"""MIAM (Media Independent Aircraft Messaging, ARINC 841) recognition.

The reference gets MIAM decoding from libacars (la_miam_parse is invoked
from la_acars_parse_and_reassemble, which /root/reference/src/acars.c:33
delegates to; the statsd counters acars.c:47-52 count its reassembly
outcomes).  MIAM rides ordinary ACARS messages with label 'MA': the
message text is one ACARS Convergence Function (CF) frame, identified by
its first character, and the Single Transfer frame body carries a MIAM
CORE PDU.

Decode depth here is *recognition plus header fields*:

- ACARS CF frame classification by frame-id character (the seven ARINC
  841 CF frame types).
- For Single Transfer frames, best-effort CORE PDU header recognition:
  the leading ASCII-hex version/PDU-type pair, plus detection of a
  DEFLATE-compressed body by its zlib signature (MIAM CORE compresses
  application data with DEFLATE).  Fields that do not parse cleanly are
  reported as unknown and the payload stays available as hex.

No ARINC 841 test vectors or off-air MIAM captures were available in
this environment, so the CORE header layout is labeled best-effort in
the output ('hdr_confidence') rather than presented as authoritative;
the frame-id table and the DEFLATE use are well-documented public facts.
"""

from __future__ import annotations

import zlib

from .tree import ProtoNode, iprintf

# ARINC 841 ACARS CF frame identifiers (first char of the message text).
FRAME_IDS = {
    'T': 'Single Transfer',
    'F': 'File Transfer Request',
    'K': 'File Transfer Accept',
    'S': 'File Segment',
    'A': 'File Transfer Abort',
    'Y': 'MIAM XOFF IND',
    'X': 'MIAM XON IND',
}

CORE_PDU_TYPES = {
    0: 'Data',
    1: 'Ack',
    2: 'Aloha',
    3: 'Aloha reply',
}


def parse(label: str, text: str, raw: bytes) -> ProtoNode | None:
    """Recognize a MIAM ACARS-CF frame (label 'MA')."""
    if label != 'MA' or not text:
        return None
    fid = text[0]
    ftype = FRAME_IDS.get(fid)
    if ftype is None:
        return None
    data: dict = {'frame_id': fid, 'frame_type': ftype}
    node = ProtoNode('miam', data)
    node.text_formatter = _fmt
    node.json_formatter = _js
    body = raw[1:] if len(raw) > 1 else text[1:].encode('latin-1')
    data['body_len'] = len(body)
    if fid == 'T' and len(body) >= 2:
        core: dict = {'hdr_confidence': 'best-effort'}
        # leading ASCII-hex version / PDU-type pair
        v, t = chr(body[0] & 0x7F), chr(body[1] & 0x7F)
        if v in '0123456789abcdefABCDEF':
            core['version'] = int(v, 16)
        if t in '0123456789abcdefABCDEF':
            tv = int(t, 16)
            core['pdu_type'] = CORE_PDU_TYPES.get(tv, f'unknown ({tv})')
        # MIAM CORE compresses application data with DEFLATE; a zlib
        # stream header (0x78 0x01/0x9c/0xda) inside the body is a
        # reliable positive signal even without the full header layout.
        comp = 'none detected'
        for i in range(len(body) - 1):
            if body[i] == 0x78 and body[i + 1] in (0x01, 0x5E, 0x9C, 0xDA):
                try:
                    zlib.decompressobj().decompress(bytes(body[i:]))
                    comp = f'deflate (zlib stream at offset {i})'
                    core['deflate_offset'] = i
                except zlib.error:
                    continue
                break
        core['compression'] = comp
        data['core'] = core
    data['payload_hex'] = bytes(b & 0xFF for b in body).hex()
    return node


def _fmt(n: ProtoNode, lines: list[str], indent: int) -> None:
    d = n.data
    iprintf(lines, indent, f"MIAM ACARS CF frame: {d['frame_type']}")
    indent += 1
    core = d.get('core')
    if core:
        iprintf(lines, indent, 'MIAM CORE PDU (header fields best-effort):')
        if 'version' in core:
            iprintf(lines, indent + 1, f"Version: {core['version']}")
        if 'pdu_type' in core:
            iprintf(lines, indent + 1, f"PDU type: {core['pdu_type']}")
        iprintf(lines, indent + 1, f"Compression: {core['compression']}")
    iprintf(lines, indent, f"Payload ({d['body_len']} bytes): "
            f"{d['payload_hex'][:64]}{'...' if d['body_len'] > 32 else ''}")


def _js(n: ProtoNode) -> dict:
    return dict(n.data)
