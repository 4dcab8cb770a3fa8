"""ADS-C (Automatic Dependent Surveillance - Contract) decoder.

Decodes the ARINC 745 ADS message carried in ARINC-622 'ADS' IMI payloads
(downlink).  The reference delegates this to libacars
(/root/reference/src/acars.c:86-173); position extraction there consumes
basic-report-bearing tags {7,9,10,18,19,20}, airframe-ID tag 17 (24-bit
ICAO, acars.c:130-131) and flight-ID tag 12.

Field packing follows ARINC 745: a basic report is 10 octets --
lat(21 bits, 180/2^20 deg LSB) lon(21) alt(16, 4 ft LSB)
timestamp(15, 0.125 s LSB) FOM(7).  Event-report tags embed a basic
report in their leading octets.  Tags after the first unknown tag are
surfaced as raw hex rather than mis-parsed.
"""

from __future__ import annotations

from .tree import ProtoNode, iprintf

TAG_NAMES = {
    3: 'Acknowledgement',
    4: 'Negative acknowledgement',
    5: 'Noncompliance notification',
    6: 'Cancel emergency mode',
    7: 'Basic report',
    9: 'Emergency basic report',
    10: 'Lateral deviation change event',
    12: 'Flight ID',
    17: 'Airframe ID',
    18: 'Vertical rate change event',
    19: 'Altitude range change event',
    20: 'Waypoint change event',
}

BASIC_REPORT_TAGS = (7, 9, 10, 18, 19, 20)

# payload octets consumed per tag (leading basic report included);
# events carry extra octets after the basic report
_TAG_LEN = {3: 1, 4: 2, 5: 2, 6: 0, 7: 10, 9: 10, 10: 12, 12: 6, 17: 3,
            18: 12, 19: 14, 20: 10}


def _coord(c: int) -> float:
    """21-bit two's-complement binary angle, LSB = 180/2^20 degrees."""
    c &= 0x1FFFFF
    if c & 0x100000:
        c -= 1 << 21
    return c * 180.0 / (1 << 20)


def _decode_flight_id(b: bytes) -> str:
    """Flight ID (tag 12): 8 characters of 6 bits across 6 octets,
    MSB-first; each 6-bit value is ASCII - 0x20 (space..'_', covering
    digits and uppercase).  The reference reads the decoded string from
    libacars' la_adsc_flight_id_t (acars.c:130-139) and feeds it to
    position info; trailing spaces are padding."""
    fid = int.from_bytes(b[:6], 'big')
    chars = [chr(((fid >> (42 - 6 * i)) & 0x3F) + 0x20) for i in range(8)]
    return ''.join(chars).rstrip()


def parse_basic_report(b: bytes) -> dict:
    lat = (b[0] << 13) | (b[1] << 5) | (b[2] >> 3)
    lon = ((b[2] & 0x7) << 18) | (b[3] << 10) | (b[4] << 2) | (b[5] >> 6)
    alt = (((b[5] & 0x3F) << 10) | (b[6] << 2) | (b[7] >> 6)) * 4
    ts = ((((b[7] & 0x3F) << 9) | (b[8] << 1) | (b[9] >> 7))) * 0.125
    return {
        'lat': _coord(lat),
        'lon': _coord(lon),
        'alt_ft': alt,
        'timestamp_s': ts,     # seconds past the hour
    }


def parse(payload: bytes) -> ProtoNode | None:
    """Parse an ADS message (tag walk); returns an 'adsc' node."""
    tags = []
    pos = 0
    err = False
    while pos < len(payload):
        tag = payload[pos]
        pos += 1
        tlen = _TAG_LEN.get(tag)
        if tlen is None or pos + tlen > len(payload):
            if len(payload) - pos + 1 > 2:   # unknown tail beyond CRC
                tags.append({'tag': tag, 'name': 'unknown',
                             'raw': payload[pos:].hex()})
            pos = len(payload)
            break
        body = payload[pos:pos + tlen]
        pos += tlen
        entry = {'tag': tag, 'name': TAG_NAMES.get(tag, 'unknown')}
        if tag in BASIC_REPORT_TAGS:
            entry.update(parse_basic_report(body))
        elif tag == 17:
            entry['icao'] = body[0] << 16 | body[1] << 8 | body[2]
        elif tag == 12:
            entry['flight_id'] = _decode_flight_id(body)
        else:
            entry['raw'] = body.hex()
        tags.append(entry)
    if not tags:
        return None

    node = ProtoNode('adsc', {'err': err, 'tags': tags})
    # surface the position fields for protocol/position.py
    for t in tags:
        if 'lat' in t:
            node.data['lat'] = t['lat']
            node.data['lon'] = t['lon']
            node.data['minute'] = int(t['timestamp_s'] // 60) % 60
            node.data['second'] = int(t['timestamp_s']) % 60
            break
    for t in tags:
        if 'icao' in t:
            node.data['icao'] = t['icao']
            break
    for t in tags:
        if 'flight_id' in t:
            node.data['flight_id'] = t['flight_id']
            break

    def fmt(n: ProtoNode, lines: list[str], indent: int) -> None:
        iprintf(lines, indent, 'ADS-C message:')
        indent += 1
        for t in n.data['tags']:
            iprintf(lines, indent, f"{t['name']}:")
            if 'lat' in t:
                iprintf(lines, indent + 1, f"Lat: {t['lat']:.7f}")
                iprintf(lines, indent + 1, f"Lon: {t['lon']:.7f}")
                iprintf(lines, indent + 1, f"Alt: {t['alt_ft']} ft")
                ts = t['timestamp_s']
                iprintf(lines, indent + 1,
                        f'Time: {int(ts // 60):02d}:{ts % 60:06.3f}')
            elif 'icao' in t:
                iprintf(lines, indent + 1, f"ICAO: {t['icao']:06X}")
            elif 'flight_id' in t:
                iprintf(lines, indent + 1, f"Flight ID: {t['flight_id']}")
            elif 'raw' in t:
                iprintf(lines, indent + 1, f"Data: {t['raw']}")

    def js(n: ProtoNode) -> dict:
        return {'err': n.data['err'], 'tags': n.data['tags']}

    node.text_formatter = fmt
    node.json_formatter = js
    return node
