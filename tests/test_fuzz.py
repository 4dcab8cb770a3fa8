"""Adversarial fuzz hardening of the deep decoders (VERDICT r3 #8).

Arbitrary byte strings through every protocol parser must never raise
and never loop; every valid message must survive truncation at every
byte boundary.  The reference inherits this robustness requirement from
libacars (whose parsers are fed off-air bytes directly,
/root/reference/src/acars.c:33); here it is pinned by seeded-random and
truncation fuzzing so a malformed frame can never take down the decoder
thread.  Parsers may return None / error nodes, but must always
format_text()/to_json() cleanly afterwards.
"""

import time

import numpy as np
import pytest

from dumphfdl_tpu.protocol import adsc, cpdlc, media_adv, miam, ohma
from dumphfdl_tpu.protocol.pdu import PduMetadata, parse_pdu
from dumphfdl_tpu.protocol.runtime import ProtocolContext

from test_protocol import make_downlink_mpdu, make_lpdu

SEED = 0x48464C      # "HFL"
N_RANDOM = 300


def _exercise_tree(trees):
    """Formatting a parse result must never raise either."""
    if trees is None:
        return
    if not isinstance(trees, list):
        trees = [trees]
    for t in trees:
        t.format_text()
        t.tree_json()


def _rand_chunks(rng, n, maxlen=300):
    for _ in range(n):
        ln = int(rng.integers(0, maxlen))
        yield bytes(rng.integers(0, 256, ln, dtype=np.uint8))


def test_fuzz_parse_pdu_random():
    """Random bytes straight into the PDU dispatcher (MPDU/SPDU/LPDU/
    HFNPDU/ACARS stack, pdu.c:102 equivalent)."""
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    rng = np.random.default_rng(SEED)
    t0 = time.monotonic()
    for buf in _rand_chunks(rng, N_RANDOM):
        _exercise_tree(parse_pdu(buf, meta, ctx))
    assert time.monotonic() - t0 < 60       # and never loops


def test_fuzz_parse_pdu_structured():
    """Random bytes wrapped in structurally-valid MPDU/LPDU envelopes so
    the deep parsers (HFNPDU/ACARS/ARINC-622 apps) actually run."""
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    rng = np.random.default_rng(SEED + 1)
    for body in _rand_chunks(rng, N_RANDOM, maxlen=200):
        lp = make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + body)
        _exercise_tree(parse_pdu(make_downlink_mpdu([lp]), meta, ctx))


def test_fuzz_app_parsers_random():
    rng = np.random.default_rng(SEED + 2)
    for buf in _rand_chunks(rng, N_RANDOM, maxlen=120):
        _exercise_tree(adsc.parse(buf))
        _exercise_tree(cpdlc.parse(buf, uplink=False))
        _exercise_tree(cpdlc.parse(buf, uplink=True))
        text = buf.decode('latin-1')
        _exercise_tree(media_adv.parse('SA', text))
        _exercise_tree(ohma.parse(text))
        _exercise_tree(miam.parse('MA', text, buf))


def test_truncation_every_boundary_adsc():
    fid = 0
    for ch in 'BAW0012 ':
        fid = (fid << 6) | (ord(ch) - 0x20)
    payload = (
        bytes([3, 7]) + bytes([4, 8, 2]) + bytes([5, 9, 2, 13, 1, 16, 0])
        + bytes([9]) + adsc.encode_basic_report(10.0, 20.0, 30000, 100.0)
        + bytes([12]) + fid.to_bytes(6, 'big')
        + bytes([13]) + adsc.encode_predicted_route(1, 2, 4000, 60, 3, 4, 8000)
        + bytes([14]) + adsc.encode_earth_ref(90.0, 400.0, 0)
        + bytes([15]) + adsc.encode_air_ref(91.0, 0.8, -512)
        + bytes([16]) + adsc.encode_meteo(30.0, 180.0, -40.0)
        + bytes([17]) + (0xA1B2C3).to_bytes(3, 'big')
        + bytes([22]) + adsc.encode_intermediate_intent(10.0, 45.0, 2000, 30)
        + bytes([23]) + adsc.encode_fixed_intent(5.0, 6.0, 10000, 90)
    )
    for cut in range(len(payload)):
        _exercise_tree(adsc.parse(payload[:cut]))


def test_truncation_every_boundary_full_stack():
    """A real MPDU truncated at every byte must parse or fail cleanly."""
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    from test_adsc import make_adsc_acars
    acars = make_adsc_acars(51.1, 2.2, 100.0)
    pdu = make_downlink_mpdu([make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + acars)])
    for cut in range(len(pdu)):
        _exercise_tree(parse_pdu(pdu[:cut], meta, ctx))


def test_fuzz_bitflips_full_stack():
    """Single-byte corruptions of a valid frame (post-FCS scenarios)."""
    ctx = ProtocolContext()
    meta = PduMetadata(freq=8912000, rx_timestamp=time.time())
    from test_adsc import make_adsc_acars
    acars = make_adsc_acars(51.1, 2.2, 100.0)
    pdu = bytearray(
        make_downlink_mpdu([make_lpdu(bytes([0x0D, 0xFF, 0xFF]) + acars)]))
    rng = np.random.default_rng(SEED + 3)
    for _ in range(N_RANDOM):
        i = int(rng.integers(0, len(pdu)))
        old = pdu[i]
        pdu[i] = int(rng.integers(0, 256))
        _exercise_tree(parse_pdu(bytes(pdu), meta, ctx))
        pdu[i] = old
