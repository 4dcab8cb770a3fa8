"""Device-side header-FCS kernel vs the host verdict (VERDICT r3 #2/#3).

backend._device_fcs_ok must agree with ops.crc.pdu_fcs_ok (which mirrors
the parsers' header geometry, mpdu.c:56-89 / spdu.c:40 / pdu.c:66-79)
on valid frames, corrupted frames, and random junk.
"""

import numpy as np
import jax.numpy as jnp

from dumphfdl_tpu.dsp import backend
from dumphfdl_tpu.ops import crc

from test_protocol import make_downlink_mpdu, make_lpdu, make_uplink_mpdu


def _to_bits(pdu: bytes) -> np.ndarray:
    """LSB-first frame bits padded to MAX_FRAMEBITS (decoder layout)."""
    bits = np.unpackbits(np.frombuffer(pdu, np.uint8),
                         bitorder='little')
    out = np.zeros(backend.MAX_FRAMEBITS, np.int32)
    out[:len(bits)] = bits[:backend.MAX_FRAMEBITS]
    return out


def _device_verdicts(pdus: list[bytes]) -> np.ndarray:
    bits = jnp.asarray(np.stack([_to_bits(p) for p in pdus]))
    return np.asarray(backend._device_fcs_ok(bits))


def _make_spdu() -> bytes:
    body = bytes([0x00]) + bytes(range(63))      # LSB 0 -> SPDU
    return crc.fcs_append(body)


def test_fcs_device_matches_host_on_valid_frames():
    pdus = [
        make_downlink_mpdu([make_lpdu(bytes([0x0D, 0xFF, 0xD2]))]),
        make_uplink_mpdu([make_lpdu(bytes([0x1D, 0xFF, 0xD2])),
                          make_lpdu(bytes([0x0D] + [0x55] * 8))]),
        _make_spdu(),
    ]
    host = [crc.pdu_fcs_ok(p) for p in pdus]
    assert all(host), 'test vectors must be FCS-valid'
    assert _device_verdicts(pdus).tolist() == host


def test_fcs_device_rejects_corruption():
    good = make_downlink_mpdu([make_lpdu(bytes([0x0D, 0xFF, 0xD2]))])
    hdr_plus_fcs = crc.pdu_hdr_len(good) + 2
    pdus = []
    for i in range(hdr_plus_fcs):        # corrupt FCS-protected bytes
        b = bytearray(good)
        b[i] ^= 0x40
        pdus.append(bytes(b))
    host = [crc.pdu_fcs_ok(p) for p in pdus]
    assert not any(host)
    assert _device_verdicts(pdus).tolist() == host


def test_fcs_device_matches_host_on_junk():
    rng = np.random.default_rng(7)
    pdus = [bytes(rng.integers(0, 256, 80, dtype=np.uint8))
            for _ in range(32)]
    host = [crc.pdu_fcs_ok(p) for p in pdus]
    assert _device_verdicts(pdus).tolist() == host
