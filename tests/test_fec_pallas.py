"""Pallas Viterbi kernel vs the lax.scan reference (interpret mode)."""

import numpy as np
import pytest

from dumphfdl_tpu.ops import fec
from dumphfdl_tpu.ops.fec_pallas import viterbi_decode_pallas


@pytest.mark.parametrize('nbits,batch', [(540, 3), (1080, 8)])
def test_pallas_matches_scan(nbits, batch):
    rng = np.random.default_rng(11)
    softs, golden = [], []
    for _ in range(batch):
        bits = rng.integers(0, 2, nbits).astype(np.int8)
        bits[-6:] = 0
        soft = fec.hard_to_soft(fec.conv_encode(bits)).astype(np.int32)
        soft = np.clip(soft + rng.integers(-70, 71, soft.shape), 0, 255)
        softs.append(soft)
        golden.append(np.asarray(
            fec.viterbi_decode(soft[None], nbits))[0])
    out = np.asarray(viterbi_decode_pallas(np.stack(softs), nbits,
                                           interpret=True))
    assert np.array_equal(out, np.stack(golden))


def test_backend_dispatch_uses_pallas(monkeypatch):
    """DUMPHFDL_VITERBI=pallas routes decode_frame_batch through the
    kernel (interpret mode on CPU) and still round-trips a frame."""
    monkeypatch.setenv('DUMPHFDL_VITERBI', 'pallas')
    from dumphfdl_tpu.dsp import backend, modulator
    from dumphfdl_tpu import constants as C
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, C.MODES[1].pdu_len_octets, dtype=np.uint8)
    raw[-1] = 0                        # encoder flush bits must be zero
    pdu = bytes(raw)
    syms = modulator.encode_pdu_to_data_symbols(pdu, 1)
    out = backend.decode_frames(syms[None], np.asarray([False]), 1)
    assert out[0][:len(pdu)] == pdu
