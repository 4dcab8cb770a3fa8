#!/usr/bin/env python
"""Generate the real-chip Pallas parity artifact (tests/golden/chip_parity.json).

Runs fixed, fully deterministic scenarios through the two Pallas TPU
kernels and records their observable outputs:

  * tracker mega-kernel (dsp/tracker_pallas.py): a synthesized mode-1
    frame with CFO + timing offset on channel 0, noise on channel 1,
    processed in two blocks (state carry across the halo).  Records the
    per-block event tables, counters, final tracker state, and a
    checksum of the symbol stream.
  * Viterbi ACS kernel (ops/fec_pallas.py): seeded random soft bits ->
    decoded bit rows (hex digest).

Run this ON A REAL TPU to capture the compiled Mosaic behavior:

    python extras/chip_parity.py          # writes tests/golden/chip_parity.json

tests/test_chip_parity.py replays the identical scenarios in Pallas
interpret mode on CPU and asserts the integer-valued outputs match the
artifact exactly and the float outputs match to 1e-4 -- making the
"kernels validated on hardware" claim reviewable without a TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np   # noqa: E402


def tracker_scenario():
    """Deterministic two-block tracker run; returns JSON-serializable dict."""
    import jax.numpy as jnp
    from dumphfdl_tpu.dsp import modulator
    from dumphfdl_tpu.dsp.channel import agc_block, agc_init, matched_filter
    from dumphfdl_tpu.dsp.tracker import HALO, tracker_init
    from dumphfdl_tpu.dsp.tracker_pallas import tracker_block_pallas
    from dumphfdl_tpu.utils.xfer import czeros, device_get, device_put_safe

    rng = np.random.default_rng(5)
    pdu = modulator.make_test_mpdu(1, rng, icao=0x3C0001)
    syms = modulator.frame_symbols(pdu, 1)
    iq = modulator.synthesize_iq(
        syms, imp=modulator.Impairments(snr_db=30.0, cfo_hz=12.0,
                                        timing_offset=0.4, seed=3))
    n = len(iq)
    noise = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.01
    x = np.stack([iq, noise]).astype(np.complex64)
    blk = (n // 2 // 3) * 3

    ast = agc_init(2)
    tst = tracker_init(2)
    tail = czeros((2, HALO))
    ltail = jnp.ones((2, HALO), jnp.float32)
    evs, counters, sym_sum = [], [], np.zeros(2, np.complex128)
    sym_absmax = np.zeros(2)
    for off in (0, blk):
        # device_put_safe: direct complex64 uploads wedge the axon tunnel
        ast, y, lv = agc_block(ast, device_put_safe(x[:, off:off + blk]))
        mf = matched_filter(y)
        mfe = jnp.concatenate([tail, mf], axis=1)
        lve = jnp.concatenate([ltail, lv], axis=1)
        tail, ltail = mfe[:, -HALO:], lve[:, -HALO:]
        tst, outs, ev, cnt = tracker_block_pallas(tst, mfe, lve, blk // 3)
        evs.append(device_get(ev))
        counters.append(device_get(cnt))
        s = device_get(outs.sym)
        sym_sum += s.sum(axis=0)
        sym_absmax = np.maximum(sym_absmax, np.abs(s).max(axis=0))
    state = {f: device_get(getattr(tst, f)).tolist()
             for f in ('fr_state', 'mode', 'frame_counter', 'abs_symbol',
                       'symbols_wanted', 'data_idx')}
    statef = {f: device_get(getattr(tst, f)).astype(float).tolist()
              for f in ('tau', 'phi', 'dphi', 'freq_err', 'signal_level',
                        'noise_floor')}
    return {
        'ev_tables': [e.astype(float).tolist() for e in evs],
        'counters': [c.astype(float).tolist() for c in counters],
        'state_int': state,
        'state_float': statef,
        'sym_sum_re': sym_sum.real.tolist(),
        'sym_sum_im': sym_sum.imag.tolist(),
        'sym_absmax': sym_absmax.tolist(),
        'blk': blk,
    }


def viterbi_scenario():
    """Seeded soft bits -> Pallas Viterbi decoded bits (hex digests)."""
    import hashlib
    from dumphfdl_tpu.ops.fec_pallas import viterbi_decode_pallas
    from dumphfdl_tpu.utils.xfer import device_get, device_put_safe

    rng = np.random.default_rng(11)
    framebits = 1800
    soft = rng.integers(0, 256, size=(8, 2 * framebits),
                        dtype=np.int64).astype(np.uint8)
    bits = device_get(viterbi_decode_pallas(device_put_safe(soft), framebits))
    digests = [hashlib.sha256(np.packbits(row).tobytes()).hexdigest()
               for row in np.asarray(bits, np.uint8)]
    return {'framebits': framebits, 'digests': digests}


def main() -> int:
    import jax
    platform = jax.devices()[0].platform
    out = {
        'platform': platform,
        'compiled': platform == 'tpu',
        'tracker': tracker_scenario(),
        'viterbi': viterbi_scenario(),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, 'tests', 'golden', 'chip_parity.json')
    with open(path, 'w') as fh:
        json.dump(out, fh, indent=1)
    print(f'wrote {path} (platform={platform})')
    return 0


if __name__ == '__main__':
    sys.exit(main())
