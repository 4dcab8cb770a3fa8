"""Pallas tracker mega-kernel vs the lax.scan reference implementation.

On the CPU test mesh the kernel runs in Pallas interpret mode (pure-JAX
emulation of the Mosaic program), so these tests validate the kernel's
*logic*; the compiled path was additionally validated on a real TPU v5e
chip (identical event tables / state, symbols within 1e-6 -- see
NOTES.md round-2 section).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dumphfdl_tpu import constants as C
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.dsp.channel import agc_block, agc_init, matched_filter
from dumphfdl_tpu.dsp.tracker import HALO, tracker_block, tracker_init
from dumphfdl_tpu.dsp.tracker_pallas import tracker_block_pallas
from dumphfdl_tpu.utils.xfer import czeros


def _assert_state_close(s1, s2, **kw):
    for f in s1._fields:
        a, b = np.asarray(getattr(s1, f)), np.asarray(getattr(s2, f))
        np.testing.assert_allclose(a, b, err_msg=f'state field {f}',
                                   rtol=kw.get('rtol', 1e-4),
                                   atol=kw.get('atol', 1e-4))


def test_noise_block_parity(monkeypatch):
    """Multi-tile geometry (several grid steps) over pure noise: state,
    outputs, event table and counters must match the scan tracker.
    (Acquisition gate off: this pins full-trajectory parity; the gated
    fast path is pinned separately below.)"""
    monkeypatch.setenv('DUMPHFDL_ACQ', 'off')
    monkeypatch.setenv('DUMPHFDL_PALLAS_SYMS', '40')   # force 3 time tiles
    nch, steps = 4, 100
    T = steps * 3 + HALO
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((nch, T))
         + 1j * rng.standard_normal((nch, T))).astype(np.complex64)
    lvl = np.abs(rng.standard_normal((nch, T)).astype(np.float32)) + 0.5
    st = tracker_init(nch)
    s1, o1, ev1, cnt1 = tracker_block(st, jnp.asarray(x), jnp.asarray(lvl),
                                      steps)
    s2, o2, ev2, cnt2 = tracker_block_pallas(st, jnp.asarray(x),
                                             jnp.asarray(lvl), steps)
    _assert_state_close(s1, s2, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o1.sym), np.asarray(o2.sym),
                               atol=2e-5)
    assert np.array_equal(np.asarray(o1.is_data), np.asarray(o2.is_data))
    assert np.array_equal(np.asarray(o1.data_idx), np.asarray(o2.data_idx))
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev2))
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cnt2))


@pytest.mark.slow
def test_frame_decode_parity():
    """A full mode-1 frame with CFO + timing offset, processed in two
    blocks (state carry across the halo): both implementations must
    produce the same completion event and near-identical symbols."""
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

    def run(tb):
        ast = agc_init(2)
        tst = tracker_init(2)
        tail = czeros((2, HALO))
        ltail = jnp.ones((2, HALO), jnp.float32)
        evs, syms_out = [], []
        for off in (0, blk):
            ast, y, lv = agc_block(ast, jnp.asarray(x[:, off:off + blk]))
            mf = matched_filter(y)
            mfe = jnp.concatenate([tail, mf], axis=1)
            lve = jnp.concatenate([ltail, lv], axis=1)
            tail, ltail = mfe[:, -HALO:], lve[:, -HALO:]
            tst, outs, ev, cnt = tb(tst, mfe, lve, blk // 3)
            evs.append(np.asarray(ev))
            syms_out.append(np.asarray(outs.sym))
        return np.concatenate(evs), tst, np.concatenate(syms_out)

    ev1, st1, sym1 = run(tracker_block)
    ev2, st2, sym2 = run(tracker_block_pallas)
    # one completed frame on channel 0, none on the noise channel
    assert (ev1[:, 0] > 0.5).sum() == 1
    np.testing.assert_allclose(ev1, ev2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sym1, sym2, atol=1e-4)
    _assert_state_close(st1, st2)


def test_debug_taps_parity(monkeypatch):
    """debug_taps=True emits the same per-symbol loop internals (costas
    dphi / phase error / timing fraction) from both implementations."""
    monkeypatch.setenv('DUMPHFDL_PALLAS_SYMS', '32')
    nch, steps = 2, 64
    T = steps * 3 + HALO
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((nch, T))
         + 1j * rng.standard_normal((nch, T))).astype(np.complex64)
    lvl = np.abs(rng.standard_normal((nch, T)).astype(np.float32)) + 0.5
    st = tracker_init(nch)
    _, o1, _, _ = tracker_block(st, jnp.asarray(x), jnp.asarray(lvl),
                                steps, debug_taps=True)
    _, o2, _, _ = tracker_block_pallas(st, jnp.asarray(x), jnp.asarray(lvl),
                                       steps, debug_taps=True)
    assert o1.taps is not None and o2.taps is not None
    np.testing.assert_allclose(np.asarray(o1.taps), np.asarray(o2.taps),
                               rtol=2e-5, atol=2e-5)


def test_channel_step_dispatch_uses_pallas(monkeypatch):
    """DUMPHFDL_TRACKER=pallas routes channel_step through the kernel and
    still decodes (interpret mode on CPU)."""
    monkeypatch.setenv('DUMPHFDL_TRACKER', 'pallas')
    from dumphfdl_tpu.dsp.channel import ChannelBank
    rng = np.random.default_rng(1)
    pdu = modulator.make_test_mpdu(0, rng, icao=0x3C0002)
    syms = modulator.frame_symbols(pdu, 0)
    iq = modulator.synthesize_iq(
        syms, imp=modulator.Impairments(snr_db=30.0, seed=2))
    n = (len(iq) // 3) * 3
    bank = ChannelBank(1, auto_shard=False)
    events = bank.process(iq[None, :n])
    # flush silence so the final EQ-train period completes
    pad = np.zeros((1, 3 * C.T_LEN * 4), np.complex64)
    events += bank.process(pad)
    assert any(e.pdu for e in events)
    ev = next(e for e in events if e.pdu)
    assert ev.mode == 0 and ev.pdu == pdu


# ---- block-parallel acquisition gate (VERDICT r3 #1b) ----

def test_acq_prefilter_detects_and_rejects():
    """acq_hits: >= 0.87 stat on real frames at 3 dB SNR / +-60 Hz CFO
    (measured, tracker_pallas.py), noise well under the 0.5 threshold."""
    from dumphfdl_tpu.dsp.tracker_pallas import acq_hits
    rng = np.random.default_rng(11)
    pdu = modulator.make_test_mpdu(0, rng)
    syms = modulator.frame_symbols(pdu, 0)
    iq = modulator.synthesize_iq(syms, imp=modulator.Impairments(
        snr_db=3.0, cfo_hz=45.0, timing_offset=0.3, seed=4))
    n = (len(iq) // 3) * 3
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64) * 0.1
    x = np.stack([iq[:n], noise])
    ast = agc_init(2)
    _, y, _ = agc_block(ast, jnp.asarray(x))
    mf = matched_filter(y)
    hits = np.asarray(acq_hits(mf, 0.5))
    assert hits.tolist() == [1, 0]


def test_gated_idle_parity(monkeypatch):
    """Gated kernel on pure noise: the idle fast path must be EXACT for
    everything frame detection depends on (event table, counters, clocks,
    noise-floor EMA trajectory) vs the scan tracker; timing/costas noise
    jitter is explicitly not carried (documented no-noise limit)."""
    monkeypatch.setenv('DUMPHFDL_PALLAS_SYMS', '128')
    nch, steps = 3, 300
    T = steps * 3 + HALO
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((nch, T))
         + 1j * rng.standard_normal((nch, T))).astype(np.complex64) * 0.2
    lvl = np.abs(rng.standard_normal((nch, T)).astype(np.float32)) + 0.5
    st = tracker_init(nch)
    s1, o1, ev1, cnt1 = tracker_block(st, jnp.asarray(x), jnp.asarray(lvl),
                                      steps)
    s2, o2, ev2, cnt2 = tracker_block_pallas(st, jnp.asarray(x),
                                             jnp.asarray(lvl), steps)
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev2))
    np.testing.assert_array_equal(np.asarray(cnt1), np.asarray(cnt2))
    for f in ('abs_symbol', 'out_idx', 'symbol_cnt', 'nf_clk', 'fr_state',
              'symbols_wanted', 'frame_counter'):
        np.testing.assert_array_equal(
            np.asarray(getattr(s1, f)), np.asarray(getattr(s2, f)),
            err_msg=f'state field {f}')
    np.testing.assert_allclose(np.asarray(s1.noise_floor),
                               np.asarray(s2.noise_floor), rtol=1e-6)
    # idle tau follows the nominal no-noise advance and rebases cleanly
    np.testing.assert_allclose(np.asarray(s2.tau),
                               np.asarray(st.tau), atol=1e-3)
    # no data symbols were emitted
    assert not np.asarray(o2.is_data).any()


def test_gated_mixed_tiles_decode(monkeypatch):
    """A frame on a channel in tile 0, pure noise filling tile 1: the
    gated kernel must decode the frame identically to the scan tracker
    while tile 1 takes the idle path."""
    monkeypatch.setenv('DUMPHFDL_TRACKER', 'pallas')
    from dumphfdl_tpu.dsp.channel import ChannelBank
    rng = np.random.default_rng(21)
    pdu = modulator.make_test_mpdu(1, rng, icao=0x3C0099)
    syms = modulator.frame_symbols(pdu, 1)
    iq = modulator.synthesize_iq(
        syms, imp=modulator.Impairments(snr_db=20.0, cfo_hz=-25.0, seed=9))
    n = (len(iq) // 3) * 3
    nch = 130                      # 2 channel tiles
    x = (rng.standard_normal((nch, n))
         + 1j * rng.standard_normal((nch, n))).astype(np.complex64) * 0.05
    x[3, :] = iq[:n]
    bank = ChannelBank(nch, auto_shard=False)
    events = bank.process(x)
    pad = np.zeros((nch, 3 * C.T_LEN * 4), np.complex64)
    events += bank.process(pad)
    events += bank.drain_events() if bank.pipeline_events else []
    good = [e for e in events if e.pdu == pdu and e.channel == 3]
    assert good, [(e.channel, e.mode) for e in events]
    assert good[0].fcs_ok
