"""Demod chain under channel impairments: noise, CFO, timing offset, gain."""

import numpy as np
import pytest

from dumphfdl_tpu import constants as C
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.dsp.channel import ChannelBank


def run_frames(iq: np.ndarray) -> list:
    bank = ChannelBank(1)
    events = []
    n = len(iq)
    block = 5400
    for off in range(0, n, block):
        chunk = iq[off:off + block]
        if len(chunk) < block:
            chunk = np.pad(chunk, (0, block - len(chunk)))
        events.extend(bank.process(chunk[None, :]))
    return events


def synth(mode: int, seed: int, **imp) -> tuple[bytes, np.ndarray]:
    rng = np.random.default_rng(seed)
    pdu = modulator.random_pdu(mode, rng)
    syms = modulator.frame_symbols(pdu, mode)
    iq = modulator.synthesize_iq(
        syms, pad_symbols=(400, 200),
        imp=modulator.Impairments(seed=seed, **imp))
    return pdu, iq


@pytest.mark.parametrize('mode', range(8))
def test_all_modes_with_noise(mode):
    """Every mode decodes at a comfortable SNR with mild gain offset."""
    pdu, iq = synth(mode, seed=100 + mode, snr_db=25.0, gain=0.3)
    events = run_frames(iq)
    assert any(e.pdu == pdu and e.mode == mode for e in events), \
        [(e.mode, e.train_bad, e.train_total) for e in events]


@pytest.mark.parametrize('cfo', [-20.0, 8.0, 30.0])
def test_cfo(cfo):
    """Costas loop pulls in carrier offsets of tens of Hz."""
    mode = 1
    pdu, iq = synth(mode, seed=7, snr_db=25.0, cfo_hz=cfo, phase=1.1)
    events = run_frames(iq)
    assert any(e.pdu == pdu for e in events), \
        [(e.mode, e.train_bad, e.train_total, e.freq_err_hz) for e in events]
    ev = next(e for e in events if e.pdu == pdu)
    # The reference reports dphi*1800/2pi with dphi per HALF-symbol
    # (hfdl.c:505 sets symsync output rate 2; costas steps per output,
    # hfdl.c:709-710; report formula hfdl.c:812), i.e. it displays cfo/2.
    # We mirror that formula for message-header parity, hence the *2 here
    # maps the displayed value back to the true injected CFO.
    assert abs(ev.freq_err_hz * 2.0 - cfo) < 15.0, (ev.freq_err_hz, cfo)


@pytest.mark.parametrize('toff', [0.5, 1.5, 2.5])
def test_timing_offset(toff):
    """Fractional-sample timing offsets (incl. worst-case half symbol)."""
    mode = 2
    pdu, iq = synth(mode, seed=8, snr_db=25.0, timing_offset=toff)
    events = run_frames(iq)
    assert any(e.pdu == pdu for e in events), \
        [(e.mode, e.train_bad, e.train_total) for e in events]


def test_low_snr_bpsk():
    """300 bps BPSK with rate-1/4 FEC should survive moderate noise."""
    mode = 0
    pdu, iq = synth(mode, seed=9, snr_db=12.0)
    events = run_frames(iq)
    assert any(e.pdu == pdu for e in events), \
        [(e.mode, e.train_bad, e.train_total) for e in events]


def test_back_to_back_frames():
    """Two frames on one channel decode independently."""
    mode = 1
    rng = np.random.default_rng(11)
    pdus = [modulator.random_pdu(mode, rng) for _ in range(2)]
    iqs = []
    for pdu in pdus:
        syms = modulator.frame_symbols(pdu, mode)
        iqs.append(modulator.synthesize_iq(
            syms, pad_symbols=(300, 300),
            imp=modulator.Impairments(snr_db=28.0, seed=12)))
    iq = np.concatenate(iqs)
    events = run_frames(iq)
    got = [e.pdu for e in events]
    assert pdus[0] in got and pdus[1] in got, len(events)
