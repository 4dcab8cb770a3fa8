"""Channelizer geometry + tone/frame round trips through the frontend."""

import numpy as np
import pytest

from dumphfdl_tpu import constants as C
from dumphfdl_tpu.dsp import frontend, modulator
from dumphfdl_tpu.dsp.receiver import WidebandReceiver
from dumphfdl_tpu.io import formats


def test_geometry_matches_reference_formulas():
    # fs=250k: floor(250000/5400)=46 -> next_pow2=64 -> /2 = 32
    assert frontend.compute_fft_decimation_rate(250_000) == 32
    geo = frontend.compute_geometry(32, 250 / 250_000)
    # taps_min = 4000->4001; ceil(4001/32)*32 = 4032 -> next_pow2 4096 +1
    assert geo.taps_length == 4097
    assert geo.fft_size == next_pow2_check(4097 * 4)
    assert geo.overlap_length == 4096
    assert geo.input_size == geo.fft_size - 4096
    assert geo.fft_size % geo.decimation == 0
    assert geo.v == geo.fft_size // geo.overlap_length


def next_pow2_check(x):
    p = 1
    while p <= x:
        p *= 2
    return p


def test_tone_lands_at_dc():
    """A tone at (channel + 1440 Hz) must appear at DC at 5400 sps."""
    fs = 250_000
    center = 10_000_000
    chan = 10_060_000     # 60 kHz above center
    cz = frontend.Channelizer(fs, center, [chan], out_chunk=1024)
    f_tone = (chan + C.SSB_CARRIER_OFFSET_HZ) - center   # Hz in baseband
    n = fs  # 1 s
    t = np.arange(n) / fs
    wb = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    out = cz.process(wb)
    assert out.shape[0] == 1
    assert out.shape[1] > 4000
    seg = out[0, 1000:4000]
    # instantaneous frequency ~ 0
    dphi = np.angle(seg[1:] * np.conj(seg[:-1]))
    f_est = np.mean(dphi) * C.INTERNAL_RATE / (2 * np.pi)
    assert abs(f_est) < 1.0, f_est
    # amplitude roughly preserved through the filter
    assert 0.5 < np.mean(np.abs(seg)) < 2.0


def test_tone_rejected_out_of_band():
    fs = 250_000
    center = 10_000_000
    chan = 10_060_000
    cz = frontend.Channelizer(fs, center, [chan], out_chunk=1024)
    # a tone 20 kHz away from the channel must be strongly attenuated
    f_tone = (chan + C.SSB_CARRIER_OFFSET_HZ + 20_000) - center
    t = np.arange(fs // 2) / fs
    wb = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    out = cz.process(wb)
    assert np.mean(np.abs(out[0, 1000:])) < 0.02


def test_sample_format_roundtrip():
    rng = np.random.default_rng(0)
    # NB: the reference CU8 convention ((byte-63.5)/127, input-helpers.c:72-76)
    # represents only +-0.5 full scale; stay well inside it
    x = np.clip((rng.standard_normal(1000) + 1j * rng.standard_normal(1000)),
                -3.0, 3.0).astype(np.complex64) * 0.12
    for fmt in formats.SAMPLE_FORMATS:
        raw = formats.serialize(x, fmt)
        back = formats.convert(raw, fmt)
        tol = {'CF32': 1e-6, 'CS16': 1e-4, 'CU8': 1e-2}[fmt]
        assert np.allclose(back, x, atol=tol), fmt


@pytest.mark.slow
def test_wideband_frame_decode():
    """Synthesized wideband capture with two channels -> decoded PDUs."""
    fs = 250_000
    center = 10_000_000
    chans = [10_030_000, 10_084_800]
    rng = np.random.default_rng(123)
    pdus = [modulator.random_pdu(1, rng), modulator.random_pdu(2, rng)]
    modes = [1, 2]
    t_wb = None
    wb = np.zeros(0, dtype=np.complex64)
    # build per-channel 5400-sps signals, upconvert to wideband offsets
    sigs = []
    for pdu, mode, chan in zip(pdus, modes, chans):
        syms = modulator.frame_symbols(pdu, mode)
        iq = modulator.synthesize_iq(syms, pad_symbols=(300, 300))
        sigs.append((iq, chan))
    n_max = max(len(s[0]) for s in sigs)
    n_wb = int(np.ceil(n_max * fs / C.INTERNAL_RATE)) + fs // 10
    wb = np.zeros(n_wb, dtype=np.complex64)
    for iq, chan in sigs:
        up = modulator._resample_poly(iq, fs, C.INTERNAL_RATE)
        f_off = (chan + C.SSB_CARRIER_OFFSET_HZ) - center
        n = np.arange(len(up))
        wb[:len(up)] += up * np.exp(2j * np.pi * f_off / fs * n) * 0.5
    rx = WidebandReceiver(fs, center, chans)
    events = []
    step = fs // 4
    for off in range(0, len(wb), step):
        events.extend(rx.process(wb[off:off + step]))
    events.extend(rx.flush())
    got = {(e.channel, e.pdu) for e in events}
    assert (0, pdus[0]) in got, 'channel 0 frame missing'
    assert (1, pdus[1]) in got, 'channel 1 frame missing'
