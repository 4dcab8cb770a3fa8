"""Superstep engine: the one-dispatch-per-super-block streaming path
(dsp/superstep.py) must decode the same frames as the incremental
fused path on the same capture.
"""

import io
import os

import numpy as np
import pytest

# the superstep is a single-device path; keep the bank off the 8-device
# virtual test mesh (the sharded paths have their own tests)
os.environ['DUMPHFDL_NO_AUTOSHARD'] = '1'

from dumphfdl_tpu import constants as C
from dumphfdl_tpu.app import AppConfig, HfdlApp
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.dsp.frontend import Channelizer
from dumphfdl_tpu.dsp.superstep import plan_superstep
from dumphfdl_tpu.io import formats
from dumphfdl_tpu.io.outputs import OutputManager, OutputSpec
from dumphfdl_tpu.protocol.enrichment import AcCache, SysTable
from dumphfdl_tpu.protocol.runtime import ProtocolContext, ProtocolOptions

FS = 3_456_000
CENTER = 10_000_000
NCH = 8


def _mk_capture():
    freqs = [CENTER + (i - NCH // 2) * 12_000 for i in range(NCH)]
    rng = np.random.default_rng(7)
    emissions, expect = [], {}
    for k, ci in enumerate([0, 3, 6]):
        mode = [m for m in range(len(C.MODES)) if C.MODES[m].slot == 'S'][k]
        pdu = modulator.make_test_mpdu(mode, rng)
        emissions.append((pdu, mode, freqs[ci]))
        expect[ci] = pdu
    wb = modulator.synthesize_wideband_fft(emissions, fs=FS,
                                           centerfreq=CENTER, snr_db=25.0)
    return freqs, formats.serialize(wb, 'CS16'), expect


def _decode(freqs, raw, block_len):
    ctx = ProtocolContext(systable=SysTable(None), ac_cache=AcCache(),
                          ac_data=None, options=ProtocolOptions())
    outputs = OutputManager(ctx, hwm=0)
    outputs.add_output(OutputSpec.parse('decoded:text:file:path=/dev/null'))
    cfg = AppConfig(frequencies=freqs, sample_rate=FS, centerfreq=CENTER,
                    demod_block_len=block_len, sample_format='CS16')
    app = HfdlApp(cfg, ctx, outputs)
    got = {}

    orig = app.handle_events

    def capture_events(events):
        for ev in events:
            if ev.pdu is not None and ev.fcs_ok:
                got.setdefault(ev.channel, []).append(ev.pdu)
        orig(events)

    app.handle_events = capture_events
    # feed the in-memory capture through the same chunker run_file uses
    from dumphfdl_tpu.io import ingest
    ss = app.receiver.superstep
    if ss is not None:
        raw_iter = ingest.file_chunks(io.BytesIO(raw), 'CS16',
                                      app.receiver.raw_chunk_bytes,
                                      pad_final=True)
        for pk in ingest.superstep_stream(app.receiver, raw_iter):
            capture_events(app.receiver.process_packed(pk))
    else:
        for xd in ingest.uploaded_stream(
                ingest.file_chunks(io.BytesIO(raw), 'CS16', 1 << 22),
                'CS16'):
            capture_events(app.receiver.process(xd))
    capture_events(app.receiver.flush())
    outputs.shutdown()
    return app, got


@pytest.fixture(scope='module')
def capture():
    return _mk_capture()


def test_superstep_engages(capture):
    freqs, raw, _ = capture
    cfg = AppConfig(frequencies=freqs, sample_rate=FS, centerfreq=CENTER,
                    demod_block_len=16200, sample_format='CS16')
    ctx = ProtocolContext(systable=SysTable(None), ac_cache=AcCache(),
                          ac_data=None, options=ProtocolOptions())
    app = HfdlApp(cfg, ctx, OutputManager(ctx, hwm=0))
    ss = app.receiver.superstep
    assert ss is not None
    # the aligned cadence at 3.456 Msps: 10752 out samples = 15 frames
    assert ss.plan.out_chunk == 10752
    assert ss.plan.frames == 15
    assert ss.plan.wb_chunk == 15 * app.receiver.channelizer.geo.input_size
    assert app.receiver.raw_chunk_bytes == ss.plan.wb_chunk * 4


def test_superstep_decodes_same_frames(capture):
    freqs, raw, expect = capture
    app_ss, got_ss = _decode(freqs, raw, block_len=16200)
    assert app_ss.receiver.superstep is not None, 'superstep did not engage'
    app_pl, got_pl = _decode(freqs, raw, block_len=5400)
    assert app_pl.receiver.superstep is None
    # both paths decode every emission exactly once, payload-exact
    for ci, pdu in expect.items():
        assert ci in got_ss, f'superstep missed channel {ci}'
        assert ci in got_pl, f'fused path missed channel {ci}'
        assert got_ss[ci][0][:len(pdu)] == pdu
        assert got_pl[ci][0][:len(pdu)] == pdu
    assert sum(map(len, got_ss.values())) == len(expect)
    assert sum(map(len, got_pl.values())) == len(expect)


def test_plan_unalignable_geometry():
    # 2.16 Msps reduces to 25/16: the aligned block would be 16 s of
    # stream, far past the symbol-ring invariant -> no superstep
    chz = Channelizer(2_160_000, CENTER, [CENTER], out_chunk=5400)
    assert plan_superstep(chz) is None
