"""--datadumps taps (incl. costas/symsync loop internals) and --profile."""

import pathlib

import numpy as np

from dumphfdl_tpu import cli
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.io import formats


def test_datadumps_and_profile(tmp_path, monkeypatch):
    fs = 36_000
    chan = 10_000_000
    rng = np.random.default_rng(21)
    pdu = modulator.make_test_mpdu(1, rng, icao=0x3C0001)
    wb = modulator.synthesize_wideband([(pdu, 1, chan)], fs=fs,
                                       centerfreq=chan, snr_db=30.0)
    cap = tmp_path / 'cap.cs16'
    cap.write_bytes(formats.serialize(wb, 'CS16'))
    out = tmp_path / 'out.txt'
    prof = tmp_path / 'trace'
    monkeypatch.chdir(tmp_path)        # dump files land in cwd
    rc = cli.main([
        '--iq-file', str(cap), '--sample-format', 'CS16',
        '--sample-rate', str(fs), '--centerfreq', '10000',
        '--datadumps', '--profile', str(prof),
        '--output', f'decoded:text:file:path={out}', '10000',
    ])
    assert rc == 0
    assert 'ICAO: 3C0001' in out.read_text()
    # reference tap set (dumpfile.c) + the costas/symsync loop internals
    for stage, ext in [('chan_out', 'cf32'), ('agc_out', 'cf32'),
                       ('agc_level', 'rf32'), ('mf_out', 'cf32'),
                       ('sym_out', 'cf32'), ('const', 'cf32'),
                       ('costas_dphi', 'rf32'), ('costas_err', 'rf32'),
                       ('symsync_tau', 'rf32')]:
        path = tmp_path / f'{stage}.ch0.{ext}'
        assert path.exists(), f'missing tap {stage}'
        assert path.stat().st_size > 0
    # costas dphi converges near zero CFO: last quarter mean ~ 0
    dphi = np.fromfile(tmp_path / 'costas_dphi.ch0.rf32', np.float32)
    assert np.abs(dphi[-len(dphi) // 4:]).mean() < 0.05
    tau = np.fromfile(tmp_path / 'symsync_tau.ch0.rf32', np.float32)
    assert ((tau >= 0) & (tau < 1)).all()
    # an xprof trace directory was produced
    assert prof.exists() and any(prof.rglob('*'))
