"""Two-process jax.distributed deployment test (VERDICT r2 #9).

Validates the documented cross-host production topology: every process
joins one jax.distributed job (DUMPHFDL_COORDINATOR env, cli.py:122-133)
and decodes its contiguous slice of the global channel list from its own
(physically local) SDR stream; outputs are emitted host-locally.

The test spawns two REAL processes coordinated over localhost, each
decoding its half of a synthesized 8-channel capture, and asserts the
union of their decoded PDUs equals the full emission set -- i.e. the
multi-host path loses nothing vs a single process.

Why per-host slicing and not a cross-host ('time','chan') global mesh:
see NOTES.md "Cross-host topology" -- each host's wideband stream
originates at its own SDR, so a global-mesh halo would ship raw samples
over DCN purely to compute them on another host; channels are
embarrassingly parallel, so slicing at the channel axis keeps DCN
traffic at zero.  Time-axis sharding (ShardedWidebandReceiver) remains
the intra-host multi-chip path (ICI), tested in test_sharding.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r'''
import json, os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
# the axon environment pre-imports jax via sitecustomize, so the env var
# alone is too late -- pin via the config API like tests/conftest.py
jax.config.update('jax_platforms', 'cpu')
from dumphfdl_tpu import constants as C
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.dsp.receiver import WidebandReceiver
from dumphfdl_tpu.parallel import multihost

assert multihost.init_distributed()
FS, CENTER, NCH = 432000, 10_000_000, 8
freqs = [CENTER + (i - NCH // 2) * 6000 for i in range(NCH)]
sl = multihost.local_channel_slice(NCH)
local = freqs[sl]

# deterministic capture, identical in both processes (each host would
# normally feed its own SDR; here both "SDRs" see the same air)
rng = np.random.default_rng(0)
single_slot = [m for m in range(len(C.MODES)) if C.MODES[m].slot == 'S']
emissions = []
for k, ci in enumerate(range(0, NCH, 2)):
    mode = single_slot[k % len(single_slot)]
    emissions.append((modulator.make_test_mpdu(mode, rng), mode, freqs[ci]))
wb = modulator.synthesize_wideband_fft(emissions, fs=FS, centerfreq=CENTER,
                                       snr_db=30.0)

rx = WidebandReceiver(FS, CENTER, local)
pdus = []
blk = FS // 2
for off in range(0, len(wb), blk):
    for ev in rx.process(wb[off:off + blk]):
        if ev.pdu:
            pdus.append(ev.pdu.hex())
for ev in rx.flush():
    if ev.pdu:
        pdus.append(ev.pdu.hex())
print(json.dumps({'rank': jax.process_index(),
                  'nprocs': jax.process_count(),
                  'local_freqs': local,
                  'expected': [p.hex() for p, _, f in emissions
                               if f in local],
                  'pdus': pdus}), flush=True)
'''


@pytest.mark.slow
def test_two_process_channel_slicing():
    env_base = dict(os.environ)
    env_base['PYTHONPATH'] = ':'.join(
        p for p in [REPO, env_base.get('PYTHONPATH', '')] if p)
    env_base['DUMPHFDL_COORDINATOR'] = '127.0.0.1:29517'
    env_base['DUMPHFDL_NUM_PROCESSES'] = '2'
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env['DUMPHFDL_PROCESS_ID'] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        results.append(json.loads(out.strip().splitlines()[-1]))

    assert {r['rank'] for r in results} == {0, 1}
    assert all(r['nprocs'] == 2 for r in results)
    # the channel slices partition the global list
    all_freqs = sorted(f for r in results for f in r['local_freqs'])
    assert len(all_freqs) == 8 and len(set(all_freqs)) == 8
    # every emitted frame decodes on exactly the host that owns its channel
    for r in results:
        assert sorted(set(r['pdus'])) == sorted(set(r['expected'])), r

_CHILD_MESH = r'''
import json, os, sys, tempfile
os.environ['JAX_PLATFORMS'] = 'cpu'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)
from dumphfdl_tpu import constants as C
from dumphfdl_tpu.dsp import modulator
from dumphfdl_tpu.io import formats
from dumphfdl_tpu.app import AppConfig, HfdlApp
from dumphfdl_tpu.io.outputs import OutputManager
from dumphfdl_tpu.protocol.runtime import ProtocolContext
from dumphfdl_tpu.parallel import multihost

assert multihost.init_distributed()
assert jax.device_count() == 8 and jax.local_device_count() == 4

FS, CENTER, NCH = 432000, 10_000_000, 8
freqs = [CENTER + (i - NCH // 2) * 6000 for i in range(NCH)]
rng = np.random.default_rng(0)
single_slot = [m for m in range(len(C.MODES)) if C.MODES[m].slot == 'S']
emissions = []
for k, ci in enumerate(range(0, NCH, 2)):
    mode = single_slot[k % len(single_slot)]
    emissions.append((modulator.make_test_mpdu(mode, rng), mode, freqs[ci]))
wb = modulator.synthesize_wideband_fft(emissions, fs=FS, centerfreq=CENTER,
                                       snr_db=30.0)
cap = tempfile.mktemp(suffix='.cs16')
open(cap, 'wb').write(formats.serialize(wb, 'CS16'))

# the APP path: cfg.mesh spans BOTH processes (2x4 over 8 global devices)
ctx = ProtocolContext()
cfg = AppConfig(frequencies=freqs, sample_rate=FS, centerfreq=CENTER,
                sample_format='CS16', mesh='2x4')
app = HfdlApp(cfg, ctx, OutputManager(ctx, hwm=0))
pdus = []
orig = app.handle_events
def capture_ev(events):
    for ev in events:
        if ev.pdu is not None and ev.fcs_ok:
            pdus.append(ev.pdu.hex())
    orig(events)
app.handle_events = capture_ev
app.run_file(cap, sample_format='CS16')
os.unlink(cap)
print(json.dumps({'rank': jax.process_index(),
                  'mesh': [2, 4],
                  'expected': sorted(p.hex() for p, _, _ in emissions),
                  'pdus': sorted(set(pdus))}), flush=True)
'''


@pytest.mark.slow
def test_two_process_global_mesh_app_path():
    """The ('time','chan') global-mesh decode in the APP path, spanning
    two real jax.distributed processes x 4 virtual devices each
    (VERDICT r4 #4): both hosts decode the full emission set bit-exactly
    through cfg.mesh -> ShardedWidebandReceiver."""
    env_base = dict(os.environ)
    env_base['PYTHONPATH'] = ':'.join(
        p for p in [REPO, env_base.get('PYTHONPATH', '')] if p)
    env_base['DUMPHFDL_COORDINATOR'] = '127.0.0.1:29531'
    env_base['DUMPHFDL_NUM_PROCESSES'] = '2'
    procs = []
    for rank in range(2):
        env = dict(env_base)
        env['DUMPHFDL_PROCESS_ID'] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _CHILD_MESH], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        results.append(json.loads(out.strip().splitlines()[-1]))
    assert {r['rank'] for r in results} == {0, 1}
    for r in results:
        assert r['pdus'] == r['expected'], r
