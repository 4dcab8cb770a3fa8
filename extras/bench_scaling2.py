#!/usr/bin/env python
"""Scaling artifact v2 (VERDICT r4 #8): an efficiency column that is
EXPLAINABLE on a 2-vCPU host, plus an explicit ICI-attached prediction.

The r3 weak-scaling curve was CPU-starved (N virtual devices share 2
physical cores, so wall-clock efficiency falls as 1/N by construction)
and said nothing about what a real pod would do.  This harness separates
the three quantities that actually determine pod scaling and measures
each one in a way this host CAN measure:

1. **Work inflation** W(N): total PROCESS CPU seconds to decode a fixed
   stream on an N-device mesh, normalized to N=1.  Sharding is efficient
   iff the partitioned programs do (almost) no duplicated or extra
   compute; CPU time measures exactly that, independent of how many
   cores the work is folded onto.  (Wall time on this host measures core
   count, not the design -- it is recorded but NOT the metric.)
2. **Collective volume** B(N): bytes of the collectives GSPMD actually
   inserted into the compiled partitioned programs (same extraction as
   extras/measure_collectives.py), per stream-second.
3. **Decode correctness**: the sharded decode at every N reproduces the
   emission set (the same PDUs as N=1).

ICI-attached prediction (the methodology the artifact carries):

   eff(N) ~= 1 / (W(N) * (1 + B(N) / (ICI_BW * T_dev(1))))

where T_dev(1) is the single-device compute time per stream-second on
the REAL chip (BENCH rt factor) and ICI_BW the per-link ICI bandwidth
(v5e: ~4.5e10 B/s usable per direction).  With measured W(N) ~ 1 and
B(N) of a few hundred kB..MB/s against tens of GB/s links, the
prediction is >= 90% scaling efficiency, limited by work inflation, not
communication.  The one measured exception is the fs1-append ring
all-gather (see MULTICHIP_DETAIL findings), which this artifact carries
per point so the prediction degrades honestly where GSPMD compiles the
reshard badly.

Writes SCALING.json (v2 schema) at the repo root.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'

import numpy as np            # noqa: E402
import jax                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

ICI_BW = 4.5e10               # B/s usable per v5e ICI direction (public)


def _cpu_seconds() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def run_point(n_dev: int, fs: int, nch: int, stream_s: float,
              wb, emissions, freqs, center) -> dict:
    from jax.sharding import Mesh
    from dumphfdl_tpu.parallel.sharding import ShardedWidebandReceiver
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_collectives import collectives_in

    t_ax = 1 if n_dev < 4 else 2
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(
        t_ax, n_dev // t_ax), ('time', 'chan'))
    rx = ShardedWidebandReceiver(fs, center, freqs, mesh=mesh)
    sl = rx.frontend.super_len
    total = int(stream_s * fs)
    n_steps = max(4, total // sl)

    # measured collectives of the two partitioned frontend programs
    fe, ch = rx.frontend, rx.channelizer
    from dumphfdl_tpu.parallel.sharding import place_global
    xs_d = place_global(np.zeros((fe.T, fe.span), np.complex64),
                        fe._x_shard)
    ph0 = place_global(np.zeros((fe.T, ch.rows), np.float32), fe._ph_shard)
    coll_fe = collectives_in(fe._step.lower(
        xs_d, fe._tail, fe._idx, fe._hwin, fe._residual_dev,
        ph0).compile())
    # the frontend's explicit all_to_all delivers the chunk already in
    # the ring's P(('chan','time'), None) layout (r5 reshard fix)
    nb = place_global(np.zeros((ch.rows, fe.nb_cols), np.complex64),
                      ch._fs1_ring.sharding)
    coll_app = collectives_in(type(ch)._fs1_append.lower(
        ch, ch._fs1_ring, nb, ch._fs1_wcur).compile())
    sb_per_s = fs / sl
    coll_bytes_per_s = int((sum(coll_fe.values())
                            + sum(coll_app.values())) * sb_per_s)

    # fixed-work decode, CPU-time accounted; 1 warm-up step first
    pdus = []
    rx.process(wb[:sl])
    cpu0, w0 = _cpu_seconds(), time.time()
    for k in range(n_steps):
        off = sl + k * sl
        chunk = wb[off:off + sl]
        if len(chunk) < sl:
            chunk = np.pad(chunk, (0, sl - len(chunk)))
        for ev in rx.process(chunk):
            if ev.pdu is not None and ev.fcs_ok:
                pdus.append(ev.pdu.hex())
    cpu1, w1 = _cpu_seconds(), time.time()
    for ev in rx.flush():
        if ev.pdu is not None and ev.fcs_ok:
            pdus.append(ev.pdu.hex())
    secs = n_steps * sl / fs
    return {
        'devices': n_dev,
        'mesh': {k: int(v) for k, v in mesh.shape.items()},
        'stream_s_measured': round(secs, 2),
        'cpu_s': round(cpu1 - cpu0, 2),
        'cpu_s_per_stream_s': round((cpu1 - cpu0) / secs, 3),
        'wall_s': round(w1 - w0, 2),
        'collective_bytes_per_stream_s': coll_bytes_per_s,
        'collectives_frontend': coll_fe,
        'collectives_fs1_append': coll_app,
        'decoded': sorted(set(pdus)),
    }


def main() -> int:
    from dumphfdl_tpu import constants as C
    from dumphfdl_tpu.dsp import modulator

    fs = int(os.environ.get('SCALING_FS', '864000'))
    nch = int(os.environ.get('SCALING_CHANNELS', '32'))
    stream_s = float(os.environ.get('SCALING_SECONDS', '4'))
    center = 10_000_000
    spacing = max(3000, min(8000, (fs - 20000) // max(nch, 1)))
    freqs = [center + (i - nch // 2) * spacing for i in range(nch)]
    rng = np.random.default_rng(0)
    single_slot = [m for m in range(len(C.MODES)) if C.MODES[m].slot == 'S']
    emissions = []
    for k, ci in enumerate(range(0, nch, max(1, nch // 4))[:4]):
        mode = single_slot[k % len(single_slot)]
        emissions.append((modulator.make_test_mpdu(mode, rng), mode,
                          freqs[ci]))
    wb = modulator.synthesize_wideband_fft(emissions, fs=fs,
                                           centerfreq=center, snr_db=30.0)
    need = int(stream_s * fs) + 4 * fs
    wb = np.tile(wb, -(-need // len(wb)))[:need]
    expected = sorted(p.hex() for p, _, _ in emissions)

    points = []
    for n in (1, 2, 4, 8):
        print(f'# point: {n} devices', file=sys.stderr, flush=True)
        p = run_point(n, fs, nch, stream_s, wb, emissions, freqs, center)
        p['decode_ok'] = p.pop('decoded') == expected
        points.append(p)
        print(json.dumps(p), file=sys.stderr, flush=True)

    base_cpu = points[0]['cpu_s_per_stream_s']
    # single-chip device time per stream-second on the REAL chip: from
    # the committed bench (rt 1.15 at 2048 ch -> T_dev ~= 0.87 s/s; use
    # the conservative 1.0)
    t_dev1 = float(os.environ.get('SCALING_TDEV1', '1.0'))
    for p in points:
        p['work_inflation'] = round(p['cpu_s_per_stream_s'] / base_cpu, 3)
        ici_share = p['collective_bytes_per_stream_s'] / (ICI_BW * t_dev1)
        p['ici_time_share'] = round(ici_share, 6)
        p['predicted_pod_efficiency'] = round(
            1.0 / (p['work_inflation'] * (1.0 + ici_share)), 3)

    out = {
        'metric': ('strong scaling v2: work inflation (process CPU '
                   'seconds, fixed stream) + measured collectives + '
                   'ICI-attached pod prediction'),
        'schema': 2,
        'host_cpus': os.cpu_count(),
        'sample_rate': fs, 'channels': nch,
        'ici_bw_assumed_Bps': ICI_BW,
        't_dev1_assumed_s_per_stream_s': t_dev1,
        'methodology': (
            'Pod efficiency ~= 1 / (work_inflation * (1 + '
            'collective_bytes_per_stream_s / (ICI_BW * t_dev1))). '
            'work_inflation = CPU-seconds per stream-second on the '
            'N-device partitioned programs over the 1-device programs '
            '(measures duplicated/extra compute from sharding, '
            'independent of host core count -- wall time on a 2-vCPU '
            'host measures cores, not the design, and is recorded but '
            'not used).  Collective bytes come from the compiled '
            'partitioned HLO, not a model.'),
        'points': points,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, 'SCALING.json'), 'w') as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == '__main__':
    sys.exit(main())
