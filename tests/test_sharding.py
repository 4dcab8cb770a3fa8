"""Driver entry points: forward-step tracing + multi-device dry runs."""

import sys

import jax
import pytest

sys.path.insert(0, '/root/repo')


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)      # traces the full fused step
    assert isinstance(out, tuple)


@pytest.mark.parametrize('n', [2, 8])
def test_dryrun_multichip(n):
    from dumphfdl_tpu.parallel.sharding import dryrun_multichip
    dryrun_multichip(n)


def test_mesh_shapes():
    from dumphfdl_tpu.parallel.sharding import make_mesh
    m = make_mesh(jax.devices()[:8])
    assert m.shape['time'] * m.shape['chan'] == 8
    m1 = make_mesh(jax.devices()[:1])
    assert m1.shape['time'] == 1 and m1.shape['chan'] == 1


def test_time_sharded_receiver_matches_default():
    """PDU-level parity: the production ('time','chan')-mesh receiver
    (halo collective-permute frontend + channel-sharded demod) decodes a
    wideband capture identically to the default receiver."""
    import numpy as np
    from dumphfdl_tpu.dsp import modulator
    from dumphfdl_tpu.dsp.receiver import WidebandReceiver
    from dumphfdl_tpu.parallel.sharding import (ShardedWidebandReceiver,
                                                make_mesh)

    fs, center = 43_200, 10_000_000
    chans = [9_990_000, 10_000_000, 10_008_000]
    rng = np.random.default_rng(42)
    pdus = [modulator.make_test_mpdu(1, rng, icao=0xABCDEF),
            modulator.make_test_mpdu(3, rng, icao=0x777777)]
    wb = modulator.synthesize_wideband_fft(
        [(pdus[0], 1, chans[0]), (pdus[1], 3, chans[2])],
        fs=fs, centerfreq=center, snr_db=25.0)

    mesh = make_mesh(jax.devices()[:8])          # (time=2, chan=4)
    assert mesh.shape['time'] == 2
    results = []
    for rx in (WidebandReceiver(fs, center, chans),
               ShardedWidebandReceiver(fs, center, chans, mesh=mesh)):
        events = []
        step = fs // 3
        for off in range(0, len(wb), step):
            events.extend(rx.process(wb[off:off + step]))
        events.extend(rx.flush())
        decoded = sorted((e.channel, e.mode, e.pdu)
                         for e in events if e.pdu)
        ferr = {e.channel: e.freq_err_hz for e in events if e.pdu}
        results.append((decoded, ferr))
    assert results[0][0] == results[1][0]
    assert [c for c, _, _ in results[0][0]] == [0, 2]
    for chan in results[0][1]:
        assert abs(results[0][1][chan] - results[1][1][chan]) < 0.1


def test_fs1_reshard_is_explicit_all_to_all():
    """The fs1 reshard must be the explicit all_to_all inside the
    frontend step, NOT a GSPMD full-ring all-gather at the ring-append
    boundary (r5 finding: left implicit, GSPMD compiled the append to a
    5.4x all-gather).  Pins: (a) frontend_step contains an all-to-all of
    exactly one fs1 chunk, (b) _fs1_append compiles collective-free."""
    import re

    import numpy as np
    from dumphfdl_tpu.parallel.sharding import (ShardedWidebandReceiver,
                                                make_mesh, place_global)

    fs, center = 432_000, 10_000_000
    nch = 16
    chans = [center + (i - nch // 2) * 8000 for i in range(nch)]
    mesh = make_mesh(jax.devices()[:8])          # (time=2, chan=4)
    rx = ShardedWidebandReceiver(fs, center, chans, mesh=mesh)
    fe, ch = rx.frontend, rx.channelizer

    def collective_bytes(compiled):
        """Per-collective-kind result ELEMENT counts from the optimized
        HLO (tuple-shaped results -- e.g. the decomposed tiled
        all-to-all -- sum their elements)."""
        txt = compiled.as_text()
        out = {}
        for line in txt.splitlines():
            m = re.match(r'\s*%?[\w.\-]+ = ((?:\([^)]*\)|\S+)) ([\w\-]+)\(',
                         line.strip())
            if not m:
                continue
            shape, op = m.groups()
            for kind in ('all-gather', 'all-to-all', 'collective-permute',
                         'all-reduce'):
                if op == kind or op.startswith(kind + '-'):
                    n = 0
                    for dims in re.findall(r'\[([0-9,]*)\]', shape):
                        k = 1
                        for d in (dims.split(',') if dims else []):
                            k *= int(d)
                        n += k
                    out[kind] = out.get(kind, 0) + n
        return out

    xs = place_global(np.zeros((fe.T, fe.span), np.complex64), fe._x_shard)
    ph0 = place_global(np.zeros((fe.T, ch.rows), np.float32), fe._ph_shard)
    front = collective_bytes(fe._step.lower(
        xs, fe._tail, fe._idx, fe._hwin, fe._residual_dev, ph0).compile())
    # (a) the reshard rides the frontend step as one all-to-all whose
    # per-device result is this device's full fs1 chunk share (the HLO
    # is one SPMD program, so counts are per-device)
    ndev = int(mesh.devices.size)
    assert front.get('all-to-all', 0) == ch.rows * fe.nb_cols // ndev
    assert front.get('all-gather', 0) == 0

    nb = place_global(np.zeros((ch.rows, fe.nb_cols), np.complex64),
                      ch._fs1_ring.sharding)
    app = collective_bytes(type(ch)._fs1_append.lower(
        ch, ch._fs1_ring, nb, ch._fs1_wcur).compile())
    # (b) chunk and ring shardings now agree -> no collectives at all
    assert not app, f'fs1 append compiled collectives: {app}'


def test_channelbank_sharded_matches_single():
    """ChannelBank with an explicit 8-device channel mesh decodes the
    same frame as the unsharded bank (padded dummy channels included)."""
    import numpy as np
    from jax.sharding import Mesh
    from dumphfdl_tpu.dsp import modulator
    from dumphfdl_tpu.dsp.channel import ChannelBank

    mode = 1
    rng = np.random.default_rng(123)
    pdu = modulator.random_pdu(mode, rng)
    syms = modulator.frame_symbols(pdu, mode)
    iq = modulator.synthesize_iq(syms, pad_symbols=(300, 300)) * 0.5

    mesh = Mesh(np.asarray(jax.devices()[:8]), ('chan',))
    # 3 real channels -> padded to 8 internally; channel 1 gets the frame
    banks = [ChannelBank(3, auto_shard=False),
             ChannelBank(3, mesh=mesh)]
    assert banks[1]._c == 8
    results = []
    for bank in banks:
        events = []
        for off in range(0, len(iq), 5400):
            chunk = iq[off:off + 5400]
            if len(chunk) < 5400:
                chunk = np.pad(chunk, (0, 5400 - len(chunk)))
            block = np.zeros((3, 5400), np.complex64)
            block[1] = chunk
            events.extend(bank.process(block))
        results.append(events)
    assert len(results[0]) == 1 and len(results[1]) == 1
    e0, e1 = results[0][0], results[1][0]
    assert e0.channel == e1.channel == 1
    assert e0.pdu == pdu and e1.pdu == pdu
    assert abs(e0.freq_err_hz - e1.freq_err_hz) < 1e-3
