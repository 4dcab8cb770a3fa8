"""Multi-chip sharding: time-axis halo exchange + channel data parallelism.

The scaling story (SURVEY.md §2.9): channels are embarrassingly parallel
-- the reference's one-FFT-to-N-threads broadcast becomes a sharded batch
axis -- while the overlap-save forward FFT's `overlap` memmove
(/root/reference/src/fft.c:49-54) becomes a ``ppermute`` of boundary
samples between neighboring time shards.

Production mapping on a ('time', 'chan') mesh:

* **Frontend** (cost ∝ sample rate): each super-block of wideband samples
  is split into T contiguous spans, one per time shard.  Each shard
  receives its predecessor's trailing `overlap` samples by collective
  permute (shard 0 gets the carried tail of the previous super-block),
  frames its span, runs the batched forward FFT, and computes the
  per-channel **bin-window gather** DDC (see dsp/frontend.py) for its
  *local* channel slice (gather tables and kernel windows sharded over
  'chan').  All devices contribute.
* **Demodulator** (cost ∝ channels): the fused tracker scan is serial in
  time per channel, so channels shard over BOTH mesh axes (T*K-way,
  P(('chan','time'))).  The narrowband redistribution to that layout is
  an EXPLICIT ``lax.all_to_all`` over 'time' inside the frontend's
  shard_map (left to GSPMD, the ring-append boundary compiles to a
  full-ring all-gather -- measured 5.4x the minimum, r5) -- so the one
  bulk cross-chip traffic is exactly (T-1)/T of the fs1 stream:
  C x 6.75 ksps x 8 B -- a few MB/s per thousand channels, riding ICI.

`ShardedWidebandReceiver` is the production entry (used by the app when
a mesh is configured); `dryrun_multichip` runs it end-to-end on a
synthesized capture and asserts decoded-PDU correctness.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..dsp.channel import ChannelBank
from ..dsp.frontend import Channelizer
from ..dsp.receiver import WidebandReceiver


def place_global(x, sharding) -> jax.Array:
    """device_put that also works on cross-process (non-fully-addressable)
    meshes: every process contributes its addressable shards from an
    identical host-local copy (jax.make_array_from_callback)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array):
        from ..utils.xfer import device_get
        x = device_get(x)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def fetch_global(x):
    """device_get that also works on cross-process arrays: gathers the
    non-addressable shards from the other processes (every host gets the
    full array, like each reference instance seeing its own decode)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    from ..utils.xfer import device_get
    return device_get(x)


def make_mesh(devices=None, time_axis: int | None = None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if time_axis is None:
        time_axis = 2 if n % 2 == 0 and n >= 4 else 1
    chan_axis = n // time_axis
    arr = np.asarray(devices[:time_axis * chan_axis]).reshape(
        time_axis, chan_axis)
    return Mesh(arr, ('time', 'chan'))


class ShardedFrontend:
    """Time-sharded overlap-&-scrap channelizer step.

    One call consumes a (T, span) super-block (row t = the t-th
    contiguous span of the wideband stream, sharded P('time')) and
    returns the (C_pad, T*F*post) narrowband fs1 stream already in the
    demodulator's channel-sharded layout P(('chan','time'), None): the
    DDC computes P('chan','time') locally, then an explicit
    ``lax.all_to_all`` over 'time' exchanges column spans for row
    sub-blocks -- the minimal reshard, (T-1)/T of the stream.
    """

    def __init__(self, ch: Channelizer, mesh: Mesh,
                 frames_per_shard: int = 4):
        self.ch = ch
        self.mesh = mesh
        geo = ch.geo
        self.T = mesh.shape['time']
        self.F = frames_per_shard
        self.span = self.F * geo.input_size
        self.super_len = self.T * self.span
        self.nb_cols = self.T * self.F * geo.post_input_size
        self.c_pad = ch.rows

        kshard = NamedSharding(mesh, P('chan', None))
        cshard = NamedSharding(mesh, P('chan'))
        self._idx = place_global(ch._idx_np, kshard)
        self._hwin = place_global(ch._hwin_np, kshard)
        self._residual64 = ch._residual64
        self._residual_dev = place_global(
            ch._residual64.astype(np.float32), cshard)
        rep = NamedSharding(mesh, P(None))
        self._tail = place_global(
            np.zeros(geo.overlap_length, np.complex64), rep)
        self._x_shard = NamedSharding(mesh, P('time', None))
        self._ph_shard = NamedSharding(mesh, P('time', 'chan'))
        self._nb_count = 0          # global fs1 samples emitted
        self._step = self._build_step()

    def _build_step(self):
        geo = self.ch.geo
        T, F = self.T, self.F
        post = geo.post_input_size
        D = geo.decimation
        L = geo.fft_inv_size
        w = self.ch.window_images
        ov = geo.overlap_length

        def step(x, tail_prev, idxtab, hwin, residual, phase0):
            # local shapes: x (1, span); idxtab/hwin (Cl, W); phase0 (1, Cl)
            t = jax.lax.axis_index('time')
            xl = x[0]
            # halo exchange == the reference's overlap-save memmove
            # (fft.c:49-54): my last `ov` samples go to my time-successor
            halo = jax.lax.ppermute(
                xl[-ov:], 'time', perm=[(i, i + 1) for i in range(T - 1)])
            tail = jnp.where(t == 0, tail_prev, halo)
            x_ext = jnp.concatenate([tail, xl])
            idx = (jnp.arange(F, dtype=jnp.int32)[:, None] * geo.input_size
                   + jnp.arange(geo.fft_size, dtype=jnp.int32)[None, :])
            frames = x_ext[idx]
            spec = jnp.fft.fft(frames, axis=1)                 # (F, N)
            g = spec[:, idxtab]                                # (F, Cl, W)
            prod = g * hwin[None, :, :]
            folded = prod.reshape(F, -1, w, L).sum(axis=2)
            nb = jnp.fft.ifft(folded, axis=2)[:, :, geo.scrap:] / D
            nb = nb.transpose(1, 0, 2).reshape(-1, F * post)   # (Cl, F*post)
            # residual mixer: phase0 computed host-side in f64 for this
            # shard's first sample; local ramp stays small (f32-safe)
            ramp = residual[:, None] * jnp.arange(F * post,
                                                  dtype=jnp.float32)[None, :]
            ph = phase0[0][:, None] + ramp
            nb = nb * jnp.exp(-2j * jnp.pi * (ph - jnp.floor(ph)))
            # next super-block's carried tail: last shard's trailing samples
            contrib = jnp.where(t == T - 1, xl[-ov:],
                                jnp.zeros_like(xl[-ov:]))
            new_tail = jax.lax.psum(contrib, 'time')
            # explicit reshard to the demod layout P(('chan','time')):
            # split my local rows into T sub-blocks and all_to_all over
            # 'time' -- each device keeps sub-block t of its chan-block
            # and gains every time shard's column span for it.  Exactly
            # (T-1)/T of the fs1 stream crosses chips (the analytic
            # minimum); left to GSPMD at the ring-append boundary this
            # compiled to a full-ring all-gather (measured 5.4x, r5).
            nb = jax.lax.all_to_all(nb.astype(jnp.complex64), 'time',
                                    split_axis=0, concat_axis=1, tiled=True)
            return nb, new_tail

        sharded = jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(P('time', None), P(None), P('chan', None),
                      P('chan', None), P('chan'), P('time', 'chan')),
            out_specs=(P(('chan', 'time'), None), P(None)),
            check_vma=False,
        )
        return jax.jit(sharded)

    def step(self, x: np.ndarray) -> jax.Array:
        """x: (super_len,) contiguous wideband samples -> (C_pad, nb_cols)
        narrowband chunk (sharded); updates the carried overlap tail."""
        post = self.ch.geo.post_input_size
        xs = place_global(
            np.ascontiguousarray(x.reshape(self.T, self.span)), self._x_shard)
        # per-(shard, channel) start phase in f64 (bounded f32 ramps inside)
        starts = self._nb_count + np.arange(self.T) * self.F * post
        ph0 = np.mod(self._residual64[None, :] * starts[:, None], 1.0)
        ph0 = place_global(ph0.astype(np.float32), self._ph_shard)
        nb, self._tail = self._step(xs, self._tail, self._idx, self._hwin,
                                    self._residual_dev, ph0)
        self._nb_count += self.T * self.F * post
        return nb


@dataclasses.dataclass(eq=False)
class ShardedWidebandReceiver(WidebandReceiver):
    """WidebandReceiver on a ('time', 'chan') device mesh.

    Frontend work shards over 'time' (halo via collective permute), the
    demodulator's channel batch shards over all mesh devices; the fs1
    resampler ring and all demod state are device-resident and
    channel-sharded."""
    mesh: Mesh = None
    frames_per_shard: int = 4

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh()
        # channel axis shards ('chan' major, 'time' minor) to line up
        # with the frontend's explicit all_to_all reshard: device (t,k)
        # demodulates row sub-block t of chan-block k, so the fs1 append
        # is local (zero collectives in the append/resample/demod path)
        self.bank = ChannelBank(len(self.frequencies), mesh=self.mesh,
                                mesh_axes=('chan', 'time'), auto_shard=False,
                                pipeline_events=True)
        c_pad = self.bank._c
        self.channelizer = Channelizer(self.sample_rate, self.centerfreq,
                                       list(self.frequencies),
                                       out_chunk=self.block_len, rows=c_pad)
        self.frontend = ShardedFrontend(self.channelizer, self.mesh,
                                        self.frames_per_shard)
        shard2d = NamedSharding(self.mesh, P(('chan', 'time'), None))
        ch = self.channelizer
        # rebuild the fs1 ring channel-sharded and big enough for one
        # sharded frontend step per append
        need = int(ch.out_chunk * ch.ratio) + ch._rs_taps \
            + 2 * self.frontend.nb_cols + 64
        ch._r1 = 1 << int(np.ceil(np.log2(need)))
        ch._fs1_ring = place_global(
            np.zeros((c_pad, ch._r1), np.complex64), shard2d)
        ch._fs1_wcur = place_global(
            np.asarray([[0]], np.int32), NamedSharding(self.mesh, P()))
        ch._fs1_start = 0
        ch._fs1_fill = 0
        ch._ring_global_start = 0
        self.sample_clock = 0
        self._wb_buf = np.zeros(0, np.complex64)

    # instrument=True makes process() time each stage with
    # block_until_ready barriers (slower; for scaling artifacts only)
    instrument: bool = False

    def process(self, wideband) -> list:
        self.sample_clock += len(wideband)
        if isinstance(wideband, jax.Array):
            # mesh runs normally feed host chunks (app skips the ingest
            # upload when sharded); if a device array does arrive, read it
            # back via the restricted-safe path rather than np.asarray
            from ..utils.xfer import device_get
            wideband = device_get(wideband)
        wideband = np.asarray(wideband, np.complex64)
        self._wb_buf = np.concatenate([self._wb_buf, wideband])
        events = []
        ch = self.channelizer
        sl = self.frontend.super_len
        if self.instrument:
            import time as _t
            st = getattr(self, 'stage_time', None)
            if st is None:
                st = self.stage_time = {'frontend': 0.0, 'fs1_append': 0.0,
                                        'resample_demod': 0.0,
                                        'collect': 0.0}
            while len(self._wb_buf) >= sl:
                x, self._wb_buf = self._wb_buf[:sl], self._wb_buf[sl:]
                t0 = _t.time()
                nb = jax.block_until_ready(self.frontend.step(x))
                st['frontend'] += _t.time() - t0
                t0 = _t.time()
                ch._append_fs1(nb)
                jax.block_until_ready(ch._fs1_ring)
                st['fs1_append'] += _t.time() - t0
                t0 = _t.time()
                chunks = [jax.block_until_ready(c)
                          for c in ch._drain_resampler()]
                for chunk in chunks:
                    events.extend(self.bank.process(chunk))
                    jax.block_until_ready(self.bank.tracker_state.tau)
                st['resample_demod'] += _t.time() - t0
            return events
        while len(self._wb_buf) >= sl:
            x, self._wb_buf = self._wb_buf[:sl], self._wb_buf[sl:]
            nb = self.frontend.step(x)
            ch._append_fs1(nb)
            for chunk in ch._drain_resampler():
                events.extend(self.bank.process(chunk))
        return events

    def comm_model(self) -> dict:
        """Analytic per-stream-second collective/transfer volumes for this
        geometry (VERDICT r3 #6): lets pod-scale behavior be predicted
        from the artifact instead of guessed.

        * halo_bytes: the ppermute of `overlap` boundary samples between
          adjacent time shards (the reference's overlap memmove,
          fft.c:49-54) -- (T-1) x overlap x 8 B per super-block.
        * fs1_reshard_bytes: the one bulk reshard, narrowband fs1
          samples moving from the DDC's P('chan','time') layout to the
          demod ring's P(('chan','time'), None) layout via the explicit
          all_to_all over 'time' inside the frontend step: exactly
          (T-1)/T of the stream crosses chips, riding ICI.
        * demod collectives: none -- channels are fully data-parallel.
        * event_readback_bytes: the per-block host readback (event table
          [+ fused decode words]).
        """
        from ..dsp.backend import PACK_WORDS
        from ..dsp.tracker import EV_FIELDS, K_EVENTS
        geo = self.channelizer.geo
        fe, fs = self.frontend, self.sample_rate
        ndev = int(self.mesh.devices.size)
        sb_per_s = fs / fe.super_len
        c_pad = self.bank._c
        fs1_rate = fs / geo.decimation
        fused = self.bank.fused_event_decode or 0
        blocks_per_s = C.INTERNAL_RATE / self.block_len
        return {
            'devices': ndev,
            'time_shards': fe.T,
            'halo_bytes_per_s': int((fe.T - 1) * geo.overlap_length * 8
                                    * sb_per_s),
            'fs1_reshard_bytes_per_s': int(c_pad * fs1_rate * 8
                                           * (fe.T - 1) / fe.T),
            'demod_collective_bytes_per_s': 0,
            'event_readback_bytes_per_s': int(
                (c_pad * K_EVENTS * EV_FIELDS
                 + fused * (2 + PACK_WORDS)) * 4 * blocks_per_s),
            'wideband_upload_bytes_per_s': int(fs * 8),
        }

    def flush(self) -> list:
        pad_wb = int((C.DOUBLE_SLOT_FRAME_LEN + 200) * C.SPS
                     * self.sample_rate / C.INTERNAL_RATE) \
            + 4 * self.channelizer.geo.fft_size + 2 * self.frontend.super_len
        events = []
        step = self.sample_rate
        pad = np.zeros(step, dtype=np.complex64)
        for _ in range(-(-pad_wb // step)):
            events.extend(self.process(pad))
        events.extend(self.bank.drain_events())
        return events


def dryrun_multichip(n_devices: int) -> None:
    """Production-geometry multi-chip dry run: decode a synthesized HFDL
    capture through the time+channel-sharded receiver on an n-device mesh
    and assert the decoded PDUs match the transmitted ones bit-for-bit
    (not merely finiteness).

    Default geometry is production-SHAPED and mid-SIZED (64 channels @
    432 ksps -- the recommended one-SDR-per-subband operating rate x2,
    reference README.md:969); DUMPHFDL_DRYRUN_CHANNELS/_FS scale it."""
    import os

    from ..dsp import modulator

    mesh = make_mesh(jax.devices()[:n_devices])
    fs = int(os.environ.get('DUMPHFDL_DRYRUN_FS', '432000'))
    nch = int(os.environ.get('DUMPHFDL_DRYRUN_CHANNELS', '64'))
    center = 10_000_000
    spacing = max(3000, min(8000, (fs - 20000) // nch))
    chans = [center + (i - nch // 2) * spacing for i in range(nch)]
    rng = np.random.default_rng(7)
    # traffic on 8 channels spread across the band, cycling the
    # single-slot modes; the rest hunt over noise
    modes = [1, 3, 0, 2, 1, 3, 0, 2]
    traffic = list(range(0, nch, max(1, nch // 8)))[:8]
    pdus = {ci: modulator.make_test_mpdu(modes[k], rng,
                                         icao=0x3C0000 + ci)
            for k, ci in enumerate(traffic)}
    wb = modulator.synthesize_wideband_fft(
        [(pdus[ci], modes[k], chans[ci]) for k, ci in enumerate(traffic)],
        fs=fs, centerfreq=center, snr_db=30.0)
    rx = ShardedWidebandReceiver(fs, center, chans, mesh=mesh)
    rx.instrument = True
    events = []
    step = fs // 2
    for off in range(0, len(wb), step):
        events.extend(rx.process(wb[off:off + step]))
    events.extend(rx.flush())
    got: dict[int, set] = {}
    for e in events:
        if e.pdu:
            got.setdefault(e.channel, set()).add(e.pdu)
    # every traffic channel must decode its PDU bit-for-bit (noise
    # channels may occasionally emit false frames; the FCS rejects those
    # downstream, so they are not an error here)
    missing = [ci for ci, p in pdus.items() if p not in got.get(ci, set())]
    assert not missing, (
        f'sharded decode mismatch: channels {missing} missing their PDU; '
        f'decoded channels {sorted(got)}')
    # evidence sidecar: per-stage wall time + modeled collective volumes
    # (VERDICT r3 #6) next to the driver's own MULTICHIP artifact; only
    # written for explicit-geometry runs so test/driver invocations at
    # default geometry don't clobber the committed production artifact
    if not os.environ.get('DUMPHFDL_DRYRUN_CHANNELS'):
        return
    import json
    detail = {
        'devices': n_devices, 'mesh': dict(mesh.shape),
        'sample_rate': fs, 'channels': nch,
        'stream_seconds': round(len(wb) / fs, 2),
        'stage_wall_s': {k: round(v, 3)
                         for k, v in rx.stage_time.items() if v},
        'comm_model': rx.comm_model(),
        'decoded_ok': len(pdus),
    }
    try:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        with open(os.path.join(repo, 'MULTICHIP_DETAIL.json'), 'w') as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
