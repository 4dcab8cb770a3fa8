"""Multi-chip sharding: channel-axis data parallelism + time-axis halo.

The scaling story (SURVEY.md §2.9): channels are embarrassingly parallel
-- the reference's one-FFT-to-N-threads broadcast becomes a sharded batch
axis -- while the overlap-save forward FFT's `overlap` memmove
(/root/reference/src/fft.c:49) becomes a ``ppermute`` of boundary samples
between neighboring time shards.  This module builds the jitted sharded
decode step used by both production scale-out and the driver's
multi-chip dry run.

Mesh axes:
  'time' -- wideband stream split into consecutive spans (halo exchange
            via collective permute; frontend only),
  'chan' -- channel batch axis (demod state fully local; no collectives).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..dsp import frontend as fe
from ..dsp.channel import AgcState, agc_init, channel_step
from ..dsp.tracker import HALO, tracker_init


def make_mesh(devices=None, time_axis: int | None = None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if time_axis is None:
        time_axis = 2 if n % 2 == 0 and n >= 4 else 1
    chan_axis = n // time_axis
    arr = np.asarray(devices[:time_axis * chan_axis]).reshape(
        time_axis, chan_axis)
    return Mesh(arr, ('time', 'chan'))


class ShardedDecodeConfig(NamedTuple):
    geo: fe.DdcGeometry
    num_channels: int          # total, divisible by chan axis
    frames_per_shard: int      # forward-FFT frames per time shard
    demod_block: int           # 5400-sps samples per demod step
    num_steps: int


def build_config(mesh: Mesh, frames_per_shard: int = 2,
                 channels_per_shard: int = 2) -> ShardedDecodeConfig:
    # tiny geometry for dry runs; production uses compute_geometry(fs-based)
    geo = fe.compute_geometry(decimation=8, transition_bw=0.1)
    num_channels = mesh.shape['chan'] * channels_per_shard
    demod_block = 96
    num_steps = demod_block // C.SPS
    return ShardedDecodeConfig(geo, num_channels, frames_per_shard,
                               demod_block, num_steps)


def sharded_decode_step(mesh: Mesh, cfg: ShardedDecodeConfig):
    """Build the jitted multi-chip decode step.

    Layout:
      wideband x: (T_time, span)        P('time', None)
      kernels:    (C, fft_size)         P('chan', None)
      demod states: (C, ...)            P('chan', None) (replicated on time)

    The step:
      1. halo-exchange `overlap` boundary samples between time shards
         (collective permute == the reference's overlap-save memmove),
      2. frame + batched forward FFT per time shard,
      3. per-channel fold/iFFT (sharded over 'chan'),
      4. run the fused demod step (AGC/MF/tracker/frame scatter) on each
         (time, chan) shard's narrowband block,
      5. psum spectrum power across 'chan' as a wideband health metric.
    """
    geo = cfg.geo
    span = cfg.frames_per_shard * geo.input_size

    def step(x, kernels, coarse, agc_state, trk_state, framebuf, tail, lvl_tail):
        # x: local (1, span); kernels: (C_loc, N)
        x = x.reshape(span)
        # --- 1. halo exchange along 'time' (non-circular: shard 0 gets 0s)
        t_ax = jax.lax.axis_size('time')
        tail_in = jax.lax.ppermute(
            x[-geo.overlap_length:], 'time',
            perm=[(i, i + 1) for i in range(t_ax - 1)])
        x_ext = jnp.concatenate([tail_in, x])
        # --- 2. overlap-save framing + forward FFT
        frames = jnp.stack([
            jax.lax.dynamic_slice(x_ext, (f * geo.input_size,),
                                  (geo.fft_size,))
            for f in range(cfg.frames_per_shard)])
        spec = jnp.fft.fft(frames, axis=1)                     # (F, N)
        # --- 3. per-channel fold (channel axis local to this shard)
        prod = spec[:, None, :] * kernels[None, :, :]          # (F, Cl, N)
        shifted = jax.vmap(lambda p, b: jnp.roll(p, -b, axis=-1),
                           in_axes=(1, 0), out_axes=1)(prod, coarse)
        L = geo.fft_inv_size
        folded = shifted.reshape(spec.shape[0], -1, geo.decimation, L).sum(2)
        nb = jnp.fft.ifft(folded, axis=2)[:, :, geo.scrap:] / geo.decimation
        nb = nb.transpose(1, 0, 2).reshape(kernels.shape[0], -1)  # (Cl, Tnb)
        # --- 4. fused demod step on the narrowband block
        nb_block = jax.lax.dynamic_slice(
            nb, (0, 0), (nb.shape[0], cfg.demod_block))
        (agc_state, trk_state, framebuf, tail, lvl_tail, outs,
         ev_table, _counters) = channel_step(
            agc_state, trk_state, framebuf, tail, lvl_tail, nb_block,
            cfg.num_steps)
        # --- 5. cross-chip reduction: wideband power psum'd over 'chan'
        power = jax.lax.psum(jnp.sum(jnp.abs(spec) ** 2), 'chan')
        emitted = jnp.sum(ev_table[:, 0].astype(jnp.int32))
        return (agc_state, trk_state, framebuf, tail, lvl_tail,
                power[None], emitted[None])

    cl = cfg.num_channels // mesh.shape['chan']
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P('time', None), P('chan', None), P('chan'),
                  P('chan'), P('chan'), P('chan'), P('chan'), P('chan')),
        out_specs=(P('chan'), P('chan'), P('chan'), P('chan'), P('chan'),
                   P('time'), P(('time', 'chan'))),
        check_vma=False,
    )
    return jax.jit(sharded), span, cl


def init_sharded_states(mesh: Mesh, cfg: ShardedDecodeConfig):
    """Device-placed initial states + example inputs for the decode step."""
    geo = cfg.geo
    t_ax = mesh.shape['time']
    span = cfg.frames_per_shard * geo.input_size
    c = cfg.num_channels

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((t_ax, span))
         + 1j * rng.standard_normal((t_ax, span))).astype(np.complex64) * 0.1

    hbw = 0.5 / geo.decimation
    kernels = np.zeros((c, geo.fft_size), dtype=np.complex64)
    coarse = np.zeros((c,), dtype=np.int32)
    for i in range(c):
        shift = (i - c / 2) * 0.01
        taps = fe.firdes_bandpass_c(geo.taps_length, -shift - hbw, -shift + hbw)
        kernels[i, :geo.taps_length] = taps
        coarse[i] = geo.v * int(round(-shift * geo.fft_size / geo.v))

    agc = agc_init(c)
    trk = tracker_init(c)
    from ..utils.xfer import czeros
    framebuf = czeros((c, 2, C.DATA_SYMBOLS_MAX))
    tail = czeros((c, HALO))
    lvl_tail = jnp.ones((c, HALO), dtype=jnp.float32)
    from ..utils.xfer import device_put_safe
    return (device_put_safe(x), device_put_safe(kernels), device_put_safe(coarse),
            agc, trk, framebuf, tail, lvl_tail)


def dryrun_multichip(n_devices: int) -> None:
    """Compile + execute the full sharded decode step on an n-device mesh."""
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    cfg = build_config(mesh)
    step, span, _ = sharded_decode_step(mesh, cfg)
    args = init_sharded_states(mesh, cfg)
    out = step(*args)
    jax.block_until_ready(out)
    power = np.asarray(out[5])
    assert np.all(np.isfinite(power)), 'non-finite spectrum power'
