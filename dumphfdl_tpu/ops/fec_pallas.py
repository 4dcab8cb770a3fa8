"""Pallas TPU kernel for the 64-state Viterbi ACS sweep.

The lax.scan decoder in ops/fec.py dispatches one tiny XLA step per
decoded bit (up to 7560 for a double-slot 8PSK frame).  This kernel runs
the whole add-compare-select sweep inside one Pallas program, laid out
for the hardware:

* frames are the lane dimension (128 per grid tile), trellis states the
  sublane dimension (64 rows);
* path metrics are f32 (exact: max accumulated metric 510*7560 < 2^24);
  the per-step butterfly interleave new[2k]=even[k], new[2k+1]=odd[k] --
  which Mosaic cannot shape-cast -- is done with strided sublane stores
  (a value-carrying MXU matmul would truncate the f32 metrics to bf16);
* decisions are packed to 4x16-bit words per step by a second small
  matmul and emitted as (4*nbits, 128) f32 rows;
* soft chips stream through VMEM in time tiles via the grid, metrics
  persist in scratch across tiles.

Trellis conventions identical to ops/fec.py (Karn viterbi27,
/root/reference/src/libfec/viterbi27_port.c:166).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fec import _branch_tables

_NSTATES = 64
_L = 128         # frames per grid tile (lane dimension)


@functools.cache
def _pack_matrix() -> np.ndarray:
    """(4,64) 16-bit decision packer matrix."""
    W = np.zeros((8, _NSTATES), np.float32)
    for b in range(32):
        W[b // 16, b] = float(1 << (b % 16))        # de bits -> words 0,1
        W[2 + b // 16, 32 + b] = float(1 << (b % 16))  # do bits -> words 2,3
    return W[:4]


def _acs_kernel(nbits, t_tile,
                s0_ref, s1_ref, b0_ref, b1_ref, w_ref,
                dec_ref, m_ref):
    """Grid cell (i=batch tile, j=time tile): ACS over t_tile bit steps.

    s0_ref/s1_ref: (t_tile, L) f32 soft chips
    b0_ref/b1_ref: (32, L) f32 expected-chip branch tables (broadcast)
    w_ref: (8, 64) decision packer
    dec_ref: (4*t_tile, L) f32 packed decision words
    m_ref: (64, L) f32 path-metric scratch, persists across time tiles
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        row = jax.lax.broadcasted_iota(jnp.int32, (_NSTATES, _L), 0)
        m_ref[:, :] = jnp.where(row == 0, 0.0, 63.0)

    def body(t, _):
        s0 = s0_ref[pl.ds(t, 1), :]                  # (1, L)
        s1 = s1_ref[pl.ds(t, 1), :]
        bm = jnp.abs(b0_ref[:, :] - s0) + jnp.abs(b1_ref[:, :] - s1)
        m = m_ref[:, :]
        lo, hi = m[0:32, :], m[32:64, :]
        m0e = lo + bm
        m1e = hi + 510.0 - bm
        de = m0e > m1e
        even = jnp.where(de, m1e, m0e)
        m0o = lo + 510.0 - bm
        m1o = hi + bm
        do = m0o > m1o
        odd = jnp.where(do, m1o, m0o)
        # butterfly interleave new[2k]=even[k], new[2k+1]=odd[k] via
        # strided sublane stores (a value-carrying MXU matmul would
        # truncate the f32 metrics to bf16)
        m_ref[0:_NSTATES:2, :] = even
        m_ref[1:_NSTATES:2, :] = odd
        dec = jnp.concatenate([de, do], axis=0).astype(jnp.float32)
        packed = jax.lax.dot_general(                # (8, L), rows 4..7 zero
            w_ref[:, :], dec,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dec_ref[pl.ds(4 * t, 4), :] = packed[0:4, :]
        return 0

    n_this = jnp.minimum(t_tile, nbits - j * t_tile)
    jax.lax.fori_loop(0, n_this, body, 0)


def _viterbi_pallas_words(soft: jax.Array, nbits: int,
                          interpret: bool) -> jax.Array:
    """(B, 2*nbits) soft chips -> (nbits, 4, B_pad) packed decision words."""
    batch = soft.shape[0]
    b_pad = -(-batch // _L) * _L
    t_tile = min(int(os.environ.get('DUMPHFDL_VITERBI_TSTEPS', '2048')), nbits)
    t_tiles = -(-nbits // t_tile)

    pairs = soft.astype(jnp.float32).reshape(batch, nbits, 2)
    chips = jnp.pad(pairs, ((0, b_pad - batch),
                            (0, t_tiles * t_tile - nbits), (0, 0)))
    s0 = chips[:, :, 0].T                            # (T_pad, B_pad)
    s1 = chips[:, :, 1].T

    b0, b1 = _branch_tables()
    b0b = np.broadcast_to(np.asarray(b0, np.float32)[:, None], (32, _L)).copy()
    b1b = np.broadcast_to(np.asarray(b1, np.float32)[:, None], (32, _L)).copy()
    W8 = np.concatenate([_pack_matrix(),
                         np.zeros((4, _NSTATES), np.float32)], axis=0)

    grid = (b_pad // _L, t_tiles)
    const = lambda r, l: pl.BlockSpec((r, l), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)
    dec = pl.pallas_call(
        functools.partial(_acs_kernel, nbits, t_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_tile, _L), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, _L), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            const(32, _L), const(32, _L), const(8, 64),
        ],
        out_specs=pl.BlockSpec((4 * t_tile, _L), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * t_tile * t_tiles, b_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((_NSTATES, _L), jnp.float32)],
        interpret=interpret,
    )(s0, s1, jnp.asarray(b0b), jnp.asarray(b1b), jnp.asarray(W8))
    return dec.reshape(t_tile * t_tiles, 4, b_pad)[:nbits]


@functools.partial(jax.jit, static_argnames=('nbits', 'interpret'))
def _viterbi_decode_pallas(soft: jax.Array, nbits: int,
                           interpret: bool) -> jax.Array:
    words = _viterbi_pallas_words(soft, nbits, interpret).astype(jnp.int32)
    batch = soft.shape[0]
    words = words[:, :, :batch]                      # (nbits, 4, B)

    # chainback (viterbi27_port.c:105-134): 6 virtual zero decisions
    ext = jnp.concatenate(
        [words, jnp.zeros((6, 4, batch), jnp.int32)], axis=0)

    def chainback(state, dec_t):
        # dec_t: (4, B); decision bit for new state s lives in word
        # (s&1)*2 + ((s>>1)>=16), bit (s>>1)%16
        widx = (state & 1) * 2 + ((state >> 1) >= 16).astype(jnp.int32)
        word = jnp.take_along_axis(dec_t, widx[None, :], axis=0)[0]
        k = (word >> ((state >> 1) % 16)) & 1
        new_state = (state >> 1) | (k << 5)
        return new_state, k.astype(jnp.int8)

    state0 = jnp.zeros((batch,), dtype=jnp.int32)
    _, bits_rev = jax.lax.scan(chainback, state0, ext[6:][::-1])
    return bits_rev[::-1].transpose(1, 0)


def viterbi_decode_pallas(soft: jax.Array, nbits: int,
                          interpret: bool | None = None) -> jax.Array:
    """Batched Viterbi decode with the Pallas ACS kernel.

    Args/returns match ops.fec.viterbi_decode.  Off TPU the kernel runs
    in interpret mode (pure-JAX emulation) unless overridden.
    """
    if interpret is None:
        interpret = (bool(int(os.environ.get('DUMPHFDL_PALLAS_INTERPRET',
                                             '0')))
                     or jax.devices()[0].platform != 'tpu')
    return _viterbi_decode_pallas(soft, nbits, interpret)
