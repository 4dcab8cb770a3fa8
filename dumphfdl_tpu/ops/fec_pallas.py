"""Pallas TPU kernel for the 64-state Viterbi ACS sweep.

The lax.scan decoder in ops/fec.py dispatches one tiny XLA step per
decoded bit (up to 7560 for a double-slot 8PSK frame).  This kernel runs
the whole add-compare-select sweep inside one Pallas program: path
metrics live in VMEM scratch, the trellis loop is a ``fori_loop`` with
no per-step dispatch, and decisions are emitted bit-packed (2x int32 per
step) for the cheap XLA chainback.

Trellis conventions identical to ops/fec.py (Karn viterbi27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fec import _branch_tables

_NSTATES = 64
_BT = 8          # batch rows per grid cell (sublane tile)


def _acs_kernel(b0_ref, b1_ref, soft_ref, dec_ref, metrics_ref):
    """One grid cell: full ACS sweep for a _BT-row batch tile.

    b0_ref/b1_ref: (1, 32) int32 expected-symbol branch tables
    soft_ref: (BT, nbits, 2) int32 soft chip pairs
    dec_ref:  (BT, nbits, 2) int32 bit-packed decisions (lo, hi)
    metrics_ref: (BT, 64) int32 scratch
    """
    nbits = soft_ref.shape[1]
    b0c = b0_ref[:, :]
    b1c = b1_ref[:, :]
    w32 = (jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0))

    init = jnp.full((_BT, _NSTATES), 63, jnp.int32)
    metrics_ref[:, :] = init.at[:, 0].set(0)

    def body(t, _):
        syms = soft_ref[:, t, :]                     # (BT, 2)
        s0 = syms[:, 0:1]
        s1 = syms[:, 1:2]
        bm = jnp.abs(b0c - s0) + jnp.abs(b1c - s1)   # (BT, 32)
        m = metrics_ref[:, :]
        lo, hi = m[:, :32], m[:, 32:]
        m0e = lo + bm
        m1e = hi + 510 - bm
        de = m0e > m1e
        even = jnp.where(de, m1e, m0e)
        m0o = lo + 510 - bm
        m1o = hi + bm
        do = m0o > m1o
        odd = jnp.where(do, m1o, m0o)
        new = jnp.stack([even, odd], axis=-1).reshape(_BT, _NSTATES)
        metrics_ref[:, :] = new
        dec = jnp.stack([de, do], axis=-1).reshape(_BT, _NSTATES)
        packed_lo = jnp.dot(dec[:, :32].astype(jnp.int32), w32,
                            preferred_element_type=jnp.int32)
        packed_hi = jnp.dot(dec[:, 32:].astype(jnp.int32), w32,
                            preferred_element_type=jnp.int32)
        dec_ref[:, t, :] = jnp.concatenate([packed_lo, packed_hi], axis=1)
        return 0

    jax.lax.fori_loop(0, nbits, body, 0)


@functools.partial(jax.jit, static_argnames=('nbits', 'interpret'))
def viterbi_decode_pallas(soft: jax.Array, nbits: int,
                          interpret: bool = False) -> jax.Array:
    """Batched Viterbi decode with the Pallas ACS kernel.

    Args/returns match ops.fec.viterbi_decode.
    """
    batch = soft.shape[0]
    pad = (-batch) % _BT
    pairs = soft.astype(jnp.int32).reshape(batch, nbits, 2)
    if pad:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((pad, nbits, 2), jnp.int32)], axis=0)
    bpad = batch + pad

    b0, b1 = _branch_tables()
    decisions = pl.pallas_call(
        _acs_kernel,
        grid=(bpad // _BT,),
        in_specs=[pl.BlockSpec((1, 32), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 32), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_BT, nbits, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BT, nbits, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, nbits, 2), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_BT, _NSTATES), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(b0, jnp.int32).reshape(1, 32),
      jnp.asarray(b1, jnp.int32).reshape(1, 32), pairs)
    decisions = decisions[:batch]                    # (B, nbits, 2)

    # chainback (viterbi27_port.c:105-134): 6 virtual zero decisions
    dec_ext = jnp.concatenate(
        [decisions, jnp.zeros((batch, 6, 2), jnp.int32)], axis=1)

    def chainback(state, dec_t):
        # dec_t: (B, 2) packed decisions; pick bit `state` of the word
        use_hi = state >= 32
        word = jnp.where(use_hi, dec_t[:, 1], dec_t[:, 0])
        k = (word >> jnp.where(use_hi, state - 32, state)) & 1
        new_state = (state >> 1) | (k << 5)
        return new_state, k.astype(jnp.int8)

    state0 = jnp.zeros((batch,), dtype=jnp.int32)
    _, bits_rev = jax.lax.scan(chainback, state0,
                               dec_ext[:, 6:].transpose(1, 0, 2)[::-1])
    return bits_rev[::-1].transpose(1, 0)
