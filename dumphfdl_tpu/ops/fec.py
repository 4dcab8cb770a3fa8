"""K=7 R=1/2 convolutional FEC: encoder + batched Viterbi decoder.

Trellis conventions follow Phil Karn's viterbi27 as vendored by the
reference (/root/reference/src/libfec/viterbi27_port.c):

* polynomials V27POLYA=0x6d, V27POLYB=0x4f (fec.h:13-14);
* encoder register shifts the new bit into the LSB;
* soft symbols are uint8 with 0=strong 0, 255=strong 1, 128=erasure;
* branch metrics are ``(expected ^ sym)`` sums (viterbi27_port.c:149);
* traceback starts at state 0 and consumes six virtual zero decisions
  beyond the block end (viterbi27_port.c:98,126), which forces the last
  6 decoded bits to zero -- these are the encoder flush bits.

The decoder is a ``lax.scan`` over chip pairs with a ``(batch, 64)``
metric array: channels/frames ride the batch axis, the 64-state butterfly
is one fused VPU step.  A reverse scan performs chainback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_NSTATES = 64


@functools.cache
def _branch_tables() -> tuple[np.ndarray, np.ndarray]:
    """Expected soft symbols (0/255) for transitions out of states 0..31."""
    i = np.arange(32)
    b0 = np.array([bin((2 * s) & C.V27_POLY_A).count('1') & 1 for s in i]) * 255
    b1 = np.array([bin((2 * s) & C.V27_POLY_B).count('1') & 1 for s in i]) * 255
    return b0.astype(np.int32), b1.astype(np.int32)


def conv_encode(bits: np.ndarray) -> np.ndarray:
    """Encode a bit stream; returns interleaved chips [c0_0, c1_0, c0_1, ...]."""
    bits = np.asarray(bits, dtype=np.int64)
    n = len(bits)
    # register value after shifting each bit into the LSB (7 bits live)
    reg = np.zeros(n, dtype=np.int64)
    acc = 0
    for k in range(n):
        acc = ((acc << 1) | int(bits[k])) & 0x7F
        reg[k] = acc
    popcount = np.vectorize(lambda v: bin(v).count('1'))
    c0 = popcount(reg & C.V27_POLY_A) & 1
    c1 = popcount(reg & C.V27_POLY_B) & 1
    out = np.empty(2 * n, dtype=np.int8)
    out[0::2] = c0
    out[1::2] = c1
    return out


def hard_to_soft(chips: np.ndarray) -> np.ndarray:
    """Map hard chips {0,1} to soft uint8 {0,255}."""
    return (np.asarray(chips, dtype=np.uint8) * 255).astype(np.uint8)


def viterbi_decode_np(soft: np.ndarray, nbits: int) -> np.ndarray:
    """Golden single-frame decoder (integer-exact vs the reference)."""
    b0, b1 = _branch_tables()
    soft = np.asarray(soft, dtype=np.int32).reshape(nbits, 2)
    metrics = np.full(_NSTATES, 63, dtype=np.int64)
    metrics[0] = 0
    decisions = np.zeros((nbits, _NSTATES), dtype=np.uint8)
    for t in range(nbits):
        s0, s1 = soft[t]
        bm = np.abs(b0 - s0) + np.abs(b1 - s1)      # == (b0^s0)+(b1^s1) for 0/255 tables
        m0e = metrics[:32] + bm
        m1e = metrics[32:] + 510 - bm
        de = (m0e - m1e) > 0
        even = np.where(de, m1e, m0e)
        m0o = metrics[:32] + 510 - bm
        m1o = metrics[32:] + bm
        do = (m0o - m1o) > 0
        odd = np.where(do, m1o, m0o)
        metrics = np.stack([even, odd], axis=-1).reshape(_NSTATES)
        decisions[t] = np.stack([de, do], axis=-1).reshape(_NSTATES)
    out = np.zeros(nbits, dtype=np.int8)
    state = 0
    for n in range(nbits - 1, -1, -1):
        k = int(decisions[n + 6][state]) if n + 6 < nbits else 0
        out[n] = k
        state = (state >> 1) | (k << 5)
    return out


@functools.partial(jax.jit, static_argnames=('nbits',))
def viterbi_decode(soft: jax.Array, nbits: int) -> jax.Array:
    """Batched Viterbi decode.

    Args:
      soft: (batch, 2*nbits) soft chips, uint8-valued (any int/float dtype).
      nbits: decoded bits per frame (static).

    Returns:
      (batch, nbits) int8 decoded bits.
    """
    b0_np, b1_np = _branch_tables()
    b0 = jnp.asarray(b0_np, dtype=jnp.int32)
    b1 = jnp.asarray(b1_np, dtype=jnp.int32)
    batch = soft.shape[0]
    pairs = soft.astype(jnp.int32).reshape(batch, nbits, 2).transpose(1, 0, 2)

    init = jnp.full((batch, _NSTATES), 63, dtype=jnp.int32).at[:, 0].set(0)

    def acs(metrics, syms):
        s0 = syms[:, 0:1]
        s1 = syms[:, 1:2]
        bm = jnp.abs(b0[None, :] - s0) + jnp.abs(b1[None, :] - s1)  # (B, 32)
        lo, hi = metrics[:, :32], metrics[:, 32:]
        m0e = lo + bm
        m1e = hi + 510 - bm
        de = m0e > m1e
        even = jnp.where(de, m1e, m0e)
        m0o = lo + 510 - bm
        m1o = hi + bm
        do = m0o > m1o
        odd = jnp.where(do, m1o, m0o)
        new = jnp.stack([even, odd], axis=-1).reshape(batch, _NSTATES)
        dec = jnp.stack([de, do], axis=-1).reshape(batch, _NSTATES)
        return new, dec

    _, decisions = jax.lax.scan(acs, init, pairs)        # (nbits, B, 64) bool
    # Virtual zero decisions beyond block end (flush-bit traceback).
    dec_ext = jnp.concatenate(
        [decisions, jnp.zeros((6, batch, _NSTATES), dtype=bool)], axis=0)

    def chainback(state, dec_t):
        k = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0].astype(jnp.int32)
        new_state = (state >> 1) | (k << 5)
        return new_state, k.astype(jnp.int8)

    state0 = jnp.zeros((batch,), dtype=jnp.int32)
    _, bits_rev = jax.lax.scan(chainback, state0, dec_ext[6:][::-1])
    return bits_rev[::-1].transpose(1, 0)                # (B, nbits)
