"""PSK modulation / demodulation maps (liquid-dsp-compatible conventions).

HFDL uses BPSK / QPSK / 8PSK.  The bit<->symbol maps must match the
reference demodulator's (liquid modem) conventions end to end, because the
descrambler/deinterleaver/Viterbi chain downstream assumes them
(/root/reference/src/hfdl.c:737, 1006-1017):

* BPSK:  bit 0 -> +1, bit 1 -> -1.
* QPSK:  bit0 -> sign(Re), bit1 -> sign(Im); sym = (Re>0?0:1)|(Im>0?0:2);
         constellation points (+-1 +-1j)/sqrt(2).
* 8PSK:  phase index p = gray_decode(sym); point = exp(j*2*pi*p/8);
         demod returns sym = gray_encode(round(arg*8/2pi) mod 8).

Soft bits are uint8 with 0=strong 0, 255=strong 1 (Karn convention), and
are emitted MSB-first per symbol, matching liquid's unpacking order used
when pushing into the deinterleaver (hfdl.c:1015-1017).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .. import constants as C


def gray_encode(p: np.ndarray) -> np.ndarray:
    return p ^ (p >> 1)


def gray_decode(s: np.ndarray) -> np.ndarray:
    # valid for values < 16 (HFDL arity <= 3 bits)
    b = np.asarray(s).copy()
    b ^= b >> 1
    b ^= b >> 2
    return b


_gray_decode_small = gray_decode


# -- constellations ---------------------------------------------------------

@functools.cache
def constellation(arity: int) -> np.ndarray:
    """Complex points indexed by *symbol* (bit pattern), liquid conventions."""
    if arity == C.M_BPSK:
        return np.array([1.0 + 0j, -1.0 + 0j], dtype=np.complex64)
    if arity == C.M_PSK4:
        s = np.arange(4)
        re = np.where(s & 1, -1.0, 1.0) / np.sqrt(2.0)
        im = np.where(s & 2, -1.0, 1.0) / np.sqrt(2.0)
        return (re + 1j * im).astype(np.complex64)
    if arity == C.M_PSK8:
        s = np.arange(8)
        p = _gray_decode_small(s)
        return np.exp(2j * np.pi * p / 8).astype(np.complex64)
    raise ValueError(f'bad arity {arity}')


def modulate(symbols: np.ndarray, arity: int) -> np.ndarray:
    """Map symbol indices to constellation points."""
    return constellation(arity)[np.asarray(symbols, dtype=np.int64)]


def bits_to_symbols(bits: np.ndarray, arity: int) -> np.ndarray:
    """Group a chip stream into symbol indices, MSB-first per symbol."""
    bits = np.asarray(bits, dtype=np.int64).reshape(-1, arity)
    weights = 1 << np.arange(arity - 1, -1, -1)
    return bits @ weights


def symbols_to_bits(symbols: np.ndarray, arity: int) -> np.ndarray:
    """Expand symbol indices to bits, MSB-first per symbol."""
    symbols = np.asarray(symbols, dtype=np.int64)
    shifts = np.arange(arity - 1, -1, -1)
    return ((symbols[..., None] >> shifts) & 1).reshape(*symbols.shape[:-1], -1).astype(np.int8)


# -- hard demod (jax-friendly, works on numpy too) --------------------------

def demodulate(x, arity: int):
    """Hard-decision demod -> symbol indices (same conventions as liquid)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    if arity == C.M_BPSK:
        return xp.where(x.real > 0, 0, 1)
    if arity == C.M_PSK4:
        return xp.where(x.real > 0, 0, 1) + xp.where(x.imag > 0, 0, 2)
    if arity == C.M_PSK8:
        theta = xp.arctan2(x.imag, x.real)
        p = xp.round(theta * (8 / (2 * np.pi))).astype(xp.int32) % 8
        return p ^ (p >> 1)  # gray encode (3-bit)
    raise ValueError(f'bad arity {arity}')


def phase_error(x, arity: int):
    """Angle from received point to the nearest constellation point.

    Used as the Costas-loop error term (hfdl.c:738 via
    modem_get_demodulator_phase_error).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    theta = xp.arctan2(x.imag, x.real)
    m = {C.M_BPSK: 2, C.M_PSK4: 4, C.M_PSK8: 8}[arity]
    if arity == C.M_PSK4:
        # liquid QPSK constellation sits at odd multiples of pi/4
        theta = theta - np.pi / 4
    step = 2 * np.pi / m
    err = theta - xp.round(theta / step) * step
    return err


# -- soft demod -------------------------------------------------------------

def soft_demodulate(x, arity: int):
    """Approximate-LLR soft demod -> (..., arity) uint8 soft bits, MSB first.

    BPSK scaling follows liquid's gamma=4 linear LLR map
    (soft = clip(127 - 128*Re)); QPSK applies the same per-axis rule with
    the sqrt(2) constellation scale; 8PSK uses max-log LLR over the ring.
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np

    def q(v):
        return xp.clip(xp.round(v), 0, 255).astype(xp.uint8)

    if arity == C.M_BPSK:
        return q(127.0 - 128.0 * x.real)[..., None]
    if arity == C.M_PSK4:
        scale = 128.0 * np.sqrt(2.0)
        b1 = q(127.0 - scale * x.imag)   # MSB (bit1) from the imag axis
        b0 = q(127.0 - scale * x.real)
        return xp.stack([b1, b0], axis=-1)
    if arity == C.M_PSK8:
        pts = constellation(C.M_PSK8)
        d2 = xp.abs(x[..., None] - xp.asarray(pts)[None, :]) ** 2  # (..., 8)
        sym = np.arange(8)
        out = []
        for bitpos in (2, 1, 0):   # MSB first
            mask1 = (sym >> bitpos) & 1
            d2_0 = xp.min(xp.where(xp.asarray(mask1 == 0), d2, xp.inf), axis=-1)
            d2_1 = xp.min(xp.where(xp.asarray(mask1 == 1), d2, xp.inf), axis=-1)
            llr = d2_0 - d2_1          # >0 => bit 1 likelier
            out.append(q(128.0 + 64.0 * llr))
        return xp.stack(out, axis=-1)
    raise ValueError(f'bad arity {arity}')
