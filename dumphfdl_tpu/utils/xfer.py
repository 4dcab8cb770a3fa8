"""Transfer-safe device->host conversion.

Some PJRT backends (notably the axon TPU tunnel) implement complex64
*compute* but not complex64 (or sub-32-bit) device->host transfers.
``device_get`` probes the backend once and, when needed, routes complex
arrays through a jitted split into stacked float32 and narrow ints
through int32, which always transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def _native_transfer_ok(kind: str) -> bool:
    """kind in {'complex', 'narrow'}; probe once per process."""
    try:
        if kind == 'complex':
            np.asarray(jnp.zeros((1,), jnp.complex64) + 0)
        else:
            np.asarray(jnp.zeros((1,), jnp.int8) + 0)
        return True
    except Exception:
        return False


@jax.jit
def _split_complex(x):
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=0).astype(jnp.float32)


@jax.jit
def _widen(x):
    return x.astype(jnp.int32)


def device_get(x) -> np.ndarray:
    """np.asarray that works around backend transfer gaps."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    dt = x.dtype
    if jnp.issubdtype(dt, jnp.complexfloating):
        if _native_transfer_ok('complex'):
            return np.asarray(x)
        ri = np.asarray(_split_complex(x))
        return (ri[0] + 1j * ri[1]).astype(np.complex64)
    if dt == jnp.bool_ or jnp.issubdtype(dt, jnp.integer) and dt.itemsize < 4:
        if _native_transfer_ok('narrow'):
            return np.asarray(x)
        out = np.asarray(_widen(x))
        return out.astype(bool) if dt == jnp.bool_ else out.astype(dt)
    return np.asarray(x)
