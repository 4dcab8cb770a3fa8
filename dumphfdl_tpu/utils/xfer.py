"""Transfer-safe device->host conversion.

Some PJRT backends (notably the axon TPU tunnel) implement only a subset
of device->host transfers: 2-D float32/int32/bool/int8 arrays work, but
complex64 and rank-1 arrays raise UNIMPLEMENTED.  ``device_get`` first
tries the native path; on failure it canonicalizes on device -- complex
split into trailing (re, im) float32, everything reshaped to (1, N) --
transfers that, and reassembles on the host.  The failure is remembered
so later calls skip the doomed native attempt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_native_broken = False


@functools.partial(jax.jit, static_argnames=('kind',))
def _canonicalize(x, kind: str):
    if kind == 'complex':
        x = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)
    elif kind == 'int':
        x = x.astype(jnp.int32)
    elif kind == 'float':
        x = x.astype(jnp.float32)
    return x.reshape(1, -1)


def _via_canonical(x) -> np.ndarray:
    dt = x.dtype
    shape = x.shape
    if jnp.issubdtype(dt, jnp.complexfloating):
        flat = np.asarray(_canonicalize(x, 'complex'))
        ri = flat.reshape(*shape, 2) if shape else flat.reshape(2)
        return (ri[..., 0] + 1j * ri[..., 1]).astype(np.complex64)
    if dt == jnp.bool_ or jnp.issubdtype(dt, jnp.integer):
        flat = np.asarray(_canonicalize(x, 'int'))
        out = flat.reshape(shape) if shape else flat.reshape(())
        return out.astype(bool) if dt == jnp.bool_ else out.astype(dt)
    flat = np.asarray(_canonicalize(x, 'float'))
    out = flat.reshape(shape) if shape else flat.reshape(())
    return out.astype(dt) if dt != jnp.float32 else out


def device_get(x) -> np.ndarray:
    """np.asarray that works around backend transfer gaps."""
    global _native_broken
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if not _native_broken:
        try:
            return np.asarray(x)
        except Exception:
            _native_broken = True
    return _via_canonical(x)
