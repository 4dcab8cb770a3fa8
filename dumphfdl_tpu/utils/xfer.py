"""Transfer-safe host<->device conversion.

The axon PJRT tunnel (experimental TPU backend) supports compute for all
dtypes but its host<->device *transfers* only handle >=2-D float32/int32
(and similar) arrays -- and a complex64 device_put doesn't just fail, it
wedges the connection for minutes.  On restricted backends these helpers
keep every boundary crossing to 2-D float32/int32:

* ``device_put_safe``: complex is split host-side into an (N, 2) float32
  array and joined on device; narrow ints widen; rank<2 reshapes.
* ``device_get``: the reverse -- split/widen/reshape on device, transfer
  a (rows, 128) float32/int32 block, reassemble host-side.

On normal backends both are plain ``jnp.asarray`` / ``np.asarray``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128


@functools.cache
def restricted_backend() -> bool:
    import os
    if 'axon' in os.environ.get('JAX_PLATFORMS', '').lower():
        return True
    try:
        if jax.default_backend() == 'axon':
            return True
        dev = jax.devices()[0]
        return 'axon' in (getattr(dev, 'platform', '') or '').lower() \
            or 'axon' in str(type(dev)).lower()
    except Exception:
        return False


# ---------------------------------------------------------------------------
# host -> device
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('shape', 'kind'))
def _join_on_device(flat, shape: tuple, kind: str):
    n = int(np.prod(shape, dtype=np.int64))
    if kind == 'complex':
        # planar (all-re || all-im) layout: a (n, 2) reshape would pad to
        # the (8, 128) TPU tile -- 64x memory blowup on large uploads
        v = flat.reshape(-1)
        return jax.lax.complex(v[:n], v[n:2 * n]).reshape(shape)
    return flat.reshape(-1)[:n].reshape(shape)


def _pad_rows(flat: np.ndarray) -> np.ndarray:
    rows = max(8, -(-flat.size // _LANES))
    out = np.zeros(rows * _LANES, dtype=flat.dtype)
    out[:flat.size] = flat
    return out.reshape(rows, _LANES)


def device_put_safe(x) -> jax.Array:
    """jnp.asarray that never crosses the boundary with unsupported forms."""
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if not restricted_backend():
        return jnp.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating):
        ri = np.empty(2 * x.size, np.float32)
        flat = x.reshape(-1)
        ri[:x.size] = flat.real
        ri[x.size:] = flat.imag
        return _join_on_device(jnp.asarray(_pad_rows(ri)), x.shape, 'complex')
    if x.dtype == bool or (np.issubdtype(x.dtype, np.integer)
                           and x.dtype.itemsize < 4):
        widened = _pad_rows(x.reshape(-1).astype(np.int32))
        dev = _join_on_device(jnp.asarray(widened), x.shape, 'real')
        return dev.astype(jnp.bool_ if x.dtype == bool else x.dtype)
    # Route EVERYTHING through the (rows>=8, 128)-padded form: it is the
    # only transfer class that has never failed on the tunnel.
    dt = np.float32 if np.issubdtype(x.dtype, np.floating) else np.int32
    flat = _pad_rows(x.reshape(-1).astype(dt))
    dev = _join_on_device(jnp.asarray(flat), x.shape, 'real')
    return dev.astype(x.dtype) if x.dtype not in (np.float32, np.int32) \
        else dev


@functools.partial(jax.jit, static_argnames=('shape',))
def _unpack_i16(packed, shape: tuple):
    """(rows, 128) i32 of packed int16 pairs -> complex64 of `shape`.

    Each i32 holds one sample: high 16 bits = re, low 16 = im (signed)."""
    n = int(np.prod(shape, dtype=np.int64))
    w = packed.reshape(-1)[:n]
    re = jnp.right_shift(w, 16).astype(jnp.float32)
    im = (jnp.right_shift(jnp.left_shift(w, 16), 16)).astype(jnp.float32)
    return (jax.lax.complex(re, im) * (1.0 / 32767.0)).reshape(shape)


def device_put_cs16(x: np.ndarray) -> jax.Array:
    """Upload complex samples as packed int16 pairs (half the bytes of the
    float32-pair route) and unpack on device.

    Quantizes to CS16 precision (~90 dB SNR at full scale), i.e. no worse
    than the reference's CS16 SDR input format (input-helpers.c:34-55);
    inputs are expected normalized to [-1, 1] full scale and are clipped.
    This is the fast path for bulk sample ingest on bandwidth-limited
    interconnects; metadata/state still ride device_put_safe."""
    x = np.asarray(x, np.complex64)
    re = np.clip(np.round(x.real * 32767.0), -32768, 32767).astype(np.int32)
    im = np.clip(np.round(x.imag * 32767.0), -32768, 32767).astype(np.int32)
    packed = (re << 16) | (im & 0xFFFF)
    return _unpack_i16(jnp.asarray(_pad_rows(packed.reshape(-1))), x.shape)


@functools.partial(jax.jit, static_argnames=('n',))
def _unpack_cs16_raw(packed, n: int):
    """(rows, 128) i32 of packed int16 I/Q pairs -> (n,) complex64.

    Same reciprocal-multiply scaling as the native C++ converter
    (native/hfdl_host.cpp hfdl_convert_cs16); matches the numpy fallback
    divide to 1 ULP (XLA rewrites constant division to reciprocal
    multiply, so true division is not expressible on device anyway)."""
    w = packed.reshape(-1)[:n]
    re = jnp.right_shift(w, 16).astype(jnp.float32)
    im = jnp.right_shift(jnp.left_shift(w, 16), 16).astype(jnp.float32)
    scale = np.float32(1.0) / np.float32(32767.5)
    return jax.lax.complex(re * scale, im * scale)


def device_put_cs16_raw(raw: np.ndarray) -> jax.Array:
    """Upload raw interleaved int16 I/Q in native width (4 bytes/sample,
    half the float-pair route) and convert on device.

    The int16 values ride untouched; the full-scale conversion
    (input-helpers.c:34-55) happens in f32 on device, matching
    formats.convert(raw, 'CS16') to 1 ULP."""
    v = np.ascontiguousarray(raw).view(np.int16)
    re = v[0::2].astype(np.int32)
    im = v[1::2].astype(np.int32)
    packed = (re << 16) | (im & 0xFFFF)
    return _unpack_cs16_raw(jnp.asarray(_pad_rows(packed)), re.size)


@functools.partial(jax.jit, static_argnames=('n',))
def _unpack_cu8_raw(packed, n: int):
    """(rows, 128) i32 of 4 packed CU8 bytes -> (n,) complex64.

    Matches formats.convert(.., 'CU8') -- (byte - 63.5) / 127.0 -- to
    1 ULP (see _unpack_cs16_raw on XLA's constant-division rewrite)."""
    w = packed.reshape(-1)

    def byte(k):
        return jnp.bitwise_and(
            jax.lax.shift_right_logical(w, 8 * k), 0xFF).astype(jnp.float32)

    re = jnp.stack([byte(0), byte(2)], axis=1).reshape(-1)[:n]
    im = jnp.stack([byte(1), byte(3)], axis=1).reshape(-1)[:n]
    scale = np.float32(127.0)
    off = np.float32(63.5)
    return jax.lax.complex((re - off) / scale, (im - off) / scale)


def device_put_cu8_raw(raw: np.ndarray) -> jax.Array:
    """Upload raw CU8 I/Q bytes in native width (2 bytes/sample, a quarter
    of the float-pair route) and convert on device (matches
    formats.convert(raw, 'CU8') to 1 ULP)."""
    b = np.ascontiguousarray(raw, np.uint8).reshape(-1)
    n = b.size // 2                      # complex samples
    b = b[:2 * n]
    if b.size % 4:
        b = np.concatenate([b, np.zeros(2, np.uint8)])
    packed = b.view('<i4').astype(np.int32, copy=False)
    return _unpack_cu8_raw(jnp.asarray(_pad_rows(packed)), n)


def czeros(shape: tuple) -> jax.Array:
    """complex64 zeros.

    Eager complex fills are unimplemented on some experimental backends
    (and jitted variants get constant-folded back into the same path),
    so on restricted backends this rides the proven put route: upload
    zero float32 pairs and join them on device."""
    if not restricted_backend():
        return jnp.zeros(shape, jnp.complex64)
    return device_put_safe(np.zeros(shape, np.complex64))


# ---------------------------------------------------------------------------
# device -> host
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('kind',))
def _canonicalize(x, kind: str):
    """Reshape to a well-supported transfer shape: (rows>=8, 128) padded."""
    if kind == 'complex':
        # planar layout (see _join_on_device on TPU tile padding)
        x = jnp.concatenate([jnp.real(x).reshape(-1),
                             jnp.imag(x).reshape(-1)]).astype(jnp.float32)
    elif kind == 'int':
        x = x.astype(jnp.int32)
    elif kind == 'float':
        x = x.astype(jnp.float32)
    flat = x.reshape(-1)
    rows = max(8, -(-flat.size // _LANES))
    flat = jnp.pad(flat, (0, rows * _LANES - flat.size))
    return flat.reshape(rows, _LANES)


def _via_canonical(x) -> np.ndarray:
    dt = x.dtype
    shape = x.shape
    n = int(np.prod(shape)) if shape else 1
    if jnp.issubdtype(dt, jnp.complexfloating):
        flat = np.asarray(_canonicalize(x, 'complex')).reshape(-1)[:2 * n]
        out = (flat[:n] + 1j * flat[n:]).astype(np.complex64)
        return out.reshape(shape) if shape else out.reshape(())
    if dt == jnp.bool_ or jnp.issubdtype(dt, jnp.integer):
        flat = np.asarray(_canonicalize(x, 'int')).reshape(-1)[:n]
        out = flat.reshape(shape) if shape else flat.reshape(())
        return out.astype(bool) if dt == jnp.bool_ else out.astype(dt)
    flat = np.asarray(_canonicalize(x, 'float')).reshape(-1)[:n]
    out = flat.reshape(shape) if shape else flat.reshape(())
    return out.astype(dt) if dt != jnp.float32 else out


def device_get(x) -> np.ndarray:
    """np.asarray that works around backend transfer gaps."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if not restricted_backend():
        return np.asarray(x)
    return _via_canonical(x)
