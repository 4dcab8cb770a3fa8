"""Native host runtime: C++ ring buffer + converters vs numpy reference."""

import numpy as np
import pytest

from dumphfdl_tpu.io import native


@pytest.fixture(scope='module')
def lib_available():
    if not native.available():
        pytest.skip('native library not built (no compiler?)')
    return True


def test_native_convert_cu8(lib_available):
    raw = np.arange(256, dtype=np.uint8)
    out = native.convert_cu8(raw)
    ref = ((raw.astype(np.float32) - 63.5) / 127.0)
    expect = (ref[0::2] + 1j * ref[1::2]).astype(np.complex64)
    assert np.allclose(out, expect, atol=1e-6)


def test_native_convert_cs16(lib_available):
    rng = np.random.default_rng(0)
    vals = rng.integers(-32768, 32768, 512, dtype=np.int16)
    out = native.convert_cs16(vals.view(np.uint8))
    ref = vals.astype(np.float32) / 32767.5
    expect = (ref[0::2] + 1j * ref[1::2]).astype(np.complex64)
    assert np.allclose(out, expect, atol=1e-6)


def test_ring_roundtrip(lib_available):
    ring = native.SampleRing(1024)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(600) + 1j * rng.standard_normal(600)) \
        .astype(np.complex64)
    assert ring.write(x) == 600
    assert len(ring) == 600
    got = ring.read(200)
    assert np.array_equal(got, x[:200])
    got2 = ring.read(1000)
    assert np.array_equal(got2, x[200:])
    assert len(ring) == 0
    ring.close()


def test_ring_overrun(lib_available):
    ring = native.SampleRing(128)      # rounds to pow2 = 128
    x = np.ones(200, dtype=np.complex64)
    written = ring.write(x)
    assert written == 128
    assert ring.overruns == 72
    ring.close()


def test_ring_wraparound(lib_available):
    ring = native.SampleRing(256)
    rng = np.random.default_rng(2)
    total_in, total_out = [], []
    for i in range(50):
        x = (rng.standard_normal(37) * (i + 1)).astype(np.complex64)
        n = ring.write(x)
        total_in.append(x[:n])
        total_out.append(ring.read(29))
    total_out.append(ring.read(10_000))
    a = np.concatenate(total_in)
    b = np.concatenate(total_out)
    assert np.array_equal(a, b)
    ring.close()
