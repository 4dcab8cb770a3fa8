"""SoapySDR input driver against a mock device module.

SoapySDR hardware/bindings are absent in CI, so these tests inject a
fake `SoapySDR` module and verify the negotiation/conversion/error
behaviors the reference defines (input-soapysdr.c:49-83,111-115,224)."""

import sys
import types

import numpy as np
import pytest

from dumphfdl_tpu.io.soapy_input import SOAPY_READ_ERROR_LIMIT, SoapyInput


class FakeStreamResult:
    def __init__(self, ret):
        self.ret = ret


class FakeDevice:
    def __init__(self, args):
        self.args = args
        self.calls = []
        self.native = ('CS16', 2047.0)        # e.g. sdrplay 12-bit
        self.formats = ['CS16', 'CF32']
        self.has_dc_mode = True
        self.reads = []                        # queue of read results

    def __getattr__(self, name):
        # record setters generically
        def method(*a, **kw):
            self.calls.append((name, a))
            if name == 'getNativeStreamFormat':
                return self.native
            if name == 'getStreamFormats':
                return self.formats
            if name == 'hasDCOffsetMode':
                return self.has_dc_mode
            if name == 'setupStream':
                return 'stream-handle'
            if name == 'readStream':
                buf = a[1][0]
                item = self.reads.pop(0)
                if isinstance(item, np.ndarray):
                    buf[:len(item)] = item
                    return FakeStreamResult(len(item) // 2)
                return FakeStreamResult(item)   # negative error code
            return None
        return method


@pytest.fixture
def fake_soapy(monkeypatch):
    mod = types.ModuleType('SoapySDR')
    mod.SOAPY_SDR_RX = 1
    mod.SOAPY_SDR_CF32 = 'CF32'
    mod.SOAPY_SDR_CS16 = 'CS16'
    mod.SOAPY_SDR_CU8 = 'CU8'
    devices = []

    def make_device(args):
        dev = FakeDevice(args)
        devices.append(dev)
        return dev

    mod.Device = make_device
    monkeypatch.setitem(sys.modules, 'SoapySDR', mod)
    return devices


def test_native_format_negotiation_and_full_scale(fake_soapy):
    src = SoapyInput(device='driver=fake', sample_rate=250_000,
                     centerfreq=10_000_000)
    src.connect()
    assert src.negotiated_format == 'CS16'
    assert src.full_scale == 2047.0
    assert src.is_integer_format
    dev = fake_soapy[0]
    names = [c[0] for c in dev.calls]
    assert 'setDCOffsetMode' in names           # input-soapysdr.c:111-115
    assert ('setGainMode', (1, 0, True)) in dev.calls   # AGC default


def test_fallback_format_when_native_unsupported(fake_soapy):
    src = SoapyInput(device='driver=fake', sample_rate=250_000,
                     centerfreq=10_000_000)
    SoapyInput._probe = None
    # device reports an unsupported native format
    import SoapySDR
    orig = SoapySDR.Device

    def make(args):
        dev = orig(args)
        dev.native = ('CS8', 127.0)            # not in our supported set
        dev.formats = ['CS8', 'CU8', 'CF32']
        return dev

    SoapySDR.Device = make
    src.connect()
    assert src.negotiated_format == 'CU8'      # first supported in the list
    assert src.full_scale == 127.0


def test_stream_converts_with_device_full_scale(fake_soapy):
    src = SoapyInput(device='driver=fake', sample_rate=250_000,
                     centerfreq=10_000_000, buffer_samples=4)
    src.connect()
    dev = fake_soapy[0]
    raw = np.asarray([2047, 0, -2047, 1024, 0, -1024, 2047, -2047], np.int16)
    dev.reads = [raw, -1]                       # one good read, then stop
    it = src.stream()
    chunk = next(it)
    assert chunk.dtype == np.complex64
    s = 1024 / 2047
    np.testing.assert_allclose(
        chunk, np.asarray([1 + 0j, -1 + s * 1j, -s * 1j, 1 - 1j],
                          np.complex64), rtol=1e-6)


def test_exit_after_read_error_limit(fake_soapy):
    src = SoapyInput(device='driver=fake', sample_rate=250_000,
                     centerfreq=10_000_000, buffer_samples=4)
    src.connect()
    dev = fake_soapy[0]
    dev.reads = [-1] * SOAPY_READ_ERROR_LIMIT
    with pytest.raises(SystemExit) as ei:
        for _ in src.stream():
            pass
    assert ei.value.code == 1                   # nonzero for systemd restart
    names = [c[0] for c in dev.calls]
    assert 'deactivateStream' in names and 'closeStream' in names


def test_forced_format_skips_negotiation(fake_soapy):
    src = SoapyInput(device='driver=fake', sample_rate=250_000,
                     centerfreq=10_000_000, sample_format='CF32')
    src.connect()
    assert src.negotiated_format == 'CF32'
    assert src.full_scale == 1.0
    assert not src.is_integer_format
