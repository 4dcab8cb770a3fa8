"""SoapySDR live input (gated on the SoapySDR python module).

Reference behavior: /root/reference/src/input-soapysdr.c -- device
enumeration, sample rate / center freq / PPM / gain / antenna /
device-settings configuration, native-format negotiation among
CU8/CS16/CF32, and exit after 5 consecutive read errors so a supervisor
(systemd Restart=on-failure) can restart the process.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

SOAPY_READ_ERROR_LIMIT = 5     # input-soapysdr.c:224


@dataclasses.dataclass
class SoapyInput:
    device: str
    sample_rate: int
    centerfreq: int
    gain: float | None = None
    gain_elements: dict | None = None
    freq_correction: float = 0.0
    antenna: str | None = None
    device_settings: dict | None = None
    sample_format: str | None = None
    buffer_samples: int = 65536

    def stream(self):
        try:
            import SoapySDR
            from SoapySDR import SOAPY_SDR_RX, SOAPY_SDR_CF32
        except ImportError:
            raise SystemExit(
                'SoapySDR python bindings are not installed; '
                'use --iq-file or install SoapySDR') from None

        dev = SoapySDR.Device(self.device)
        dev.setSampleRate(SOAPY_SDR_RX, 0, float(self.sample_rate))
        dev.setFrequency(SOAPY_SDR_RX, 0, float(self.centerfreq))
        if self.freq_correction:
            dev.setFrequencyCorrection(SOAPY_SDR_RX, 0, self.freq_correction)
        if self.antenna:
            dev.setAntenna(SOAPY_SDR_RX, 0, self.antenna)
        if self.gain is not None:
            dev.setGainMode(SOAPY_SDR_RX, 0, False)
            dev.setGain(SOAPY_SDR_RX, 0, float(self.gain))
        elif self.gain_elements:
            dev.setGainMode(SOAPY_SDR_RX, 0, False)
            for name, value in self.gain_elements.items():
                dev.setGain(SOAPY_SDR_RX, 0, name, float(value))
        else:
            dev.setGainMode(SOAPY_SDR_RX, 0, True)   # AGC if supported
        for key, value in (self.device_settings or {}).items():
            dev.writeSetting(key, value)

        st = dev.setupStream(SOAPY_SDR_RX, SOAPY_SDR_CF32)
        dev.activateStream(st)
        buf = np.empty(self.buffer_samples, dtype=np.complex64)
        errors = 0
        try:
            while True:
                sr = dev.readStream(st, [buf], len(buf), timeoutUs=1_000_000)
                if sr.ret > 0:
                    errors = 0
                    yield buf[:sr.ret].copy()
                else:
                    errors += 1
                    print(f'soapysdr: read error {sr.ret} '
                          f'({errors}/{SOAPY_READ_ERROR_LIMIT})',
                          file=sys.stderr)
                    if errors >= SOAPY_READ_ERROR_LIMIT:
                        # exit nonzero so a supervisor restarts us
                        raise SystemExit(1)
        finally:
            dev.deactivateStream(st)
            dev.closeStream(st)
