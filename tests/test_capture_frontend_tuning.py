"""Capture front-end tuning extras: ppm / bandwidth / antenna / AGC.

Reference api.py exposes these per capture (DeviceSettingsModal /
AdvancedSettings surface); here they flow CaptureConfig -> DeviceConfig
-> driver.configure, applied live via the retune path (no stream
teardown).
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from wavecap_tpu.capture.engine import Capture, CaptureConfig
from wavecap_tpu.devices.base import Device, DeviceConfig, DeviceInfo, StreamHandle


class RecordingStream(StreamHandle):
    def __init__(self):
        self.closed = False

    def read(self, n):
        time.sleep(0.005)
        return np.zeros(n, np.complex64), False

    def close(self):
        self.closed = True


class RecordingDevice(Device):
    """Records every configure() call."""

    def __init__(self):
        self.info = DeviceInfo(id="rec0", driver="rec", label="recorder")
        self.configs: list[DeviceConfig] = []

    def configure(self, config: DeviceConfig) -> None:
        self.configs.append(config)

    def start_stream(self) -> StreamHandle:
        return RecordingStream()

    def close(self) -> None:
        pass


class TestFrontEndTuning:
    def test_config_reaches_device(self):
        dev = RecordingDevice()
        cap = Capture(
            dev,
            CaptureConfig(
                center_hz=100e6, sample_rate=2_400_000,
                ppm=12.5, bandwidth_hz=1.5e6, antenna="Antenna B", agc=True,
            ),
        )
        cap.start()
        try:
            deadline = time.time() + 30
            while not dev.configs and time.time() < deadline:
                time.sleep(0.05)
            assert dev.configs, "device never configured"
            c = dev.configs[0]
            assert c.ppm == 12.5
            assert c.bandwidth_hz == 1.5e6
            assert c.antenna == "Antenna B"
            assert c.agc is True
        finally:
            cap.stop()

    def test_update_config_live_retune(self):
        dev = RecordingDevice()
        cap = Capture(dev, CaptureConfig(center_hz=100e6, sample_rate=2_400_000))
        cap.start()
        try:
            deadline = time.time() + 30
            while not dev.configs and time.time() < deadline:
                time.sleep(0.05)
            n0 = len(dev.configs)
            cap.update_config(ppm=-3.0, bandwidth_hz=200e3, antenna="A", agc=True)
            deadline = time.time() + 30
            while len(dev.configs) == n0 and time.time() < deadline:
                time.sleep(0.05)
            assert len(dev.configs) > n0, "no live reconfigure happened"
            c = dev.configs[-1]
            assert (c.ppm, c.bandwidth_hz, c.antenna, c.agc) == (
                -3.0, 200e3, "A", True,
            )
            assert cap.state == "running"  # no teardown
            # clearing: bandwidth 0 -> None, antenna "" -> None
            cap.update_config(bandwidth_hz=0, antenna="")
            assert cap.config.bandwidth_hz is None
            assert cap.config.antenna is None
        finally:
            cap.stop()

    def test_status_echoes_tuning(self):
        dev = RecordingDevice()
        cap = Capture(
            dev, CaptureConfig(ppm=5.0, bandwidth_hz=1e6, antenna="X", agc=True)
        )
        st = cap.status()
        assert st["ppm"] == 5.0 and st["bandwidthHz"] == 1e6
        assert st["antenna"] == "X" and st["agc"] is True


class TestSoapyFrontEndMarshaling:
    def test_configure_passes_bandwidth_ppm_antenna(self):
        from tests.test_soapy_and_lock import FakeSoapyLib
        from wavecap_tpu.devices import soapy

        lib = FakeSoapyLib()
        d = soapy.SoapyDevice(
            lib, DeviceInfo(id="soapy0", driver="soapy", label=""), ""
        )
        d.configure(
            DeviceConfig(
                sample_rate=2.4e6, center_hz=100e6,
                bandwidth_hz=1.5e6, ppm=7.0, antenna="RX2",
            )
        )
        names = [c[0] for c in lib.calls]
        assert "SoapySDRDevice_setBandwidth" in names
        assert "SoapySDRDevice_setFrequencyCorrection" in names
        assert "SoapySDRDevice_setAntenna" in names
        # antenna marshaled as bytes
        ant = [c for c in lib.calls if c[0] == "SoapySDRDevice_setAntenna"][0]
        assert ant[1][-1] == b"RX2"

    def test_defaults_skip_optional_calls(self):
        from tests.test_soapy_and_lock import FakeSoapyLib
        from wavecap_tpu.devices import soapy

        lib = FakeSoapyLib()
        d = soapy.SoapyDevice(
            lib, DeviceInfo(id="soapy0", driver="soapy", label=""), ""
        )
        d.configure(DeviceConfig(sample_rate=1e6, center_hz=100e6))
        names = [c[0] for c in lib.calls]
        for skipped in (
            "SoapySDRDevice_setBandwidth",
            "SoapySDRDevice_setFrequencyCorrection",
            "SoapySDRDevice_setAntenna",
        ):
            assert skipped not in names
