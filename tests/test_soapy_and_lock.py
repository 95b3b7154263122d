"""SoapySDR ctypes layer (with a fake libSoapySDR) + server port lockfile.

No SDR hardware nor libSoapySDR exists in this image; the fake lib
exercises the driver's read-assembly, overflow, and configure marshaling
logic the same way the reference tests its Soapy wrapper with mocks.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np
import pytest

from wavecap_tpu.devices import soapy
from wavecap_tpu.devices.base import DeviceConfig, DeviceInfo


class FakeSoapyLib:
    """Stands in for the ctypes CDLL: records calls, synthesizes samples."""

    def __init__(self, mtu: int = 100, overflow_at_call: int | None = None):
        self.mtu = mtu
        self.calls: list[tuple] = []
        self._read_calls = 0
        self._overflow_at = overflow_at_call
        self._sample = 0
        # attribute stubs the driver assigns restype on
        self.SoapySDRDevice_setupStream = self._record("setupStream", ret=1234)
        self.SoapySDRDevice_makeStrArgs = self._record("make", ret=777)
        self.SoapySDRDevice_enumerate = self._record("enumerate", ret=None)

    def _record(self, name, ret):
        def fn(*a, **k):
            self.calls.append((name, a))
            return ret

        fn.restype = None
        return fn

    def __getattr__(self, name):  # any other SoapySDRDevice_* call
        def fn(*a, **k):
            self.calls.append((name, a))
            return 0

        return fn

    def SoapySDRDevice_getStreamMTU(self, dev, stream):
        return self.mtu

    def SoapySDRDevice_readStream(self, dev, stream, buffs, want, flags, tn, timeout):
        self._read_calls += 1
        if self._overflow_at == self._read_calls:
            return -4  # SOAPY_SDR_OVERFLOW
        n = min(int(want), self.mtu, 37)  # partial reads force reassembly
        ramp = (np.arange(self._sample, self._sample + n) + 0j).astype(np.complex64)
        self._sample += n
        ctypes.memmove(buffs[0], ramp.ctypes.data, ramp.nbytes)
        return n


class TestSoapyStream:
    def test_read_assembles_partial_chunks(self):
        lib = FakeSoapyLib(mtu=100)
        st = soapy.SoapyStream(lib, dev=1, stream=2, mtu=100)
        out, overflow = st.read(200)
        assert not overflow
        np.testing.assert_array_equal(out.real, np.arange(200, dtype=np.float32))
        assert out.dtype == np.complex64

    def test_read_flags_overflow_and_continues(self):
        lib = FakeSoapyLib(mtu=64, overflow_at_call=2)
        st = soapy.SoapyStream(lib, dev=1, stream=2, mtu=64)
        out, overflow = st.read(120)
        assert overflow
        assert len(out) == 120  # overflow retried, read completed

    def test_read_error_raises(self):
        lib = FakeSoapyLib()
        lib.SoapySDRDevice_readStream = lambda *a: -1
        st = soapy.SoapyStream(lib, dev=1, stream=2, mtu=64)
        with pytest.raises(RuntimeError, match="readStream error"):
            st.read(10)

    def test_close_is_idempotent(self):
        lib = FakeSoapyLib()
        st = soapy.SoapyStream(lib, dev=1, stream=2, mtu=64)
        st.close()
        st.close()
        names = [c[0] for c in lib.calls]
        assert names.count("SoapySDRDevice_deactivateStream") == 1
        assert names.count("SoapySDRDevice_closeStream") == 1


class TestSoapyDevice:
    def _dev(self, lib):
        info = DeviceInfo(id="soapy0", driver="soapy", label="fake")
        return soapy.SoapyDevice(lib, info, "driver=rtlsdr")

    def test_configure_marshals_rate_freq_gain(self):
        lib = FakeSoapyLib()
        d = self._dev(lib)
        d.configure(DeviceConfig(sample_rate=2.4e6, center_hz=100e6, gain_db=30.0))
        names = [c[0] for c in lib.calls]
        assert "make" in names
        assert "SoapySDRDevice_setSampleRate" in names
        assert "SoapySDRDevice_setFrequency" in names
        assert "SoapySDRDevice_setGain" in names
        # AGC off: no gain-mode call
        assert "SoapySDRDevice_setGainMode" not in names

    def test_configure_agc(self):
        lib = FakeSoapyLib()
        d = self._dev(lib)
        d.configure(DeviceConfig(sample_rate=1e6, center_hz=100e6, agc=True))
        assert "SoapySDRDevice_setGainMode" in [c[0] for c in lib.calls]

    def test_start_stream_and_close(self):
        lib = FakeSoapyLib(mtu=4096)
        d = self._dev(lib)
        st = d.start_stream()
        assert isinstance(st, soapy.SoapyStream) and st.mtu == 4096
        d.close()
        d.close()
        assert [c[0] for c in lib.calls].count("SoapySDRDevice_unmake") == 1


class TestSoapyDriver:
    def test_enumerate_without_library(self, monkeypatch):
        monkeypatch.setattr(soapy, "load_soapy", lambda: None)
        assert soapy.SoapyDriver().enumerate() == []

    def test_open_without_library_raises(self, monkeypatch):
        monkeypatch.setattr(soapy, "load_soapy", lambda: None)
        with pytest.raises(RuntimeError, match="not available"):
            soapy.SoapyDriver().open("soapy0")

    def test_open_builds_args_string(self, monkeypatch):
        lib = FakeSoapyLib()
        monkeypatch.setattr(soapy, "load_soapy", lambda: lib)
        d = soapy.SoapyDriver({"driver": "sdrplay", "serial": "X1"}).open("soapy3")
        assert d._args == b"driver=sdrplay,serial=X1"
        assert d.info.id == "soapy3"


class TestPortLockfile:
    def _lockpath(self, port):
        return Path(f"/tmp/wavecap_tpu-{port}.lock")

    def test_acquire_and_stale_takeover(self):
        from wavecap_tpu.server.__main__ import _acquire_lock

        port = 18321
        self._lockpath(port).unlink(missing_ok=True)
        lock = _acquire_lock(port)
        assert lock is not None and lock.read_text() == str(os.getpid())
        # same (live) pid holds it -> denied
        assert _acquire_lock(port) is None
        # stale pid -> takeover
        lock.write_text("999999999")
        lock2 = _acquire_lock(port)
        assert lock2 is not None and lock2.read_text() == str(os.getpid())
        lock2.unlink()

    def test_garbage_lockfile_is_replaced(self):
        from wavecap_tpu.server.__main__ import _acquire_lock

        port = 18322
        path = self._lockpath(port)
        path.write_text("not-a-pid")
        lock = _acquire_lock(port)
        assert lock is not None and lock.read_text() == str(os.getpid())
        lock.unlink()
