"""Direct librtlsdr driver (reference devices/rtl.py via pyrtlsdr; here
ctypes with an injectable low-level surface so no hardware is needed)."""

import time

import numpy as np

from wavecap_tpu.devices.rtl import RtlDriver, RtlStream, _U8_LUT


class FakeRtlLib:
    """Pure-Python stand-in for RtlLib: one device serving a u8 tone."""

    def __init__(self, n_devices=1, tone_cycles_per_chunk=32.0):
        self.n = n_devices
        self.calls: list[tuple] = []
        self.tone_cycles = tone_cycles_per_chunk
        self._phase = 0.0
        self.fail_reads = False

    def device_count(self):
        return self.n

    def device_name(self, i):
        return f"Generic RTL2832U {i}"

    def usb_strings(self, i):
        return "Realtek", "RTL2838UHIDIR", f"SN{i:08d}"

    def open(self, index):
        self.calls.append(("open", index))
        return ("dev", index)

    def close(self, dev):
        self.calls.append(("close", dev))

    def set_center_freq(self, dev, hz):
        self.calls.append(("center", hz))

    def set_sample_rate(self, dev, hz):
        self.calls.append(("rate", hz))

    def set_freq_correction(self, dev, ppm):
        self.calls.append(("ppm", ppm))

    def set_tuner_bandwidth(self, dev, hz):
        self.calls.append(("bandwidth", hz))

    def set_tuner_gain_mode(self, dev, manual):
        self.calls.append(("gain_mode", manual))

    def set_tuner_gain(self, dev, tenths):
        self.calls.append(("gain", tenths))

    def set_agc_mode(self, dev, on):
        self.calls.append(("agc", on))

    def tuner_gains(self, dev):
        return [0, 90, 197, 297, 496]  # tenths of dB, like an R820T

    def reset_buffer(self, dev):
        self.calls.append(("reset", dev))

    def read_chunk(self, dev, n_bytes):
        if self.fail_reads:
            raise RuntimeError("usb gone")
        n = n_bytes // 2
        k = np.arange(n) + self._phase
        self._phase += n
        w = 2 * np.pi * self.tone_cycles / n
        i = np.round(127.5 + 100 * np.cos(w * k)).astype(np.uint8)
        q = np.round(127.5 + 100 * np.sin(w * k)).astype(np.uint8)
        out = np.empty(2 * n, np.uint8)
        out[0::2], out[1::2] = i, q
        return out


class TestEnumerate:
    def test_devices_listed_with_usb_strings(self):
        drv = RtlDriver(lib=FakeRtlLib(n_devices=2))
        infos = drv.enumerate()
        assert [d.id for d in infos] == ["rtl0", "rtl1"]
        assert infos[0].driver == "rtl"
        assert "Realtek" in infos[0].label
        assert infos[1].serial == "SN00000001"


class TestConfigure:
    def test_manual_gain_snaps_to_supported_step(self):
        from wavecap_tpu.devices.base import DeviceConfig

        lib = FakeRtlLib()
        dev = RtlDriver(lib=lib).open("rtl0")
        dev.configure(
            DeviceConfig(center_hz=100e6, sample_rate=2_400_000, gain_db=28.0)
        )
        assert ("center", 100_000_000) in lib.calls
        assert ("rate", 2_400_000) in lib.calls
        assert ("gain_mode", True) in lib.calls
        assert ("gain", 297) in lib.calls  # 28.0 dB -> nearest step 29.7 dB
        assert ("agc", False) in lib.calls
        dev.close()

    def test_no_gain_means_agc(self):
        from wavecap_tpu.devices.base import DeviceConfig

        lib = FakeRtlLib()
        dev = RtlDriver(lib=lib).open("rtl0")
        dev.configure(DeviceConfig(center_hz=100e6, sample_rate=960_000))
        assert ("gain_mode", False) in lib.calls
        assert ("agc", True) in lib.calls
        dev.close()


class TestStream:
    def test_u8_lut_offset_binary(self):
        assert abs(float(_U8_LUT[128]) - (0.5 / 127.5)) < 1e-6
        assert float(_U8_LUT[255]) == 1.0
        assert float(_U8_LUT[0]) == -1.0

    def test_reads_tone_across_chunk_boundaries(self):
        dev = RtlDriver(lib=FakeRtlLib()).open("rtl0")
        dev.configure(dev.config)
        stream = dev.start_stream()
        try:
            # 3 odd-size reads spanning USB chunks: phase must be continuous
            parts = [stream.read(10_000)[0] for _ in range(3)]
            x = np.concatenate(parts)
            assert not any(stream.read(100)[1] for _ in range(2))
            spec = np.abs(np.fft.fft(x))
            pk = np.argmax(spec)
            f_pk = pk / len(x) if pk < len(x) / 2 else (pk - len(x)) / len(x)
            # tone at tone_cycles per 16384-sample chunk
            assert abs(f_pk - 32.0 / 16384) < 1e-4
            # amplitude ~100/127.5
            assert abs(np.abs(x).mean() - 100 / 127.5) < 0.02
        finally:
            dev.close()

    def test_overflow_reported_once_after_ring_drop(self):
        dev = RtlDriver(lib=FakeRtlLib()).open("rtl0")
        stream = dev.start_stream()
        try:
            # let the reader thread overfill the ring (consumer idle)
            deadline = time.time() + 10
            while time.time() < deadline:
                with stream._cv:
                    if stream._overflow:
                        break
                time.sleep(0.01)
            samples, overflow = stream.read(1024)
            assert overflow
            # next read is clean again
            _, overflow2 = stream.read(1024)
            assert not overflow2
        finally:
            dev.close()

    def test_usb_error_propagates_to_reader(self):
        lib = FakeRtlLib()
        dev = RtlDriver(lib=lib).open("rtl0")
        stream = dev.start_stream()
        try:
            stream.read(1024)
            lib.fail_reads = True
            # drain buffered chunks until the error surfaces
            deadline = time.time() + 10
            try:
                while time.time() < deadline:
                    stream.read(100_000)
            except RuntimeError as e:
                assert "usb gone" in str(e)
            else:
                raise AssertionError("error never propagated")
        finally:
            dev.close()
