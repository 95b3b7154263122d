"""Native C++ ingest ring: build, stream, overflow contract."""

import numpy as np
import pytest

from wavecap_tpu.devices.native import NativeDriver, native_available, load_ingest_lib
from wavecap_tpu.devices.fake import FakeStation
from wavecap_tpu.devices.base import DeviceConfig

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / native lib"
)


class TestNativeRing:
    def test_synthesizes_tone(self):
        drv = NativeDriver(
            stations=[FakeStation(offset_hz=50_000.0, kind="tone", amplitude=0.5)],
            realtime=False,
        )
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=1_000_000))
        st = dev.start_stream()
        try:
            iq, ov = st.read(1 << 17)
            assert not ov and iq.dtype == np.complex64
            spec = np.abs(np.fft.fft(iq))
            f = np.fft.fftfreq(len(iq), 1e-6)
            assert abs(f[np.argmax(spec)] - 50_000.0) < 20
            amp = np.abs(iq).mean()
            assert 0.4 < amp < 0.6
        finally:
            st.close()

    def test_phase_continuity_across_reads(self):
        drv = NativeDriver(
            stations=[FakeStation(offset_hz=10_000.0, kind="tone", amplitude=1.0)],
            realtime=False,
        )
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=500_000))
        st = dev.start_stream()
        try:
            a, _ = st.read(5000)
            b, _ = st.read(5000)
            # phase must continue: angle step between a[-1] and b[0] == tone step
            dphi = np.angle(b[0] * np.conj(a[-1]))
            expected = 2 * np.pi * 10_000 / 500_000
            assert abs(dphi - expected) < 0.2
        finally:
            st.close()

    def test_overflow_when_reader_stalls(self):
        # Realtime mode keeps the overflow-drop contract (non-realtime mode
        # paces to the consumer and never overflows by construction).
        drv = NativeDriver(stations=[], realtime=True)
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=2_000_000))
        st = dev.start_stream()
        try:
            import time

            time.sleep(1.5)  # ring holds 2M; writer free-runs far beyond
            lib = load_ingest_lib()
            assert lib.wavecap_ring_overflows(st._h) >= 1
            iq, ov = st.read(1000)
            assert ov  # overflow reported on next read
        finally:
            st.close()

    def test_nbfm_station_demodulates(self):
        import jax.numpy as jnp
        from wavecap_tpu import models, ops

        drv = NativeDriver(
            stations=[
                FakeStation(
                    offset_hz=0.0, kind="nbfm", tone_hz=800.0, deviation_hz=4000.0
                )
            ],
            realtime=False,
        )
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=48_000))
        st = dev.start_stream()
        try:
            iq, _ = st.read(96_000)
            cfg = models.NbfmConfig(sample_rate=48_000, max_deviation_hz=4000.0)
            audio, _ = models.nbfm_demod(jnp.asarray(iq), models.nbfm_init(cfg), cfg)
            a = np.array(audio)[48_000:]
            a = a - a.mean()
            s = np.abs(np.fft.rfft(a * np.hanning(len(a))))
            f = np.fft.rfftfreq(len(a), 1 / 48_000)
            assert abs(f[np.argmax(s)] - 800.0) < 10
        finally:
            st.close()
