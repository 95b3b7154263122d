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
        # paces to the consumer and never overflows by construction).  A
        # tiny explicit ring (10 ms at 2 MHz) makes the writer lap the
        # stalled reader within a couple of write periods, so the test
        # needs no long wall-clock sleep and survives a loaded CI host.
        drv = NativeDriver(stations=[], realtime=True, ring_capacity=20_000)
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=2_000_000))
        st = dev.start_stream()
        try:
            import time

            lib = load_ingest_lib()
            deadline = time.time() + 10.0
            while time.time() < deadline:
                if lib.wavecap_ring_overflows(st._h) >= 1:
                    break
                time.sleep(0.02)
            assert lib.wavecap_ring_overflows(st._h) >= 1
            iq, ov = st.read(1000)
            assert ov  # overflow reported on next read
        finally:
            st.close()

    def test_oversized_chunk_does_not_wedge_nonrealtime(self):
        # A single synthesis chunk larger than the ring must be written in
        # slices rather than spinning forever waiting for impossible space.
        # 10 ms at 2 MHz = 20k samples/chunk vs a 5k-sample ring.
        drv = NativeDriver(stations=[], realtime=False, ring_capacity=5_000)
        dev = drv.open("native0")
        dev.configure(DeviceConfig(sample_rate=2_000_000))
        st = dev.start_stream()
        try:
            iq, ov = st.read(4_000)
            assert len(iq) == 4_000
            iq, ov = st.read(4_000)
            assert len(iq) == 4_000
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
