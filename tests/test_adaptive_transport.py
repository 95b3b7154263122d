"""Adaptive IQ transport: auto-degrade i16 -> i8 -> i4 under link pressure,
recover when the link clears (VERDICT round 4, weak item 1 / next item 2).

The round-4 BASELINE operating point was link-weather-dependent: a
congested hour measured 1.23x realtime at static i8 while opt-in i4 won.
The engine now measures its own per-batch budget (capture thread:
conv + upload + dispatch + pipeline wait; fetch thread: fetch + fan-out)
against realtime and walks the transport ladder with hysteresis
(``engine.Capture._adapt_transport``).  Reference analog: load-adaptive
FFT FPS (reference ``capture.py:3144``) — here the lever is the dominant
term, host->device bytes.
"""

import time

import numpy as np
import pytest

from wavecap_tpu.capture import Capture, CaptureConfig, CaptureManager, ChannelSpec
from wavecap_tpu.devices import FakeDriver, FakeStation

CENTER = 155_000_000.0
RATE = 800_000


def wait_for(pred, timeout=90.0, dt=0.1):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(dt)
    return False


class TestController:
    """Ladder mechanics driven directly (no device, no jit)."""

    def _cap(self, transport="i16", adaptive=True) -> Capture:
        mgr = CaptureManager(FakeDriver(n_devices=1))
        return mgr.create_capture(
            config=CaptureConfig(
                center_hz=CENTER,
                sample_rate=RATE,
                transport=transport,
                adaptive_transport=adaptive,
            )
        )

    def test_degrades_under_sustained_load(self):
        cap = self._cap("i16")
        # one loaded batch is never enough (EMA converges from 0)
        cap._adapt_transport(busy_ms=95.0, budget_ms=100.0)
        assert cap.transport_active == "i16"
        for _ in range(12):
            cap._adapt_transport(busy_ms=95.0, budget_ms=100.0)
        assert cap.transport_active == "i8"
        # fresh EMA window after the step: sustained overload needed again
        cap._adapt_transport(busy_ms=120.0, budget_ms=100.0)
        assert cap.transport_active == "i8"
        for _ in range(12):
            cap._adapt_transport(busy_ms=120.0, budget_ms=100.0)
        assert cap.transport_active == "i4"
        # the floor holds
        for _ in range(15):
            cap._adapt_transport(busy_ms=200.0, budget_ms=100.0)
        assert cap.transport_active == "i4"

    def test_hard_overload_degrades_on_first_sample(self):
        cap = self._cap("i16")
        cap._adapt_transport(busy_ms=400.0, budget_ms=100.0)
        assert cap.transport_active == "i8"

    def test_recovers_with_patience_and_never_exceeds_ceiling(self):
        cap = self._cap("i8")  # ceiling below i16
        for _ in range(13):
            cap._adapt_transport(busy_ms=95.0, budget_ms=100.0)
        assert cap.transport_active == "i4"
        # recovery needs predicted post-upgrade load < 0.85 sustained for
        # 40 batches: no recovery in the first 30 low-load batches, but
        # recovery well before 80
        for _ in range(30):
            cap._adapt_transport(busy_ms=20.0, budget_ms=100.0)
        assert cap.transport_active == "i4"
        for _ in range(50):
            cap._adapt_transport(busy_ms=20.0, budget_ms=100.0)
        assert cap.transport_active == "i8"
        # never recovers past the configured ceiling
        for _ in range(100):
            cap._adapt_transport(busy_ms=1.0, budget_ms=100.0)
        assert cap.transport_active == "i8"

    def test_moderate_load_resets_recovery_patience(self):
        cap = self._cap("i16")
        for _ in range(13):
            cap._adapt_transport(busy_ms=95.0, budget_ms=100.0)
        assert cap.transport_active == "i8"
        for _ in range(35):
            cap._adapt_transport(busy_ms=20.0, budget_ms=100.0)
        # moderate batches (predicted upgrade load >= 0.85) reset patience
        for _ in range(5):
            cap._adapt_transport(busy_ms=60.0, budget_ms=100.0)
        for _ in range(30):
            cap._adapt_transport(busy_ms=20.0, budget_ms=100.0)
        assert cap.transport_active == "i8"

    @pytest.mark.parametrize("transport", ["f32", "i4"])
    def test_explicit_fidelity_and_floor_never_adapt(self, transport):
        cap = self._cap(transport)
        for _ in range(10):
            cap._adapt_transport(busy_ms=500.0, budget_ms=100.0)
        assert cap.transport_active == transport

    def test_disabled_never_adapts(self):
        cap = self._cap("i16", adaptive=False)
        for _ in range(10):
            cap._adapt_transport(busy_ms=500.0, budget_ms=100.0)
        assert cap.transport_active == "i16"


class TestCongestedLink:
    """End-to-end: a throttled upload link makes static i16 exceed the
    realtime budget; the adaptive capture degrades, keeps processing, and
    recovers after the link clears."""

    @pytest.mark.slow
    def test_degrade_and_recover_e2e(self):
        mgr = CaptureManager(
            FakeDriver(
                n_devices=1,
                stations=[FakeStation(offset_hz=100_000.0, kind="nbfm", tone_hz=900.0)],
            )
        )
        cap = mgr.create_capture(
            config=CaptureConfig(
                center_hz=CENTER,
                sample_rate=RATE,
                block_seconds=0.2,
                transport="i16",
            )
        )
        cap.create_channel(
            ChannelSpec(id="ch1", mode="nbfm", frequency_hz=CENTER + 100_000.0)
        )
        # i16 ships 4 B/sample -> 640 KB per 0.2 s block; at 3.5 MB/s the
        # upload alone is ~0.18 s of the 0.2 s budget (load > 0.9).
        # i8 ships half that -> comfortably inside the budget.
        cap._upload_throttle_bps = 3.5e6
        # adaptation only engages for realtime-paced sources (a
        # non-realtime fake runs busy>budget by construction); make this
        # fake stream pace like real hardware
        cap.device.realtime = True
        cap.start()
        try:
            assert wait_for(lambda: cap.blocks_processed >= 3)
            assert wait_for(
                lambda: cap.transport_active in ("i8", "i4"), timeout=60
            ), f"never degraded (active={cap.transport_active}, ema={cap._adapt_ema:.2f})"
            degraded_at = cap.blocks_processed
            # the stream keeps flowing at the degraded width
            assert wait_for(
                lambda: cap.blocks_processed >= degraded_at + 5, timeout=60
            )
            assert cap.state == "running"
            assert cap.overflow_count == 0
            assert cap.status()["transportActive"] in ("i8", "i4")
            # link clears: recovery back to the ceiling after the patience
            # window (40 low-load batches)
            cap._upload_throttle_bps = None
            assert wait_for(
                lambda: cap.transport_active == "i16", timeout=120
            ), f"never recovered (active={cap.transport_active})"
            assert cap.state == "running"
        finally:
            cap.stop()
