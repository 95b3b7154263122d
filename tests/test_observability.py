"""Observability suite: error tracker, profiler, log ring, rate-limit
filter, state broadcaster, system metrics (reference error_tracker.py,
utils/profiler.py, log_streamer.py, log_sampling.py, state_broadcaster.py,
system_metrics.py)."""

import logging
import time

from wavecap_tpu.utils.observability import (
    ErrorTracker,
    LogRing,
    Profiler,
    RateLimitFilter,
    StateBroadcaster,
    system_metrics,
)


class TestErrorTracker:
    def test_record_recent_rates(self):
        t = ErrorTracker()
        for i in range(5):
            t.record("dsp", "capture1", f"boom {i}")
        t.record("io", "device0", "late")
        recent = t.recent(3)
        assert len(recent) == 3
        assert recent[-1].kind == "io"
        rates = t.rates()
        assert rates["dsp"]["total"] == 5 and rates["dsp"]["rate1s"] == 5
        assert rates["io"]["total"] == 1

    def test_recent_limit_and_order(self):
        t = ErrorTracker()
        for i in range(10):
            t.record("k", "s", str(i))
        msgs = [e.message for e in t.recent(4)]
        assert msgs == ["6", "7", "8", "9"]


class TestProfiler:
    def test_sections_accumulate_and_reset(self):
        p = Profiler("test")
        for _ in range(3):
            with p.measure("step"):
                time.sleep(0.002)
        rep = p.report()
        assert rep["step"]["count"] == 3
        assert rep["step"]["totalMs"] >= 5
        rep2 = p.report(reset=True)
        assert rep2["step"]["count"] == 3
        assert p.report() == {} or p.report().get("step", {}).get("count", 0) == 0

    def test_disabled_profiler_is_noop(self):
        p = Profiler("off", enabled=False)
        with p.measure("x"):
            pass
        assert p.report() == {}


class TestLogRing:
    def make_record(self, msg, level=logging.INFO):
        return logging.LogRecord("test.logger", level, __file__, 1, msg, (), None)

    def test_emit_tail_subscribe(self):
        ring = LogRing(capacity=5)
        got = []
        cancel = ring.subscribe(got.append)
        for i in range(8):
            ring.emit(self.make_record(f"m{i}"))
        tail = ring.tail(10)
        assert len(tail) == 5  # capacity bound
        assert tail[-1]["message"] == "m7"
        assert len(got) == 8
        cancel()
        ring.emit(self.make_record("after"))
        assert len(got) == 8  # cancelled

    def test_tail_limit(self):
        ring = LogRing(capacity=50)
        for i in range(20):
            ring.emit(self.make_record(f"x{i}"))
        assert [e["message"] for e in ring.tail(2)] == ["x18", "x19"]


class TestRateLimitFilter:
    def test_suppresses_repeats_within_interval(self):
        f = RateLimitFilter(min_interval_s=10.0)
        rec = logging.LogRecord("hot", logging.WARNING, __file__, 42, "spam", (), None)
        assert f.filter(rec) is True
        assert f.filter(rec) is False  # same logger:lineno, too soon
        other = logging.LogRecord("hot", logging.WARNING, __file__, 43, "spam", (), None)
        assert f.filter(other) is True  # different line: own bucket

    def test_allows_after_interval(self):
        f = RateLimitFilter(min_interval_s=0.01)
        rec = logging.LogRecord("hot", logging.WARNING, __file__, 1, "x", (), None)
        assert f.filter(rec) is True
        time.sleep(0.02)
        assert f.filter(rec) is True


class TestStateBroadcaster:
    def test_publish_subscribe_cancel(self):
        b = StateBroadcaster()
        got = []
        cancel = b.subscribe(got.append)
        b.publish("capture", "cap1", "created", {"state": "running"})
        assert got and got[0]["entity"] == "capture"
        assert got[0]["change"] == "created" and got[0]["data"]["state"] == "running"
        cancel()
        b.publish("capture", "cap1", "deleted")
        assert len(got) == 1

    def test_bad_subscriber_does_not_break_others(self):
        b = StateBroadcaster()
        got = []

        def boom(evt):
            raise RuntimeError("subscriber bug")

        b.subscribe(boom)
        b.subscribe(got.append)
        b.publish("channel", "ch1", "updated")
        assert len(got) == 1


class TestSystemMetrics:
    def test_has_time_and_memory(self):
        m = system_metrics()
        assert "time" in m
        # psutil-free fallback must still produce a memory percentage on linux
        assert "memory" in m or "loadavg" in m
