"""Live-path tests for wired-in attachments and capture services that were
unit-tested-but-orphaned in round 1 (VERDICT missing items 3-4): RDS from
the wide slot's pre-MPX baseband export, and the channel classifier fed
from capture spectrum frames."""

import time

import numpy as np
import pytest

from wavecap_tpu.capture import Capture, CaptureConfig, CaptureManager, ChannelSpec
from wavecap_tpu.devices import FakeDriver, FakeStation


def wait_for(pred, timeout=60.0, dt=0.2):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(dt)
    return False


CENTER = 98_000_000.0
RATE = 960_000


def make_wbfm_rds_iq(rate=RATE, pi=0x2345):
    """WBFM IQ whose baseband carries an audio tone + real RDS groups."""
    from wavecap_tpu.decoders import rds

    groups = []
    for seg in range(4):
        b_low = (0 << 11) | seg
        d = (ord("AB"[seg % 2]) << 8) | ord("CD"[seg % 2])
        groups.append(rds.encode_group(pi, 0, b_low, 0xE201, d))
    bits = np.concatenate(groups * 10)
    fs_bb = 240_000
    baseband = np.asarray(rds.modulate_rds(bits, fs_bb, amplitude=0.12))
    t = np.arange(len(baseband)) / fs_bb
    program = 0.4 * np.sin(2 * np.pi * 1000 * t) + baseband
    # upsample the program to the capture rate and FM modulate (75 kHz dev)
    up = rate // fs_bb
    prog_up = np.repeat(program, up)
    phase = 2 * np.pi * 75_000 * np.cumsum(prog_up) / rate
    return np.exp(1j * phase).astype(np.complex64)


class TestLiveRds:
    def test_rds_decodes_from_wide_baseband(self):
        iq = make_wbfm_rds_iq()
        mgr = CaptureManager(
            FakeDriver(
                n_devices=1,
                stations=[
                    FakeStation(offset_hz=150_000.0, kind="iq_loop", iq_loop=iq)
                ],
            )
        )
        cap = mgr.create_capture(
            config=CaptureConfig(center_hz=CENTER, sample_rate=RATE, block_seconds=0.2)
        )
        ch = cap.create_channel(
            ChannelSpec(id="fm1", mode="wbfm", frequency_hz=CENTER + 150_000.0)
        )
        from wavecap_tpu.capture.attachments import RdsAttachment

        att = RdsAttachment(ch, capture=cap)
        cap.start()
        try:
            assert wait_for(lambda: att.decoder.data.pi is not None, timeout=90)
            assert att.decoder.data.pi == 0x2345
            assert att.decoder.data.blocks_ok > 0
        finally:
            att.stop()
            cap.stop()


class TestLiveClassifier:
    def test_classifier_sees_carrier_and_endpoint_shape(self):
        mgr = CaptureManager(
            FakeDriver(
                n_devices=1,
                stations=[
                    FakeStation(offset_hz=200_000.0, kind="carrier", amplitude=0.8)
                ],
            )
        )
        cap = mgr.create_capture(
            config=CaptureConfig(center_hz=CENTER, sample_rate=RATE, block_seconds=0.2)
        )
        # any channel keeps the pipeline busy; classifier feeds off spectrum
        cap.create_channel(
            ChannelSpec(id="x", mode="nbfm", frequency_hz=CENTER + 100_000.0)
        )
        cap.start()
        try:
            # occupancy is an EMA (alpha=0.05): needs ~60 frames to reach
            # the steady-carrier threshold
            assert wait_for(lambda: cap.classifier.frames >= 80, timeout=60)
            chans = cap.classifier.classify(min_occupancy=0.3)
            assert chans, "classifier found nothing"
            best = min(chans, key=lambda c: abs(c.frequency_hz - (CENTER + 200_000.0)))
            assert abs(best.frequency_hz - (CENTER + 200_000.0)) < 5_000
            assert best.kind == "control"  # steady carrier
        finally:
            cap.stop()


class TestRecoveryEscalation:
    def test_exhausted_restarts_escalate_to_service_recovery(self):
        """When per-capture restarts hit the hourly cap, the engine calls
        the shared ServiceRecovery before declaring failure (reference
        sdrplay_recovery health-monitor escalation)."""
        from wavecap_tpu.devices.recovery import RecoveryPolicy, ServiceRecovery

        calls = []

        def fake_runner(cmd, timeout=30.0):
            calls.append(cmd)
            return 0, "restarted"

        recovery = ServiceRecovery(
            policy=RecoveryPolicy(cooldown_s=0.0), runner=fake_runner
        )
        mgr = CaptureManager(
            FakeDriver(n_devices=1, stations=[]), recovery=recovery
        )
        cap = mgr.create_capture(
            config=CaptureConfig(center_hz=CENTER, sample_rate=RATE, block_seconds=0.2)
        )
        assert cap.recovery is recovery
        cap.max_restarts_per_hour = 0  # exhaust immediately
        cap.watchdog_timeout_s = 0.5
        cap.startup_timeout_s = 0.5

        # break the device so the capture keeps failing
        def dead_start_stream():
            raise RuntimeError("device gone")

        cap.device.start_stream = dead_start_stream
        cap.start()
        try:
            # generous horizon: under a full-suite run the pipeline compile
            # inside start() can take tens of seconds on a loaded CPU
            assert wait_for(lambda: len(calls) >= 1, timeout=120)
            assert calls[0][:2] == ["systemctl", "restart"]
            assert recovery.state.total_restarts >= 1
        finally:
            cap.auto_restart = False
            cap.stop()

    def test_hung_device_open_trips_watchdog(self):
        """A driver open that hangs in a C call leaves the capture in
        'starting' forever; the watchdog must bound it (reference opens
        devices under a subprocess timeout for the same failure mode)."""
        import threading

        mgr = CaptureManager(FakeDriver(n_devices=1, stations=[]))
        cap = mgr.create_capture(
            config=CaptureConfig(center_hz=CENTER, sample_rate=RATE, block_seconds=0.2)
        )
        cap.device_open_timeout_s = 0.5
        cap.max_restarts_per_hour = 1
        hang = threading.Event()
        real_start = cap.device.start_stream

        calls = {"n": 0}

        def hung_start_stream():
            calls["n"] += 1
            if calls["n"] == 1:
                hang.wait(30)  # simulate a wedged driver on the first open
            return real_start()

        cap.device.start_stream = hung_start_stream
        cap.start()
        try:
            assert cap.state == "starting"
            # watchdog restarts past device_open_timeout_s; the second open
            # succeeds and the capture comes up
            assert wait_for(lambda: cap.state == "running", timeout=60)
            assert cap.restart_count >= 1
        finally:
            hang.set()
            cap.auto_restart = False
            cap.stop()


class TestLivePocsag:
    def test_pocsag_decodes_from_rf_through_nbfm_channel(self):
        """Pager FSK from RF, end to end: FM IQ -> capture engine ->
        channelizer -> NBFM demod (voice band filters DISABLED — the
        default 300 Hz highpass destroys the FSK's low-frequency bit
        runs; round-3 RF-audit find, previously only synthetic audio was
        ever fed to the decoder) -> PocsagAttachment -> parsed message.
        The server's attachment route applies these dsp overrides
        automatically (tested in test_server.py)."""
        from math import gcd

        from scipy import signal as sps_

        from wavecap_tpu.capture.attachments import PocsagAttachment
        from wavecap_tpu.decoders import pocsag
        from wavecap_tpu.ops.channelizer import ChannelizerConfig

        rate = 800_000
        cc = ChannelizerConfig(
            sample_rate=float(rate), channel_bandwidth=25_000.0
        )
        off = cc.channel_offset_hz(4)
        bits = pocsag.encode_message(133_7003, "HELLO WORLD")
        audio = pocsag.modulate_pocsag(bits, 48_000, 1200)
        a = np.concatenate([audio, np.zeros(4800, np.float32)])
        phase = 2 * np.pi * 4500.0 * np.cumsum(a) / 48_000
        iq48 = np.exp(1j * phase).astype(np.complex64)
        g = gcd(rate, 48_000)
        iq = sps_.resample_poly(iq48, rate // g, 48_000 // g).astype(
            np.complex64
        )
        t = np.arange(len(iq)) / rate
        iq = (iq * np.exp(2j * np.pi * off * t)).astype(np.complex64)
        st = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
        st.iq_loop = iq
        cap = CaptureManager(FakeDriver(stations=[st])).create_capture(
            config=CaptureConfig(
                center_hz=152e6, sample_rate=rate,
                wide_capacity=0, p25_capacity=0,
            )
        )
        ch = cap.create_channel(
            ChannelSpec(
                id="pg", mode="nbfm", frequency_hz=152e6 + off,
                dsp={"enable_highpass": False, "enable_lowpass": False},
            )
        )
        att = PocsagAttachment(ch)
        cap.start()
        try:
            assert wait_for(lambda: len(att.messages) >= 1, timeout=90)
        finally:
            cap.stop()
            att.stop()
        msgs = list(att.messages)
        assert any(
            m["address"] == 133_7003 and "HELLO" in m["content"]
            for m in msgs
        ), msgs

    def test_flex_decodes_from_rf_through_nbfm_channel(self):
        """FLEX from RF through the same filter-disabled NBFM path."""
        from math import gcd

        from scipy import signal as sps_

        from wavecap_tpu.capture.attachments import FlexAttachment
        from wavecap_tpu.decoders import flex
        from wavecap_tpu.ops.channelizer import ChannelizerConfig

        rate = 800_000
        cc = ChannelizerConfig(
            sample_rate=float(rate), channel_bandwidth=25_000.0
        )
        off = cc.channel_offset_hz(4)
        bits = flex.encode_frame(1234567, "TEST PAGE")
        audio = flex.modulate_flex(bits, 48_000)
        a = np.concatenate([audio, np.zeros(4800, np.float32)])
        phase = 2 * np.pi * 4800.0 * np.cumsum(a) / 48_000
        iq48 = np.exp(1j * phase).astype(np.complex64)
        g = gcd(rate, 48_000)
        iq = sps_.resample_poly(iq48, rate // g, 48_000 // g).astype(
            np.complex64
        )
        t = np.arange(len(iq)) / rate
        iq = (iq * np.exp(2j * np.pi * off * t)).astype(np.complex64)
        st = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
        st.iq_loop = iq
        cap = CaptureManager(FakeDriver(stations=[st])).create_capture(
            config=CaptureConfig(
                center_hz=152e6, sample_rate=rate,
                wide_capacity=0, p25_capacity=0,
            )
        )
        ch = cap.create_channel(
            ChannelSpec(
                id="fx", mode="nbfm", frequency_hz=152e6 + off,
                dsp={"enable_highpass": False, "enable_lowpass": False},
            )
        )
        att = FlexAttachment(ch)
        cap.start()
        try:
            assert wait_for(lambda: len(att.messages) >= 1, timeout=90)
        finally:
            cap.stop()
            att.stop()
        msgs = list(att.messages)
        assert any("TEST PAGE" in m.get("content", "") for m in msgs), msgs
