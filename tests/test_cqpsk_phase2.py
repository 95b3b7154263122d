"""CQPSK demod round trip + P25 Phase 2 superframe detection."""

import numpy as np
import pytest

import jax.numpy as jnp

from wavecap_tpu.decoders import p25_frames as pf
from wavecap_tpu.decoders import p25_phase2 as p2
from wavecap_tpu.decoders import p25_tsbk as tsbk
from wavecap_tpu.decoders.framer import P25Framer
from wavecap_tpu.models.p25.cqpsk import (
    CqpskConfig,
    cqpsk_init,
    cqpsk_demodulate,
    modulate_cqpsk,
)
from tests.test_p25_roundtrip import make_control_channel_dibits


def run_demod(iq, cfg, block=4800):
    state = cqpsk_init(cfg)
    softs = []
    for i in range(len(iq) // block):
        soft, _, state = cqpsk_demodulate(
            jnp.asarray(iq[i * block : (i + 1) * block]), state, cfg
        )
        softs.append(np.asarray(soft))
    return np.concatenate(softs)


class TestCqpsk:
    def test_clean_symbol_recovery(self, rng):
        dibits = rng.integers(0, 4, 2000).astype(np.uint8)
        iq = modulate_cqpsk(dibits, 48_000, 4800)
        cfg = CqpskConfig(sample_rate=48_000, symbol_rate=4800.0)
        soft = run_demod(iq, cfg)
        # align via correlation of dibit symbols
        tx = pf.DIBIT_SYMBOLS[dibits]
        best = None
        for off in range(0, 60):
            n = min(len(soft) - off, len(tx) - 8)
            err = np.mean(np.abs(soft[off : off + n] - tx[8 : 8 + n]) > 1.0)
            if best is None or err < best[1]:
                best = (off, err)
        assert best[1] < 0.05, best  # <5% symbol errors after lock

    def test_lsm_control_channel_via_framer(self):
        """Full stack: TSBKs over pi/4-DQPSK -> same framer/decoders."""
        dibits, expected = make_control_channel_dibits(n_frames=6)
        iq = modulate_cqpsk(dibits, 48_000, 4800)
        t = np.arange(len(iq)) / 48_000
        iq = (iq * np.exp(2j * np.pi * 80.0 * t)).astype(np.complex64)  # carrier error
        cfg = CqpskConfig(sample_rate=48_000)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        for i in range(len(iq) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(iq[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for frame in framer.process(np.asarray(soft)):
                if frame.duid != pf.DUID.TSDU:
                    continue
                payload = pf.remove_status_dibits(frame.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(payload):
                    tot += 1
                    ok += b.crc_valid
        assert framer.sync_count >= 3
        assert tot > 0 and ok / tot >= 0.6, (ok, tot)

    def test_phase2_rate_6000(self, rng):
        dibits = rng.integers(0, 4, 1200).astype(np.uint8)
        iq = modulate_cqpsk(dibits, 48_000, 6000.0, alpha=1.0)
        cfg = CqpskConfig(sample_rate=48_000, symbol_rate=6000.0, rrc_alpha=1.0)
        soft = run_demod(iq, cfg)
        tx = pf.DIBIT_SYMBOLS[dibits]
        best = min(
            (
                (off, np.mean(np.abs(soft[off : off + 800] - tx[8:808]) > 1.0))
                for off in range(0, 60)
            ),
            key=lambda x: x[1],
        )
        assert best[1] < 0.08, best


class TestPhase2Framing:
    def test_superframe_detection(self, rng):
        frags = [p2.build_test_fragment() for _ in range(4)]
        soft = np.concatenate(
            [p2.DIBIT_SYMBOLS[np.concatenate(frags)]]
        ) + rng.normal(0, 0.2, 4 * p2.FRAGMENT_DIBITS).astype(np.float32)
        det = p2.P25P2SuperFrameDetector()
        found = []
        for i in range(0, len(soft), 500):
            found += det.process(soft[i : i + 500])
        assert len(found) >= 2
        f = found[0]
        assert f.rotation == 0
        bursts = f.bursts()
        assert len(bursts) == 4
        assert [b[0] for b in bursts] == [0, 1, 0, 1]
        np.testing.assert_array_equal(
            f.dibits[360:380], p2.SYNC_DIBITS
        )

    def test_rotation_detection_and_correction(self):
        frag = p2.build_test_fragment()
        rotated = p2.rotate_dibits(frag, 1)  # +90° lock error
        soft = p2.DIBIT_SYMBOLS[rotated]
        det = p2.P25P2SuperFrameDetector()
        found = det.process(np.concatenate([soft, soft]))
        assert found, "no fragment found"
        assert found[0].rotation == 90
        # corrected dibits should match the original at sync positions
        np.testing.assert_array_equal(found[0].dibits[360:380], p2.SYNC_DIBITS)

    def test_dibit_rotation_is_cyclic(self):
        d = np.array([0, 1, 2, 3], np.uint8)
        r4 = p2.rotate_dibits(d, 4)
        np.testing.assert_array_equal(r4, d)


@pytest.mark.slow
class TestCqpskCaptureIntegration:
    def test_lsm_control_channel_through_capture(self):
        """A cqpsk-modulation capture decodes an LSM control channel
        end-to-end: device IQ -> channelizer -> CQPSK bank -> framer ->
        TSBKs (the p25_modulation='cqpsk' switch, reference P25Modulation
        select at ``decoders/p25.py:1755``)."""
        import time

        from scipy import signal as sps

        from wavecap_tpu.capture import CaptureConfig, CaptureManager, ChannelSpec
        from wavecap_tpu.devices import FakeDriver, FakeStation
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders import p25_tsbk as tsbk
        from wavecap_tpu.decoders.framer import P25Framer
        from wavecap_tpu.models.p25.cqpsk import modulate_cqpsk

        rate, center, freq = 960_000, 851_500_000.0, 851_200_000.0
        blocks = [
            pf.encode_tsbk_block(
                tsbk.TSBKOpcode.RFSS_STS_BCAST,
                tsbk.make_rfss_status_data(
                    system_id=0x2AA, rfss_id=1, site_id=6, band=1, channel_number=9
                ),
                last=True,
            )
        ] * 3
        frame = pf.build_tsdu_frame(0x293, blocks[:1] * 3)
        stream = np.concatenate([frame] * 12)
        iq48 = modulate_cqpsk(stream, 48_000.0, 4800.0)
        from math import gcd

        g = gcd(rate, 48_000)
        iq = sps.resample_poly(iq48, rate // g, 48_000 // g).astype(np.complex64)
        t = np.arange(len(iq)) / rate
        iq = (iq * np.exp(2j * np.pi * (freq - center) * t)).astype(np.complex64)

        st = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
        st.iq_loop = iq
        mgr = CaptureManager(FakeDriver(stations=[st]))
        cap = mgr.create_capture(
            config=CaptureConfig(
                center_hz=center,
                sample_rate=rate,
                block_seconds=0.1,
                narrow_capacity=0,
                wide_capacity=0,
                p25_capacity=1,
                p25_modulation="cqpsk",
            )
        )
        ch = cap.create_channel(ChannelSpec(id="cc", mode="p25", frequency_hz=freq))
        sub = ch.symbols.subscribe()
        cap.start()
        framer = P25Framer()
        ok = tot = 0
        deadline = time.time() + 180
        try:
            # run to a fixed TSBK count so the CRC-rate bar is meaningful
            # (the original `ok >= 1` bar passed at 50 % CRC and hid a
            # block-boundary clock-slip bug in the cqpsk block timing)
            while time.time() < deadline and tot < 30:
                batch = sub.get_nowait()
                if batch is None:
                    time.sleep(0.1)
                    continue
                for f in framer.process(batch["soft"]):
                    if f.duid != pf.DUID.TSDU:
                        continue
                    pl = pf.remove_status_dibits(f.dibits[57:], 57)
                    for b in pf.decode_tsbk_payload(pl):
                        tot += 1
                        if b.crc_valid:
                            p = tsbk.parse_tsbk(b.opcode, b.mfid, b.data)
                            if p.get("site_id") == 6:
                                ok += 1
        finally:
            cap.stop()
        assert framer.sync_count >= 1
        assert tot >= 30 and ok / tot >= 0.9, (ok, tot, framer.sync_count)


@pytest.mark.slow
class TestPhase2OverRF:
    def test_superframes_from_rf_iq_through_p25p2_bank(self):
        """Phase 2 TDMA voice from RF, end to end: 6000-baud H-DQPSK IQ
        (alpha=1.0) -> capture engine -> channelizer -> dedicated p25p2
        bank (6000-baud CQPSK demod; the 4800-baud p25 bank CANNOT decode
        this — round-3 find: Phase 2 trunking captures previously
        demodulated everything at 4800 baud, so voice-from-IQ was garbage
        while symbol-injection tests stayed green) -> superframe
        detector."""
        import time
        from math import gcd

        from scipy import signal as sps_

        from wavecap_tpu.capture import (
            CaptureConfig,
            CaptureManager,
            ChannelSpec,
        )
        from wavecap_tpu.decoders.p25_phase2 import (
            P25P2SuperFrameDetector,
            build_test_fragment,
        )
        from wavecap_tpu.devices import FakeDriver, FakeStation
        from wavecap_tpu.models.p25.cqpsk import modulate_cqpsk
        from wavecap_tpu.ops.channelizer import ChannelizerConfig

        rate = 800_000
        cc = ChannelizerConfig(
            sample_rate=float(rate), channel_bandwidth=25_000.0
        )
        off = cc.channel_offset_hz(5)
        frag = build_test_fragment()
        stream = np.concatenate([frag] * 10)
        iq48 = modulate_cqpsk(stream, 48_000.0, symbol_rate=6000.0, alpha=1.0)
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
                center_hz=851e6,
                sample_rate=rate,
                wide_capacity=0,
                narrow_capacity=0,
                p25_capacity=0,
                p25p2_capacity=2,
            )
        )
        ch = cap.create_channel(
            ChannelSpec(id="v", mode="p25p2", frequency_hz=851e6 + off)
        )
        assert ch.mode_group == "p25p2"
        det = P25P2SuperFrameDetector()
        frames = []
        sub = ch.symbols.subscribe(maxsize=64)
        cap.start()
        t0 = time.time()
        fed = 0
        try:
            while time.time() - t0 < 150 and fed < 40_000:
                got = sub.get_nowait()
                if got is None:
                    time.sleep(0.05)
                    continue
                soft = np.asarray(got["soft"])
                fed += len(soft)
                frames += det.process(soft)
        finally:
            sub.close()
            cap.stop()
        # nearly every repeated fragment must be recovered (fed/len(frag)
        # fragments were transmitted; allow the stream-boundary stragglers)
        sent = fed // len(frag)
        assert len(frames) >= int(0.9 * sent), (len(frames), sent, fed)


class TestPhase2TrunkingWiring:
    def test_phase2_system_uses_p25p2_voice_and_dedicated_probe(self, tmp_path):
        """A Phase 2 trunking system's capture must carry: one 4800-baud
        CQPSK CC slot + one dedicated 4800-baud probe slot (p25 bank) and
        6000-baud H-DQPSK voice slots (p25p2 bank) — the symbol rates run
        simultaneously (reference decoders/p25_phase2.py:7 vs its Phase 1
        CC)."""
        from wavecap_tpu.capture import CaptureManager
        from wavecap_tpu.devices import FakeDriver
        from wavecap_tpu.trunking.config import (
            TrunkingProtocol,
            TrunkingSystemConfig,
        )
        from wavecap_tpu.trunking.system import TrunkingSystem

        cfg = TrunkingSystemConfig(
            id="p2sys",
            control_channels=[851_000_000.0],
            sample_rate=2_400_000,
            protocol=TrunkingProtocol.P25_PHASE2,
            max_voice_channels=3,
        )
        mgr = CaptureManager(FakeDriver())
        sys_ = TrunkingSystem(cfg, mgr, state_dir=tmp_path)
        sys_.start()
        try:
            cap = sys_.capture
            assert cap is not None
            assert cap.config.p25_capacity == 2  # cc + dedicated probe
            assert cap.config.p25p2_capacity == 3
            assert cap.config.p25_modulation == "cqpsk"
            assert cap.channels["cc"].mode_group == "p25"
            assert cap.channels["probe"].mode_group == "p25"
            for i in range(3):
                assert cap.channels[f"voice{i}"].mode_group == "p25p2"
            # probing must not depend on an idle recorder: all busy still
            # leaves the dedicated slot available
            for rec in sys_.pool.recorders:
                rec.state = "recording"
            assert sys_._can_probe()
            sys_._start_probe(852_000_000.0, now=0.0)
            assert sys_._probe_slot == "probe"
            assert sys_.scanner.probe is not None
            assert sys_.scanner.probe.channel_id == "probe"
        finally:
            sys_.stop()


class TestImpairmentFloors:
    """Operating-point regressions from the round-3 impairment sweep
    (docs/perf.md): the differential detector's AWGN edge and its
    simulcast-echo tolerance — the two properties LSM exists for."""

    def _crc_rate(self, iq):
        cfg = CqpskConfig(sample_rate=48_000)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        for i in range(len(iq) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(iq[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        return ok, tot

    def test_cqpsk_awgn_minus1db(self):
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=8, modulation="cqpsk")
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(11)
        noise_std = np.sqrt(sig_p / (10 ** (-1.0 / 10)) / 2)
        iq = (
            iq0
            + noise_std
            * (rng.standard_normal(len(iq0)) + 1j * rng.standard_normal(len(iq0)))
        ).astype(np.complex64)
        ok, tot = self._crc_rate(np.concatenate([np.zeros(1000, np.complex64), iq]))
        assert tot >= 15 and ok / tot >= 0.85, (ok, tot)

    @pytest.mark.parametrize("cfo_hz", (1000.0, -1000.0))
    def test_cqpsk_cfo_acquisition_1khz(self, cfo_hz):
        """Round-4 CFO acquisition: the 4th-power feedforward estimator +
        NCO pre-correction must hold >=0.9 CRC at +-1 kHz (the round-3
        detector folded at 500 Hz: 2*pi*500/4800 = 0.65 rad vs the pi/4
        decision cell).  Reference analog: the Costas loop at reference
        dsp/p25/cqpsk.py:84 tracks this range."""
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=8, modulation="cqpsk")
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(7)
        t = np.arange(len(iq0)) / 48_000
        iq = iq0 * np.exp(2j * np.pi * cfo_hz * t)
        noise_std = np.sqrt(sig_p / (10 ** (6.0 / 10)) / 2)
        iq = (
            iq
            + noise_std
            * (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
        ).astype(np.complex64)
        ok, tot = self._crc_rate(np.concatenate([np.zeros(1000, np.complex64), iq]))
        assert tot >= 12 and ok / tot >= 0.9, (ok, tot)

    def test_cqpsk_cfo_acquisition_6000_baud(self):
        """Phase 2 H-DQPSK (6000 baud, alpha=1.0) acquires +-1 kHz too
        (span scales with symbol rate: Rs/4 = 1.5 kHz)."""
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(
            48_000, 0.0, n_frames=8, modulation="cqpsk", baud=6000
        )
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(9)
        t = np.arange(len(iq0)) / 48_000
        iq = iq0 * np.exp(2j * np.pi * 1000.0 * t)
        noise_std = np.sqrt(sig_p / (10 ** (6.0 / 10)) / 2)
        iq = (
            iq
            + noise_std
            * (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
        ).astype(np.complex64)
        cfg = CqpskConfig(sample_rate=48_000, symbol_rate=6000.0, rrc_alpha=1.0)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        sig = np.concatenate([np.zeros(1000, np.complex64), iq])
        for i in range(len(sig) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(sig[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        assert tot >= 12 and ok / tot >= 0.9, (ok, tot)

    def test_cqpsk_simulcast_echo_70us(self):
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=8, modulation="cqpsk")
        rng = np.random.default_rng(3)
        d = int(round(70e-6 * 48_000))
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.5 * np.exp(1j * rng.uniform(0, 2 * np.pi)))
        sig = iq0 + echo
        sig_p = float(np.mean(np.abs(sig) ** 2))
        noise_std = np.sqrt(sig_p / (10 ** (10.0 / 10)) / 2)
        iq = (
            sig
            + noise_std
            * (rng.standard_normal(len(sig)) + 1j * rng.standard_normal(len(sig)))
        ).astype(np.complex64)
        ok, tot = self._crc_rate(np.concatenate([np.zeros(1000, np.complex64), iq]))
        assert tot >= 15 and ok / tot >= 0.9, (ok, tot)


class TestSimulcastEqualizer:
    """Round-4 (VERDICT item 6): the analytic echo-fit MMSE equalizer.

    LSM exists FOR simulcast, yet a 70 us near-equal-power echo zeroed
    CRC for both demods in round 3 (and does for the reference's
    Costas+MM chain, which has no equalizer).  The fit matches the block
    autocorrelation against single-echo candidates and synthesizes the
    regularized MMSE inverse feedforward."""

    def test_70us_equal_power_echo_decodes(self):
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=14, modulation="cqpsk")
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(23)
        d = int(round(70e-6 * 48_000))
        # adversarial phase: notch at band center (the realization that
        # defeated a CMA prototype)
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))
        sig = iq0 + echo
        noise_std = np.sqrt(sig_p / 10 / 2)
        x = np.concatenate(
            [
                np.zeros(1000, np.complex64),
                (
                    sig
                    + noise_std
                    * (
                        rng.standard_normal(len(sig))
                        + 1j * rng.standard_normal(len(sig))
                    )
                ).astype(np.complex64),
            ]
        )
        cfg = CqpskConfig(sample_rate=48_000, equalizer_taps=127)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        for i in range(len(x) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(x[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        # a couple of early TSBKs can fail while the acf estimate
        # acquires; the steady state is ~1.0 (docs/perf.md round-4 table)
        assert tot >= 25 and ok / tot >= 0.88, (ok, tot)

    @pytest.mark.parametrize("cfo_hz", (1000.0, -1000.0))
    def test_echo_plus_cfo_corner(self, cfo_hz):
        """Echo + CFO jointly: a simulcast echo can notch one of the two
        4th-power lines, aliasing the line-pair CFO metric by Rs/4
        (measured: true +1000 Hz -> decisive false lock at -200 Hz, zero
        frames).  equalizer.resolve_cfo_alias re-scores the three alias
        candidates through the de-rotate -> re-filter -> echo-grid fit
        and recovers both the carrier and the echo."""
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=14, modulation="cqpsk")
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(23)
        d = int(round(70e-6 * 48_000))
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))
        sig = iq0 + echo
        noise_std = np.sqrt(sig_p / 10 / 2)
        x = (
            sig
            + noise_std
            * (
                rng.standard_normal(len(sig))
                + 1j * rng.standard_normal(len(sig))
            )
        ).astype(np.complex64)
        t = np.arange(len(x)) / 48_000
        x = (x * np.exp(2j * np.pi * cfo_hz * t)).astype(np.complex64)
        x = np.concatenate([np.zeros(1000, np.complex64), x])
        cfg = CqpskConfig(sample_rate=48_000, equalizer_taps=127)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        for i in range(len(x) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(x[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        assert abs(float(state.cfo_hz) - cfo_hz) < 60.0, float(state.cfo_hz)
        assert tot >= 20 and ok / tot >= 0.8, (ok, tot)

    def test_fine_offset_guard_blocks_spurious_engagement(self):
        """Round 5 (VERDICT weak 5): a fine-offset channel through the
        REAL channelizer — the bin filter truncates the band
        asymmetrically and the echo fit mis-engages (measured here:
        unguarded hits>0, taps far from identity, CRC drops).  The
        runtime guard (eq_enable=False, derived from the slot's fine
        offset in the pipeline) must hold identity taps and keep the
        unequalized decode on exactly that input."""
        from tests.test_trunking import make_p25_cc_iq
        from wavecap_tpu.models.p25.c4fm import (
            C4fmConfig,
            c4fm_demodulate,
            c4fm_init,
        )
        from wavecap_tpu.ops import freq_shift
        from wavecap_tpu.ops.channelizer import (
            ChannelizerConfig,
            channelize,
            channelizer_init,
        )

        rate = 800_000
        ccfg = ChannelizerConfig(sample_rate=rate, channel_bandwidth=25_000.0)
        crate = ccfg.channel_rate  # 50 kHz
        fine = 12_500.0  # half the bin spacing: the P25 grid's worst case
        bin_idx = 3
        iq = make_p25_cc_iq(rate, bin_idx * 25_000.0 + fine, n_frames=12)
        n = (len(iq) // ccfg.channel_count) * ccfg.channel_count
        chans, _ = channelize(jnp.asarray(iq[:n]), channelizer_init(ccfg), ccfg)
        series = np.asarray(chans)[bin_idx]
        sh, _ = freq_shift(
            jnp.asarray(series), -fine, crate, jnp.zeros((), jnp.uint32)
        )
        x = np.asarray(sh)
        ident = np.zeros(127, np.complex64)
        ident[63] = 1.0

        def run(eq_enable):
            cfg = C4fmConfig(sample_rate=int(crate), equalizer_taps=127)
            state = c4fm_init(cfg)
            framer = P25Framer()
            ok = tot = 0
            blk = 5000
            for i in range(len(x) // blk):
                kw = {} if eq_enable is None else {"eq_enable": eq_enable}
                soft, _, state = c4fm_demodulate(
                    jnp.asarray(x[i * blk : (i + 1) * blk]), state, cfg, **kw
                )
                for f in framer.process(np.asarray(soft)):
                    if f.duid != pf.DUID.TSDU:
                        continue
                    pl = pf.remove_status_dibits(f.dibits[57:], 57)
                    for b in pf.decode_tsbk_payload(pl):
                        tot += 1
                        ok += b.crc_valid
            return ok, tot, state

        # unguarded: the mis-fit engages (this is the measured hazard)
        ok_u, tot_u, st_u = run(None)
        assert int(st_u.eq_hits) > 0
        assert float(np.abs(np.asarray(st_u.eq_taps) - ident).max()) > 0.1

        # guarded (what the pipeline passes for |fine| > eq_max_fine_offset_hz):
        # identity taps, zero engagement, clean unequalized decode
        ok_g, tot_g, st_g = run(jnp.bool_(False))
        assert int(st_g.eq_hits) == 0
        np.testing.assert_allclose(np.asarray(st_g.eq_taps), ident, atol=1e-6)
        assert tot_g >= 20 and ok_g / tot_g >= 0.75, (ok_g, tot_g)
        assert ok_g / tot_g > ok_u / max(tot_u, 1), (ok_g, tot_g, ok_u, tot_u)

    def test_engagement_needs_consecutive_decisive_fits(self):
        """Round 5: one decisive block is not enough — the inverse only
        applies after eq_engage_blocks consecutive significant fits."""
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=8, modulation="cqpsk")
        d = int(round(70e-6 * 48_000))
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))
        x = (iq0 + echo).astype(np.complex64)
        cfg = CqpskConfig(sample_rate=48_000, equalizer_taps=127)
        ident = np.zeros(127, np.complex64)
        ident[63] = 1.0

        state = cqpsk_init(cfg)
        _, _, state = cqpsk_demodulate(jnp.asarray(x[:4800]), state, cfg)
        hits1 = int(state.eq_hits)
        taps1 = np.asarray(state.eq_taps)
        _, _, state = cqpsk_demodulate(jnp.asarray(x[4800:9600]), state, cfg)
        hits2 = int(state.eq_hits)
        taps2 = np.asarray(state.eq_taps)
        assert hits1 == 1 and hits2 == 2, (hits1, hits2)
        # block 1: decisive but not yet engaged -> identity taps
        np.testing.assert_allclose(taps1, ident, atol=1e-6)
        # block 2: engaged -> a real inverse
        assert np.abs(taps2 - ident).max() > 0.05

    def test_equalizer_inert_on_clean_signal(self):
        """Gating: no echo -> identity taps; clean decode unaffected."""
        from tests.test_trunking import make_p25_cc_iq

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=6, modulation="cqpsk")
        cfg = CqpskConfig(sample_rate=48_000, equalizer_taps=127)
        state = cqpsk_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        x = np.concatenate([np.zeros(1000, np.complex64), iq0])
        for i in range(len(x) // 4800):
            soft, _, state = cqpsk_demodulate(
                jnp.asarray(x[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        assert tot >= 10 and ok / tot >= 0.95, (ok, tot)


@pytest.mark.slow
class TestEqualizerThroughCapture:
    def test_lsm_simulcast_system_equalizes_without_config(self, tmp_path):
        """Round 5 (VERDICT weak 5 'auto-engage'): a Phase 1 LSM trunking
        system on a simulcast channel converges to an equalized lock with
        NO equalizer configuration — the auto policy compiles the echo
        fit in (41 taps), the hysteresis holds identity until the fit is
        decisive, and the runtime guard keeps off-center slots inert."""
        import time

        from tests.test_trunking import make_p25_cc_iq
        from wavecap_tpu.capture import CaptureManager
        from wavecap_tpu.devices import FakeDriver, FakeStation
        from wavecap_tpu.trunking import TrunkingManager
        from wavecap_tpu.trunking.config import TrunkingSystemConfig

        rate = 800_000
        center = 851.5e6
        cc = 851.3e6  # -200 kHz = exactly bin -8 of the 25 kHz grid
        iq0 = make_p25_cc_iq(rate, cc - center, n_frames=40, modulation="cqpsk")
        d = 64  # 80 us echo: integer delay at 800k AND 50k
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))  # notch-at-DC phase: 0 CRC unequalized
        st = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
        st.iq_loop = (iq0 + echo).astype(np.complex64)
        mgr = CaptureManager(FakeDriver(stations=[st]))
        tm = TrunkingManager(mgr, state_dir=tmp_path)
        cfg = TrunkingSystemConfig(
            id="lsm1",
            control_channels=[cc],
            center_hz=center,
            sample_rate=rate,
            modulation="cqpsk",
            max_voice_channels=1,
            recording_dir=str(tmp_path / "rec"),
            # NOTE: equalizer_taps deliberately NOT set
        )
        assert cfg.effective_equalizer_taps == 41
        sys_ = tm.create_system(cfg)
        sys_.start()
        try:
            t0 = time.time()
            while time.time() - t0 < 300:
                s = sys_.status()
                if s["synced"] and s["tsbkCount"] >= 10:
                    break
                time.sleep(0.25)
            s = sys_.status()
            assert s["synced"], s
            assert s["tsbkCrcRate"] >= 0.5, s
            assert s["equalizerTaps"] == 41
        finally:
            tm.stop_all()

    def test_simulcast_echo_cc_through_engine(self):
        """p25_equalizer_taps plumbs through the capture pipeline: a CC
        with a near-equal-power 70 us echo decodes through the vmapped
        C4FM bank with the equalizer enabled (it is 0.00 CRC without)."""
        import time

        from tests.test_trunking import make_p25_cc_iq
        from wavecap_tpu.capture import (
            CaptureConfig,
            CaptureManager,
            ChannelSpec,
        )
        from wavecap_tpu.devices import FakeDriver, FakeStation
        from wavecap_tpu.trunking.control import ControlChannelMonitor

        rate = 800_000  # M=32 -> true 25 kHz bins, 50 kHz channel rate
        center = 851.5e6
        cc = 851.3e6  # -200 kHz: bin-centered (the equalizer's template
        # assumes an on-bin channel; large fine offsets distort it)
        iq0 = make_p25_cc_iq(rate, cc - center, n_frames=40)
        d = 64  # 80 us: integer delay at BOTH rates (64 @ 800k = 4 @ 50k)
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))  # notch-at-DC phase (fails w/o eq)
        loop = (iq0 + echo).astype(np.complex64)
        st = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
        st.iq_loop = loop
        mgr = CaptureManager(FakeDriver(stations=[st]))
        cap = mgr.create_capture(
            config=CaptureConfig(
                center_hz=center, sample_rate=rate, block_seconds=0.15,
                narrow_capacity=0, wide_capacity=0, p25_capacity=1,
                p25_equalizer_taps=127,
            )
        )
        ch = cap.create_channel(
            ChannelSpec(id="cc", mode="p25", frequency_hz=cc)
        )
        mon = ControlChannelMonitor(on_tsbk=lambda *a: None)
        sub = ch.symbols.subscribe(maxsize=64)
        cap.start()
        try:
            t0 = time.time()
            while time.time() - t0 < 240 and mon.stats.tsbk_total < 30:
                got = sub.get_nowait()
                if got is None:
                    time.sleep(0.05)
                    continue
                mon.process_symbols(np.asarray(got["soft"]))
        finally:
            sub.close()
            cap.stop()
        assert mon.stats.tsbk_total >= 15, mon.stats
        assert mon.stats.crc_rate >= 0.7, mon.stats
