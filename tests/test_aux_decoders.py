"""Auxiliary decoders: RDS, POCSAG; scanner + channel classifier."""

import time

import numpy as np
import pytest

from wavecap_tpu.decoders import pocsag, rds


class TestRDS:
    def test_crc_roundtrip(self):
        for data in (0x1234, 0xABCD, 0x0000, 0xFFFF):
            for name, off in rds.OFFSET_WORDS.items():
                block = (data << 10) | (rds._crc10(data) ^ off)
                assert rds.block_syndrome(block) == off

    def test_group_decode_roundtrip(self):
        # PI 0x484F, group 0A with PS segments
        dec = rds.RDSDecoder(240_000)
        ps = "KEXP 903"
        for seg in range(4):
            b_low = (0 << 11) | (5 << 5) | seg  # version A, PTY 5, segment
            d = (ord(ps[2 * seg]) << 8) | ord(ps[2 * seg + 1])
            bits = rds.encode_group(0x484F, 0, b_low, 0xE201, d)
            dec._bits = np.concatenate([dec._bits, bits])
            dec._decode_groups()
        assert dec.data.pi == 0x484F
        assert dec.data.ps == "KEXP 903"
        assert dec.data.pty == 5

    def test_radiotext(self):
        dec = rds.RDSDecoder(240_000)
        text = "NOW PLAYING - TEST SONG"
        padded = text + " " * (64 - len(text))
        for seg in range(16):
            b_low = (0 << 11) | seg
            c = (ord(padded[4 * seg]) << 8) | ord(padded[4 * seg + 1])
            d = (ord(padded[4 * seg + 2]) << 8) | ord(padded[4 * seg + 3])
            bits = rds.encode_group(0x1111, 2, b_low, c, d)
            dec._bits = np.concatenate([dec._bits, bits])
            dec._decode_groups()
        assert dec.data.radiotext.startswith("NOW PLAYING - TEST SONG")

    def test_physical_layer_roundtrip(self):
        """Modulated 57 kHz subcarrier -> demod -> groups."""
        fs = 240_000
        groups = []
        for seg in range(4):
            b_low = (0 << 11) | seg
            d = (ord("AB"[seg % 2]) << 8) | ord("CD"[seg % 2])
            groups.append(rds.encode_group(0x2345, 0, b_low, 0xE201, d))
        bits = np.concatenate(groups * 8)
        baseband = rds.modulate_rds(bits, fs)
        dec = rds.RDSDecoder(fs)
        n = len(baseband)
        for i in range(0, n - fs // 4, fs // 4):
            dec.process_baseband(baseband[i : i + fs // 4])
        assert dec.data.blocks_ok > 0
        assert dec.data.pi == 0x2345


class TestPOCSAG:
    def test_bch_roundtrip(self):
        for data in (0, 0x12345, 0xFFFFF, 0x1ABCDE & 0x1FFFFF):
            cw = pocsag.bch3121_encode(data)
            assert pocsag.bch3121_check(cw)
            assert not pocsag.bch3121_check(cw ^ (1 << 5) ^ (1 << 17))

    def test_alpha_message_roundtrip(self):
        bits = pocsag.encode_message(133_7003, "HELLO WORLD")
        audio = pocsag.modulate_pocsag(bits, 48_000, 1200)
        dec = pocsag.POCSAGDecoder(48_000, bauds=(1200,))
        msgs = dec.process_audio(audio)
        assert msgs, "no messages decoded"
        assert msgs[0].address == 133_7003
        assert msgs[0].content == "HELLO WORLD"
        assert msgs[0].kind == "alpha"

    def test_numeric_message_roundtrip(self):
        bits = pocsag.encode_message(42, "911 555", numeric=True)
        audio = pocsag.modulate_pocsag(bits, 48_000, 2400)
        dec = pocsag.POCSAGDecoder(48_000, bauds=(2400,))
        msgs = dec.process_audio(audio)
        assert msgs and msgs[0].kind == "numeric"
        assert msgs[0].content == "911 555"

    def test_noise_produces_nothing(self, rng):
        audio = rng.standard_normal(48_000).astype(np.float32)
        dec = pocsag.POCSAGDecoder(48_000)
        assert dec.process_audio(audio) == []


class TestClassifier:
    def test_control_vs_voice(self, rng):
        from wavecap_tpu.capture.classifier import ChannelClassifier

        fs, nfft = 800_000, 1024
        clf = ChannelClassifier(851e6, fs, nfft)
        bin_hz = fs / nfft
        control_bin = nfft // 2 + 100
        voice_bin = nfft // 2 - 150
        for frame_i in range(200):
            spec = rng.normal(-95.0, 2.0, nfft).astype(np.float32)
            spec[control_bin] = -40.0 + rng.normal(0, 1)  # steady
            if (frame_i // 20) % 2 == 0:  # bursty
                spec[voice_bin] = -45.0 + rng.normal(0, 2)
            clf.update(spec)
        chans = clf.classify(min_occupancy=0.15)
        kinds = {round(c.frequency_hz): c.kind for c in chans}
        f_control = round(851e6 + 100 * bin_hz)
        f_voice = round(851e6 - 150 * bin_hz)
        assert kinds.get(f_control) == "control", chans
        assert f_voice in kinds and kinds[f_voice] in ("voice", "data")


class TestScanner:
    def test_scans_and_holds_on_activity(self):
        from wavecap_tpu.capture.scanner import (
            ScanEntry,
            ScanMode,
            ScannerConfig,
            ScannerService,
        )

        class FakeChannel:
            rssi_db = -120.0

        class FakeCapture:
            def __init__(self):
                self.channels = {"s1": FakeChannel()}
                self.tunes = []

            def update_channel(self, cid, frequency_hz=None, **kw):
                self.tunes.append(frequency_hz)

        cap = FakeCapture()
        cfg = ScannerConfig(
            entries=[
                ScanEntry(155.0e6),
                ScanEntry(155.1e6),
                ScanEntry(155.2e6, locked_out=True),
            ],
            dwell_s=0.05,
            hold_s=0.2,
            squelch_db=-60,
        )
        svc = ScannerService(cap, "s1", cfg)
        svc.start()
        time.sleep(0.4)
        assert 155.0e6 in cap.tunes and 155.1e6 in cap.tunes
        assert 155.2e6 not in cap.tunes  # locked out
        # activity on current freq -> hold
        cap.channels["s1"].rssi_db = -30.0
        time.sleep(0.3)
        assert svc.state == "holding"
        n_tunes = len(cap.tunes)
        time.sleep(0.2)
        assert len(cap.tunes) == n_tunes  # not scanning while holding
        cap.channels["s1"].rssi_db = -120.0
        time.sleep(0.6)
        assert svc.state == "scanning"
        svc.stop()
        assert svc.state == "stopped"
