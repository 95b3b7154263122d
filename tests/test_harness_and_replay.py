"""End-to-end harness (reference harness.py KEXP tier) + file-replay
driver: the framework's own correctness harness must produce an audible
report with the right tone, and IQ WAVs must replay through the full
capture stack."""

import argparse
import asyncio

import numpy as np
import pytest

from wavecap_tpu.devices.file_replay import FileReplayDriver
from wavecap_tpu.harness import run_harness
from wavecap_tpu.utils.wavio import read_audio_wav, write_iq_wav


class TestHarness:
    def test_tone_preset_end_to_end(self, tmp_path):
        """The tone preset (fake NBFM station) must report the expected
        dominant audio frequency and write WAV + JSON artifacts."""
        args = argparse.Namespace(
            preset="tone", duration=1.5, iq_file=None, out_dir=str(tmp_path)
        )
        report = asyncio.run(run_harness(args))
        assert report.samples >= 1.5 * 48_000
        assert report.rms > 0.01
        assert abs(report.dominant_hz - 1000.0) < 25.0, report
        audio, rate = read_audio_wav(report.wav_path)
        assert rate == 48_000 and len(audio) == report.samples
        assert (tmp_path / "harness_tone.json").exists()

    def test_p25_trunk_preset_locks_and_grants(self, tmp_path):
        """The p25-trunk preset boots the whole trunking stack against a
        synthesized control channel and reports lock + a followed call."""
        from wavecap_tpu.harness import run_trunking_harness

        args = argparse.Namespace(
            preset="p25-trunk", duration=3.0, iq_file=None,
            out_dir=str(tmp_path),
        )
        report = asyncio.run(run_trunking_harness(args))
        assert report["synced"], report
        assert report["nac"] == 0x293
        assert report["tsbkCount"] > 3 and report["tsbkCrcRate"] > 0.5, report
        # post-acquisition the chain must be essentially lossless on clean
        # synthesized IQ (reference's offline anchor is 90.7 % on a real
        # recording, trunking/system.py:1300-1305; a synthetic channel
        # decodes near-1.0 once the timing/gain transient is excluded)
        assert report["tsbkCountSteady"] >= 30, report
        assert report["tsbkCrcRateSteady"] >= 0.95, report
        assert report["systemId"] == 0x123 and report["calls"] >= 1
        assert (tmp_path / "harness_p25-trunk.json").exists()

    def test_p25_phase2_trunk_preset_locks_on_lsm_cc(self, tmp_path):
        """The p25-phase2-trunk preset drives the dual-rate Phase 2
        capture: a CQPSK/LSM control channel (loop-continuous pi/4-DQPSK,
        modulate_cqpsk_cyclic) must lock with near-lossless steady CRC
        and follow a grant."""
        from wavecap_tpu.harness import run_trunking_harness

        args = argparse.Namespace(
            preset="p25-phase2-trunk", duration=3.0, iq_file=None,
            out_dir=str(tmp_path),
        )
        report = asyncio.run(run_trunking_harness(args))
        assert report["synced"], report
        assert report["nac"] == 0x293
        assert report["tsbkCountSteady"] >= 30, report
        assert report["tsbkCrcRateSteady"] >= 0.95, report
        assert report["systemId"] == 0x123 and report["calls"] >= 1
        assert (tmp_path / "harness_p25-phase2-trunk.json").exists()


class TestFileReplay:
    def make_wav(self, tmp_path, n=48_000, rate=800_000):
        t = np.arange(n) / rate
        iq = (0.5 * np.exp(2j * np.pi * 12_345.0 * t)).astype(np.complex64)
        p = tmp_path / "replay.wav"
        write_iq_wav(p, iq, rate)
        return p, iq, rate

    def test_stream_loops_seamlessly(self, tmp_path):
        from wavecap_tpu.devices.base import DeviceConfig

        p, iq, rate = self.make_wav(tmp_path, n=10_000)
        driver = FileReplayDriver(str(p))
        devices = driver.enumerate()
        assert devices and devices[0].driver == "file"
        dev = driver.open(devices[0].id)
        dev.configure(DeviceConfig(center_hz=100e6, sample_rate=rate))
        stream = dev.start_stream()
        a, overflow = stream.read(7_000)
        b, _ = stream.read(7_000)
        assert not overflow and len(a) == 7_000 and len(b) == 7_000
        # loop: b's tail wraps to the file's head
        joined = np.concatenate([a, b])
        # int16 WAV quantization tolerance
        assert np.allclose(joined[10_000:10_500], iq[:500], atol=1e-3)
        stream.close()
        with pytest.raises(RuntimeError):
            stream.read(10)

    def test_non_loop_pads_zeros(self, tmp_path):
        from wavecap_tpu.devices.file_replay import FileReplayStream

        _, iq, _ = self.make_wav(tmp_path, n=1000)
        s = FileReplayStream(iq, loop=False)
        out, _ = s.read(1500)
        assert np.allclose(out[:1000], iq, atol=1e-6)
        assert np.all(out[1000:] == 0)
        assert s.exhausted
