"""AMBE+2 half-rate vocoder: FEC layer + codec round trip.

Mirrors test_imbe_vocoder's strategy for the half-rate path the reference
never implements natively (it requires external DSD-FME/libmbe)."""

import numpy as np
import pytest

from wavecap_tpu.decoders.ambe_vocoder import (
    AmbeDecoder,
    AmbeEncoder,
    B_BITS,
    FRAME_BITS,
    ambe_fec_decode,
    ambe_fec_encode,
)


def dominant_freq(x: np.ndarray, fs: int = 8000) -> float:
    seg = x - np.mean(x)
    s = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    return float(np.fft.rfftfreq(len(seg), 1 / fs)[np.argmax(s)])


class TestAmbeFec:
    def test_roundtrip_clean(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            b = rng.integers(0, 2, B_BITS).astype(np.uint8)
            frame = ambe_fec_encode(b)
            assert frame.shape == (FRAME_BITS,)
            out = ambe_fec_decode(frame)
            assert out is not None
            dec, errors = out
            assert errors == 0
            assert np.array_equal(dec, b)

    def test_corrects_errors_in_protected_words(self):
        rng = np.random.default_rng(11)
        b = rng.integers(0, 2, B_BITS).astype(np.uint8)
        frame = ambe_fec_encode(b)
        # 3 errors in C0 + 3 in C1 (positions via the interleave map:
        # serial index i lands at (i % 6) * 12 + i // 6)
        corrupted = frame.copy()
        for serial_idx in (0, 7, 20, 25, 30, 44):
            corrupted[(serial_idx % 6) * 12 + serial_idx // 6] ^= 1
        out = ambe_fec_decode(corrupted)
        assert out is not None
        dec, errors = out
        assert np.array_equal(dec, b)
        assert errors == 6

    def test_unrecoverable_c0_returns_none(self):
        b = np.zeros(B_BITS, np.uint8)
        frame = ambe_fec_encode(b)
        corrupted = frame.copy()
        # 4 errors inside C0: beyond correction (t=3), within detection
        # (d=8) — 5+ could alias onto a wrong codeword instead
        for serial_idx in (0, 5, 9, 14):
            corrupted[(serial_idx % 6) * 12 + serial_idx // 6] ^= 1
        assert ambe_fec_decode(corrupted) is None

    def test_unprotected_bits_pass_through(self):
        rng = np.random.default_rng(3)
        b = rng.integers(0, 2, B_BITS).astype(np.uint8)
        frame = ambe_fec_encode(b)
        out = ambe_fec_decode(frame)
        assert out is not None and np.array_equal(out[0][24:], b[24:])


class TestAmbeCodec:
    def make_voiced(self, f0=150.0, seconds=0.6, fs=8000):
        t = np.arange(int(seconds * fs)) / fs
        x = np.zeros_like(t)
        for k, a in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.2)):
            x += a * np.sin(2 * np.pi * f0 * k * t)
        return (0.3 * x / np.max(np.abs(x))).astype(np.float32)

    def test_roundtrip_preserves_pitch(self):
        audio = self.make_voiced(150.0)
        frames = AmbeEncoder().encode(audio)
        assert frames.shape[0] >= 25 and frames.shape[1] == FRAME_BITS
        pcm = AmbeDecoder().decode_frames(frames)
        assert pcm is not None and len(pcm) == frames.shape[0] * 160
        # skip the attack; pitch must survive the codec
        f = dominant_freq(pcm[800:])
        assert abs(f - 150.0) < 20.0, f
        assert np.max(np.abs(pcm)) > 0.02

    def test_concealment_decays(self):
        audio = self.make_voiced(200.0)
        frames = AmbeEncoder().encode(audio)
        dec = AmbeDecoder()
        dec.decode_frames(frames)
        lost = np.concatenate([dec.decode_frame(None) for _ in range(12)])
        head = float(np.sqrt(np.mean(lost[:320] ** 2)))
        tail = float(np.sqrt(np.mean(lost[-320:] ** 2)))
        assert tail < head * 0.5

    def test_empty_input(self):
        assert AmbeDecoder().decode_frames(np.zeros((0, 72), np.uint8)) is None
        assert AmbeEncoder().encode(np.zeros(10, np.float32)).shape == (0, 72)

    def test_garbage_frames_stay_bounded(self):
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 2, (30, FRAME_BITS)).astype(np.uint8)
        pcm = AmbeDecoder().decode_frames(frames)
        if pcm is not None:
            assert np.max(np.abs(pcm)) <= 1.0


class TestDmrVoiceEndToEnd:
    def test_tone_survives_dmr_superframe_chain(self):
        """Encoder PCM -> AMBE frames -> DMR voice superframe dibits ->
        soft symbols -> voice tracker -> vocoder -> pitch preserved."""
        from wavecap_tpu.decoders.dmr import (
            DIBIT_SYMBOLS,
            DMRVoiceTracker,
            build_voice_superframe,
        )

        t = np.arange(int(0.6 * 8000)) / 8000.0
        x = np.zeros_like(t)
        for k, a in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.2)):
            x += a * np.sin(2 * np.pi * 150.0 * k * t)
        audio = (0.3 * x / np.max(np.abs(x))).astype(np.float32)
        frames = AmbeEncoder().encode(audio)
        assert frames.shape[0] >= 18
        # frames that round-tripped the superframe must decode identically
        dibits = build_voice_superframe(ambe_bits=frames[:18])
        soft = DIBIT_SYMBOLS[dibits]
        tracker = DMRVoiceTracker()
        sfs = tracker.process(np.concatenate([soft, np.zeros(600, np.float32)]))
        assert len(sfs) == 1
        assert np.array_equal(sfs[0].ambe_bits, frames[:18])
        pcm = AmbeDecoder().decode_frames(sfs[0].ambe_bits)
        assert pcm is not None and len(pcm) == 18 * 160
        f = dominant_freq(pcm[800:])
        assert abs(f - 150.0) < 20.0, f


class TestPhase2VoiceBursts:
    def test_burst_roundtrip_with_and_without_sync(self):
        from wavecap_tpu.decoders.p25_phase2 import (
            build_voice_burst,
            extract_voice_frames,
        )

        rng = np.random.default_rng(9)
        frames = rng.integers(0, 2, (4, 72)).astype(np.uint8)
        for with_sync in (False, True):
            burst = build_voice_burst(frames, with_sync=with_sync)
            assert burst.shape == (180,)
            out = extract_voice_frames(burst)
            assert np.array_equal(out, frames)

    def test_voice_through_fragment_detector(self):
        """Fragment with encoder voice bursts -> detector -> extracted
        frames -> vocoder PCM with the pitch intact."""
        from wavecap_tpu.decoders.p25_phase2 import (
            DIBIT_SYMBOLS,
            FRAGMENT_DIBITS,
            P25P2SuperFrameDetector,
            build_test_fragment,
            build_voice_burst,
            extract_voice_frames,
        )

        t = np.arange(int(0.4 * 8000)) / 8000.0
        x = np.sin(2 * np.pi * 140.0 * t) + 0.4 * np.sin(2 * np.pi * 280.0 * t)
        audio = (0.3 * x / np.max(np.abs(x))).astype(np.float32)
        frames = AmbeEncoder().encode(audio)
        assert frames.shape[0] >= 16
        frag = np.zeros(FRAGMENT_DIBITS, np.uint8)
        # slot-0 bursts are fragment positions 0 and 2 (2 carries sync)
        frag[0:180] = build_voice_burst(frames[0:4])
        frag[180:360] = build_voice_burst(frames[4:8])
        frag[360:540] = build_voice_burst(frames[8:12], with_sync=True)
        frag[540:720] = build_voice_burst(frames[12:16], with_sync=True)
        frag = build_test_fragment(frag)  # stamps the fragment syncs
        soft = DIBIT_SYMBOLS[frag]
        det = P25P2SuperFrameDetector()
        frags = det.process(
            np.concatenate([soft, soft, np.zeros(800, np.float32)])
        )
        assert frags, "fragment not detected"
        dec = AmbeDecoder()
        pcm = []
        for ts, burst in frags[0].bursts():
            if ts != 0:
                continue
            pcm.append(dec.decode_frames(extract_voice_frames(burst)))
        pcm = np.concatenate([p for p in pcm if p is not None])
        assert len(pcm) == 8 * 160
        f = dominant_freq(pcm[320:])
        assert abs(f - 140.0) < 25.0, f


class TestPureToneVoicing:
    def test_pure_sine_roundtrips_voiced(self):
        """A single-harmonic tone must decode as voiced pitch, not noise
        (the band voicing vote is energy-weighted, so empty neighbor
        harmonics can't out-vote the one carrying the signal)."""
        t = np.arange(int(0.6 * 8000)) / 8000.0
        tone = (0.3 * np.sin(2 * np.pi * 160.0 * t)).astype(np.float32)
        frames = AmbeEncoder().encode(tone)
        pcm = AmbeDecoder().decode_frames(frames)
        f = dominant_freq(pcm[800:])
        assert abs(f - 160.8) < 15.0, f  # 160.8 = 7-bit pitch quantization
