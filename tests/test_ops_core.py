"""Parity of the kernel library against scipy/numpy references.

Mirrors the reference's unit-DSP tier (reference ``tests/unit/test_dsp_core.py``):
every op is checked against an independent scipy/numpy computation on
synthetic signals, plus streaming-continuity checks (block-split output ==
one-shot output) which the TPU block pipeline depends on.
"""

import numpy as np
import pytest
from scipy import signal as sps

import jax.numpy as jnp

from wavecap_tpu import ops
from tests.conftest import make_tone, make_noise, snr_db


class TestNCO:
    def test_freq_shift_matches_numpy(self):
        fs, n = 48_000, 4096
        x = make_tone(1000.0, fs, n)
        y, _ = ops.freq_shift(jnp.asarray(x), 5000.0, fs)
        t = np.arange(n) / fs
        expected = x * np.exp(2j * np.pi * 5000.0 * t)
        assert snr_db(expected.real, np.asarray(y.real)) > 80

    def test_phase_continuity_across_blocks(self):
        fs, n = 240_000, 9000
        x = np.ones(n, np.complex64)
        one, _ = ops.freq_shift(jnp.asarray(x), 12_345.0, fs)
        ph = jnp.uint32(0)
        parts = []
        for i in range(0, n, 3000):
            y, ph = ops.freq_shift(jnp.asarray(x[i : i + 3000]), 12_345.0, fs, ph)
            parts.append(np.asarray(y))
        stitched = np.concatenate(parts)
        np.testing.assert_allclose(stitched, np.asarray(one), atol=1e-5)

    def test_traced_offset_close_to_static(self):
        fs, n = 48_000, 4096
        x = np.ones(n, np.complex64)
        ys, _ = ops.freq_shift(jnp.asarray(x), 5000.0, fs)
        yd, _ = ops.freq_shift(jnp.asarray(x), jnp.float32(5000.0), fs)
        assert snr_db(np.asarray(ys.real), np.asarray(yd.real)) > 60


class TestFIR:
    def test_matches_lfilter(self, rng):
        taps = sps.firwin(63, 0.2).astype(np.float32)
        x = make_noise(rng, 5000)
        y, _ = ops.fir_filter(jnp.asarray(x), jnp.asarray(taps), ops.fir_init(63))
        expected = sps.lfilter(taps, 1.0, x)
        assert snr_db(expected.real, np.asarray(y.real)) > 80
        assert snr_db(expected.imag, np.asarray(y.imag)) > 80

    def test_long_taps_fft_path(self, rng):
        taps = sps.firwin(1001, 0.02).astype(np.float32)
        x = make_noise(rng, 20000)
        y, _ = ops.fir_filter(jnp.asarray(x), jnp.asarray(taps), ops.fir_init(1001))
        expected = sps.lfilter(taps, 1.0, x)
        assert snr_db(expected.real, np.asarray(y.real)) > 70

    def test_streaming_equals_oneshot(self, rng):
        taps = jnp.asarray(sps.firwin(91, 0.1).astype(np.float32))
        x = make_noise(rng, 8000)
        full, _ = ops.fir_filter(jnp.asarray(x), taps, ops.fir_init(91))
        tail = ops.fir_init(91)
        parts = []
        for i in range(0, 8000, 2000):
            y, tail = ops.fir_filter(jnp.asarray(x[i : i + 2000]), taps, tail)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(full), atol=2e-5
        )

    def test_matmul_conv_path_matches_direct(self, rng, monkeypatch):
        """The TPU MXU banded-matmul conv (round 5: the voice FIR was
        73 % of the fused 800-channel program on the VPU; this path took
        the headline 417 -> 1390 Msps) must be numerically equivalent to
        the direct conv on identical inputs."""
        from wavecap_tpu.ops import fir as fir_ops

        monkeypatch.setenv("WAVECAP_FIR_MATMUL", "1")
        for t in (9, 63, 127, 128):
            taps = sps.firwin(t, 0.2).astype(np.float32)
            for x in (
                rng.standard_normal(5126).astype(np.float32),
                make_noise(rng, 5126),
            ):
                a = np.asarray(
                    fir_ops._conv_valid_direct(jnp.asarray(x), jnp.asarray(taps))
                )
                b = np.asarray(
                    fir_ops.conv_valid(jnp.asarray(x), jnp.asarray(taps))
                )
                assert a.shape == b.shape
                denom = max(float(np.max(np.abs(a))), 1e-9)
                assert float(np.max(np.abs(a - b))) / denom < 2e-5, (t, x.dtype)
        # below the size/taps floor the dispatch stays direct (identical)
        small = rng.standard_normal(100).astype(np.float32)
        taps = sps.firwin(63, 0.2).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fir_ops.conv_valid(jnp.asarray(small), jnp.asarray(taps))),
            np.asarray(
                fir_ops._conv_valid_direct(jnp.asarray(small), jnp.asarray(taps))
            ),
        )

    def test_decimate_matches_lfilter_slice(self, rng):
        taps = sps.firwin(157, 0.03).astype(np.float32)
        x = make_noise(rng, 30000)
        y, _ = ops.fir_decimate(
            jnp.asarray(x), jnp.asarray(taps), 30, ops.fir_init(157)
        )
        expected = sps.lfilter(taps, 1.0, x)[::30]
        assert y.shape[-1] == 1000
        assert snr_db(expected.real, np.asarray(y.real)) > 80

    def test_decimate_streaming(self, rng):
        taps = jnp.asarray(sps.firwin(73, 0.2).astype(np.float32))
        x = make_noise(rng, 16000)
        full, _ = ops.fir_decimate(jnp.asarray(x), taps, 4, ops.fir_init(73))
        tail = ops.fir_init(73)
        parts = []
        for i in range(0, 16000, 4000):
            y, tail = ops.fir_decimate(jnp.asarray(x[i : i + 4000]), taps, 4, tail)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(full), atol=2e-5
        )


class TestResample:
    @pytest.mark.parametrize("in_rate,out_rate", [(2_400_000, 48_000), (50_000, 48_000), (48_000, 8_000), (8_000, 48_000)])
    def test_matches_scipy(self, rng, in_rate, out_rate):
        n = 24_000
        x = np.asarray(make_noise(rng, n).real, np.float32)
        y = ops.resample_poly(jnp.asarray(x), in_rate, out_rate)
        from math import gcd

        g = gcd(in_rate, out_rate)
        expected = sps.resample_poly(x.astype(np.float64), out_rate // g, in_rate // g)
        assert y.shape[-1] == len(expected)
        assert snr_db(expected, np.asarray(y)) > 60


class TestIIR:
    def test_onepole_matches_lfilter(self, rng):
        x = np.asarray(make_noise(rng, 4000).real, np.float32)
        b, a = np.array([0.3]), np.array([1.0, -0.7])
        y, _ = ops.onepole_filter(jnp.asarray(x), 0.3, 0.7, ops.onepole_init())
        expected = sps.lfilter(b, a, x)
        assert snr_db(expected, np.asarray(y)) > 70

    def test_onepole_streaming(self, rng):
        x = np.asarray(make_noise(rng, 6000).real, np.float32)
        full, _ = ops.onepole_filter(jnp.asarray(x), 0.05, 0.95, ops.onepole_init())
        carry = ops.onepole_init()
        parts = []
        for i in range(0, 6000, 1500):
            y, carry = ops.onepole_filter(jnp.asarray(x[i : i + 1500]), 0.05, 0.95, carry)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(parts), np.asarray(full), atol=1e-4)

    @pytest.mark.parametrize(
        "btype,order,cut",
        [("low", 5, (15000.0,)), ("high", 5, (100.0,)), ("band", 4, (300.0, 3000.0))],
    )
    def test_butter_matches_sosfilt(self, rng, btype, order, cut):
        fs = 48_000.0
        x = np.asarray(make_noise(rng, 8000).real, np.float32)
        sos = ops.butter_sos(btype, cut, order, fs)
        z = ops.sos_init(sos.shape[0])
        y, _ = ops.sos_filter(jnp.asarray(x), sos, z)
        expected = sps.sosfilt(sos, x)
        assert snr_db(expected, np.asarray(y)) > 55

    def test_sos_streaming(self, rng):
        fs = 48_000.0
        x = np.asarray(make_noise(rng, 6000).real, np.float32)
        sos = ops.butter_sos("low", (8000.0,), 5, fs)
        full, _ = ops.sos_filter(jnp.asarray(x), sos, ops.sos_init(sos.shape[0]))
        z = ops.sos_init(sos.shape[0])
        parts = []
        for i in range(0, 6000, 2000):
            y, z = ops.sos_filter(jnp.asarray(x[i : i + 2000]), sos, z)
            parts.append(np.asarray(y))
        assert snr_db(np.asarray(full), np.concatenate(parts)) > 80

    def test_deemphasis_response(self):
        # 75us deemphasis: ~ -3 dB at 1/(2*pi*tau) ~= 2122 Hz
        fs = 240_000
        n = 48000
        t = np.arange(n) / fs
        for f, lo, hi in [(100.0, -0.5, 0.05), (2122.0, -3.6, -2.5), (15000.0, -18.0, -15.0)]:
            x = np.sin(2 * np.pi * f * t).astype(np.float32)
            y, _ = ops.deemphasis(jnp.asarray(x), fs, 75e-6, ops.onepole_init())
            ss = np.asarray(y)[n // 2 :]
            gain_db = 20 * np.log10(np.sqrt(2) * ss.std() + 1e-12)
            assert lo < gain_db < hi, (f, gain_db)


class TestAGC:
    def test_agc_levels_signal(self):
        fs = 48_000
        t = np.arange(fs) / fs
        x = (0.01 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        y, _ = ops.apply_agc(jnp.asarray(x), fs, ops.agc_init(), target_db=-20.0)
        rms = float(np.sqrt(np.mean(np.asarray(y[fs // 2 :]) ** 2)))
        target = 10 ** (-20 / 20)
        assert 0.3 * target < rms < 3.0 * target

    def test_agc_limits_gain(self):
        fs = 48_000
        x = np.full(4096, 1e-7, np.float32)
        y, _ = ops.apply_agc(jnp.asarray(x), fs, ops.agc_init(), max_gain_db=60.0)
        assert float(np.abs(np.asarray(y)).max()) < 1e-3

    def test_matches_reference_vectorized_envelope(self, rng):
        # Reference dsp/agc.py:73-108 envelope on random audio
        fs = 48_000
        x = np.abs(np.asarray(make_noise(rng, 8000).real, np.float32))
        ac, rc = 0.2, 0.02
        env_a = sps.lfilter([ac], [1.0, -(1 - ac)], np.abs(x))
        env_r = sps.lfilter([rc], [1.0, -(1 - rc)], env_a)
        expected = np.maximum(env_a, env_r)
        from wavecap_tpu.ops.agc import envelope

        got, _ = envelope(jnp.asarray(x), ac, rc, ops.agc_init())
        assert snr_db(expected, np.asarray(got)) > 70


class TestDemod:
    def test_quadrature_demod_tone(self):
        # FM carrier deviated by steady 10 kHz -> constant output 10/75
        fs, n = 240_000, 8192
        f_dev = 10_000.0
        t = np.arange(n) / fs
        iq = np.exp(2j * np.pi * f_dev * t).astype(np.complex64)
        y, _ = ops.quadrature_demod(jnp.asarray(iq), fs, ops.fm_discriminator_init())
        got = np.asarray(y)[10:]
        np.testing.assert_allclose(got, f_dev / 75_000.0, rtol=1e-3)

    def test_quadrature_demod_block_continuity(self):
        fs, n = 48_000, 6000
        t = np.arange(n) / fs
        phase = 2 * np.pi * 5000 * t + 3 * np.sin(2 * np.pi * 7 * t)
        iq = np.exp(1j * phase).astype(np.complex64)
        full, _ = ops.quadrature_demod(jnp.asarray(iq), fs, ops.fm_discriminator_init())
        carry = ops.fm_discriminator_init()
        parts = []
        for i in range(0, n, 1500):
            y, carry = ops.quadrature_demod(jnp.asarray(iq[i : i + 1500]), fs, carry)
            parts.append(np.asarray(y))
        np.testing.assert_allclose(
            np.concatenate(parts), np.asarray(full), atol=1e-5
        )

    def test_am_envelope(self):
        fs, n = 48_000, 4800
        t = np.arange(n) / fs
        mod = 1.0 + 0.5 * np.sin(2 * np.pi * 1000 * t)
        iq = (mod * np.exp(2j * np.pi * 3000 * t)).astype(np.complex64)
        env = np.asarray(ops.am_envelope(jnp.asarray(iq)))
        assert snr_db(mod, env) > 40


class TestSpectrum:
    def test_tone_peak_location(self):
        fs, nfft = 1_024_000, 1024
        x = make_tone(100_000.0, fs, nfft)
        spec = np.asarray(ops.power_spectrum(jnp.asarray(x), fft_size=nfft))
        peak_bin = int(np.argmax(spec))
        freq = (peak_bin - nfft // 2) * fs / nfft
        assert abs(freq - 100_000.0) <= fs / nfft

    def test_spectrogram_shape(self, rng):
        x = make_noise(rng, 8192)
        s = ops.spectrogram(jnp.asarray(x), fft_size=1024, hop=512)
        assert s.shape == (15, 1024)


class TestClip:
    def test_soft_clip_bounds(self):
        x = jnp.asarray(np.linspace(-10, 10, 101, dtype=np.float32))
        y = np.asarray(ops.soft_clip(x))
        # Reference-exact formula saturates at 0.95/tanh(1.5) ~= 1.0496
        assert np.all(np.abs(y) <= 1.05)
        np.testing.assert_allclose(
            y, np.tanh(np.asarray(x) * 1.5) / np.tanh(1.5) * 0.95, atol=1e-6
        )

    def test_rms_normalize(self, rng):
        x = np.asarray(make_noise(rng, 4000).real, np.float32) * 0.01
        y = np.asarray(ops.rms_normalize(jnp.asarray(x), 0.18))
        assert abs(float(np.sqrt(np.mean(y**2))) - 0.18) < 0.01

    def test_squelch(self):
        audio = jnp.ones((2, 100), jnp.float32)
        rssi = jnp.asarray([-50.0, -90.0])
        out = np.asarray(ops.squelch_gate(audio, rssi, -70.0))
        assert out[0].sum() == 100 and out[1].sum() == 0


class TestFastAtan2:
    def test_accuracy(self, rng):
        from wavecap_tpu.ops.demod import fast_atan2

        y = rng.standard_normal(20000).astype(np.float32)
        x = rng.standard_normal(20000).astype(np.float32)
        got = np.asarray(fast_atan2(jnp.asarray(y), jnp.asarray(x)))
        ref = np.arctan2(y, x)
        assert np.abs(got - ref).max() < 3e-4

    def test_discriminator_fast_matches_exact(self):
        fs, n = 48_000, 24_000
        t = np.arange(n) / fs
        iq = np.exp(1j * 2 * np.pi * 4000 * np.cumsum(np.sin(2 * np.pi * 5 * t)) / fs).astype(np.complex64)
        a_ex, _ = ops.quadrature_demod(jnp.asarray(iq), fs, ops.fm_discriminator_init())
        a_fa, _ = ops.quadrature_demod(
            jnp.asarray(iq), fs, ops.fm_discriminator_init(), atan_impl="fast"
        )
        from tests.conftest import snr_db

        assert snr_db(np.asarray(a_ex), np.asarray(a_fa)) > 70


class TestComplexTapsConv:
    def test_conv_valid_complex_taps_matches_numpy(self):
        """Round-4 regression: the direct conv path silently cast COMPLEX
        taps to f32 (dropping the imaginary part) — invisible with real
        RRC/decimation taps, fatal for the CQPSK echo equalizer."""
        import numpy as np
        import jax.numpy as jnp

        from wavecap_tpu.ops.fir import conv_valid

        rng = np.random.default_rng(5)
        x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(
            np.complex64
        )
        for t in (7, 31):  # both sizes ride the direct path
            w = (
                rng.standard_normal(t) + 1j * rng.standard_normal(t)
            ).astype(np.complex64)
            got = np.asarray(conv_valid(jnp.asarray(x), jnp.asarray(w)))
            ref = np.convolve(x, w, mode="valid")
            assert np.allclose(got, ref, atol=2e-4), np.abs(got - ref).max()
        # real-taps path unchanged
        wr = rng.standard_normal(9).astype(np.float32)
        got = np.asarray(conv_valid(jnp.asarray(x), jnp.asarray(wr)))
        ref = np.convolve(x, wr, mode="valid")
        assert np.allclose(got, ref, atol=2e-4)
