"""Planar (f32-pair) kernels match the complex implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from wavecap_tpu import ops
from wavecap_tpu.ops import planar
from wavecap_tpu.ops.channelizer import ChannelizerConfig, channelize, channelizer_init
from tests.conftest import make_noise, make_tone, snr_db


class TestPlanarOps:
    def test_freq_shift_matches_complex(self, rng):
        x = make_noise(rng, 4096)
        fs = 48_000
        yc, _ = ops.freq_shift(jnp.asarray(x), 5000.0, fs)
        yr, yi, _ = planar.planar_freq_shift(
            jnp.asarray(x.real), jnp.asarray(x.imag), 5000.0, fs
        )
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yc.real), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(yc.imag), atol=1e-5)

    def test_quad_demod_matches_complex(self, rng):
        fs = 48_000
        t = np.arange(6000) / fs
        iq = np.exp(1j * 2 * np.pi * 3000 * np.cumsum(np.sin(2 * np.pi * 5 * t)) / fs).astype(
            np.complex64
        )
        ac, _ = ops.quadrature_demod(jnp.asarray(iq), fs, ops.fm_discriminator_init())
        ap, _, _ = planar.planar_quadrature_demod(
            jnp.asarray(iq.real),
            jnp.asarray(iq.imag),
            fs,
            jnp.zeros(()),
            jnp.zeros(()),
        )
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ac), atol=1e-5)

    def test_dft_matmul_matches_fft(self, rng):
        x = make_noise(rng, 256)
        ref = np.fft.fft(x)
        yr, yi = planar.planar_matmul_dft(
            jnp.asarray(x.real)[None, :], jnp.asarray(x.imag)[None, :], 256
        )
        got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
        assert snr_db(ref.real, got.real) > 55

    def test_factored_dft_matches_fft(self, rng):
        """Round 5: the two-stage Cooley-Tukey matmul DFT (14x fewer
        FLOPs at m=800, took the headline 1390->2470 Msps) must match
        numpy fft forward AND inverse at f32-dot accuracy, across
        factorable sizes including the production m=800 and m=96."""
        for m in (800, 96, 640, 64):
            assert planar._dft_factor(m) is not None
            x = make_noise(rng, 3 * m).reshape(3, m)
            for inverse in (False, True):
                ref = np.fft.ifft(x) * m if inverse else np.fft.fft(x)
                yr, yi = planar.planar_factored_dft(
                    jnp.asarray(x.real), jnp.asarray(x.imag), m,
                    inverse=inverse,
                )
                got = np.asarray(yr) + 1j * np.asarray(yi)
                err = np.linalg.norm(ref - got) / np.linalg.norm(ref)
                assert err < 1e-5, (m, inverse, err)
        # prime-ish sizes have no factorization and stay on the single
        # matmul path
        assert planar._dft_factor(38) is None

    def test_channelizer_matches_complex(self, rng):
        cfg = ChannelizerConfig(sample_rate=200_000.0, channel_bandwidth=25_000.0)
        x = make_noise(rng, 8 * 400)
        yc, _ = channelize(jnp.asarray(x), channelizer_init(cfg), cfg)
        yr, yi, _ = planar.planar_channelize(
            jnp.asarray(x.real),
            jnp.asarray(x.imag),
            planar.planar_channelizer_init(cfg),
            cfg,
        )
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.asarray(yc)
        assert snr_db(ref.real.ravel(), got.real.ravel()) > 50
        assert snr_db(ref.imag.ravel(), got.imag.ravel()) > 50

    def test_spectrum_matches_complex(self, rng):
        x = make_tone(100_000.0, 1_024_000, 2048)
        ref = np.asarray(ops.power_spectrum(jnp.asarray(x), 2048))
        got = np.asarray(
            planar.planar_power_spectrum(
                jnp.asarray(x.real), jnp.asarray(x.imag), 2048
            )
        )
        # peak location identical, dB values close in the high-power bins
        assert int(np.argmax(got)) == int(np.argmax(ref))
        strong = ref > -60
        np.testing.assert_allclose(got[strong], ref[strong], atol=0.5)
