"""Pallas banked-FIR kernel vs the reference conv implementation."""

import numpy as np
import pytest
from scipy import signal as sps

import jax.numpy as jnp

from wavecap_tpu import ops
from wavecap_tpu.ops.pallas.fir_bank import fir_bank_stream, fir_bank_valid


class TestPallasFirBank:
    def test_matches_scipy(self, rng):
        c, n, t = 16, 1024, 127
        taps = sps.firwin(t, 0.2).astype(np.float32)
        x = rng.standard_normal((c, n + t - 1)).astype(np.float32)
        y = np.asarray(fir_bank_valid(jnp.asarray(x), jnp.asarray(taps)))
        assert y.shape == (c, n)
        for ci in range(0, c, 5):
            expected = np.convolve(x[ci], taps, mode="valid")
            np.testing.assert_allclose(y[ci], expected, atol=1e-4)

    def test_unaligned_shapes(self, rng):
        c, n, t = 5, 700, 63  # not multiples of the tile sizes
        taps = sps.firwin(t, 0.3).astype(np.float32)
        x = rng.standard_normal((c, n + t - 1)).astype(np.float32)
        y = np.asarray(fir_bank_valid(jnp.asarray(x), jnp.asarray(taps)))
        assert y.shape == (c, n)
        expected = np.convolve(x[2], taps, mode="valid")
        np.testing.assert_allclose(y[2], expected, atol=1e-4)

    def test_streaming_matches_fir_filter(self, rng):
        c, n, t = 8, 2048, 91
        taps = jnp.asarray(sps.firwin(t, 0.1).astype(np.float32))
        x = rng.standard_normal((c, n)).astype(np.float32)
        tails = jnp.zeros((c, t - 1), jnp.float32)
        y1, tails1 = fir_bank_stream(jnp.asarray(x[:, : n // 2]), taps, tails)
        y2, _ = fir_bank_stream(jnp.asarray(x[:, n // 2 :]), taps, tails1)
        stitched = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
        taps_np = np.asarray(taps)
        for ci in range(c):
            ref = sps.lfilter(taps_np, 1.0, x[ci])
            np.testing.assert_allclose(stitched[ci], ref, atol=1e-4)
