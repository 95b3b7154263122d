"""Block-segmentation invariance: the central correctness property of the
carry-state design.  Processing a signal in B-sample blocks must equal
processing it in 2B-sample blocks, because all streaming state (FIR tails,
NCO phase words, scan carries) is explicit.  The reference relies on
scipy's zi for the same property (``dsp/filters.py:558``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from wavecap_tpu import models
from tests.conftest import make_fm_signal, make_tone


def run_blocks(mode, cfg, x, block):
    spec = models.get_demod(mode)
    state = spec.init(cfg)
    parts = []
    for i in range(0, len(x), block):
        y, state = spec.demod(jnp.asarray(x[i : i + block]), state, cfg)
        parts.append(np.asarray(y))
    return np.concatenate(parts)


FS = 240_000
BLOCK = 24_000  # divisible by every resampling factor in the chain


@pytest.mark.parametrize("mode", ["wbfm", "nbfm", "am", "sam", "usb"])
def test_segmentation_invariance(mode, rng):
    if mode == "wbfm":
        x = make_fm_signal(1000.0, FS, 4 * BLOCK, deviation_hz=50_000.0)
    elif mode == "nbfm":
        x = make_fm_signal(800.0, FS, 4 * BLOCK, deviation_hz=3_000.0)
    else:
        x = (make_tone(1000.0, FS, 4 * BLOCK) * 0.5).astype(np.complex64)
        x = x + 0.001 * (
            rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x))
        ).astype(np.complex64)
    cfg = models.make_config(mode, FS, audio_rate=48_000)
    a = run_blocks(mode, cfg, x, BLOCK)
    b = run_blocks(mode, cfg, x, 2 * BLOCK)
    assert a.shape == b.shape
    # identical math, different jit programs: tolerance is fp accumulation
    err = np.abs(a - b)
    scale = max(1e-6, float(np.abs(a).max()))
    assert float(err.max()) / scale < 5e-3, float(err.max()) / scale


DSP_VARIANTS = [
    # notches away from the program tone: a notch ON the program content
    # makes the per-block RMS normalization gain depend on block length
    # (documented non-invariance of blockwise normalization, not of the
    # filter state, whose carry test_channel_dsp pins)
    ("nbfm", {"notch_frequencies": (2000.0, 2600.0)}),
    ("nbfm", {"enable_deemphasis": True, "deemphasis_tau": 50e-6}),
    ("nbfm", {"filter_impl": "fir"}),
    ("wbfm", {"enable_highpass": True, "notch_frequencies": (5000.0,)}),
    ("am", {"enable_agc": True, "notch_frequencies": (3000.0,)}),
    ("usb", {"bandpass_low": 200.0, "bandpass_high": 2800.0}),
]


@pytest.mark.parametrize("mode,dsp", DSP_VARIANTS)
def test_dsp_variant_segmentation_invariance(mode, dsp, rng):
    """Per-channel DSP overrides (API-reachable since the ChannelSettings
    surface landed) must preserve the carry-state contract.  Noise blanker
    and spectral NR are deliberately absent: both are block-local
    nonlinearities (per-block statistics) with no invariance claim."""
    if mode == "wbfm":
        x = make_fm_signal(1000.0, FS, 4 * BLOCK, deviation_hz=50_000.0)
    elif mode == "nbfm":
        x = make_fm_signal(800.0, FS, 4 * BLOCK, deviation_hz=3_000.0)
    else:
        x = (make_tone(1000.0, FS, 4 * BLOCK) * 0.5).astype(np.complex64)
        x = x + 0.001 * (
            rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x))
        ).astype(np.complex64)
    cfg = models.make_config(mode, FS, audio_rate=48_000, **dsp)
    a = run_blocks(mode, cfg, x, BLOCK)
    b = run_blocks(mode, cfg, x, 2 * BLOCK)
    assert a.shape == b.shape
    err = np.abs(a - b)
    scale = max(1e-6, float(np.abs(a).max()))
    assert float(err.max()) / scale < 5e-3, float(err.max()) / scale


def test_channelizer_segmentation_invariance(rng):
    from wavecap_tpu.ops.channelizer import (
        ChannelizerConfig,
        channelize,
        channelizer_init,
    )

    cfg = ChannelizerConfig(sample_rate=800_000.0, channel_bandwidth=25_000.0)
    m = cfg.channel_count
    n = 16 * m * 8
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    def run(block):
        st = channelizer_init(cfg)
        outs = []
        for i in range(0, n, block):
            y, st = channelize(jnp.asarray(x[i : i + block]), st, cfg)
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    a = run(4 * m * 8)
    b = run(8 * m * 8)
    np.testing.assert_allclose(a, b, atol=1e-4)
