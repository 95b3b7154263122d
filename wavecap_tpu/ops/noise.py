"""Impulse noise blanking and spectral noise reduction.

Reference semantics: ``dsp/filters.py:267-344`` (median-baseline impulse
blanker with morphological dilation) and ``dsp/filters.py:346-470`` (STFT
Wiener-gain spectral subtraction).  Both are expressed as fully batched
array ops: the dilation is a max-pool (``lax.reduce_window``) and the STFT
is a framed batched rFFT — no per-sample host loops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def noise_blanker(
    x: jnp.ndarray, threshold_db: float = 10.0, blanking_width: int = 3
) -> jnp.ndarray:
    """Zero out impulses > ``threshold_db`` above the block median level."""
    if x.shape[-1] == 0:
        return x
    mag = jnp.abs(x)
    median = jnp.median(mag, axis=-1, keepdims=True)
    thr = median * (10.0 ** (threshold_db / 20.0))
    mask = (mag > thr).astype(jnp.float32)
    if blanking_width > 0:
        w = 2 * blanking_width + 1
        mask = jax.lax.reduce_window(
            mask,
            0.0,
            jax.lax.max,
            window_dimensions=(1,) * (x.ndim - 1) + (w,),
            window_strides=(1,) * x.ndim,
            padding="SAME",
        )
    blank = mask > 0
    # Reference: no-op when the block's median level is ~zero.
    degenerate = median < 1e-10
    keep = jnp.logical_or(jnp.logical_not(blank), degenerate)
    return jnp.where(keep, x, jnp.zeros_like(x))


def spectral_noise_reduction(
    x: jnp.ndarray,
    reduction_db: float = 12.0,
    fft_size: int = 1024,
    overlap: float = 0.5,
) -> jnp.ndarray:
    """STFT spectral subtraction with Wiener-like soft gain.

    Noise floor per bin = 10th percentile of frame magnitudes; gain =
    ``max(0.1, 1 - (noise*k/mag)^2)``; overlap-add reconstruction.
    Output trimmed/padded to input length.
    """
    n = x.shape[-1]
    if n < fft_size:
        return x
    hop = int(fft_size * (1.0 - overlap))
    n_frames = (n - fft_size) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(fft_size)[None, :]
    win = jnp.asarray(np.hanning(fft_size).astype(np.float32))

    frames = x[..., jnp.asarray(idx)] * win
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec)
    noise_floor = jnp.percentile(mag, 10.0, axis=-2, keepdims=True)
    k = 10.0 ** (reduction_db / 20.0)
    gain = jnp.maximum(0.0, 1.0 - (noise_floor * k / jnp.maximum(mag, 1e-10)) ** 2)
    gain = jnp.maximum(gain, 0.1)
    clean = jnp.fft.irfft(spec * gain, fft_size, axis=-1).astype(jnp.float32) * win

    # Overlap-add (scatter-add over frame positions) with window-power comp.
    out_len = (n_frames - 1) * hop + fft_size
    flat_idx = jnp.asarray(idx.reshape(-1))
    y = jnp.zeros(x.shape[:-1] + (out_len,), jnp.float32)
    y = y.at[..., flat_idx].add(clean.reshape(clean.shape[:-2] + (-1,)))
    wsum = jnp.zeros((out_len,), jnp.float32)
    wsum = wsum.at[flat_idx].add(jnp.tile(win * win, n_frames))
    y = y / jnp.maximum(wsum, 1e-6)
    if out_len < n:
        y = jnp.concatenate([y, x[..., out_len:]], axis=-1)
    return y[..., :n]
