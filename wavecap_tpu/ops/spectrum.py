"""Windowed FFT power spectrum for the waterfall/spectrum stream.

Reference semantics: ``dsp/fft/base.py:31`` — Hann window, power in dB,
fftshift, 2048-point default.  On TPU the FFT is XLA's batched FFT; a
whole block of frames is transformed at once (the reference computes one
frame per chunk at an adaptive FPS — we compute every frame and let the
serving layer subsample).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=16)
def _hann(n: int) -> np.ndarray:
    return np.hanning(n).astype(np.float32)


def power_spectrum(
    iq: jnp.ndarray, fft_size: int = 2048, ref_level: float = 1.0
) -> jnp.ndarray:
    """Single power spectrum (dB, fftshifted) of the first frame of ``iq``."""
    frame = iq[..., :fft_size]
    if frame.shape[-1] < fft_size:  # short/empty block: zero-pad the frame
        pad = [(0, 0)] * (frame.ndim - 1) + [(0, fft_size - frame.shape[-1])]
        frame = jnp.pad(frame, pad)
    win = jnp.asarray(_hann(fft_size))
    spec = jnp.fft.fftshift(jnp.fft.fft(frame * win, axis=-1), axes=-1)
    p = (jnp.abs(spec) ** 2) / (np.float32(fft_size) * ref_level)
    return (10.0 * jnp.log10(jnp.maximum(p, 1e-20))).astype(jnp.float32)


def spectrogram(
    iq: jnp.ndarray,
    fft_size: int = 2048,
    hop: int | None = None,
    average: int = 1,
) -> jnp.ndarray:
    """All frames of the block: ``(..., n_frames, fft_size)`` dB spectra."""
    hop = hop or fft_size
    n = iq.shape[-1]
    n_frames = max((n - fft_size) // hop + 1, 0)
    if n_frames == 0:
        return jnp.zeros(iq.shape[:-1] + (0, fft_size), jnp.float32)
    if hop == fft_size:
        # contiguous framing is a free reshape; the gather below on a
        # multi-Msample block forces a full-size index relayout on TPU
        k = n_frames * fft_size
        frames = iq[..., :k].reshape(iq.shape[:-1] + (n_frames, fft_size))
    else:
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(fft_size)[None, :])
        frames = iq[..., jnp.asarray(idx)]
    win = jnp.asarray(_hann(fft_size))
    spec = jnp.fft.fftshift(jnp.fft.fft(frames * win, axis=-1), axes=-1)
    p = (jnp.abs(spec) ** 2) / np.float32(fft_size)
    if average > 1:
        k = (n_frames // average) * average
        p = p[..., :k, :].reshape(p.shape[:-2] + (-1, average, fft_size)).mean(-2)
    return (10.0 * jnp.log10(jnp.maximum(p, 1e-20))).astype(jnp.float32)


def spectrogram_sampled(
    iq: jnp.ndarray,
    fft_size: int = 2048,
    n_out: int = 2,
    avg: int = 8,
) -> jnp.ndarray:
    """``n_out`` averaged dB spectra from ``n_out*avg`` SAMPLED windows.

    Waterfall UIs show ~10 fps and the classifier needs a variance
    estimate, not every sample: FFT-ing a whole multi-Msps block
    (``spectrogram``) spends hundreds of ms/s on frames that are
    immediately averaged away (round-4 bisect).  This picks
    ``n_out*avg`` evenly-spaced windows across the block — same output
    shape and cadence, ~2 orders of magnitude less work at 10 Msps.
    Reference analog: adaptive-FPS FFT computes one frame per chunk at
    most (reference ``capture.py:3144-3237``)."""
    n = iq.shape[-1]
    total = n_out * avg
    if n < fft_size or total <= 0:
        return jnp.zeros(iq.shape[:-1] + (0, fft_size), jnp.float32)
    starts = np.linspace(0, n - fft_size, total).astype(np.int64)
    idx = starts[:, None] + np.arange(fft_size)[None, :]
    frames = iq[..., jnp.asarray(idx)]
    win = jnp.asarray(_hann(fft_size))
    spec = jnp.fft.fftshift(jnp.fft.fft(frames * win, axis=-1), axes=-1)
    p = (jnp.abs(spec) ** 2) / np.float32(fft_size)
    p = p.reshape(p.shape[:-2] + (n_out, avg, fft_size)).mean(-2)
    return (10.0 * jnp.log10(jnp.maximum(p, 1e-20))).astype(jnp.float32)
