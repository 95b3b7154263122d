"""Streaming FIR filtering, decimation, and polyphase resampling.

TPU-native replacement for the reference's numba streaming complex FIR
(reference ``dsp/filters.py:471-651``: Direct Form I carrying ``zi`` across
chunks) and ``scipy.signal.resample_poly`` usage (reference ``dsp/fm.py:184``).

Design notes (TPU-first):
- Streaming state is an explicit **overlap-save carry**: the last
  ``taps-1`` input samples of the previous block.  Prepending the carry and
  running a *valid* convolution reproduces ``lfilter(b, 1, x, zi=...)``
  exactly, with the state being plain samples instead of filter internals —
  trivially shardable and ppermute-able (halo exchange).
- The convolution itself dispatches between a strided
  ``lax.conv_general_dilated`` (short filters / decimation — XLA maps this
  onto the VPU/MXU) and FFT fast-convolution (long filters) — both
  compile to static shapes.
- Decimating FIR fuses the stride into the conv, so only every D-th output
  is computed (the reference's two-stage 6 MHz -> 48 kHz trunking chain,
  reference ``trunking/system.py:1290-1415``, costs O(N*taps/D) here).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def _conv_valid_fft(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode convolution via one big FFT (long-filter path)."""
    n = x.shape[-1]
    t = taps.shape[-1]
    nfft = _next_pow2(n)
    cdt = jnp.complex64
    X = jnp.fft.fft(x.astype(cdt), nfft)
    H = jnp.fft.fft(taps.astype(cdt), nfft)
    y = jnp.fft.ifft(X * H)[..., t - 1 : n]
    if not jnp.issubdtype(x.dtype, jnp.complexfloating) and not jnp.issubdtype(
        taps.dtype, jnp.complexfloating
    ):
        return y.real.astype(jnp.float32)
    return y


def _conv_valid_direct(
    x: jnp.ndarray, taps: jnp.ndarray, stride: int = 1
) -> jnp.ndarray:
    """Valid-mode convolution via XLA conv; supports output stride (decim).

    ``y[m] = sum_k taps[k] * x[m*stride + (T-1-k)]`` — i.e. convolution
    (flipped-kernel correlation), matching ``lfilter(b, 1, .)[::stride]``
    on the overlap-save-extended input.
    """
    t = taps.shape[-1]

    def conv1d(xr, kern):  # real (N,) -> (M,)
        lhs = xr[None, None, :]
        rhs = kern[None, None, :]
        out = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            # TPU convs default to bf16; HIGH = 3-pass bf16 (~f32 accuracy)
            precision=jax.lax.Precision.HIGHEST
            if __import__("os").environ.get("WAVECAP_CONV_PRECISION") == "highest"
            else jax.lax.Precision.HIGH,
        )
        return out[0, 0, :]

    complex_taps = jnp.issubdtype(taps.dtype, jnp.complexfloating)
    complex_x = jnp.issubdtype(x.dtype, jnp.complexfloating)
    if complex_taps:
        # complex kernel (e.g. the CQPSK echo equalizer): 4 real convs —
        # a plain f32 cast here silently dropped the imaginary part
        kr = taps[::-1].real.astype(jnp.float32)
        ki = taps[::-1].imag.astype(jnp.float32)
        xr = (x.real if complex_x else x).astype(jnp.float32)
        xi = (
            x.imag.astype(jnp.float32)
            if complex_x
            else jnp.zeros_like(xr)
        )
        return jax.lax.complex(
            conv1d(xr, kr) - conv1d(xi, ki),
            conv1d(xr, ki) + conv1d(xi, kr),
        )
    kern = taps[::-1].astype(jnp.float32)
    if complex_x:
        xr = x.real.astype(jnp.float32)
        xi = x.imag.astype(jnp.float32)
        return jax.lax.complex(conv1d(xr, kern), conv1d(xi, kern))
    return conv1d(x.astype(jnp.float32), kern)


_CONV_TILE = 128


def _conv_valid_matmul(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Valid convolution as a banded-matrix tile matmul (MXU path).

    ``lax.conv`` with C_in=1 lowers to a VPU shift-multiply-accumulate on
    TPU (~0.3 TFLOP/s measured) — at the 800-channel operating point the
    voice-band FIR was 73 % of the whole fused program (round-5 profile,
    ``scripts/profile_roofline.py``).  Blocking the output into
    ``_CONV_TILE``-sample tiles turns it into
    ``(n_tiles, tile+T-1) @ (tile+T-1, tile)`` matmuls against a banded
    taps matrix — the systolic array's bread and butter.  The band matrix
    wastes a factor ~(tile+T)/T of multiplies on structural zeros, which
    the MXU's ~100x headroom swallows: measured 6x end-to-end on the
    voice chain.  Real taps only (complex x rides as two real rows);
    Precision.HIGH matches the direct path's accumulation.
    """
    t = taps.shape[-1]
    n = x.shape[-1]
    m_out = n - t + 1
    tile = _CONV_TILE
    n_tiles = -(-m_out // tile)
    kern = taps.astype(jnp.float32)
    # band[i, o] = taps[o + t - 1 - i] for 0 <= o + t - 1 - i < t
    i = np.arange(tile + t - 1)[:, None]
    o = np.arange(tile)[None, :]
    k_idx = o + (t - 1) - i
    valid = (k_idx >= 0) & (k_idx < t)
    band = jnp.where(
        jnp.asarray(valid), kern[jnp.asarray(np.clip(k_idx, 0, t - 1))], 0.0
    )

    complex_x = jnp.issubdtype(x.dtype, jnp.complexfloating)
    planes = (
        jnp.stack([x.real, x.imag]).astype(jnp.float32)
        if complex_x
        else x.astype(jnp.float32)[None]
    )
    pad = n_tiles * tile + tile - n  # one spare row for the tail window
    xp = jnp.pad(planes, ((0, 0), (0, max(pad, 0))))
    rows = xp.reshape(planes.shape[0], -1, tile)  # (P, n_tiles+1, tile)
    win = jnp.concatenate(
        [rows[:, :-1], rows[:, 1:, : t - 1]], axis=-1
    )  # (P, n_tiles, tile+t-1)
    y = jnp.einsum(
        "pnk,ko->pno", win, band, precision=jax.lax.Precision.HIGH
    ).reshape(planes.shape[0], -1)[:, :m_out]
    if complex_x:
        return jax.lax.complex(y[0], y[1])
    return y[0]


def conv_valid(x: jnp.ndarray, taps: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Valid convolution with real taps; picks direct vs FFT vs MXU-matmul
    by cost and platform."""
    t = int(taps.shape[-1])
    if stride == 1 and t > 128:
        return _conv_valid_fft(x, taps)
    import os as _os

    force = _os.environ.get("WAVECAP_FIR_MATMUL")  # "1" force / "0" off
    use_matmul = (
        force == "1" or (force is None and jax.default_backend() == "tpu")
    )
    if (
        stride == 1
        and t > 8
        and use_matmul
        and not jnp.issubdtype(taps.dtype, jnp.complexfloating)
        and x.shape[-1] >= 4 * _CONV_TILE
    ):
        # the banded matmul wastes ~(tile+T)/T multiplies on zeros, a win
        # only where the MXU exists; CPU/GPU keep the direct conv
        return _conv_valid_matmul(x, taps)
    return _conv_valid_direct(x, taps, stride)


def fir_init(taps_len: int, dtype=jnp.complex64) -> jnp.ndarray:
    """Zero overlap-save carry for a ``taps_len``-tap filter."""
    return jnp.zeros((taps_len - 1,), dtype=dtype)


def fir_filter(x: jnp.ndarray, taps: jnp.ndarray, tail: jnp.ndarray):
    """Streaming FIR: ``(y, new_tail)``; exact ``lfilter(b,1,·)`` continuation.

    ``tail`` is the previous block's last ``len(taps)-1`` input samples
    (zeros for the first block).
    """
    t = taps.shape[-1]
    if x.shape[-1] == 0:
        return x, tail
    xin = jnp.concatenate([tail, x], axis=-1)
    y = conv_valid(xin, taps)
    new_tail = xin[..., -(t - 1):] if t > 1 else tail
    return y, new_tail


def fir_decimate(x: jnp.ndarray, taps: jnp.ndarray, decim: int, tail: jnp.ndarray):
    """Streaming decimating FIR: filter then keep every ``decim``-th sample.

    Matches ``lfilter(b, 1, stream)[::decim]`` when block lengths are
    multiples of ``decim`` (enforce upstream).  Returns ``(y, new_tail)``.
    """
    t = taps.shape[-1]
    xin = jnp.concatenate([tail, x], axis=-1)
    y = _conv_valid_direct(xin, taps, stride=decim)
    new_tail = xin[..., -(t - 1):] if t > 1 else tail
    return y, new_tail


# ---------------------------------------------------------------------------
# Filter design (host-side, cached — mirrors scipy semantics)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=128)
def design_lowpass_fir(
    num_taps: int, cutoff_norm: float, beta: float = 8.0
) -> np.ndarray:
    """Kaiser-windowed lowpass prototype (cutoff normalized to Nyquist)."""
    return _sps.firwin(num_taps, cutoff_norm, window=("kaiser", beta)).astype(
        np.float32
    )


@lru_cache(maxsize=128)
def design_decimation_fir(decim: int, sample_rate: float, beta: float = 7.857):
    """Anti-alias FIR for ``decim``:1, ~80 dB stopband (Kaiser).

    Mirrors the reference's trunking decimator design targets
    (reference ``trunking/system.py:1290-1415``).
    """
    nyq_out = sample_rate / decim / 2.0
    cutoff = 0.8 * nyq_out
    width = 0.4 * nyq_out
    numtaps, _ = _sps.kaiserord(80.0, width / (sample_rate / 2.0))
    numtaps = int(numtaps) | 1  # odd length, linear phase
    taps = _sps.firwin(
        numtaps, cutoff, window=("kaiser", beta), fs=sample_rate
    ).astype(np.float32)
    return taps


@lru_cache(maxsize=128)
def design_resample_poly_filter(up: int, down: int) -> np.ndarray:
    """The FIR used by ``scipy.signal.resample_poly`` (kaiser 5.0, 10 taps/phase)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = _sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float64).astype(np.float32)


# ---------------------------------------------------------------------------
# Polyphase resampling (scipy.resample_poly semantics, block API)
# ---------------------------------------------------------------------------


def _resample_plan(in_rate: int, out_rate: int):
    from math import gcd

    g = gcd(int(in_rate), int(out_rate))
    up, down = int(out_rate) // g, int(in_rate) // g
    taps = design_resample_poly_filter(up, down)
    return up, down, taps


def resample_stream_init(
    in_rate: int, out_rate: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Carry state (input tail) for ``resample_poly_stream``."""
    if int(in_rate) == int(out_rate):
        return jnp.zeros((0,), dtype)
    up, down, taps_np = _resample_plan(in_rate, out_rate)
    if up == 1:
        return jnp.zeros((len(taps_np) - 1,), dtype)
    ph_len = -(-len(taps_np) // up)
    return jnp.zeros((ph_len - 1,), dtype)


def resample_poly_stream(
    x: jnp.ndarray, in_rate: int, out_rate: int, tail: jnp.ndarray
):
    """Streaming polyphase resample: segmentation-invariant.

    Causal variant of :func:`resample_poly` — output is the same filter
    but delayed by the filter's group delay instead of centered, so that
    concatenating per-block outputs equals the one-shot result exactly
    (minus the fixed delay).  Block length must be divisible by ``down``.
    Returns ``(y, new_tail)``.
    """
    if int(in_rate) == int(out_rate):
        return x, tail
    up, down, taps_np = _resample_plan(in_rate, out_rate)
    n = x.shape[-1]
    if n % down != 0:
        # block length not commensurate with the decimation: fall back to
        # the centered one-shot resample (the reference's per-chunk
        # behavior, reference dsp/fm.py:184) — continuous-phase streaming
        # needs down | block for static output shapes
        return resample_poly(x, in_rate, out_rate), tail
    xin = jnp.concatenate([tail.astype(x.dtype), x], axis=-1)
    if up == 1:
        taps = jnp.asarray(taps_np)
        y = _conv_valid_direct(xin, taps, stride=down)[..., : n // down]
        return y, xin[..., -(len(taps_np) - 1) :]

    t = len(taps_np)
    ph_len = -(-t // up)
    phases = np.zeros((up, ph_len), dtype=np.float32)
    for p_ in range(up):
        sub = taps_np[p_::up]
        phases[p_, : len(sub)] = sub
    L = ph_len - 1
    n_out = n * up // down
    m = np.arange(n_out)
    p_idx = (m * down) % up
    q_idx = (m * down - p_idx) // up + L
    k = np.arange(ph_len)
    gather_idx = jnp.asarray(q_idx[:, None] - k[None, :])
    wins = xin[..., gather_idx]  # (..., n_out, ph_len)
    coeffs = jnp.asarray(phases)[jnp.asarray(p_idx)]  # (n_out, ph_len)
    y = jnp.einsum("...mk,mk->...m", wins, coeffs)
    return y, xin[..., -L:]


def resample_poly(x: jnp.ndarray, in_rate: int, out_rate: int) -> jnp.ndarray:
    """One-shot polyphase resample of a whole block (scipy-compatible).

    Matches ``scipy.signal.resample_poly(x, up, down)`` including its
    centered group-delay compensation and output length ``ceil(n*up/down)``.
    """
    if int(in_rate) == int(out_rate):
        return x
    up, down, taps_np = _resample_plan(in_rate, out_rate)
    n = x.shape[-1]
    n_out = -(-n * up // down)  # ceil
    t = len(taps_np)
    half = (t - 1) // 2

    if up == 1:
        # Pure decimation: y[m] = sum_k h[k] x[m*down + half - k]
        taps = jnp.asarray(taps_np)
        pad_l = half
        pad_r = half + down  # slack so every window is in range
        xin = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)])
        y = _conv_valid_direct(xin, taps, stride=down)
        return y[..., :n_out]

    # General rational resample via per-phase decimating convolutions.
    # Output m uses phase p = (half + m*down) % up on input offset
    # q = (half + m*down) // up :  y[m] = sum_k h[p + k*up] x[q - k].
    ph_len = -(-t // up)
    phases = np.zeros((up, ph_len), dtype=np.float32)
    for p in range(up):
        sub = taps_np[p::up]
        phases[p, : len(sub)] = sub
    phases_j = jnp.asarray(phases)

    pad_l = ph_len - 1
    pad_r = ph_len + down // up + 2
    xin = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)])

    m = np.arange(n_out)
    p_idx = (half + m * down) % up
    q_idx = (half + m * down) // up + pad_l  # index into padded input

    # Gather windows: w[m, k] = xin[q_idx[m] - k], k in [0, ph_len)
    k = np.arange(ph_len)
    gather_idx = jnp.asarray(q_idx[:, None] - k[None, :])
    wins = xin[..., gather_idx]  # (..., n_out, ph_len)
    coeffs = phases_j[jnp.asarray(p_idx)]  # (n_out, ph_len)
    y = jnp.sum(wins * coeffs, axis=-1)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return y.astype(jnp.complex64)
    return y.astype(jnp.float32)
