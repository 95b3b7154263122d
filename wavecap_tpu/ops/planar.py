"""Planar-complex kernels: IQ as (real, imag) f32 planes, DFT as matmul.

Two reasons this path exists:

1. **MXU-first**: the channelizer's cross-arm DFT and the spectrum FFT
   become plain f32 matmuls against precomputed cos/sin matrices —
   exactly the shape the 128x128 systolic array wants (the FFT-as-
   butterflies form runs on the VPU instead and leaves the MXU idle for
   M up to a few thousand, a matmul DFT is faster per the roofline).
2. **Portability**: some TPU runtimes have incomplete complex64 support;
   this path never materializes a complex dtype on device.

Numerics: a matmul DFT is O(M^2) per output step instead of O(M log M),
but with M<=1024-ish arms the MXU's ~200 TFLOP/s turns that into
microseconds; accuracy is f32-dot-product class (~1e-6 relative),
comparable to an f32 FFT.

All functions mirror their complex counterparts in this package and are
validated against them in tests.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .channelizer import ChannelizerConfig, design_prototype
from .nco import nco_phases, tuning_word


# ---------------------------------------------------------------------------
# DFT matrices (host-side, cached)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def dft_matrices(m: int, inverse: bool = False, scaled: bool = True):
    """(cos, sin) of the DFT: X[c] = sum_k x[k] * exp(-+2pi i k c / m)."""
    k = np.arange(m)
    ang = 2.0 * np.pi * np.outer(k, k) / m
    sign = 1.0 if inverse else -1.0
    c = np.cos(ang).astype(np.float32)
    s = (sign * np.sin(ang)).astype(np.float32)
    if inverse and scaled:
        # unnormalized inverse (matches ifft * m)
        pass
    return c, s


def planar_matmul_dft(re, im, m: int, inverse: bool = False):
    """Batched DFT over the last axis via two real matmuls per plane.

    f32 precision forced: TPU matmuls default to bf16, which would cost
    ~40 dB of DFT accuracy.
    """
    import os

    c, s = dft_matrices(m, inverse)
    cj, sj = jnp.asarray(c), jnp.asarray(s)
    prec = os.environ.get("WAVECAP_DFT_PRECISION", "high")
    hi = {
        "highest": jax.lax.Precision.HIGHEST,
        # bf16 inputs + f32 accumulate: one MXU pass instead of HIGH's
        # three — ~40 dB of DFT accuracy traded for speed (round-5
        # roofline: the DFT is the top on-chip term); opt-in
        "default": jax.lax.Precision.DEFAULT,
    }.get(prec, jax.lax.Precision.HIGH)
    yr = jnp.matmul(re, cj, precision=hi) - jnp.matmul(im, sj, precision=hi)
    yi = jnp.matmul(re, sj, precision=hi) + jnp.matmul(im, cj, precision=hi)
    return yr, yi


# ---------------------------------------------------------------------------
# Factorized (Cooley-Tukey two-stage) matmul DFT
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _dft_factor(m: int) -> tuple[int, int] | None:
    """Split ``m = m1 * m2`` with both factors >= 8, closest to sqrt(m);
    None if no such factorization exists (prime-ish m)."""
    best = None
    for m1 in range(8, int(np.sqrt(m)) + 1):
        if m % m1 == 0 and m // m1 >= 8:
            best = (m1, m // m1)  # m1 <= m2, m1 ascending -> last is closest
    return best


@lru_cache(maxsize=16)
def _factored_mats(m: int, inverse: bool):
    m1, m2 = _dft_factor(m)  # type: ignore[misc]
    sign = 1.0 if inverse else -1.0
    a1 = 2.0 * np.pi * np.outer(np.arange(m1), np.arange(m1)) / m1
    a2 = 2.0 * np.pi * np.outer(np.arange(m2), np.arange(m2)) / m2
    tw = 2.0 * np.pi * np.outer(np.arange(m1), np.arange(m2)) / m
    return (
        (np.cos(a1).astype(np.float32), (sign * np.sin(a1)).astype(np.float32)),
        (np.cos(a2).astype(np.float32), (sign * np.sin(a2)).astype(np.float32)),
        (np.cos(tw).astype(np.float32), (sign * np.sin(tw)).astype(np.float32)),
    )


def planar_factored_dft(re, im, m: int, inverse: bool = False):
    """Two-stage Cooley-Tukey DFT as planar matmuls (round 5).

    The full m x m matmul DFT does O(m) MACs per output; splitting
    ``m = m1 * m2`` (e.g. 800 = 25 x 32) does O(m1 + m2) — ~14x fewer
    FLOPs at m=800 — while every stage stays an MXU matmul at full f32
    accumulation (`Precision.HIGH`), so there is no precision trade
    (measured ~116 dB vs numpy fft at m=800; the single-matmul HIGH
    path measures ~99 dB).

    Derivation (forward): with k = m2*k1 + k2 and c = c1 + m1*c2,
      X[c1 + m1 c2] = sum_{k2} [ e^{-2pi i c1 k2 / m}
                       * sum_{k1} x[k1,k2] e^{-2pi i k1 c1 / m1} ]
                       * e^{-2pi i k2 c2 / m2}
    i.e. stage-1 DFT over k1 (m1 x m1 matmul), twiddle by c1*k2, stage-2
    DFT over k2 (m2 x m2 matmul), then (c1, c2) -> c1 + m1*c2 reorder.
    """
    import os

    (c1m, s1m), (c2m, s2m), (twc, tws) = _factored_mats(m, inverse)
    m1, m2 = c1m.shape[0], c2m.shape[0]
    prec = os.environ.get("WAVECAP_DFT_PRECISION", "high")
    hi = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }.get(prec, jax.lax.Precision.HIGH)
    c1j, s1j = jnp.asarray(c1m), jnp.asarray(s1m)
    c2j, s2j = jnp.asarray(c2m), jnp.asarray(s2m)
    twcj, twsj = jnp.asarray(twc), jnp.asarray(tws)

    lead = re.shape[:-1]
    xr = re.reshape(lead + (m1, m2))
    xi = im.reshape(lead + (m1, m2))

    # stage 1: DFT over k1 -> A[..., c1, k2]
    def mm1(x, mat):
        return jnp.einsum("...ab,ac->...cb", x, mat, precision=hi)

    ar = mm1(xr, c1j) - mm1(xi, s1j)
    ai = mm1(xr, s1j) + mm1(xi, c1j)

    # twiddle by e^{sign 2pi i c1 k2 / m} (elementwise, (m1, m2) grid)
    br = ar * twcj - ai * twsj
    bi = ar * twsj + ai * twcj

    # stage 2: DFT over k2 -> X[..., c1, c2]
    def mm2(x, mat):
        return jnp.einsum("...cb,bd->...cd", x, mat, precision=hi)

    yr = mm2(br, c2j) - mm2(bi, s2j)
    yi = mm2(br, s2j) + mm2(bi, c2j)

    # (c1, c2) -> c = c1 + m1*c2: transpose to (c2, c1) then flatten
    yr = jnp.swapaxes(yr, -1, -2).reshape(lead + (m,))
    yi = jnp.swapaxes(yi, -1, -2).reshape(lead + (m,))
    return yr, yi


# ---------------------------------------------------------------------------
# Elementwise planar ops
# ---------------------------------------------------------------------------


def planar_freq_shift(re, im, offset_hz, sample_rate: float, phase0_u32=0):
    """Planar mirror of ``ops.freq_shift``; returns (re, im, next_phase)."""
    n = re.shape[-1]
    dphi = tuning_word(offset_hz, sample_rate)
    ph = nco_phases(n, dphi, jnp.asarray(phase0_u32, jnp.uint32))
    c, s = jnp.cos(ph), jnp.sin(ph)
    nxt = jnp.asarray(phase0_u32, jnp.uint32) + jnp.uint32(n) * dphi
    return re * c - im * s, re * s + im * c, nxt


def planar_quadrature_demod(re, im, sample_rate: float, prev_re, prev_im,
                            max_deviation_hz: float = 75_000.0):
    """Planar FM discriminator; returns (audio, last_re, last_im)."""
    pre = jnp.concatenate([prev_re[..., None], re[..., :-1]], axis=-1)
    pim = jnp.concatenate([prev_im[..., None], im[..., :-1]], axis=-1)
    pr = re * pre + im * pim
    pi = im * pre - re * pim
    scale = np.float32(sample_rate / (2.0 * np.pi * max_deviation_hz))
    return (jnp.arctan2(pi, pr) * scale).astype(jnp.float32), re[..., -1], im[..., -1]


def planar_rssi_dbfs(re, im):
    p = jnp.mean(re * re + im * im, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-20))


# ---------------------------------------------------------------------------
# Channelizer (planar; DFT across arms as matmul)
# ---------------------------------------------------------------------------


def planar_channelizer_init(cfg: ChannelizerConfig):
    n = cfg.channel_count * cfg.taps_per_channel
    return jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32)


def planar_channelize(re, im, state, cfg: ChannelizerConfig):
    """Planar mirror of ``ops.channelizer.channelize``.

    Args: ``re, im`` of shape (N,), state = (hist_re, hist_im).
    Returns ``(chan_re, chan_im, state)`` with channel arrays (M, S).
    """
    m = cfg.channel_count
    t = cfg.taps_per_channel
    n = re.shape[-1]
    if n % m != 0:
        raise ValueError(f"block length {n} must be a multiple of M={m}")
    r_steps = n // m

    proto = design_prototype(m, t, cfg.cutoff_scale)
    # Flip-free formulation (see ops/channelizer.py): reversal folded into
    # the taps; forward DFT then a per-channel twiddle e^{-2pi i c / M}.
    arms = jnp.asarray(proto.reshape(t, m)[:, ::-1].copy())
    tw_c = jnp.asarray(np.cos(2 * np.pi * np.arange(m) / m).astype(np.float32))
    tw_s = jnp.asarray((-np.sin(2 * np.pi * np.arange(m) / m)).astype(np.float32))

    hist_re, hist_im = state
    xr = jnp.concatenate([hist_re, re])
    xi = jnp.concatenate([hist_im, im])

    def parity_stack(x_ext, offset: int):
        seg = jax.lax.dynamic_slice_in_dim(x_ext, offset, (r_steps + t - 1) * m)
        w = seg.reshape(r_steps + t - 1, m)
        u = jnp.zeros((r_steps, m), jnp.float32)
        for m_tap in range(t):
            u = u + w[t - 1 - m_tap : t - 1 - m_tap + r_steps, :] * arms[m_tap][None, :]
        return u

    ur_e = parity_stack(xr, 1)
    ui_e = parity_stack(xi, 1)
    ur_o = parity_stack(xr, 1 + m // 2)
    ui_o = parity_stack(xi, 1 + m // 2)

    dr_e, di_e = planar_matmul_dft(ur_e, ui_e, m, inverse=False)
    dr_o, di_o = planar_matmul_dft(ur_o, ui_o, m, inverse=False)
    # twiddle (complex multiply by planes)
    yr_e = dr_e * tw_c - di_e * tw_s
    yi_e = dr_e * tw_s + di_e * tw_c
    yr_o = dr_o * tw_c - di_o * tw_s
    yi_o = dr_o * tw_s + di_o * tw_c

    sign = jnp.asarray(np.where(np.arange(m) % 2 == 0, 1.0, -1.0), np.float32)
    yr_o = yr_o * sign
    yi_o = yi_o * sign

    yr = jnp.stack([yr_e, yr_o], axis=1).reshape(2 * r_steps, m).T
    yi = jnp.stack([yi_e, yi_o], axis=1).reshape(2 * r_steps, m).T
    new_state = (xr[-m * t :], xi[-m * t :])
    return yr, yi, new_state


# ---------------------------------------------------------------------------
# Spectrum (planar; windowed DFT as matmul, power in dB)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _spectrum_mats(nfft: int):
    win = np.hanning(nfft).astype(np.float32)
    c, s = dft_matrices(nfft)
    return win, c, s


def planar_power_spectrum(re, im, fft_size: int = 2048):
    win, c, s = _spectrum_mats(fft_size)
    wr = re[..., :fft_size] * jnp.asarray(win)
    wi = im[..., :fft_size] * jnp.asarray(win)
    yr = wr @ jnp.asarray(c) - wi @ jnp.asarray(s)
    yi = wr @ jnp.asarray(s) + wi @ jnp.asarray(c)
    p = (yr * yr + yi * yi) / np.float32(fft_size)
    p = jnp.roll(p, fft_size // 2, axis=-1)  # fftshift
    return (10.0 * jnp.log10(jnp.maximum(p, 1e-20))).astype(jnp.float32)
