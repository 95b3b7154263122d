"""IIR filtering as parallel (associative-scan) linear recurrences.

TPU-native replacement for the reference's ``scipy.signal.lfilter`` IIR
usage: deemphasis one-pole (reference ``dsp/fm.py:100-126``), Butterworth
high/low/band-pass and notch (reference ``dsp/filters.py:41-264``).

A sequential per-sample loop is the worst possible TPU program, so every
recurrence here is evaluated with ``jax.lax.associative_scan`` over affine
state maps:

- one-pole  : scalar affine maps ``y <- a*y + b`` composed in parallel,
- biquad    : 2x2 state-space affine maps (A z + b) composed in parallel
              (8 mul/combine, log2(N) sweeps — HBM-bound, vectorized).

Higher orders run as cascaded second-order sections (scipy ``butter``
design with ``output='sos'`` — numerically safe in f32, unlike high-order
direct forms).  All ops take and return explicit carry state so streams
continue exactly across block boundaries.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps


# ---------------------------------------------------------------------------
# One-pole:  y[n] = b0*x[n] + a*y[n-1]
# ---------------------------------------------------------------------------


def onepole_init(dtype=jnp.float32):
    return jnp.zeros((), dtype)


def onepole_filter(x: jnp.ndarray, b0: float, a: float, y_prev):
    """Streaming one-pole IIR via associative scan.  Returns ``(y, y_last)``."""
    if x.shape[-1] == 0:
        return x, y_prev
    b0 = jnp.asarray(b0, x.dtype)
    a = jnp.asarray(a, x.dtype)
    # Element n is the affine map y -> a*y + b0*x[n]; prefix-compose.
    A = jnp.broadcast_to(a, x.shape)
    B = b0 * x

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    Ap, Bp = jax.lax.associative_scan(combine, (A, B), axis=-1)
    y = Ap * y_prev + Bp
    return y, y[..., -1]


def deemphasis_coeffs(sample_rate: float, tau: float = 75e-6):
    """FM deemphasis one-pole RC, impulse-invariant discretization.

    Correct -3 dB point at 1/(2*pi*tau) (~2122 Hz for 75 us).  Note: the
    reference's formula (reference ``dsp/fm.py:102-108``,
    ``alpha = 1/(1 + 1/(2*pi*tau*fs))``) places the pole at ``1-alpha ~ 0``
    — a near-passthrough at broadcast sample rates; we deliberately use
    the textbook discretization instead.
    """
    a = float(np.exp(-1.0 / (tau * sample_rate)))
    return 1.0 - a, a  # b0, a


def deemphasis(x: jnp.ndarray, sample_rate: float, tau: float, y_prev):
    b0, a = deemphasis_coeffs(sample_rate, tau)
    return onepole_filter(x, b0, a, y_prev)


# ---------------------------------------------------------------------------
# Biquad cascade (SOS)
# ---------------------------------------------------------------------------


def sos_init(n_sections: int, dtype=jnp.float32):
    """Per-section DF2T state ``z = (z1, z2)``."""
    return jnp.zeros((n_sections, 2), dtype)


def _biquad_scan(x, b0, b1, b2, a1, a2, z0):
    """One DF2T biquad via 2x2 associative scan.  Returns ``(y, z_last)``.

    DF2T:  y[n]  = b0 x[n] + z1[n-1]
           z1[n] = b1 x[n] - a1 y[n] + z2[n-1]
           z2[n] = b2 x[n] - a2 y[n]
    State s = [z1, z2]:  s[n] = A s[n-1] + B x[n]
        A = [[-a1, 1], [-a2, 0]],  B = [b1 - a1 b0, b2 - a2 b0]
        y[n] = b0 x[n] + z1[n-1]
    """
    dt = x.dtype
    A = jnp.asarray([[-a1, 1.0], [-a2, 0.0]], dt)
    Bv = jnp.asarray([b1 - a1 * b0, b2 - a2 * b0], dt)

    n = x.shape[-1]
    Ae = jnp.broadcast_to(A, x.shape[:-1] + (n, 2, 2))
    be = (x[..., None] * Bv)[..., None]  # (..., n, 2, 1)

    # TPU matmuls default to bf16; the 2x2 recurrence products need full
    # f32 or poles near 1 explode (NaN) within a block.
    def mm(a, b):
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    def combine(l, r):
        Al, bl = l
        Ar, br = r
        return mm(Ar, Al), mm(Ar, bl) + br

    Ap, bp = jax.lax.associative_scan(combine, (Ae, be), axis=-3)
    s = (
        jnp.einsum(
            "...nij,...j->...ni", Ap, z0, precision=jax.lax.Precision.HIGHEST
        )
        + bp[..., 0]
    )  # s[n], n=0..N-1
    s_prev = jnp.concatenate(
        [jnp.broadcast_to(z0, x.shape[:-1] + (1, 2)), s[..., :-1, :]], axis=-2
    )
    y = b0 * x + s_prev[..., 0]
    return y, s[..., -1, :]


def sos_filter(x: jnp.ndarray, sos: np.ndarray, z):
    """Cascade of biquads (scipy ``sosfilt`` semantics).  Returns ``(y, z)``."""
    if x.shape[-1] == 0:  # empty block: state passes through unchanged
        return x, jnp.asarray(z)
    zs = []
    y = x
    for i in range(sos.shape[0]):
        b0, b1, b2, _, a1, a2 = [float(v) for v in sos[i]]
        y, zi = _biquad_scan(y, b0, b1, b2, a1, a2, z[i])
        zs.append(zi)
    return y, jnp.stack(zs)


# ---------------------------------------------------------------------------
# Designs (host-side, cached)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=128)
def butter_sos(
    btype: str, cutoff: tuple, order: int, sample_rate: float
) -> np.ndarray:
    wn = [c / (sample_rate / 2.0) for c in cutoff]
    return _sps.butter(
        order, wn if len(wn) > 1 else wn[0], btype=btype, output="sos"
    ).astype(np.float64)


@lru_cache(maxsize=64)
def notch_sos(freq_hz: float, q: float, sample_rate: float) -> np.ndarray:
    b, a = _sps.iirnotch(freq_hz / (sample_rate / 2.0), q)
    return _sps.tf2sos(b, a).astype(np.float64)


def lowpass(x, sample_rate, cutoff, z, order=5):
    sos = butter_sos("low", (float(cutoff),), order, float(sample_rate))
    return sos_filter(x, sos, z)


def highpass(x, sample_rate, cutoff, z, order=5):
    sos = butter_sos("high", (float(cutoff),), order, float(sample_rate))
    return sos_filter(x, sos, z)


def bandpass(x, sample_rate, low, high, z, order=4):
    sos = butter_sos("band", (float(low), float(high)), order, float(sample_rate))
    return sos_filter(x, sos, z)


def notch(x, sample_rate, freq_hz, z, q=30.0):
    sos = notch_sos(float(freq_hz), float(q), float(sample_rate))
    return sos_filter(x, sos, z)


def n_sections(btype: str, order: int) -> int:
    """Number of SOS sections scipy produces for this design."""
    if btype == "band":
        return order  # bandpass doubles the order
    return (order + 1) // 2
