"""Core demodulation primitives (quadrature FM, AM envelope, SSB product).

Reference semantics: ``dsp/fm.py:65-97`` (quadrature demod), ``dsp/am.py:45``
(envelope), ``dsp/am.py:144`` (SSB via BFO shift + real part).  Each op is
stateless-per-sample except for the one-sample boundary carry needed to
make ``angle(x[n] * conj(x[n-1]))`` exact across block edges (the
reference zero-fills the first output of each chunk instead; we carry the
previous block's last sample — strictly better continuity).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fast_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 approximation (max error ~1e-4 rad, ~-80 dB).

    XLA's exact ``atan2`` lowers to a long transcendental sequence that
    dominates dense discriminator banks on the VPU; this 7th-order
    minimax polynomial with quadrant folding is several times cheaper
    and far below the FM noise floor for voice work.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    s = a * a
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * a + a
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def quadrature_demod(
    iq: jnp.ndarray,
    sample_rate: float,
    prev_sample: jnp.ndarray,
    max_deviation_hz: float = 75_000.0,
    atan_impl: str = "exact",
):
    """FM discriminator: ``angle(x[n]·conj(x[n-1])) · fs/(2π·dev)``.

    Returns ``(audio, last_sample)``.  Initialize ``prev_sample`` to 0
    (first output sample of the very first block is then 0, matching the
    reference's zero-fill).
    """
    x = iq.astype(jnp.complex64)
    if x.shape[-1] == 0:
        return jnp.zeros(x.shape, jnp.float32), prev_sample
    prev = jnp.concatenate([prev_sample[..., None], x[..., :-1]], axis=-1)
    prod = x * jnp.conj(prev)
    scale = np.float32(sample_rate / (2.0 * np.pi * max_deviation_hz))
    # First-ever sample: prev==0 -> prod==0 -> angle 0, matches reference.
    atan = fast_atan2 if atan_impl == "fast" else jnp.arctan2
    audio = atan(prod.imag, prod.real) * scale
    return audio.astype(jnp.float32), x[..., -1]


def am_envelope(iq: jnp.ndarray) -> jnp.ndarray:
    """AM envelope detection (magnitude)."""
    return jnp.abs(iq).astype(jnp.float32)


def ssb_product(iq_shifted: jnp.ndarray) -> jnp.ndarray:
    """SSB product detection: real part after BFO shift."""
    return iq_shifted.real.astype(jnp.float32)


def fm_discriminator_init(dtype=jnp.complex64) -> jnp.ndarray:
    return jnp.zeros((), dtype)
