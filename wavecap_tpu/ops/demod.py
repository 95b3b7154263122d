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


def quadrature_demod(
    iq: jnp.ndarray,
    sample_rate: float,
    prev_sample: jnp.ndarray,
    max_deviation_hz: float = 75_000.0,
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
    audio = jnp.arctan2(prod.imag, prod.real) * scale
    return audio.astype(jnp.float32), x[..., -1]


def am_envelope(iq: jnp.ndarray) -> jnp.ndarray:
    """AM envelope detection (magnitude)."""
    return jnp.abs(iq).astype(jnp.float32)


def ssb_product(iq_shifted: jnp.ndarray) -> jnp.ndarray:
    """SSB product detection: real part after BFO shift."""
    return iq_shifted.real.astype(jnp.float32)


def fm_discriminator_init(dtype=jnp.complex64) -> jnp.ndarray:
    return jnp.zeros((), dtype)
