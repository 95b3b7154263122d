"""Soft clipping, RMS normalization, and squelch gating.

Reference semantics: ``dsp/fm.py:26-62`` (tanh soft clip with 1.5 knee and
0.95 headroom; RMS normalize to 0.18) and the capture squelch gate
(reference ``capture.py:2919-2921``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_K = np.float32(1.5)
_NORM = np.float32(1.0 / np.tanh(1.5))


def soft_clip(x: jnp.ndarray, headroom: float = 0.95) -> jnp.ndarray:
    return jnp.tanh(x * _K) * (_NORM * np.float32(headroom))


def rms_normalize(
    x: jnp.ndarray, target_rms: float = 0.18, min_rms: float = 1e-4
) -> jnp.ndarray:
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    gain = jnp.where(rms > min_rms, target_rms / jnp.maximum(rms, min_rms), 1.0)
    return x * gain


def rssi_dbfs(iq: jnp.ndarray) -> jnp.ndarray:
    """Mean-power RSSI in dBFS over the block (per-channel metric)."""
    p = jnp.mean(jnp.abs(iq) ** 2, axis=-1)
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-20))


def squelch_gate(audio: jnp.ndarray, rssi_db: jnp.ndarray, threshold_db) -> jnp.ndarray:
    """Zero the audio when RSSI is below threshold (open when above)."""
    open_ = rssi_db[..., None] >= jnp.asarray(threshold_db)[..., None]
    return jnp.where(open_, audio, jnp.zeros_like(audio))
