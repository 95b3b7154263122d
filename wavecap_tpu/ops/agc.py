"""Automatic gain control on batched blocks.

TPU-native replacement for reference ``dsp/agc.py``.  The reference's
default path (``_envelope_detector_vectorized``, reference ``dsp/agc.py:73``)
is two cascaded one-pole IIR lowpasses over ``|x|`` (attack pass, then
release pass) combined with an elementwise max — exactly two parallel
associative scans here, so the envelope is computed without any
per-sample loop.  Explicit carry state keeps the envelope continuous
across blocks (which the reference's chunk-stateless version does not —
a small fidelity win).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .iir import onepole_filter
from .clip import soft_clip


class AgcState(NamedTuple):
    env_attack: jnp.ndarray  # scalar carry of attack-pass envelope
    env_release: jnp.ndarray  # scalar carry of release-pass envelope


def agc_init(dtype=jnp.float32) -> AgcState:
    return AgcState(jnp.zeros((), dtype), jnp.zeros((), dtype))


def _coef(ms: float, sample_rate: float) -> float:
    n = (ms / 1000.0) * sample_rate
    return float(1.0 - np.exp(-1.0 / n)) if n > 0 else 1.0


def envelope(x: jnp.ndarray, attack_coef: float, release_coef: float, state: AgcState):
    """Asymmetric attack/release envelope (reference dsp/agc.py:73-108)."""
    abs_x = jnp.abs(x)
    env_a, ca = onepole_filter(abs_x, attack_coef, 1.0 - attack_coef, state.env_attack)
    env_r, cr = onepole_filter(env_a, release_coef, 1.0 - release_coef, state.env_release)
    return jnp.maximum(env_a, env_r), AgcState(ca, cr)


def apply_agc(
    x: jnp.ndarray,
    sample_rate: float,
    state: AgcState,
    target_db: float = -20.0,
    attack_ms: float = 5.0,
    release_ms: float = 50.0,
    max_gain_db: float = 60.0,
):
    """Envelope-follower AGC with soft clip.  Returns ``(y, state)``."""
    target = 10.0 ** (target_db / 20.0)
    max_gain = 10.0 ** (max_gain_db / 20.0)
    env, state = envelope(x, _coef(attack_ms, sample_rate), _coef(release_ms, sample_rate), state)
    gain = jnp.minimum(target / jnp.maximum(env, 1e-6), max_gain)
    return soft_clip(x * gain, headroom=1.0), state


def simple_agc(x: jnp.ndarray, target_rms: float = 0.1, max_gain: float = 10.0):
    """Block RMS AGC (reference dsp/agc.py:245-285)."""
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    gain = jnp.where(rms > 1e-6, target_rms / jnp.maximum(rms, 1e-6), max_gain)
    return soft_clip(x * jnp.minimum(gain, max_gain), headroom=1.0)
