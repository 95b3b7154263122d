"""Phase-locked loops as on-device sequential scans.

Reference semantics: ``dsp/sam.py:26-160`` (type-2 carrier-recovery PLL
for synchronous AM) and ``dsp/p25/cqpsk.py:84`` (Costas loop).  These are
per-sample feedback loops — inherently sequential — but they run at the
*channel* rate (tens of kHz), so a ``lax.scan`` over the block is cheap
on TPU while everything sample-rate-heavy stays vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class PllState(NamedTuple):
    phase: jnp.ndarray  # f32 scalar, radians
    freq: jnp.ndarray  # f32 scalar, radians/sample (integrator)


def pll_init(dtype=jnp.float32) -> PllState:
    return PllState(jnp.zeros((), dtype), jnp.zeros((), dtype))


def pll_coeffs(loop_bandwidth_hz: float, sample_rate: float, damping: float = 0.707):
    """2nd-order PI loop coefficients (reference dsp/sam.py:57-67)."""
    omega_n = 2.0 * np.pi * loop_bandwidth_hz
    alpha = 2.0 * damping * omega_n / sample_rate
    beta = (omega_n**2) / (sample_rate**2)
    return float(alpha), float(beta)


def carrier_recovery_pll(
    iq: jnp.ndarray,
    sample_rate: float,
    state: PllState,
    loop_bandwidth_hz: float = 50.0,
    damping: float = 0.707,
):
    """Track the carrier; return coherent baseband and the locked LO phase.

    Phase detector: ``atan2(imag(mixed), |real(mixed)|)`` (AM carrier —
    insensitive to modulation sign), PI loop filter.

    Returns ``(coherent, state)`` with ``coherent = iq * exp(-j*phase)``.
    """
    alpha, beta = pll_coeffs(loop_bandwidth_hz, sample_rate, damping)
    a = jnp.float32(alpha)
    b = jnp.float32(beta)

    def step(carry, z):
        phase, integ = carry
        lo = jax.lax.complex(jnp.cos(-phase), jnp.sin(-phase))
        mixed = z * lo
        err = jnp.arctan2(mixed.imag, jnp.abs(mixed.real) + 1e-10)
        integ = integ + b * err
        corr = a * err + integ
        phase = phase + corr
        phase = jnp.where(phase > np.pi, phase - 2 * np.pi, phase)
        phase = jnp.where(phase < -np.pi, phase + 2 * np.pi, phase)
        return (phase, integ), mixed

    (phase, integ), coherent = jax.lax.scan(step, (state.phase, state.freq), iq)
    return coherent, PllState(phase, integ)


def costas_loop_qpsk(
    iq: jnp.ndarray,
    state: PllState,
    alpha: float,
    beta: float,
):
    """4th-power Costas loop for (pi/4-D)QPSK carrier tracking.

    Phase detector for QPSK: ``sign(I)*Q - sign(Q)*I`` (decision-directed).
    Returns ``(derotated, state)``.
    """
    a = jnp.float32(alpha)
    b = jnp.float32(beta)

    def step(carry, z):
        phase, integ = carry
        lo = jax.lax.complex(jnp.cos(-phase), jnp.sin(-phase))
        mixed = z * lo
        err = jnp.sign(mixed.real) * mixed.imag - jnp.sign(mixed.imag) * mixed.real
        err = jnp.clip(err, -1.0, 1.0)
        integ = integ + b * err
        corr = a * err + integ
        phase = jnp.mod(phase + corr + np.pi, 2 * np.pi) - np.pi
        return (phase, integ), mixed

    (phase, integ), out = jax.lax.scan(step, (state.phase, state.freq), iq)
    return out, PllState(phase, integ)
