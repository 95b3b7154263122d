"""CQPSK / LSM demodulator: pi/4-DQPSK -> C4FM-compatible soft symbols.

Behavioral rebuild of reference ``dsp/p25/cqpsk.py`` (RRC + Costas +
Mueller-Muller) with a TPU-friendlier structure: the differential
detection ``z[k] = s[k] * conj(s[k-1])`` cancels absolute carrier phase,
so no Costas loop is needed on the hot path — a slow bias tracker absorbs
residual frequency offset.  Only symbol timing is sequential
(``lax.scan``, like the C4FM path).

Output soft symbols use the C4FM scale (delta-phase / (pi/4) in
{±1, ±3}), so the same streaming framer, FEC, and TSBK stack decode both
modulations (that equivalence is the point of P25's dual air interfaces:
+45° <-> +1, +135° <-> +3, -45° <-> -1, -135° <-> -3).

Supports Phase 1 LSM (4800 baud) and Phase 2 H-DQPSK (6000 baud) via
``symbol_rate``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps

from wavecap_tpu import ops


@lru_cache(maxsize=8)
def design_rrc_cqpsk(
    sample_rate: float, symbol_rate: float, alpha: float
) -> np.ndarray:
    sps = sample_rate / symbol_rate
    n = int(8 * sps) | 1
    t = (np.arange(n) - n // 2) / sps
    h = np.zeros(n)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-9:
            h[i] = 1.0 - alpha + 4 * alpha / np.pi
        elif abs(abs(4 * alpha * ti) - 1.0) < 1e-9:
            h[i] = (alpha / np.sqrt(2)) * (
                (1 + 2 / np.pi) * np.sin(np.pi / (4 * alpha))
                + (1 - 2 / np.pi) * np.cos(np.pi / (4 * alpha))
            )
        else:
            h[i] = (
                np.sin(np.pi * ti * (1 - alpha))
                + 4 * alpha * ti * np.cos(np.pi * ti * (1 + alpha))
            ) / (np.pi * ti * (1 - (4 * alpha * ti) ** 2))
    return (h / np.sqrt(np.sum(h**2))).astype(np.float32)


@dataclass(frozen=True)
class CqpskConfig:
    sample_rate: int = 48_000
    symbol_rate: float = 4800.0  # 6000 for Phase 2 TDMA
    rrc_alpha: float = 0.2  # reference uses 1.0 for Phase 2
    loop_bandwidth: float = 0.005
    max_clock_ppm: float = 2000.0
    timing_impl: str = "block"  # "block" (vectorized, TPU-fast) | "scan"

    @property
    def sps(self) -> float:
        return self.sample_rate / self.symbol_rate


class CqpskState(NamedTuple):
    rrc_tail: jnp.ndarray  # complex FIR carry
    interp_tail: jnp.ndarray  # complex filtered samples
    pos: jnp.ndarray
    freq: jnp.ndarray
    integrator: jnp.ndarray
    prev_sym: jnp.ndarray  # complex symbol at previous instant
    bias: jnp.ndarray  # carrier-offset phase bias (radians/symbol)


INTERP_TAIL = 64


def cqpsk_init(cfg: CqpskConfig) -> CqpskState:
    rrc = design_rrc_cqpsk(float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha)
    return CqpskState(
        rrc_tail=ops.fir_init(len(rrc), jnp.complex64),
        interp_tail=jnp.zeros(INTERP_TAIL, jnp.complex64),
        pos=jnp.asarray(float(INTERP_TAIL), jnp.float32),
        freq=jnp.asarray(0.0, jnp.float32),  # set from sps on first block
        integrator=jnp.zeros((), jnp.float32),
        prev_sym=jnp.zeros((), jnp.complex64),
        bias=jnp.zeros((), jnp.float32),
    )


def n_symbols_per_block(cfg: CqpskConfig, block_len: int) -> int:
    return int(round(block_len / cfg.sps))


def cqpsk_demodulate(iq: jnp.ndarray, state: CqpskState, cfg: CqpskConfig):
    """One block -> (soft_symbols, dibits, state); soft in C4FM units."""
    sps = cfg.sps
    rrc = jnp.asarray(design_rrc_cqpsk(float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha))
    filt, rrc_tail = ops.fir_filter(iq, rrc, state.rrc_tail)
    # normalize amplitude blockwise (AGC)
    scale = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(jnp.abs(filt) ** 2)), 1e-6)
    filt = filt * scale

    buf = jnp.concatenate([state.interp_tail, filt])
    n_sym = n_symbols_per_block(cfg, iq.shape[-1])

    bw = cfg.loop_bandwidth
    zeta = 0.707
    denom = 1 + 2 * zeta * bw + bw * bw
    alpha = 4 * zeta * bw / denom
    beta = 4 * bw * bw / denom
    fmin = sps * (1 - cfg.max_clock_ppm * 1e-6)
    fmax = sps * (1 + cfg.max_clock_ppm * 1e-6)

    def interp(pos):
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0.astype(jnp.float32)
        a = jax.lax.dynamic_slice(buf, (i0,), (2,))
        return a[0] * (1 - frac) + a[1] * frac

    freq0 = jnp.where(state.freq < 1.0, jnp.float32(sps), state.freq)

    def step(carry, _):
        pos, freq, integ, prev = carry
        y = interp(pos)
        y_mid = interp(pos - freq * 0.5)
        # complex Gardner TED
        err = jnp.clip(
            (jnp.conj(y_mid) * (prev - y)).real, -2.0, 2.0
        )
        integ = jnp.clip(integ + beta * err, fmin - sps, fmax - sps)
        freq = jnp.clip(sps + integ, fmin, fmax)
        pos_next = pos + freq + alpha * err
        return (pos_next, freq, integ, y), y

    if cfg.timing_impl == "block":
        # vectorized per-block phase search (see c4fm._demod_block_timing):
        # |y| dips between pi/4-DQPSK symbol instants (RRC transitions), so
        # mean |y| over candidate phases peaks at the symbol centers
        n_cand = 25
        deltas = jnp.linspace(-sps / 2.0, sps / 2.0, n_cand)
        m = jnp.arange(n_sym, dtype=jnp.float32)
        base = state.pos + m * freq0
        pos_cand = jnp.clip(
            base[None, :] + deltas[:, None], 0.0, buf.shape[-1] - 2.0
        )
        i0 = jnp.floor(pos_cand).astype(jnp.int32)
        frac = (pos_cand - i0.astype(jnp.float32)).astype(jnp.float32)
        yc = buf[i0] * (1.0 - frac) + buf[i0 + 1] * frac
        metric = jnp.mean(jnp.abs(yc), axis=-1)
        best = jnp.argmax(metric)
        bm1 = jnp.clip(best - 1, 0, n_cand - 1)
        bp1 = jnp.clip(best + 1, 0, n_cand - 1)
        y0m, y1m, y2m = metric[bm1], metric[best], metric[bp1]
        denom2 = y0m - 2.0 * y1m + y2m
        frac_peak = jnp.where(jnp.abs(denom2) > 1e-9, 0.5 * (y0m - y2m) / denom2, 0.0)
        frac_peak = jnp.clip(frac_peak, -1.0, 1.0)
        significant = metric[best] > 1.02 * jnp.mean(metric)
        delta_best = jnp.where(
            significant, deltas[best] + frac_peak * (deltas[1] - deltas[0]), 0.0
        )
        pos_f = jnp.clip(base + delta_best, 0.0, buf.shape[-1] - 2.0)
        i0f = jnp.floor(pos_f).astype(jnp.int32)
        ff = (pos_f - i0f.astype(jnp.float32)).astype(jnp.float32)
        syms = buf[i0f] * (1.0 - ff) + buf[i0f + 1] * ff
        integ = jnp.clip(
            state.integrator + beta * n_sym * 0.5 * (delta_best / sps),
            fmin - sps,
            fmax - sps,
        )
        freq = jnp.clip(sps + integ, fmin, fmax)
        pos = state.pos + delta_best + n_sym * freq
        prev = syms[-1]
    else:
        carry0 = (state.pos, freq0, state.integrator, state.prev_sym)
        (pos, freq, integ, prev), syms = jax.lax.scan(
            step, carry0, None, length=n_sym
        )

    # differential phase detection (includes the block-boundary carry)
    prev_syms = jnp.concatenate([state.prev_sym[None], syms[:-1]])
    z = syms * jnp.conj(prev_syms)
    dphi = jnp.arctan2(z.imag, z.real)
    # residual carrier offset shows as a constant bias; track it slowly via
    # the distance to the nearest pi/4 constellation point
    quant = jnp.round((dphi - state.bias) / (np.pi / 4))
    quant = jnp.clip(quant, -3.0, 3.0)
    resid = dphi - state.bias - quant * (np.pi / 4)
    bias = state.bias + 0.02 * jnp.mean(resid)
    soft = (dphi - bias) / (np.pi / 4)

    dibits = soft_to_dibits(soft)
    new_state = CqpskState(
        rrc_tail=rrc_tail,
        interp_tail=buf[-INTERP_TAIL:],
        pos=_recenter(pos - (buf.shape[-1] - INTERP_TAIL), sps),
        freq=freq,
        integrator=integ,
        prev_sym=prev,
        bias=bias,
    )
    return soft, dibits, new_state


def _recenter(pos, sps):
    pos = jnp.where(pos < 4.0, pos + sps, pos)
    return jnp.where(pos > INTERP_TAIL + sps, pos - sps, pos)


def soft_to_dibits(soft: jnp.ndarray) -> jnp.ndarray:
    pos = soft >= 0
    outer = jnp.abs(soft) >= 2.0
    return jnp.where(pos, jnp.where(outer, 1, 0), jnp.where(outer, 3, 2)).astype(
        jnp.uint8
    )


# ---------------------------------------------------------------------------
# Modulator (tests)
# ---------------------------------------------------------------------------


def modulate_cqpsk(
    dibits: np.ndarray,
    sample_rate: float = 48_000.0,
    symbol_rate: float = 4800.0,
    alpha: float = 0.2,
    amplitude: float = 1.0,
) -> np.ndarray:
    """Dibits -> pi/4-DQPSK IQ (differentially encoded phase steps)."""
    from wavecap_tpu.decoders.p25_frames import DIBIT_SYMBOLS

    sps = sample_rate / symbol_rate
    assert abs(sps - round(sps)) < 1e-9
    sps = int(round(sps))
    steps = DIBIT_SYMBOLS[np.asarray(dibits, np.uint8)] * (np.pi / 4)
    phases = np.cumsum(steps)
    symbols = np.exp(1j * phases)
    impulses = np.zeros(len(symbols) * sps, np.complex64)
    impulses[::sps] = symbols * sps
    h = design_rrc_cqpsk(sample_rate, symbol_rate, alpha)
    shaped = _sps.lfilter(h, 1.0, impulses)
    return (amplitude * shaped / np.abs(shaped).max()).astype(np.complex64)
