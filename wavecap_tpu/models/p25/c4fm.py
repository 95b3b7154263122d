"""P25 C4FM modem: 4800-baud 4-level FSK demodulator (JAX) + test modulator.

Behavioral rebuild of the reference's SDRTrunk-port demodulator
(reference ``dsp/p25/c4fm.py:2379`` ``C4FMDemodulator``) redesigned for
the TPU execution model:

  * all sample-rate work — baseband LPF, FM discriminator, RRC matched
    filter — is vectorized over the block;
  * symbol-timing recovery (the inherently sequential feedback loop,
    reference ``_symbol_recovery_jit`` at ``c4fm.py:650``) is a
    ``lax.scan`` over a *fixed* number of symbols per block (static
    shapes), with Gardner timing error + PI loop, carried gain/DC
    trackers replacing the reference's equalizer (``c4fm.py:212``);
  * block continuity is explicit state: filter tails, discriminator
    carry, a tail of filtered samples for cross-block interpolation,
    and the fractional timing phase.

Operating point: 4800 baud at 48 kHz channel rate = 10 samples/symbol
(the reference's preferred 10-SPS mode, ``trunking/system.py:1300``:
90.7 % TSBK CRC vs 37.1 % at ~5 SPS).

Deviation map (TIA-102.BAAA): dibit 01 -> +3 (+1800 Hz), 00 -> +1
(+600 Hz), 10 -> -1, 11 -> -3.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps

from wavecap_tpu import ops

SYMBOL_RATE = 4800.0
DEVIATION_HZ = 1800.0  # +/-1800 Hz for the outer symbols (+/-3)


# ---------------------------------------------------------------------------
# Filter designs (host-side)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def design_rrc(sample_rate: float, alpha: float = 0.2, span_symbols: int = 8) -> np.ndarray:
    """Root-raised-cosine filter, unit DC gain."""
    sps = sample_rate / SYMBOL_RATE
    n = int(span_symbols * sps) | 1
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
    return (h / h.sum()).astype(np.float32)


@lru_cache(maxsize=8)
def design_baseband_lpf(sample_rate: float) -> np.ndarray:
    """Anti-noise lowpass ahead of the discriminator (remez ~5.2/6.5 kHz,
    reference ``dsp/p25/c4fm.py:95``)."""
    numtaps = 63
    h = _sps.remez(
        numtaps, [0, 5200, 6500, sample_rate / 2], [1, 0], fs=sample_rate
    )
    return h.astype(np.float32)


# ---------------------------------------------------------------------------
# Demodulator
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class C4fmConfig:
    sample_rate: int = 48_000  # input channel rate
    rrc_alpha: float = 0.2
    loop_bandwidth: float = 0.005  # fraction of symbol rate
    max_clock_ppm: float = 2000.0
    # "scan": per-symbol Gardner loop (sequential lax.scan);
    # "block": vectorized per-block phase search + block-rate PI tracking —
    # ~2 orders of magnitude faster on TPU (no sequential gathers), at
    # equal decode quality for continuous transmissions (clock drift within
    # one 100-200 ms block is < 0.5 sample at max_clock_ppm)
    timing_impl: str = "block"

    # Simulcast echo-fit MMSE equalizer on the raw IQ ahead of the
    # demodulator (round 4; see models/p25/equalizer.py).  C4FM simulcast
    # systems collapse on near-equal-power ~70 us echoes exactly like LSM
    # (round-3 impairment table) and the reference has no equalizer for
    # either.  The template is EMPIRICAL (acf of a modulated reference
    # waveform — FM has no linear pulse spectrum).  0 disables.
    equalizer_taps: int = 0
    eq_lambda: float = 0.01
    eq_max_delay: int = 16
    # Runtime guard + engagement hysteresis (round 5): see CqpskConfig /
    # models/p25/equalizer.py module docstring
    eq_max_fine_offset_hz: float = 3000.0
    eq_engage_blocks: int = 2

    @property
    def sps(self) -> float:
        return self.sample_rate / SYMBOL_RATE


class C4fmState(NamedTuple):
    lpf_tail: jnp.ndarray  # complex
    disc_prev: jnp.ndarray
    rrc_tail: jnp.ndarray  # real
    interp_tail: jnp.ndarray  # trailing filtered samples for next block
    pos: jnp.ndarray  # next symbol center within interp_tail ++ new block
    freq: jnp.ndarray  # samples per symbol estimate
    integrator: jnp.ndarray
    gain: jnp.ndarray  # EMA of |soft| at symbol instants (~2.0 when locked)
    dc: jnp.ndarray  # EMA of DC offset (carrier error)
    prev_soft: jnp.ndarray
    eq_taps: jnp.ndarray  # (T,) complex equalizer taps (T=0 when off)
    eq_tail: jnp.ndarray  # (T-1,) streaming-conv carry
    eq_acf: jnp.ndarray  # EMA'd autocorrelation lags for the echo fit
    eq_hits: jnp.ndarray = np.zeros((), np.int32)  # consecutive decisive fits


INTERP_TAIL = 64  # samples of filtered signal carried across blocks


@lru_cache(maxsize=8)
def _c4fm_eq_candidates(sample_rate: int, max_delay: int) -> tuple:
    """C4FM candidate grid: empirical clean-waveform acf template.

    The template waveform is C4FM-modulated random dibits at 48 kHz,
    resampled to ``sample_rate`` (capture channel rates are integers with
    small rational ratios to 48 k).  Noise at this point (raw channelized
    IQ, ahead of the baseband LPF) is modeled as white: a lag-0 delta."""
    from math import gcd

    from scipy import signal as _sps

    from . import equalizer as eqz

    rng = np.random.default_rng(12345)
    ref = modulate_c4fm(rng.integers(0, 4, 40_000).astype(np.uint8), 48_000.0)
    if int(sample_rate) != 48_000:
        g = gcd(int(sample_rate), 48_000)
        ref = _sps.resample_poly(ref, int(sample_rate) // g, 48_000 // g)
    ref = ref / np.sqrt(np.mean(np.abs(ref) ** 2))
    n_tau = max_delay + 12
    n_ext = n_tau + max_delay
    r_ref = np.array(
        [np.mean(ref[t:] * np.conj(ref[: len(ref) - t])) for t in range(n_ext + 1)]
    )
    r_ref = (r_ref / r_ref[0].real).astype(np.complex64)
    noise = np.zeros(n_tau + 1, np.float64)
    noise[0] = 1.0
    return eqz.build_candidates(r_ref, noise, max_delay)


def c4fm_init(cfg: C4fmConfig) -> C4fmState:
    lpf = design_baseband_lpf(float(cfg.sample_rate))
    rrc = design_rrc(float(cfg.sample_rate), cfg.rrc_alpha)
    return C4fmState(
        lpf_tail=ops.fir_init(len(lpf), jnp.complex64),
        disc_prev=jnp.zeros((), jnp.complex64),
        rrc_tail=ops.fir_init(len(rrc), jnp.float32),
        interp_tail=jnp.zeros(INTERP_TAIL, jnp.float32),
        pos=jnp.asarray(float(INTERP_TAIL), jnp.float32),
        freq=jnp.asarray(48_000.0 / SYMBOL_RATE, jnp.float32).astype(jnp.float32),
        integrator=jnp.zeros((), jnp.float32),
        gain=jnp.asarray(0.0, jnp.float32),  # 0 = "estimate from first block"
        dc=jnp.zeros((), jnp.float32),
        prev_soft=jnp.zeros((), jnp.float32),
        eq_taps=_eq_init(cfg),
        eq_tail=jnp.zeros(max(cfg.equalizer_taps - 1, 0), jnp.complex64),
        eq_acf=jnp.zeros(
            (int(cfg.eq_max_delay) + 13) if cfg.equalizer_taps > 0 else 0,
            jnp.complex64,
        ),
        eq_hits=jnp.zeros((), jnp.int32),
    )


def _eq_init(cfg: C4fmConfig):
    from . import equalizer as eqz

    t = max(cfg.equalizer_taps, 0)
    assert t == 0 or t % 2 == 1, "equalizer_taps must be odd (or 0 = off)"
    return eqz.init_taps(t)


def n_symbols_per_block(cfg: C4fmConfig, block_len: int) -> int:
    """Symbols per block: consumption must equal production on average so
    the timing position neither starves nor overruns the carry tail."""
    return int(round(block_len / cfg.sps))


def c4fm_demodulate(
    iq: jnp.ndarray, state: C4fmState, cfg: C4fmConfig, eq_enable=None
):
    """Demodulate one IQ block -> (soft_symbols, dibits, state).

    ``soft_symbols`` are in units of the 4-level constellation (~±1, ±3).
    A fixed ``n_symbols_per_block(cfg, len(iq))`` symbols are produced.
    ``eq_enable`` (traced bool, round 5): runtime guard for the simulcast
    equalizer — False (off-bin-center slot) holds identity taps and
    restarts the echo fit; None means unguarded (centered input)."""
    fs = float(cfg.sample_rate)
    sps = cfg.sps
    lpf = jnp.asarray(design_baseband_lpf(fs))
    rrc = jnp.asarray(design_rrc(fs, cfg.rrc_alpha))

    if cfg.equalizer_taps > 0:
        # simulcast equalizer on the raw IQ (the discriminator is the
        # nonlinearity — the linear channel must be inverted before it)
        from . import equalizer as eqz

        preds, params, n_tau = _c4fm_eq_candidates(
            int(cfg.sample_rate), int(cfg.eq_max_delay)
        )
        allowed = jnp.bool_(True) if eq_enable is None else eq_enable
        est, eq_acf, sig = eqz.fit_and_invert(
            iq, state.eq_acf, preds, params, n_tau,
            cfg.equalizer_taps, cfg.eq_lambda, enable=allowed,
        )
        # engagement hysteresis: decisive for eq_engage_blocks in a row
        eq_hits = jnp.where(
            allowed & sig,
            jnp.minimum(state.eq_hits + 1, jnp.int32(1_000_000)),
            jnp.int32(0),
        )
        engaged = eq_hits >= jnp.int32(cfg.eq_engage_blocks)
        eq_taps = jnp.where(
            allowed & engaged, est, eqz.init_taps(cfg.equalizer_taps)
        )
        iq, eq_tail = ops.fir_filter(iq, eq_taps, state.eq_tail)
    else:
        eq_taps, eq_tail, eq_acf = state.eq_taps, state.eq_tail, state.eq_acf
        eq_hits = state.eq_hits

    x, lpf_tail = ops.fir_filter(iq, lpf, state.lpf_tail)
    # discriminator scaled so +/-1800 Hz -> +/-3.0
    fm, disc_prev = ops.quadrature_demod(
        x, fs, state.disc_prev, max_deviation_hz=DEVIATION_HZ / 3.0
    )
    filt, rrc_tail = ops.fir_filter(fm, rrc, state.rrc_tail)

    buf = jnp.concatenate([state.interp_tail, filt])
    n_sym = n_symbols_per_block(cfg, iq.shape[-1])

    if cfg.timing_impl == "block":
        return _demod_block_timing(
            buf, filt, n_sym, state, cfg,
            lpf_tail=lpf_tail, disc_prev=disc_prev, rrc_tail=rrc_tail,
            eq_taps=eq_taps, eq_tail=eq_tail, eq_acf=eq_acf, eq_hits=eq_hits,
        )

    alpha, beta = _loop_gains(cfg)
    fmin = sps * (1 - cfg.max_clock_ppm * 1e-6)
    fmax = sps * (1 + cfg.max_clock_ppm * 1e-6)

    def interp(pos):
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0.astype(jnp.float32)
        a = jax.lax.dynamic_slice(buf, (i0,), (2,))
        return a[0] * (1 - frac) + a[1] * frac

    # previous block's amplitude estimate (gain is a soft-output multiplier)
    amp_prev = jnp.where(state.gain < 0.01, 2.0, 2.0 / jnp.maximum(state.gain, 0.05))

    def step(carry, _):
        pos, freq, integ, prev = carry
        y = interp(pos) - dc0
        y_mid = interp(pos - freq * 0.5) - dc0
        # Gardner timing error on the 4-level waveform
        err = jnp.clip((prev - y) * y_mid / amp_prev**2, -2.0, 2.0)
        integ = jnp.clip(integ + beta * err, fmin - sps, fmax - sps)
        freq = jnp.clip(sps + integ, fmin, fmax)
        pos_next = pos + freq + alpha * err
        return (pos_next, freq, integ, y), y

    dc0 = state.dc * 0.9 + jnp.mean(filt) * 0.1
    carry0 = (state.pos, state.freq, state.integrator, state.prev_soft)
    (pos, freq, integ, prev), raw = jax.lax.scan(step, carry0, None, length=n_sym)

    # Blockwise amplitude normalization: E|symbol| = 2 for the equiprobable
    # 4-level constellation (replaces the reference's per-symbol equalizer
    # gain loop, c4fm.py:212 — block statistics are free on TPU).
    block_scale = 2.0 / jnp.maximum(jnp.mean(jnp.abs(raw)), 0.05)
    # Slow EMA after acquisition: the framer applies ONE scale per frame
    # (from the sync correlation), so the demod gain must be stable across
    # the blocks a frame spans.
    gain = jnp.where(
        state.gain < 0.01, block_scale, 0.95 * state.gain + 0.05 * block_scale
    )
    gain = jnp.clip(gain, 0.05, 40.0)
    soft = raw * gain
    dc = dc0

    dibits = soft_to_dibits(soft)

    # next block: keep last INTERP_TAIL samples; shift pos accordingly.
    # Clock offset between the transmitter and our sample clock slowly walks
    # the position out of the carry window — recenter by slipping one whole
    # symbol (the framer resynchronizes; same contract as the reference's
    # sample-slip handling in its interpolating buffer, c4fm.py:891).
    new_tail = buf[-INTERP_TAIL:]
    pos_next = pos - (buf.shape[-1] - INTERP_TAIL)
    pos_next = jnp.where(pos_next < 4.0, pos_next + sps, pos_next)
    pos_next = jnp.where(pos_next > INTERP_TAIL + sps, pos_next - sps, pos_next)
    new_state = C4fmState(
        lpf_tail=lpf_tail,
        disc_prev=disc_prev,
        rrc_tail=rrc_tail,
        interp_tail=new_tail,
        pos=pos_next,
        freq=freq,
        integrator=integ,
        gain=gain,
        dc=dc,
        prev_soft=prev,
        eq_taps=eq_taps,
        eq_tail=eq_tail,
        eq_acf=eq_acf,
        eq_hits=eq_hits,
    )
    return soft, dibits, new_state


def _demod_block_timing(buf, filt, n_sym, state, cfg, *, lpf_tail, disc_prev,
                        rrc_tail, eq_taps=None, eq_tail=None, eq_acf=None,
                        eq_hits=None):
    """Vectorized timing recovery: Oerder-Meyr line for clock error + lock
    detection, block-averaged Gardner discriminant for phase.

    Squaring the RRC-filtered waveform raises a spectral line at the
    symbol rate whose half-block phase drift measures the clock error
    directly (no aliasing); the absolute phase comes from the SAME
    Gardner error signal the sequential loop uses (reference
    ``dsp/p25/c4fm.py:650``), but averaged over the whole block's symbols
    and applied once with a measured S-curve slope — two extra gathers
    instead of a per-symbol scan.
    """
    sps = cfg.sps
    fmin = sps * (1 - cfg.max_clock_ppm * 1e-6)
    fmax = sps * (1 + cfg.max_clock_ppm * 1e-6)
    freq = jnp.clip(
        jnp.where(state.freq < 1.0, jnp.float32(sps), state.freq), fmin, fmax
    )

    n = filt.shape[-1]
    dc0 = state.dc * 0.9 + jnp.mean(filt) * 0.1

    # --- clock error + lock from the squared-signal spectral line
    u = (filt - dc0) ** 2
    idx = jnp.arange(n, dtype=jnp.float32)
    w = jnp.exp(-2j * jnp.pi * idx / sps)
    uw = u.astype(jnp.complex64) * w
    half_n = n // 2
    A1 = jnp.sum(uw[:half_n])
    A2 = jnp.sum(uw[half_n:])
    lock = jnp.abs(A1 + A2) / jnp.maximum(jnp.sum(jnp.abs(u)), 1e-9)
    dphi = jnp.angle(A2 * jnp.conj(A1))
    slope = (dphi / (2.0 * jnp.pi)) * sps * (sps / jnp.maximum(half_n, 1))
    slope = jnp.clip(slope, -0.005, 0.005)

    # --- feedforward absolute phase (Oerder-Meyr): the symbol-rate line's
    # complex angle locates the symbol instants directly, with no false
    # lock — the Gardner discriminant alone has a spurious zero half a
    # symbol off symbol center, and a Newton search started there stalls
    # for many blocks (observed as a multi-second CRC acquisition
    # transient on clean signal).  O&M gives a coarse unambiguous phase
    # (mod one symbol); the Gardner Newton refinement below then starts
    # from it whenever the tracked position disagrees by >3/4 sample.
    tau_om = -jnp.angle(A1 + A2) / (2.0 * jnp.pi) * sps  # filt coords, mod sps
    pos_mod = jnp.mod(state.pos - INTERP_TAIL, sps)
    delta_om = jnp.mod(tau_om - pos_mod + sps / 2.0, sps) - sps / 2.0

    # --- phase from the block-averaged Gardner discriminant
    m = jnp.arange(n_sym, dtype=jnp.float32)
    base = state.pos + m * freq
    hi = buf.shape[-1] - 2.0

    def sample(pos):
        pos = jnp.clip(pos, 0.0, hi)
        i0 = jnp.floor(pos).astype(jnp.int32)
        fr = pos - i0.astype(jnp.float32)
        return buf[i0] * (1.0 - fr) + buf[i0 + 1] * fr - dc0

    def gardner(phase_off):
        y = sample(base + phase_off)
        ym = sample(base + phase_off - freq * 0.5)
        g = jnp.mean((y[:-1] - y[1:]) * ym[1:])
        return g / jnp.maximum(jnp.mean(y * y), 1e-6)

    d0 = jnp.where(jnp.abs(delta_om) > 0.75, delta_om, 0.0)
    g0 = gardner(d0)
    g1 = gardner(d0 + 0.5)
    k = (g1 - g0) / 0.5  # S-curve slope (samples^-1)
    delta = jnp.where(jnp.abs(k) > 1e-3, d0 - g0 / k, d0)
    delta = jnp.clip(delta, -sps / 2.0, sps / 2.0)
    # second Newton step around the refined phase for convergence
    g2 = gardner(delta)
    delta2 = jnp.where(jnp.abs(k) > 1e-3, delta - g2 / k, delta)
    delta = jnp.clip(delta2, -sps / 2.0, sps / 2.0)

    # dead-air gate: no spectral line -> freeze timing
    significant = lock > 0.005
    delta = jnp.where(significant, delta, 0.0)
    slope = jnp.where(significant, slope, 0.0)

    integ = jnp.clip(
        state.integrator + 0.5 * slope + 0.05 * (delta / jnp.maximum(n_sym, 1)),
        fmin - sps,
        fmax - sps,
    )
    freq_next = jnp.clip(sps + integ, fmin, fmax)

    # gather all symbols along the corrected ramp (phase applied in full)
    ramp = delta + slope * (m - 0.5 * n_sym)
    raw = sample(base + ramp)

    block_scale = 2.0 / jnp.maximum(jnp.mean(jnp.abs(raw)), 0.05)
    gain = jnp.where(
        state.gain < 0.01, block_scale, 0.95 * state.gain + 0.05 * block_scale
    )
    gain = jnp.clip(gain, 0.05, 40.0)
    soft = raw * gain
    dibits = soft_to_dibits(soft)

    new_tail = buf[-INTERP_TAIL:]
    pos_next = (
        state.pos + delta + n_sym * freq_next - (buf.shape[-1] - INTERP_TAIL)
    )
    pos_next = jnp.where(pos_next < 4.0, pos_next + sps, pos_next)
    pos_next = jnp.where(pos_next > INTERP_TAIL + sps, pos_next - sps, pos_next)
    new_state = C4fmState(
        lpf_tail=lpf_tail,
        disc_prev=disc_prev,
        rrc_tail=rrc_tail,
        interp_tail=new_tail,
        pos=pos_next,
        freq=freq_next,
        integrator=integ,
        gain=gain,
        dc=dc0,
        prev_soft=raw[-1],
        eq_taps=eq_taps if eq_taps is not None else state.eq_taps,
        eq_tail=eq_tail if eq_tail is not None else state.eq_tail,
        eq_acf=eq_acf if eq_acf is not None else state.eq_acf,
        eq_hits=eq_hits if eq_hits is not None else state.eq_hits,
    )
    return soft, dibits, new_state


def _loop_gains(cfg: C4fmConfig):
    # standard 2nd-order PI loop, damping 0.707
    bw = cfg.loop_bandwidth
    zeta = 0.707
    denom = 1 + 2 * zeta * bw + bw * bw
    alpha = 4 * zeta * bw / denom
    beta = 4 * bw * bw / denom
    return float(alpha), float(beta)


def soft_to_dibits(soft: jnp.ndarray) -> jnp.ndarray:
    """Map soft symbols to dibits: +3->1, +1->0, -1->2, -3->3."""
    pos = soft >= 0
    outer = jnp.abs(soft) >= 2.0
    return jnp.where(
        pos,
        jnp.where(outer, 1, 0),
        jnp.where(outer, 3, 2),
    ).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Modulator (host-side; test-signal synthesis, reference encoders/trunking)
# ---------------------------------------------------------------------------


def modulate_c4fm(
    dibits: np.ndarray,
    sample_rate: float = 48_000.0,
    amplitude: float = 1.0,
    deviation_hz: float | None = None,
) -> np.ndarray:
    """Dibits -> C4FM complex IQ at ``sample_rate`` (RRC-shaped 4FSK).

    ``deviation_hz`` overrides the outer-symbol deviation (default P25's
    +-1800 Hz); DMR test signals pass 1944 (ETSI TS 102 361-1 4FSK)."""
    from wavecap_tpu.decoders.p25_frames import DIBIT_SYMBOLS

    dev = DEVIATION_HZ if deviation_hz is None else float(deviation_hz)
    sps = sample_rate / SYMBOL_RATE
    assert abs(sps - round(sps)) < 1e-9, "integer sps required for synthesis"
    sps = int(round(sps))
    symbols = DIBIT_SYMBOLS[np.asarray(dibits, np.uint8)]
    impulses = np.zeros(len(symbols) * sps, np.float32)
    impulses[::sps] = symbols * sps  # impulse-train gain compensation
    h = design_rrc(sample_rate)
    shaped = _sps.lfilter(h, 1.0, impulses)
    freq_hz = shaped * (dev / 3.0)
    phase = 2 * np.pi * np.cumsum(freq_hz) / sample_rate
    return (amplitude * np.exp(1j * phase)).astype(np.complex64)


def modulate_c4fm_cyclic(
    dibits: np.ndarray,
    sample_rate: float = 48_000.0,
    amplitude: float = 1.0,
) -> np.ndarray:
    """Dibits -> seamlessly *loopable* C4FM IQ.

    Differences from :func:`modulate_c4fm`, both required so that tiling
    the output end-to-start is indistinguishable from a continuous
    transmission of the repeated dibit sequence:

      * the RRC pulse shaping is a circular convolution over the loop
        (FFT product), so the filter tail wraps instead of truncating;
      * the accumulated FM phase over the loop is closed to an exact
        multiple of 2pi with a uniform sub-Hz frequency trim
        (|trim| <= fs/(2n) Hz — e.g. 0.22 Hz for a 2.25 s loop,
        far inside any receiver's tracking range).
    """
    from wavecap_tpu.decoders.p25_frames import DIBIT_SYMBOLS

    sps = sample_rate / SYMBOL_RATE
    assert abs(sps - round(sps)) < 1e-9, "integer sps required for synthesis"
    sps = int(round(sps))
    symbols = DIBIT_SYMBOLS[np.asarray(dibits, np.uint8)]
    n = len(symbols) * sps
    impulses = np.zeros(n, np.float64)
    impulses[::sps] = symbols * sps
    h = design_rrc(sample_rate).astype(np.float64)
    h_pad = np.zeros(n, np.float64)
    h_pad[: len(h)] = h
    # center the pulse so the shaped waveform is not delayed by the span
    h_pad = np.roll(h_pad, -(len(h) // 2))
    shaped = np.fft.irfft(np.fft.rfft(impulses) * np.fft.rfft(h_pad), n)
    freq_hz = shaped * (DEVIATION_HZ / 3.0)
    total_cycles = np.sum(freq_hz) / sample_rate
    trim_hz = (total_cycles - round(total_cycles)) * sample_rate / n
    phase = 2 * np.pi * np.cumsum(freq_hz - trim_hz) / sample_rate
    return (amplitude * np.exp(1j * phase)).astype(np.complex64)
