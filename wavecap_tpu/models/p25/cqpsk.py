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
    # Coarse carrier-frequency-offset acquisition (round 4).  The
    # differential detector folds when |CFO| approaches Rs/8 (the pi/4
    # decision cell: 2*pi*CFO/Rs vs pi/4); real 800 MHz oscillators at
    # +-0.5 ppm sit exactly there.  A per-block feedforward estimate from
    # the 4th-power spectrum (pi/4-DQPSK: x^4 carries lines at
    # 4*CFO +- Rs/2; a joint two-line search is unambiguous for
    # |CFO| < Rs/4) drives an NCO pre-correction carried as traced state.
    # The reference tracks such offsets with its Costas loop
    # (reference dsp/p25/cqpsk.py:84); this is the block-feedforward
    # equivalent.  0.0 disables acquisition.
    cfo_max_hz: float = -1.0  # -1 = auto (0.23 * symbol_rate)
    # Simulcast equalizer (round 4): LSM's channel IS a two-transmitter
    # single-echo channel, so instead of a blind adaptive FIR (a CMA
    # variant was built, measured, and failed to converge on the
    # worst-case notch-at-DC phase realization), the echo parameters
    # (a, d, theta) are fitted ANALYTICALLY from the block
    # autocorrelation against the known clean pulse acf (see
    # _echo_mmse_taps) and a regularized MMSE inverse is synthesized
    # feedforward.  The reference has no equalizer at all (its
    # Costas+MM chain collapses on the same echo), so this is a
    # capability beyond it.  0 disables; 41 taps spans +-420 us at the
    # 48-50 kHz channel rate.
    equalizer_taps: int = 0
    eq_lambda: float = 0.01  # MMSE regularization (1/SNR-ish, caps boost)
    eq_max_delay: int = 16  # echo-delay search range (samples)
    eq_ema: float = 1.0  # per-block tap smoothing (1 = none)
    # Runtime guard (round 5): the echo-fit template assumes a (near)
    # bin-centered channel — the pipeline passes eq_enable=False for
    # slots whose fine offset exceeds this, forcing identity taps
    # (equalizer.py module docstring: measured bogus d=8/a=0.85
    # engagement on a +14 kHz-offset bin)
    eq_max_fine_offset_hz: float = 3000.0
    # Engagement hysteresis (round 5): the fit must be decisive for this
    # many CONSECUTIVE blocks before the inverse is applied
    eq_engage_blocks: int = 2

    @property
    def sps(self) -> float:
        return self.sample_rate / self.symbol_rate

    @property
    def cfo_span_hz(self) -> float:
        if self.cfo_max_hz < 0:
            return 0.23 * self.symbol_rate
        return self.cfo_max_hz


class CqpskState(NamedTuple):
    rrc_tail: jnp.ndarray  # complex FIR carry
    interp_tail: jnp.ndarray  # complex filtered samples
    pos: jnp.ndarray
    freq: jnp.ndarray
    integrator: jnp.ndarray
    prev_sym: jnp.ndarray  # complex symbol at previous instant
    bias: jnp.ndarray  # carrier-offset phase bias (radians/symbol)
    cfo_hz: jnp.ndarray  # acquired carrier offset (NCO pre-correction)
    cfo_phase: jnp.ndarray  # uint32 NCO phase carry for the correction
    eq_taps: jnp.ndarray  # (T,) complex equalizer taps (T=0 when off)
    eq_tail: jnp.ndarray  # (T-1,) streaming-conv carry
    eq_acf: jnp.ndarray  # EMA'd autocorrelation lags for the echo fit
    eq_hits: jnp.ndarray = np.zeros((), np.int32)  # consecutive decisive fits


INTERP_TAIL = 64
EQ_NFFT = 512


def _eq_init_taps(n_taps: int) -> jnp.ndarray:
    w0 = np.zeros(max(n_taps, 0), np.complex64)
    if n_taps > 0:
        w0[n_taps // 2] = 1.0
    return jnp.asarray(w0)


def cqpsk_init(cfg: CqpskConfig) -> CqpskState:
    rrc = design_rrc_cqpsk(float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha)
    t = max(cfg.equalizer_taps, 0)
    assert t == 0 or t % 2 == 1, "equalizer_taps must be odd (or 0 = off)"
    return CqpskState(
        rrc_tail=ops.fir_init(len(rrc), jnp.complex64),
        interp_tail=jnp.zeros(INTERP_TAIL, jnp.complex64),
        pos=jnp.asarray(float(INTERP_TAIL), jnp.float32),
        freq=jnp.asarray(0.0, jnp.float32),  # set from sps on first block
        integrator=jnp.zeros((), jnp.float32),
        prev_sym=jnp.zeros((), jnp.complex64),
        bias=jnp.zeros((), jnp.float32),
        cfo_hz=jnp.zeros((), jnp.float32),
        cfo_phase=jnp.zeros((), jnp.uint32),
        eq_taps=_eq_init_taps(t),
        eq_tail=jnp.zeros(max(t - 1, 0), jnp.complex64),
        eq_acf=jnp.zeros(
            (_eq_candidates(float(cfg.sample_rate), cfg.symbol_rate,
                            cfg.rrc_alpha, int(cfg.eq_max_delay))[2] + 1)
            if t > 0
            else 0,
            jnp.complex64,
        ),
        eq_hits=jnp.zeros((), jnp.int32),
    )


def n_symbols_per_block(cfg: CqpskConfig, block_len: int) -> int:
    return int(round(block_len / cfg.sps))


def _estimate_cfo_residual(filt: jnp.ndarray, cfg: CqpskConfig) -> jnp.ndarray:
    """Feedforward CFO estimate from the 4th-power spectrum of one block.

    pi/4-DQPSK steps are ODD multiples of pi/4, so ``x^4`` flips sign
    every symbol: ``x^4 = (-1)^k * exp(j*2*pi*(4*CFO)*t)`` — spectral
    lines at ``4*CFO +- Rs/2`` (odd harmonics of the per-symbol square
    wave).  Summing |X| at both line positions over a candidate grid is
    unambiguous for |CFO| < Rs/4 and needs no decisions.  Returns 0 when
    no significant line exists (dead air), so the carried ``cfo_hz``
    freezes instead of random-walking on noise."""
    fs = float(cfg.sample_rate)
    rs = float(cfg.symbol_rate)
    n = filt.shape[-1]
    size = 1 << int(np.ceil(np.log2(max(int(n), 1024))))
    p4 = filt * filt
    p4 = p4 * p4
    X = jnp.abs(jnp.fft.fft(p4, size))
    span = min(cfg.cfo_span_hz, 0.249 * rs)
    K4 = max(1, int(round(4.0 * span / fs * size)))
    k = jnp.arange(-K4, K4 + 1)
    off = int(round(rs / 2.0 / fs * size))
    M = X[(k + off) % size] + X[(k - off) % size]
    j = jnp.argmax(M)
    df = (j - K4).astype(jnp.float32) * np.float32(fs / size / 4.0)
    # line significance: the two matched bins of a locked signal hold a
    # large multiple of the average bin magnitude.  Hysteresis vs the
    # zero-residual candidate: multipath (simulcast echoes) smears x^4
    # structure that can out-peak the true line slightly — only move off
    # the current estimate when the candidate wins DECISIVELY (a real CFO
    # moves the whole line, making M(df) >> M(0)).
    significant = (M[j] > 8.0 * jnp.mean(X)) & (M[j] > 1.5 * M[K4])
    return jnp.where(significant, df, jnp.float32(0.0))


@lru_cache(maxsize=8)
def _eq_candidates(
    sample_rate: float, symbol_rate: float, alpha: float, max_delay: int
) -> tuple:
    """CQPSK candidate grid (shared machinery: models/p25/equalizer.py).

    Template: the clean post-RX-RRC signal acf = ifft(|R(w)|^4) (TX RRC x
    RX RRC); noise ahead of this point is white but passes the RX RRC, so
    its acf is the RRC autocorrelation."""
    from . import equalizer as eqz

    nfft = eqz.EQ_NFFT
    rrc = design_rrc_cqpsk(sample_rate, symbol_rate, alpha)
    R2 = np.abs(np.fft.fft(rrc, nfft)) ** 2
    r_s = np.fft.ifft(R2 * R2).real
    r_s = r_s / r_s[0]
    rho = np.fft.ifft(R2).real
    rho = rho / rho[0]
    n_tau = max_delay + 12
    return eqz.build_candidates(
        r_s[: n_tau + max_delay + 1].astype(np.complex64),
        rho[: n_tau + 1].astype(np.float64),
        max_delay,
    )


def _echo_mmse_taps(
    x: jnp.ndarray, acf_acc: jnp.ndarray, cfg: CqpskConfig, enable=None
) -> tuple:
    """Fit the LSM echo channel and build its MMSE inverse (see
    models/p25/equalizer.py for the method and its caveats)."""
    from . import equalizer as eqz

    preds, params, n_tau = _eq_candidates(
        float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha,
        int(cfg.eq_max_delay),
    )
    return eqz.fit_and_invert(
        x, acf_acc, preds, params, n_tau, cfg.equalizer_taps, cfg.eq_lambda,
        enable=enable,
    )


def cqpsk_demodulate(
    iq: jnp.ndarray, state: CqpskState, cfg: CqpskConfig, eq_enable=None
):
    """One block -> (soft_symbols, dibits, state); soft in C4FM units.

    ``eq_enable`` (traced bool, round 5): runtime guard for the simulcast
    equalizer — False (off-bin-center slot) holds identity taps and
    restarts the echo fit; None means unguarded (centered input)."""
    sps = cfg.sps
    if cfg.cfo_span_hz > 0:
        # de-rotate by the acquired offset (phase-continuous NCO); the
        # residual is re-estimated from this block's 4th-power spectrum
        iq, cfo_phase = ops.freq_shift(
            iq, -state.cfo_hz, float(cfg.sample_rate), state.cfo_phase
        )
    else:
        cfo_phase = state.cfo_phase
    rrc = jnp.asarray(design_rrc_cqpsk(float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha))
    filt, rrc_tail = ops.fir_filter(iq, rrc, state.rrc_tail)
    # normalize amplitude blockwise (AGC)
    scale = 1.0 / jnp.maximum(jnp.sqrt(jnp.mean(jnp.abs(filt) ** 2)), 1e-6)
    filt = filt * scale

    if cfg.cfo_span_hz > 0:
        # feedforward: estimate the residual offset from THIS block's
        # 4th-power spectrum and de-rotate the block before detection (the
        # ramp starts at 0, so the carried interp_tail stays continuous at
        # the boundary); the total is folded into the carried NCO so the
        # next block's pre-correction continues phase-exactly
        from wavecap_tpu.ops.nco import tuning_word

        resid_hz = _estimate_cfo_residual(filt, cfg)
        if cfg.equalizer_taps > 0:
            # simulcast: an echo can notch one of the two 4th-power
            # lines, aliasing the line-pair metric by Rs/4 — resolve via
            # the acf phase tilt (see equalizer.resolve_cfo_alias)
            from . import equalizer as eqz

            preds_np, _, n_tau_eq = _eq_candidates(
                float(cfg.sample_rate), cfg.symbol_rate, cfg.rrc_alpha,
                int(cfg.eq_max_delay),
            )
            resid_hz = eqz.resolve_cfo_alias(
                iq, rrc, resid_hz, cfg.symbol_rate / 4.0,
                float(cfg.sample_rate), preds_np, n_tau_eq,
            )
        nf = filt.shape[-1]
        ramp = jnp.arange(nf, dtype=jnp.float32) * (
            -2.0 * np.pi / float(cfg.sample_rate)
        )
        ph = ramp * resid_hz
        filt = filt * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        span = jnp.float32(min(cfg.cfo_span_hz, 0.249 * float(cfg.symbol_rate)))
        cfo_hz = jnp.clip(state.cfo_hz + resid_hz, -span, span)
        cfo_phase = cfo_phase + jnp.uint32(nf) * tuning_word(
            resid_hz, float(cfg.sample_rate)
        )
    else:
        cfo_hz = state.cfo_hz

    if cfg.equalizer_taps > 0:
        # simulcast equalizer: fit the echo channel on this block, build
        # its MMSE inverse, EMA with the carried taps, and filter with
        # streaming continuity (constant group delay — the timing
        # recovery's absolute O&M line absorbs it).  A CFO step this
        # block means the acf measurement mixed two rotations — restart
        # it and hold identity taps until the carrier settles.
        cfo_settled = (
            jnp.abs(resid_hz) < 20.0 if cfg.cfo_span_hz > 0 else jnp.bool_(True)
        )
        allowed = cfo_settled
        if eq_enable is not None:
            # fine-offset runtime guard (round 5): off-template slots
            # never fit, never accumulate, never engage
            allowed = allowed & eq_enable
        acf_in = jnp.where(
            allowed, state.eq_acf, jnp.zeros_like(state.eq_acf)
        )
        est, eq_acf, sig = _echo_mmse_taps(filt, acf_in, cfg, enable=allowed)
        # engagement hysteresis: the fit must be decisive for
        # eq_engage_blocks CONSECUTIVE blocks before the inverse applies
        eq_hits = jnp.where(
            allowed & sig,
            jnp.minimum(state.eq_hits + 1, jnp.int32(1_000_000)),
            jnp.int32(0),
        )
        engaged = eq_hits >= jnp.int32(cfg.eq_engage_blocks)
        est = jnp.where(
            allowed & engaged, est, _eq_init_taps(cfg.equalizer_taps)
        )
        eq_taps = cfg.eq_ema * est + (1.0 - cfg.eq_ema) * state.eq_taps
        filt, eq_tail = ops.fir_filter(filt, eq_taps, state.eq_tail)
    else:
        eq_taps, eq_tail, eq_acf = state.eq_taps, state.eq_tail, state.eq_acf
        eq_hits = state.eq_hits

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
        # Vectorized feedforward timing, mirroring c4fm._demod_block_timing:
        # the squared ENVELOPE |y|^2 of the RRC-shaped pi/4-DQPSK waveform
        # carries a spectral line at the symbol rate (Oerder-Meyr
        # nonlinearity for PSK); its complex angle locates the symbol
        # instants absolutely (mod one symbol), and the half-block phase
        # drift measures clock error.  The earlier mean-|y| candidate
        # search had no usable S-curve for pi/4 transitions (the envelope
        # barely dips between +-pi/4 steps), so the loop could latch a
        # wrong clock in the acquisition transient and then free-run,
        # slipping ~freq_err*n_sym samples per block (observed: 50 %
        # steady-state TSBK CRC through the channelizer; one-shot 100 %).
        n = filt.shape[-1]
        u = jnp.abs(filt) ** 2
        idx = jnp.arange(n, dtype=jnp.float32)
        w = jnp.exp(-2j * jnp.pi * idx / sps)
        uw = u.astype(jnp.complex64) * w
        half_n = n // 2
        A1 = jnp.sum(uw[:half_n])
        A2 = jnp.sum(uw[half_n:])
        lock = jnp.abs(A1 + A2) / jnp.maximum(jnp.sum(u), 1e-9)
        dphi_line = jnp.angle(A2 * jnp.conj(A1))
        slope = (dphi_line / (2.0 * jnp.pi)) * sps * (sps / jnp.maximum(half_n, 1))
        slope = jnp.clip(slope, -0.005, 0.005)

        tau_om = -jnp.angle(A1 + A2) / (2.0 * jnp.pi) * sps  # filt coords
        pos_mod = jnp.mod(state.pos - INTERP_TAIL, sps)
        delta_om = jnp.mod(tau_om - pos_mod + sps / 2.0, sps) - sps / 2.0

        m = jnp.arange(n_sym, dtype=jnp.float32)
        base = state.pos + m * freq0
        hi = buf.shape[-1] - 2.0

        def sample(pos):
            pos = jnp.clip(pos, 0.0, hi)
            i0 = jnp.floor(pos).astype(jnp.int32)
            fr = pos - i0.astype(jnp.float32)
            return buf[i0] * (1.0 - fr) + buf[i0 + 1] * fr

        def gardner(phase_off):
            # complex Gardner TED, block-averaged (same discriminant the
            # scan loop uses per symbol)
            y = sample(base + phase_off)
            ym = sample(base + phase_off - freq0 * 0.5)
            g = jnp.mean((jnp.conj(ym[1:]) * (y[:-1] - y[1:])).real)
            return g / jnp.maximum(jnp.mean(jnp.abs(y) ** 2), 1e-6)

        # O&M is coarse but unambiguous; one Newton step on the Gardner
        # S-curve refines it when the tracked position is already close
        d0 = jnp.where(jnp.abs(delta_om) > 0.75, delta_om, 0.0)
        g0 = gardner(d0)
        g1 = gardner(d0 + 0.5)
        k = (g1 - g0) / 0.5
        delta = jnp.where(jnp.abs(k) > 1e-3, d0 - g0 / k, d0)
        delta = jnp.clip(delta, -sps / 2.0, sps / 2.0)
        g2 = gardner(delta)
        delta2 = jnp.where(jnp.abs(k) > 1e-3, delta - g2 / k, delta)
        delta = jnp.clip(delta2, -sps / 2.0, sps / 2.0)

        # dead-air gate: no symbol-rate line -> freeze timing (alpha=0.2
        # excess bandwidth gives a weaker line than C4FM's discriminator
        # path, hence the lower threshold)
        significant = lock > 0.002
        delta = jnp.where(significant, delta, 0.0)
        slope = jnp.where(significant, slope, 0.0)

        integ = jnp.clip(
            state.integrator
            + 0.5 * slope
            + 0.05 * (delta / jnp.maximum(n_sym, 1)),
            fmin - sps,
            fmax - sps,
        )
        freq = jnp.clip(sps + integ, fmin, fmax)
        ramp = delta + slope * (m - 0.5 * n_sym)
        syms = sample(base + ramp)
        pos = state.pos + delta + n_sym * freq
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
        cfo_hz=cfo_hz,
        cfo_phase=cfo_phase,
        eq_taps=eq_taps,
        eq_tail=eq_tail,
        eq_acf=eq_acf,
        eq_hits=eq_hits,
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


def modulate_cqpsk_cyclic(
    dibits: np.ndarray,
    sample_rate: float = 48_000.0,
    symbol_rate: float = 4800.0,
    alpha: float = 0.2,
    amplitude: float = 1.0,
) -> np.ndarray:
    """Dibits -> seamlessly *loopable* pi/4-DQPSK IQ.

    Loop continuity needs two closures (cf. ``modulate_c4fm_cyclic``):
    the differential phase accumulated over the loop must be a multiple
    of 2*pi — achieved by appending <=2 pad dibits whose steps cancel the
    residue (pi/4-step lattice, so an exact closure always exists) — and
    the RRC shaping is applied as a circular convolution so the pulse
    tails wrap instead of truncating.
    """
    from wavecap_tpu.decoders.p25_frames import DIBIT_SYMBOLS

    sps = sample_rate / symbol_rate
    assert abs(sps - round(sps)) < 1e-9
    sps = int(round(sps))
    units = DIBIT_SYMBOLS[np.asarray(dibits, np.uint8)].astype(np.int64)
    residue = int(np.sum(units)) % 8  # phase in pi/4 units, mod 2*pi
    # pad steps (in {+1,+3,-1,-3}) that sum to -residue mod 8
    pads = {0: [], 1: [-1], 2: [-1, -1], 3: [-3], 4: [3, 1], 5: [3],
            6: [1, 1], 7: [1]}[residue]
    units = np.concatenate([units, np.asarray(pads, np.int64)])
    phases = np.cumsum(units * (np.pi / 4))
    symbols = np.exp(1j * phases)
    n = len(symbols) * sps
    impulses = np.zeros(n, np.complex128)
    impulses[::sps] = symbols * sps
    h = design_rrc_cqpsk(sample_rate, symbol_rate, alpha).astype(np.float64)
    h_pad = np.zeros(n)
    h_pad[: len(h)] = h
    h_pad = np.roll(h_pad, -(len(h) // 2))  # zero-delay centered pulse
    shaped = np.fft.ifft(np.fft.fft(impulses) * np.fft.fft(h_pad))
    return (amplitude * shaped / np.abs(shaped).max()).astype(np.complex64)
