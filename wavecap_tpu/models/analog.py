"""Analog demodulator pipelines: WBFM, NBFM, AM, SSB, SAM.

Behavioral rebuild of reference ``dsp/fm.py:228`` (wbfm), ``dsp/fm.py:317``
(nbfm), ``dsp/am.py:45`` (am), ``dsp/am.py:144`` (ssb), ``dsp/sam.py:132``
(sam) as pure block functions ``demod(iq, state, cfg) -> (audio, state)``.

TPU-first deviations from the reference (all LTI-equivalent within the
SNR parity bound, and cheaper):

- Audio-rate post-processing.  The reference runs de-emphasis / MPX /
  voice filters at the full IQ rate and resamples last; we resample
  right after the (nonlinear) detector and run every linear audio filter
  at ``audio_rate``.  Swapping the order of LTI stages is exact in the
  passband, and it shrinks the sequential-recurrence work (the only
  non-embarrassingly-parallel part) by the decimation factor.
- All carry state (discriminator sample, IIR sections, AGC envelope,
  NCO phase, PLL) is an explicit pytree — the pipelines jit, vmap over a
  channel axis, and shard.

Each config is a frozen dataclass (static under jit); each state is a
NamedTuple pytree created by ``<mode>_init(cfg)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from wavecap_tpu import ops
from wavecap_tpu.ops import iir as iir_ops
from wavecap_tpu.ops import noise as noise_ops
from wavecap_tpu.ops import pll as pll_ops


# ---------------------------------------------------------------------------
# Shared audio post-chain (filters at audio rate + notches)
# ---------------------------------------------------------------------------


def _notch_states(n_notch: int):
    return tuple(ops.sos_init(1) for _ in range(n_notch))


def _apply_notches(audio, rate, freqs, states):
    new_states = []
    for f, z in zip(freqs, states):
        if 0 < f < rate / 2:
            audio, z = iir_ops.notch(audio, rate, f, z)
        new_states.append(z)
    return audio, tuple(new_states)


# ---------------------------------------------------------------------------
# WBFM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WbfmConfig:
    sample_rate: int
    audio_rate: int = 48_000
    enable_deemphasis: bool = True
    deemphasis_tau: float = 75e-6
    enable_mpx_filter: bool = True
    mpx_cutoff_hz: float = 15_000.0
    enable_highpass: bool = False
    highpass_hz: float = 100.0
    enable_noise_blanker: bool = False
    noise_blanker_threshold_db: float = 10.0
    notch_frequencies: tuple = ()
    enable_noise_reduction: bool = False
    noise_reduction_db: float = 12.0
    target_rms: float = 0.18


class WbfmState(NamedTuple):
    disc_prev: jnp.ndarray
    deemph: jnp.ndarray
    mpx_z: jnp.ndarray
    hp_z: jnp.ndarray
    notch_z: tuple
    rs_tail: jnp.ndarray = np.zeros(0, np.float32)  # np: no backend init at import


def wbfm_init(cfg: WbfmConfig) -> WbfmState:
    return WbfmState(
        disc_prev=ops.fm_discriminator_init(),
        deemph=ops.onepole_init(),
        mpx_z=ops.sos_init(iir_ops.n_sections("low", 5)),
        hp_z=ops.sos_init(iir_ops.n_sections("high", 5)),
        notch_z=_notch_states(len(cfg.notch_frequencies)),
        rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
    )


def wbfm_demod(iq: jnp.ndarray, state: WbfmState, cfg: WbfmConfig):
    """Wideband broadcast FM -> mono audio at ``cfg.audio_rate``."""
    audio, _fm, st = wbfm_demod_baseband(iq, state, cfg)
    return audio, st


def wbfm_demod_baseband(iq: jnp.ndarray, state: WbfmState, cfg: WbfmConfig):
    """Like :func:`wbfm_demod` but also returns the pre-MPX discriminator
    baseband at the input rate — the signal the 57 kHz RDS subcarrier
    lives in (reference taps it in the capture loop, capture.py:2871)."""
    ar = cfg.audio_rate
    if cfg.enable_noise_blanker:
        iq = noise_ops.noise_blanker(iq, cfg.noise_blanker_threshold_db)
    fm, disc_prev = ops.quadrature_demod(iq, cfg.sample_rate, state.disc_prev)
    audio, rs_tail = ops.resample_poly_stream(fm, cfg.sample_rate, ar, state.rs_tail)

    deemph = state.deemph
    if cfg.enable_deemphasis:
        audio, deemph = ops.deemphasis(audio, ar, cfg.deemphasis_tau, deemph)
    mpx_z = state.mpx_z
    if cfg.enable_mpx_filter and cfg.mpx_cutoff_hz < ar / 2:
        audio, mpx_z = iir_ops.lowpass(audio, ar, cfg.mpx_cutoff_hz, mpx_z)
    hp_z = state.hp_z
    if cfg.enable_highpass and cfg.highpass_hz > 0:
        audio, hp_z = iir_ops.highpass(audio, ar, cfg.highpass_hz, hp_z)
    audio, notch_z = _apply_notches(audio, ar, cfg.notch_frequencies, state.notch_z)
    if cfg.enable_noise_reduction:
        audio = noise_ops.spectral_noise_reduction(audio, cfg.noise_reduction_db)
    audio = ops.rms_normalize(audio, cfg.target_rms)
    audio = ops.soft_clip(audio)
    return audio, fm, WbfmState(disc_prev, deemph, mpx_z, hp_z, notch_z, rs_tail)


# ---------------------------------------------------------------------------
# NBFM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NbfmConfig:
    sample_rate: int
    audio_rate: int = 48_000
    max_deviation_hz: float = 5_000.0
    enable_deemphasis: bool = False
    deemphasis_tau: float = 75e-6
    enable_highpass: bool = False
    highpass_hz: float = 300.0
    enable_lowpass: bool = False
    lowpass_hz: float = 3_000.0
    enable_noise_blanker: bool = False
    noise_blanker_threshold_db: float = 10.0
    notch_frequencies: tuple = ()
    enable_noise_reduction: bool = False
    noise_reduction_db: float = 12.0
    target_rms: float = 0.18
    filter_impl: str = "iir"  # "iir" (scipy-parity biquad scans) | "fir"
    # "fir": voice band shaping as one linear-phase FIR (conv -> MXU/VPU
    # friendly, no log-depth scans) — the TPU-fast path for dense banks.
    fast_discriminator: bool = False  # polynomial atan2 (~1e-4 rad)


class NbfmState(NamedTuple):
    disc_prev: jnp.ndarray
    deemph: jnp.ndarray
    hp_z: jnp.ndarray
    lp_z: jnp.ndarray
    notch_z: tuple
    rs_tail: jnp.ndarray = np.zeros(0, np.float32)  # np: no backend init at import


@lru_cache(maxsize=32)
def _voice_band_fir(audio_rate: int, low_hz: float, high_hz: float, taps: int = 127):
    """Linear-phase bandpass covering the voice filters' passband."""
    from scipy import signal as _sps
    import numpy as _np

    nyq = audio_rate / 2.0
    lo = max(low_hz, 1.0) / nyq
    hi = min(high_hz, nyq * 0.95) / nyq
    h = _sps.firwin(taps, [lo, hi], pass_zero=False, window=("kaiser", 6.0))
    return h.astype(_np.float32)


def nbfm_init(cfg: NbfmConfig) -> NbfmState:
    if cfg.filter_impl == "fir":
        taps = _voice_band_fir(
            cfg.audio_rate,
            cfg.highpass_hz if cfg.enable_highpass else 10.0,
            cfg.lowpass_hz if cfg.enable_lowpass else cfg.audio_rate * 0.45,
        )
        return NbfmState(
            disc_prev=ops.fm_discriminator_init(),
            deemph=ops.onepole_init(),
            hp_z=ops.fir_init(len(taps), jnp.float32),
            lp_z=jnp.zeros((0,), jnp.float32),
            notch_z=_notch_states(len(cfg.notch_frequencies)),
            rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
        )
    return NbfmState(
        disc_prev=ops.fm_discriminator_init(),
        deemph=ops.onepole_init(),
        hp_z=ops.sos_init(iir_ops.n_sections("high", 5)),
        lp_z=ops.sos_init(iir_ops.n_sections("low", 5)),
        notch_z=_notch_states(len(cfg.notch_frequencies)),
        rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
    )


def nbfm_demod(iq: jnp.ndarray, state: NbfmState, cfg: NbfmConfig):
    """Narrowband FM voice -> audio.  Discriminator scaled to max deviation.

    The reference reuses the 75 kHz-scaled discriminator for NBFM
    (reference ``dsp/fm.py:370``) which leaves voice ~24 dB quiet before
    normalization; we scale by the configured deviation instead and then
    RMS-normalize identically.
    """
    ar = cfg.audio_rate
    if cfg.enable_noise_blanker:
        iq = noise_ops.noise_blanker(iq, cfg.noise_blanker_threshold_db)
    fm, disc_prev = ops.quadrature_demod(
        iq,
        cfg.sample_rate,
        state.disc_prev,
        max_deviation_hz=cfg.max_deviation_hz,
        atan_impl="fast" if cfg.fast_discriminator else "exact",
    )
    audio, rs_tail = ops.resample_poly_stream(fm, cfg.sample_rate, ar, state.rs_tail)

    deemph = state.deemph
    if cfg.enable_deemphasis:
        audio, deemph = ops.deemphasis(audio, ar, cfg.deemphasis_tau, deemph)
    hp_z = state.hp_z
    lp_z = state.lp_z
    if cfg.filter_impl == "fir" and (cfg.enable_highpass or cfg.enable_lowpass):
        taps = jnp.asarray(
            _voice_band_fir(
                ar,
                cfg.highpass_hz if cfg.enable_highpass else 10.0,
                cfg.lowpass_hz if cfg.enable_lowpass else ar * 0.45,
            )
        )
        audio, hp_z = ops.fir_filter(audio, taps, hp_z)
    else:
        if cfg.enable_highpass and cfg.highpass_hz > 0:
            audio, hp_z = iir_ops.highpass(audio, ar, cfg.highpass_hz, hp_z)
        if cfg.enable_lowpass and 0 < cfg.lowpass_hz < ar / 2:
            audio, lp_z = iir_ops.lowpass(audio, ar, cfg.lowpass_hz, lp_z)
    audio, notch_z = _apply_notches(audio, ar, cfg.notch_frequencies, state.notch_z)
    if cfg.enable_noise_reduction:
        audio = noise_ops.spectral_noise_reduction(audio, cfg.noise_reduction_db)
    audio = ops.rms_normalize(audio, cfg.target_rms)
    audio = ops.soft_clip(audio)
    return audio, NbfmState(disc_prev, deemph, hp_z, lp_z, notch_z, rs_tail)


# ---------------------------------------------------------------------------
# AM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AmConfig:
    sample_rate: int
    audio_rate: int = 48_000
    enable_agc: bool = True
    agc_target_db: float = -20.0
    enable_highpass: bool = True
    highpass_hz: float = 100.0
    enable_lowpass: bool = True
    lowpass_hz: float = 5_000.0
    enable_noise_blanker: bool = False
    noise_blanker_threshold_db: float = 10.0
    notch_frequencies: tuple = ()


class AmState(NamedTuple):
    hp_z: jnp.ndarray
    lp_z: jnp.ndarray
    agc: ops.AgcState
    notch_z: tuple
    rs_tail: jnp.ndarray = np.zeros(0, np.float32)  # np: no backend init at import


def am_init(cfg: AmConfig) -> AmState:
    return AmState(
        hp_z=ops.sos_init(iir_ops.n_sections("high", 5)),
        lp_z=ops.sos_init(iir_ops.n_sections("low", 5)),
        agc=ops.agc_init(),
        notch_z=_notch_states(len(cfg.notch_frequencies)),
        rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
    )


def am_demod(iq: jnp.ndarray, state: AmState, cfg: AmConfig):
    """AM envelope detection -> audio (reference dsp/am.py:45)."""
    ar = cfg.audio_rate
    audio = ops.am_envelope(iq)
    if cfg.enable_noise_blanker:
        audio = noise_ops.noise_blanker(audio, cfg.noise_blanker_threshold_db)
    audio, rs_tail = ops.resample_poly_stream(audio, cfg.sample_rate, ar, state.rs_tail)

    hp_z = state.hp_z
    if cfg.enable_highpass and cfg.highpass_hz > 0:
        audio, hp_z = iir_ops.highpass(audio, ar, cfg.highpass_hz, hp_z)
    lp_z = state.lp_z
    if cfg.enable_lowpass and 0 < cfg.lowpass_hz < ar / 2:
        audio, lp_z = iir_ops.lowpass(audio, ar, cfg.lowpass_hz, lp_z)
    audio, notch_z = _apply_notches(audio, ar, cfg.notch_frequencies, state.notch_z)
    agc = state.agc
    if cfg.enable_agc:
        audio, agc = ops.apply_agc(audio, ar, agc, target_db=cfg.agc_target_db)
    else:
        audio = ops.soft_clip(audio)
    return audio, AmState(hp_z, lp_z, agc, notch_z, rs_tail)


# ---------------------------------------------------------------------------
# SSB
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SsbConfig:
    sample_rate: int
    audio_rate: int = 48_000
    mode: str = "usb"  # "usb" | "lsb"
    bfo_offset_hz: float = 1_500.0
    enable_agc: bool = True
    agc_target_db: float = -20.0
    enable_bandpass: bool = True
    bandpass_low: float = 300.0
    bandpass_high: float = 3_000.0
    enable_noise_blanker: bool = False
    noise_blanker_threshold_db: float = 10.0
    notch_frequencies: tuple = ()


class SsbState(NamedTuple):
    nco_phase: jnp.ndarray
    bp_z: jnp.ndarray
    agc: ops.AgcState
    notch_z: tuple
    rs_tail: jnp.ndarray = np.zeros(0, np.float32)  # np: no backend init at import


def ssb_init(cfg: SsbConfig) -> SsbState:
    return SsbState(
        nco_phase=jnp.zeros((), jnp.uint32),
        # order 5 matches the reference's bandpass_filter default
        # (reference dsp/filters.py:177) — the round-5 differential tier
        # measured the order-4 mismatch as the ssb correlation gap
        bp_z=ops.sos_init(iir_ops.n_sections("band", 5)),
        agc=ops.agc_init(),
        notch_z=_notch_states(len(cfg.notch_frequencies)),
        rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
    )


def ssb_demod(iq: jnp.ndarray, state: SsbState, cfg: SsbConfig):
    """SSB product detection (reference dsp/am.py:144)."""
    ar = cfg.audio_rate
    shift = cfg.bfo_offset_hz if cfg.mode.lower() == "usb" else -cfg.bfo_offset_hz
    shifted, nco_phase = ops.freq_shift(iq, shift, cfg.sample_rate, state.nco_phase)
    audio = ops.ssb_product(shifted)
    if cfg.enable_noise_blanker:
        audio = noise_ops.noise_blanker(audio, cfg.noise_blanker_threshold_db)
    audio, rs_tail = ops.resample_poly_stream(audio, cfg.sample_rate, ar, state.rs_tail)

    bp_z = state.bp_z
    if cfg.enable_bandpass:
        audio, bp_z = iir_ops.bandpass(
            audio, ar, cfg.bandpass_low, cfg.bandpass_high, bp_z, order=5
        )
    audio, notch_z = _apply_notches(audio, ar, cfg.notch_frequencies, state.notch_z)
    agc = state.agc
    if cfg.enable_agc:
        audio, agc = ops.apply_agc(audio, ar, agc, target_db=cfg.agc_target_db)
    else:
        audio = ops.soft_clip(audio)
    return audio, SsbState(nco_phase, bp_z, agc, notch_z, rs_tail)


# ---------------------------------------------------------------------------
# SAM (synchronous AM)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SamConfig:
    sample_rate: int
    audio_rate: int = 48_000
    sideband: str = "dsb"  # "dsb" | "usb" | "lsb"
    pll_bandwidth_hz: float = 50.0
    pll_damping: float = 0.707
    enable_agc: bool = True
    agc_target_db: float = -20.0
    enable_highpass: bool = True
    highpass_hz: float = 100.0
    enable_lowpass: bool = True
    lowpass_hz: float = 5_000.0
    enable_noise_blanker: bool = False
    noise_blanker_threshold_db: float = 10.0
    notch_frequencies: tuple = ()


class SamState(NamedTuple):
    pll: pll_ops.PllState
    hp_z: jnp.ndarray
    lp_z: jnp.ndarray
    agc: ops.AgcState
    notch_z: tuple
    rs_tail: jnp.ndarray = np.zeros(0, np.float32)  # np: no backend init at import


def sam_init(cfg: SamConfig) -> SamState:
    return SamState(
        pll=pll_ops.pll_init(),
        hp_z=ops.sos_init(iir_ops.n_sections("high", 5)),
        lp_z=ops.sos_init(iir_ops.n_sections("low", 5)),
        agc=ops.agc_init(),
        notch_z=_notch_states(len(cfg.notch_frequencies)),
        rs_tail=ops.resample_stream_init(cfg.sample_rate, cfg.audio_rate),
    )


def sam_demod(iq: jnp.ndarray, state: SamState, cfg: SamConfig):
    """Synchronous AM with PLL carrier recovery (reference dsp/sam.py:132).

    Returns ``(audio, state)``; the recovered carrier offset in Hz is
    ``state.pll.freq * sample_rate / (2*pi)``.
    """
    ar = cfg.audio_rate
    coherent, pll_state = pll_ops.carrier_recovery_pll(
        iq, cfg.sample_rate, state.pll, cfg.pll_bandwidth_hz, cfg.pll_damping
    )
    sb = cfg.sideband.lower()
    if sb == "usb":
        audio = coherent.real + coherent.imag
    elif sb == "lsb":
        audio = coherent.real - coherent.imag
    else:
        audio = coherent.real
    audio = audio.astype(jnp.float32)
    if cfg.enable_noise_blanker:
        audio = noise_ops.noise_blanker(audio, cfg.noise_blanker_threshold_db)
    audio, rs_tail = ops.resample_poly_stream(audio, cfg.sample_rate, ar, state.rs_tail)

    hp_z = state.hp_z
    if cfg.enable_highpass and cfg.highpass_hz > 0:
        audio, hp_z = iir_ops.highpass(audio, ar, cfg.highpass_hz, hp_z)
    lp_z = state.lp_z
    if cfg.enable_lowpass and 0 < cfg.lowpass_hz < ar / 2:
        audio, lp_z = iir_ops.lowpass(audio, ar, cfg.lowpass_hz, lp_z)
    audio, notch_z = _apply_notches(audio, ar, cfg.notch_frequencies, state.notch_z)
    agc = state.agc
    if cfg.enable_agc:
        audio, agc = ops.apply_agc(audio, ar, agc, target_db=cfg.agc_target_db)
    else:
        audio = ops.soft_clip(audio)
    return audio, SamState(pll_state, hp_z, lp_z, agc, notch_z, rs_tail)
