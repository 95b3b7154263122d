"""Feedforward simulcast echo equalizer shared by the P25 demods.

Simulcast distortion IS a two-transmitter single-echo channel
``H(w) = 1 + a e^{j theta} e^{-j w d}``.  The measured autocorrelation of
the received signal is the CLEAN waveform's autocorrelation convolved
with the channel's autocorrelation (plus a noise term) — so with a known
clean-signal acf template the echo parameters are identified by matching
against a dense precomputed candidate grid (no matrix inversion: at ~10
samples/symbol the lag design matrix is hopelessly collinear, which sank
both an LS-pinv fit and a frequency-ripple fit prototype; a blind CMA
prototype before that failed to converge on the worst-case notch-at-DC
phase).  The winning channel's regularized MMSE inverse
``W = conj(H)/(|H|^2 + lambda)`` is synthesized on an FFT grid and
windowed to FIR taps.

Shared by:
  * CQPSK/LSM (``cqpsk.py``): analytic template from the RRC pulse,
    applied post-matched-filter;
  * C4FM (``c4fm.py``): empirical template from a modulated reference
    waveform (FM signals have no linear pulse spectrum), applied to the
    raw IQ ahead of the demodulator.

The reference has no equalizer at all for either air interface
(its Costas+MM / C4FM chains collapse on a near-equal-power 70 us echo
— round-3 impairment table); this is a capability beyond it.

Caveats: |acf| cannot distinguish a causal from an anticausal echo (the
causal / minimum-phase, a<1 interpretation is used — exact for the
common simulcast case); the a-grid caps at 0.85 because over-inversion
is catastrophic while under-inversion degrades gracefully (measured:
an a=0.8 truth decodes 18/18 through an a=0.85 inverse and 7/18 through
a 0.95 one); and the template assumes the channel is (near) bin-centered
— a large fine offset through the channelizer truncates the band
asymmetrically, which the single-echo model can mis-fit as a strong
echo (measured on a +14 kHz-offset bin: bogus d=8/a=0.85 engagement).
Off-center channels decode fine unequalized (100 % steady CRC at 10 dB
SNR even with a 12.5 kHz fine offset — docs/perf.md).

Round 5: the bin-centering caveat is enforced at RUNTIME, not in prose —
``fit_and_invert(enable=...)`` takes a traced guard that the capture
pipeline derives from each slot's fine offset (``eq_max_fine_offset_hz``),
forcing identity taps and restarting the acf estimate on off-center
assignments; and engagement requires the fit to be decisive for
``eq_engage_blocks`` CONSECUTIVE blocks (carried ``eq_hits`` counter in
the demod state), so a single noisy-block fit cannot spuriously engage.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

EQ_NFFT = 512


def init_taps(n_taps: int) -> jnp.ndarray:
    w0 = np.zeros(max(n_taps, 0), np.complex64)
    if n_taps > 0:
        w0[n_taps // 2] = 1.0
    return jnp.asarray(w0)


def build_candidates(
    r_ref: np.ndarray, noise_acf: np.ndarray, max_delay: int
) -> tuple:
    """Predicted normalized acfs for every (d, theta, a, nu) candidate.

    ``r_ref``: clean-signal acf for lags 0..n_tau+max_delay (the extra
    tail feeds the shifted-template lookups at t+d; conjugate-symmetric
    continuation used for negative lags); ``noise_acf``: the noise
    process's acf over lags 0..n_tau (a delta for white noise ahead of
    the receive filtering, the filter acf after it).  Candidate 0 is the
    no-echo model used for gating.  Returns (preds, params, n_tau) with
    ``preds`` (n_cand, n_tau+1) complex64 normalized to preds[:,0]=1 and
    ``params`` rows (d, theta, a)."""
    n_tau = len(r_ref) - 1 - max_delay
    n_ext = len(r_ref) - 1

    def rr(k: int) -> complex:
        if abs(k) > n_ext:
            return 0.0j
        return complex(r_ref[k]) if k >= 0 else complex(np.conj(r_ref[-k]))

    cands = [(0.0, 0.0, 0.0, 0.0)]
    for d in range(1, max_delay + 1):
        for th in np.linspace(0, 2 * np.pi, 32, endpoint=False):
            for a in (0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85):
                for nu in (0.0, 0.1, 0.25):
                    cands.append((float(d), float(th), float(a), float(nu)))
    taus = np.arange(n_tau + 1)
    preds = np.zeros((len(cands), n_tau + 1), np.complex64)
    for i, (d, th, a, nu) in enumerate(cands):
        di = int(d)
        r = np.array(
            [
                (1 + a * a) * rr(t)
                + a * np.exp(1j * th) * rr(t - di)
                + a * np.exp(-1j * th) * rr(t + di)
                for t in taus
            ]
        )
        r = r + nu * noise_acf[: n_tau + 1]
        preds[i] = (r / r[0].real).astype(np.complex64)
    params = np.asarray([(c[0], c[1], c[2]) for c in cands], np.float32)
    return preds, params, n_tau


def block_acf(x: jnp.ndarray, n_tau: int) -> jnp.ndarray:
    """Normalized complex acf of one block for lags 0..n_tau."""
    n = x.shape[-1]
    xc = jnp.conj(x)
    r = jnp.stack(
        [jnp.mean(x[tau:] * xc[: n - tau]) for tau in range(n_tau + 1)]
    )
    return r / jnp.maximum(r[0].real, 1e-9)


def resolve_cfo_alias(
    iq: jnp.ndarray,
    rx_filt: jnp.ndarray,
    df: jnp.ndarray,
    alias_hz: float,
    sample_rate: float,
    preds_np: np.ndarray,
    n_tau: int,
    margin: float = 0.8,
) -> jnp.ndarray:
    """Disambiguate a 4th-power CFO estimate under multipath.

    pi/4-family 4th-power lines sit at ``4*df +- Rs/2``: candidates
    spaced ``Rs/4`` apart SHARE one line, so when an echo channel notches
    the other line the line-pair metric aliases (measured: a 70 us
    a=0.8 echo sent a true +1000 Hz offset to a decisive false lock at
    -200 Hz = +1000 - Rs/4).  The autocorrelation has no such ambiguity,
    so score each alias ``df + k*alias_hz`` by its best echo-grid fit.
    The offset must be removed BEFORE the receive filter — the channel
    acf template assumes a centered passband, and a 1 kHz mis-centering
    reshapes the acf enough to invert the comparison (measured) — so
    each candidate de-rotates the raw block and re-filters.  Moves off
    ``df`` only on a decisive (``margin``) win."""
    preds = jnp.asarray(preds_np)
    n = iq.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) / sample_rate

    def score(f):
        ph = -2.0 * np.pi * f * t
        x = iq * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
        filt = jnp.convolve(x, rx_filt, mode="same")
        r = block_acf(filt, n_tau)
        r = jnp.where(jnp.all(jnp.isfinite(r)), r, jnp.zeros_like(r))
        return jnp.min(jnp.sum(jnp.abs(preds - r[None, :]) ** 2, axis=-1))

    s0 = score(df)
    s_lo = score(df - alias_hz)
    s_hi = score(df + alias_hz)
    best = jnp.where(
        s_lo < jnp.minimum(s0 * margin, s_hi),
        df - alias_hz,
        jnp.where(s_hi < s0 * margin, df + alias_hz, df),
    )
    return best


def fit_and_invert(
    x: jnp.ndarray,
    acf_acc: jnp.ndarray,
    preds_np: np.ndarray,
    params_np: np.ndarray,
    n_tau: int,
    n_taps: int,
    lam: float,
    a_floor: float = 0.35,
    gate_ratio: float = 0.6,
    acf_ema: float = 0.5,
    enable=None,
) -> tuple:
    """One block of the echo fit: measure acf (EMA'd with the carried
    ``acf_acc``), match the candidate grid, synthesize the MMSE inverse.
    Returns ``(taps, new_acf_state, significant)``; identity taps (and
    ``significant`` False) when the block is too small, no material echo
    is found, or the echo model does not beat the no-echo candidate
    decisively.  ``enable`` (traced bool, round 5) is the runtime guard:
    False forces identity taps AND restarts the acf estimate — used when
    the channel's fine offset exceeds the template's validity (an
    off-center channelizer bin truncates the band asymmetrically, which
    the single-echo model can mis-fit as a strong echo; measured bogus
    d=8/a=0.85 on a +14 kHz bin)."""
    c = n_taps // 2
    nfft = EQ_NFFT
    n = x.shape[-1]
    if n < 4 * (n_tau + 1):  # static: block too small to estimate
        return init_taps(n_taps), acf_acc, jnp.bool_(False)
    if enable is None:
        enable = jnp.bool_(True)

    xc = jnp.conj(x)
    r = jnp.stack(
        [jnp.mean(x[tau:] * xc[: n - tau]) for tau in range(n_tau + 1)]
    )
    r = r / jnp.maximum(r[0].real, 1e-9)
    # a non-finite block estimate (pathological input) must not poison
    # the EMA forever
    r = jnp.where(jnp.all(jnp.isfinite(r)), r, jnp.zeros_like(r))
    acf = jnp.where(
        jnp.sum(jnp.abs(acf_acc)) > 0,
        (1.0 - acf_ema) * acf_acc + acf_ema * r,
        r,
    )
    # guard: a disabled fit must not accumulate the off-template acf
    acf = jnp.where(enable, acf, jnp.zeros_like(acf))

    preds = jnp.asarray(preds_np)
    resid = jnp.sum(jnp.abs(preds - acf[None, :]) ** 2, axis=-1)
    j = jnp.argmin(resid)
    d, theta, a = jnp.asarray(params_np)[j]
    significant = (resid[j] < gate_ratio * resid[0]) & (a >= a_floor) & enable
    a = jnp.where(significant, a, 0.0)

    w_grid = 2.0 * np.pi * np.arange(nfft) / nfft
    H = 1.0 + a * jnp.exp(1j * theta) * jnp.exp(-1j * jnp.asarray(w_grid) * d)
    W = jnp.conj(H) / (jnp.abs(H) ** 2 + lam)
    h_t = jnp.fft.ifft(W)  # circular impulse response, two-sided
    idx = (jnp.arange(n_taps) - c) % nfft  # window [-c..c] -> linear FIR
    taps = h_t[idx].astype(jnp.complex64)
    taps = jnp.where(enable, taps, init_taps(n_taps))
    return taps, acf, significant
