"""Non-maximally-decimated polyphase filter-bank channelizer (NMDPFB).

Splits one wideband IQ stream into M equal channels, each 2x oversampled
(output rate = 2 * fs / M), in one batched computation.  This is the
TPU-native replacement for the reference's per-output-sample Python loop
(reference ``dsp/channelizer.py:28-137``) *and* for the reference's
per-channel ``freq_shift`` + decimate fan-out in the capture hot loop
(reference ``capture.py:298``): all channels are produced at once for
O(N*taps_per_arm + N log M) total work, independent of channel count.

Math (standard Fred Harris M/2 scheme; the derivation drives the layout):

    y_c[s] = sum_j h[j] x[s*M/2 - j] e^{-2pi i (s*M/2 - j) c / M}
           = (-1)^{s c} * sum_k e^{2pi i k c / M} u_k[s],
    u_k[s] = sum_m h[k + m M] x[(s - 2m)*M/2 - k].

Key structural facts exploited here:
  * u_k[s] only couples steps of equal parity, so even and odd output
    steps are computed as two independent stacks;
  * v[k, r] = x[r*M - k] is a *reshape + flip* of the input (no gather);
  * the k-sum is an (unnormalized) inverse FFT across arms, batched over
    all output steps;
  * the (-1)^{s c} factor is a static sign mask on odd steps (the
    reference omits this correction entirely — its odd-step outputs are
    frequency-shifted by half a channel).

Streaming state is the last ``M*T`` input samples; block length must be a
multiple of ``M`` so output-step parity stays aligned across blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as _sps


@lru_cache(maxsize=32)
def design_prototype(
    channel_count: int, taps_per_channel: int, cutoff_scale: float = 0.5, beta: float = 8.0
) -> np.ndarray:
    """Kaiser lowpass prototype, unity DC gain, length ``M*T`` (zero-padded).

    ``cutoff_scale`` is the -6 dB half-width in units of channel spacing:
    0.5 gives perfect-reconstruction band edges (adjacent channels cross
    at -6 dB); the reference uses 0.9 (reference ``dsp/channelizer.py:75``)
    for deliberately overlapped wide channels.
    """
    m, t = channel_count, taps_per_channel
    cutoff = 2.0 * cutoff_scale / m  # normalized to Nyquist
    h = _sps.firwin(m * t - 1, cutoff, window=("kaiser", beta))
    return np.concatenate([h, [0.0]]).astype(np.float32)


@dataclass(frozen=True)
class ChannelizerConfig:
    sample_rate: float
    channel_bandwidth: float = 25_000.0
    taps_per_channel: int = 9
    cutoff_scale: float = 0.5
    # Cross-arm DFT implementation: "fft" (XLA FFT), "matmul" (MXU
    # matmuls against cos/sin matrices), or "auto" (matmul for
    # non-power-of-2 M <= 2048, where XLA falls back to Bluestein and is
    # ~10x slower than the systolic array on TPU).
    dft_impl: str = "auto"

    def _use_matmul_dft(self) -> bool:
        if self.dft_impl == "matmul":
            return True
        if self.dft_impl == "fft":
            return False
        m = self.channel_count
        return m <= 2048 and (m & (m - 1)) != 0

    @property
    def channel_count(self) -> int:
        m = int(self.sample_rate / self.channel_bandwidth)
        return m - (m % 2)

    @property
    def channel_rate(self) -> float:
        """Per-channel output rate (2x oversampled)."""
        return 2.0 * self.sample_rate / self.channel_count

    def channel_index(self, offset_hz: float) -> int:
        """FFT-bin channel index for a frequency offset from band center."""
        m = self.channel_count
        idx = int(round(offset_hz / (self.sample_rate / m)))
        return idx % m

    def channel_offset_hz(self, index: int) -> float:
        m = self.channel_count
        if index >= m // 2:
            index -= m
        return index * self.sample_rate / m


def channelizer_init(cfg: ChannelizerConfig) -> jnp.ndarray:
    """History carry: last ``M*T`` input samples (zeros at stream start)."""
    return jnp.zeros(cfg.channel_count * cfg.taps_per_channel, jnp.complex64)


def channelize(x: jnp.ndarray, state: jnp.ndarray, cfg: ChannelizerConfig):
    """Channelize one block.

    Args:
        x: ``(N,)`` complex64 wideband IQ, ``N % M == 0``.
        state: history from :func:`channelizer_init` / previous call.

    Returns:
        ``(channels, state)`` with ``channels`` of shape ``(M, S)`` complex64,
        ``S = 2N/M`` output samples per channel at rate ``2*fs/M``; channel
        ``c`` is centered at offset ``c*fs/M`` (FFT bin order, negative
        offsets wrap).
    """
    m = cfg.channel_count
    t = cfg.taps_per_channel
    n = x.shape[-1]
    if n % m != 0:
        raise ValueError(f"block length {n} must be a multiple of M={m}")
    r_steps = n // m  # output steps per parity

    proto = design_prototype(m, t, cfg.cutoff_scale)
    # Column-reversed arms fold the per-window sample reversal into the
    # (tiny, host-side) taps, so no lane-axis flip of the big array is
    # needed (reversing the minor dimension is layout-hostile on TPU):
    # with w[j, c] = x_ext[offset + jM + c] (a pure reshape),
    #   u~[r, c] = sum_m arms[m_tap, M-1-c] * w[r + T-1-m_tap, c]
    # and y = DFT_fwd(u~) * exp(-2pi i c / M) equals the flipped-window
    # inverse-DFT formulation (substitute c = M-1-k in the k-sum).
    arms_rev = jnp.asarray(proto.reshape(t, m)[:, ::-1].copy())
    twiddle = np.exp(-2j * np.pi * np.arange(m) / m).astype(np.complex64)

    x_ext = jnp.concatenate([state, x])  # length MT + N

    def parity_stack(offset: int) -> jnp.ndarray:
        seg = jax.lax.dynamic_slice_in_dim(x_ext, offset, (r_steps + t - 1) * m)
        w = seg.reshape(r_steps + t - 1, m)
        u = jnp.zeros((r_steps, m), x.dtype)
        for m_tap in range(t):
            u = u + w[t - 1 - m_tap : t - 1 - m_tap + r_steps, :] * arms_rev[m_tap][None, :]
        return u

    # Even steps s=2r use windows ending at L + rM; odd at L + rM + M/2.
    # Row j of parity_stack(offset) covers x_ext[offset+jM : offset+(j+1)M];
    # matching window-end L + (j-(T-1))M requires offset = 1 for even
    # (L = MT) and 1 + M/2 for odd.
    u_even = parity_stack(1)
    u_odd = parity_stack(1 + m // 2)

    if cfg._use_matmul_dft():
        from .planar import _dft_factor, planar_factored_dft, planar_matmul_dft

        if _dft_factor(m) is not None:
            # two-stage Cooley-Tukey matmuls (round 5): ~m/(m1+m2) fewer
            # FLOPs than the full m x m matmul (14x at m=800) at BETTER
            # accuracy (shorter f32 dot chains: ~135 dB vs ~99 dB)
            def dft_fwd(u):
                yr, yi = planar_factored_dft(u.real, u.imag, m, inverse=False)
                return jax.lax.complex(yr, yi)
        else:
            def dft_fwd(u):
                yr, yi = planar_matmul_dft(u.real, u.imag, m, inverse=False)
                return jax.lax.complex(yr, yi)
    else:
        def dft_fwd(u):
            return jnp.fft.fft(u, axis=-1)

    tw = jnp.asarray(twiddle)
    y_even = dft_fwd(u_even) * tw
    y_odd = dft_fwd(u_odd) * tw
    sign = jnp.asarray(np.where(np.arange(m) % 2 == 0, 1.0, -1.0), np.float32)
    y_odd = y_odd * sign

    y = jnp.stack([y_even, y_odd], axis=1).reshape(2 * r_steps, m)
    new_state = x_ext[-m * t :]
    return y.T.astype(jnp.complex64), new_state
