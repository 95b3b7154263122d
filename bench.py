"""Headline benchmark: wideband IQ -> channelizer -> full demod bank, per chip.

BASELINE.json target: >= 100 concurrent 12.5 kHz channels from a 10 Msps
stream per chip.  This bench runs an 800-channel NMDPFB (10 Msps / 12.5 kHz)
plus a vmapped NBFM demod on EVERY channel plus the spectrum FFT, and
reports sustained IQ throughput.  ``vs_baseline`` is throughput relative
to the 10 Msps real-time target (1.0 = meets it; the CPU reference needs
~proportionally one core per ~2 channels and cannot run this at all).

Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wavecap_tpu import models
    from wavecap_tpu.models.registry import get_demod
    from wavecap_tpu.ops import channelizer as chz
    from wavecap_tpu import ops

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)

    fs = 10_000_000.0 if on_accel else 1_000_000.0
    bw = 12_500.0
    ch = chz.ChannelizerConfig(sample_rate=fs, channel_bandwidth=bw)
    m = ch.channel_count  # 800 on accel
    chan_rate = int(ch.channel_rate)  # 25 kHz
    n_block = m * (2500 if on_accel else 500)  # 0.2 s of IQ
    demod_cfg = models.NbfmConfig(
        sample_rate=chan_rate,
        audio_rate=chan_rate,  # serving layer resamples subscribed channels
        max_deviation_hz=4000.0,
        enable_highpass=True,
        highpass_hz=300.0,
        enable_lowpass=True,
        lowpass_hz=3000.0,
    )
    spec = get_demod("nbfm")

    def step(x, hist, dstates, phases):
        chans, hist = chz.channelize(x, hist, ch)
        spectrum = ops.power_spectrum(x, 2048)

        def per_chan(iq_c, ph0, dstate):
            shifted, ph1 = ops.freq_shift(iq_c, jnp.float32(0.0), chan_rate, ph0)
            rssi = ops.rssi_dbfs(shifted)
            audio, dstate = spec.demod(shifted, dstate, demod_cfg)
            return audio, rssi, ph1, dstate

        audio, rssi, phases, dstates = jax.vmap(per_chan)(chans, phases, dstates)
        return audio, rssi, spectrum, hist, dstates, phases

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        ((rng.standard_normal(n_block) + 1j * rng.standard_normal(n_block)) * 0.1).astype(
            np.complex64
        )
    )
    hist = chz.channelizer_init(ch)
    dstates = jax.tree.map(
        lambda v: jnp.broadcast_to(v, (m,) + v.shape), spec.init(demod_cfg)
    )
    phases = jnp.zeros(m, jnp.uint32)

    jit_step = jax.jit(step)

    def sync(out):
        # On remote-TPU platforms block_until_ready may not actually block;
        # a scalar fetch is the only reliable sync point.
        return float(np.asarray(jnp.sum(out[1])))

    t0 = time.perf_counter()
    out = jit_step(x, hist, dstates, phases)
    sync(out)
    compile_s = time.perf_counter() - t0

    def run(iters):
        o = out
        t0 = time.perf_counter()
        for _ in range(iters):
            o = jit_step(x, o[3], o[4], o[5])
        sync(o)
        return time.perf_counter() - t0

    lo, hi = (2, 12) if on_accel else (1, 3)
    run(lo)  # warm
    t_lo = run(lo)
    t_hi = run(hi)
    dt = max((t_hi - t_lo) / (hi - lo), 1e-9)

    audio, rssi, spectrum, hist, dstates, phases = out
    msps = n_block / dt / 1e6
    realtime_x = msps * 1e6 / fs
    print(
        f"platform={platform} M={m} block={n_block} compile={compile_s:.1f}s "
        f"iter={dt*1e3:.2f}ms msps={msps:.1f} realtime_x={realtime_x:.2f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"iq_msps_channelize_demod_{m}ch",
                "value": round(msps, 2),
                "unit": "Msps",
                "vs_baseline": round(msps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
