"""Headline benchmark: wideband IQ -> channelizer -> full demod bank, per chip.

BASELINE.json target: >= 100 concurrent 12.5 kHz channels from a 10 Msps
stream per chip.  This bench runs an 800-channel NMDPFB (10 Msps / 12.5 kHz)
plus a vmapped NBFM demod on EVERY channel plus the spectrum FFT, and
reports sustained IQ throughput.  ``vs_baseline`` is throughput relative
to the 10 Msps real-time target (1.0 = meets it; the CPU reference needs
roughly one core per ~2 channels and cannot run this configuration).

Remote-TPU quirks this is engineered around (axon relay):
  * ``block_until_ready`` does not block -> sync via a scalar fetch of a
    checksum computed INSIDE the jitted program;
  * every eager op is a separate remote compile and a session-wedge risk
    -> exactly two compiled programs (init, step), no eager math;
  * complex64 host<->device transfer is UNIMPLEMENTED (complex math
    inside jit is fine) -> IQ crosses the boundary as interleaved f32
    and becomes complex inside the program;
  * sessions can wedge -> the main process re-spawns a worker subprocess
    up to 3 times and parses its JSON.

Prints ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def worker() -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
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
    ch = chz.ChannelizerConfig(
        sample_rate=fs,
        channel_bandwidth=bw,
        dft_impl=os.environ.get("WAVECAP_BENCH_DFT", "auto"),
    )
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
        filter_impl="fir",  # linear-phase FIR band shaping (TPU-fast path)
        fast_discriminator=True,
    )
    spec = get_demod("nbfm")

    @jax.jit
    def init():
        hist = chz.channelizer_init(ch)
        dstates = jax.tree.map(
            lambda v: jnp.broadcast_to(v, (m,) + v.shape), spec.init(demod_cfg)
        )
        phases = jnp.zeros(m, jnp.uint32)
        return hist, dstates, phases

    # Macro-batch: BLOCKS_PER_STEP dependent blocks per dispatch (a
    # lax.scan over the carried state), amortizing per-dispatch overhead —
    # remote-relay round trips are ~30 ms, far above the on-chip time.
    BLOCKS_PER_STEP = int(os.environ.get("WAVECAP_BENCH_BLOCKS", "32" if on_accel else "1"))

    def one_block(carry, x):
        hist, dstates, phases = carry
        chans, hist = chz.channelize(x, hist, ch)
        spectrum = ops.power_spectrum(x, 2048)

        def per_chan(iq_c, ph0, dstate):
            shifted, ph1 = ops.freq_shift(iq_c, jnp.float32(0.0), chan_rate, ph0)
            rssi = ops.rssi_dbfs(shifted)
            audio, dstate = spec.demod(shifted, dstate, demod_cfg)
            return audio, rssi, ph1, dstate

        audio, rssi, phases, dstates = jax.vmap(per_chan)(chans, phases, dstates)
        checksum = (
            jnp.sum(rssi) + jnp.sum(audio[:, -1]) + jnp.sum(spectrum[..., 0])
        )
        return (hist, dstates, phases), checksum

    # Input pool: N_DISTINCT *distinct* resident blocks, consumed by
    # scanning over the pool's leading axis (ROUNDS passes per step call),
    # so every iteration reads fresh HBM pages instead of re-scanning one
    # warm block (round-2 review weak #3).  The pool is kept at 8 blocks
    # x ~16 MB — big enough to defeat any cache, small enough that the
    # one-time relay upload stays cheap.  Host->device upload itself
    # stays excluded by design — this is the kernel-throughput figure;
    # sustained ingest including upload is measured by
    # scripts/benchmark_p25.py and scripts/benchmark_dual_capture.py on
    # the real capture engine.
    N_DISTINCT = min(int(os.environ.get("WAVECAP_BENCH_DISTINCT", "8")), BLOCKS_PER_STEP)
    ROUNDS = BLOCKS_PER_STEP // N_DISTINCT

    @jax.jit
    def prep(xs_f32):
        # one-time interleaved-f32 -> complex64 pool conversion on device
        return jax.lax.complex(xs_f32[:, 0::2], xs_f32[:, 1::2])

    @jax.jit
    def step(xs_c, carry):
        def one_round(c, _):
            c, checks = jax.lax.scan(one_block, c, xs_c)
            return c, jnp.sum(checks)

        carry, checksums = jax.lax.scan(one_round, carry, None, length=ROUNDS)
        return carry, jnp.sum(checksums).reshape(1)

    rng = np.random.default_rng(0)
    xs_c = prep(
        jax.device_put(
            (rng.standard_normal((N_DISTINCT, 2 * n_block)) * 0.1).astype(
                np.float32
            )
        )
    )

    t0 = time.perf_counter()
    carry = init()
    carry, cs = step(xs_c, carry)
    _ = float(np.asarray(cs)[0])
    compile_s = time.perf_counter() - t0

    def run(iters):
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(iters):
            carry, cs = step(xs_c, carry)
        _ = float(np.asarray(cs)[0])
        return time.perf_counter() - t0

    lo, hi = (3, 13) if on_accel else (1, 3)
    run(lo)  # warm
    t_lo = run(lo)
    t_hi = run(hi)
    dt = max((t_hi - t_lo) / (hi - lo), 1e-9)

    msps = BLOCKS_PER_STEP * n_block / dt / 1e6
    print(
        f"platform={platform} M={m} block={n_block} compile={compile_s:.1f}s "
        f"iter={dt*1e3:.2f}ms msps={msps:.1f} realtime_x={msps*1e6/fs:.2f}",
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


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    last_err = ""
    for attempt in range(3):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True,
                text=True,
                timeout=2400,
            )
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    print(line)
                    sys.stderr.write(out.stderr[-2000:])
                    return
            last_err = (out.stderr or out.stdout)[-800:]
        except subprocess.TimeoutExpired:
            last_err = f"worker timeout (attempt {attempt + 1})"
        print(f"bench attempt {attempt + 1} failed: {last_err}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "iq_msps_channelize_demod",
                "value": 0.0,
                "unit": "Msps",
                "vs_baseline": 0.0,
                "error": last_err[-200:],
            }
        )
    )


if __name__ == "__main__":
    main()
