#!/usr/bin/env python
"""DSP micro-benchmarks (reference benchmark_dsp.py analog).

Times the individual kernels on whatever device JAX selects; prints a
table plus one JSON line per kernel.  Run on CPU:
    JAX_PLATFORMS=cpu python scripts/benchmark_dsp.py
"""

import json
import time

import numpy as np


def main() -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    from wavecap_tpu import models, ops
    from wavecap_tpu.models.p25.c4fm import C4fmConfig, c4fm_init, c4fm_demodulate
    from wavecap_tpu.ops import channelizer as chz

    platform = jax.devices()[0].platform
    n = 2_000_000 if platform != "cpu" else 200_000
    rng = np.random.default_rng(0)
    xf = jax.device_put(
        (rng.standard_normal(2 * n) * 0.1).astype(np.float32)
    )

    def timed(name, make_fn, samples):
        fn = jax.jit(make_fn)
        out = fn(xf)
        _ = float(np.asarray(out)[0])
        t0 = time.perf_counter()
        reps = 5
        for _i in range(reps):
            out = fn(xf)
        _ = float(np.asarray(out)[0])
        dt = (time.perf_counter() - t0) / reps
        msps = samples / dt / 1e6
        print(f"{name:28s} {dt*1e3:9.2f} ms   {msps:10.1f} Msps")
        print(json.dumps({"kernel": name, "ms": round(dt * 1e3, 2), "msps": round(msps, 1)}))

    def cplx(xf_):
        return jax.lax.complex(xf_[0::2], xf_[1::2])

    timed("freq_shift", lambda xf_: ops.freq_shift(cplx(xf_), 100e3, 10e6)[0].real.sum().reshape(1), n)
    timed(
        "quadrature_demod",
        lambda xf_: ops.quadrature_demod(cplx(xf_), 10e6, jnp.zeros((), jnp.complex64))[0].sum().reshape(1),
        n,
    )
    timed(
        "quadrature_demod_fast",
        lambda xf_: ops.quadrature_demod(
            cplx(xf_), 10e6, jnp.zeros((), jnp.complex64), atan_impl="fast"
        )[0].sum().reshape(1),
        n,
    )
    taps157 = jnp.asarray(np.hamming(157).astype(np.float32))
    timed(
        "fir_decimate_30x157",
        lambda xf_: ops.fir_decimate(cplx(xf_), taps157, 30, ops.fir_init(157))[0].real.sum().reshape(1),
        n,
    )
    cfg_ch = chz.ChannelizerConfig(sample_rate=float(10_000_000 if platform != "cpu" else 1_000_000), channel_bandwidth=12_500.0)
    m = cfg_ch.channel_count
    n_ch = (n // m) * m
    timed(
        f"channelize_M{m}",
        lambda xf_: chz.channelize(cplx(xf_)[:n_ch], chz.channelizer_init(cfg_ch), cfg_ch)[0].real.sum().reshape(1),
        n_ch,
    )
    timed("power_spectrum_2048", lambda xf_: ops.power_spectrum(cplx(xf_), 2048).sum().reshape(1), 2048)
    c4 = C4fmConfig(sample_rate=48_000)
    n48 = 48_000
    timed(
        "c4fm_demod_48k_block",
        lambda xf_: c4fm_demodulate(cplx(xf_)[:n48], c4fm_init(c4), c4)[0].sum().reshape(1),
        n48,
    )


if __name__ == "__main__":
    main()
