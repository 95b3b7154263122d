#!/usr/bin/env python
"""On-device numeric self-test: run key kernels on the selected device and
compare against host numpy/scipy references.

Catches silent accelerator-precision regressions (e.g. TPU's bf16 matmul
default, which NaN'd the biquad scans and cost 40 dB of DFT accuracy
before f32 precision was forced).  Prints per-kernel SNR; exits nonzero
if any kernel falls below its floor.

Run: python scripts/tpu_selftest.py      (uses the default device)
     JAX_PLATFORMS=cpu python scripts/tpu_selftest.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp
    from scipy import signal as sps

    from wavecap_tpu import ops
    from wavecap_tpu.ops import channelizer as chz

    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} ({platform})", file=sys.stderr)
    rng = np.random.default_rng(7)
    failures = []

    def check(name, got, ref, floor_db):
        got = np.asarray(got, np.float64).ravel()
        ref = np.asarray(ref, np.float64).ravel()
        n = min(len(got), len(ref))
        err = got[:n] - ref[:n]
        p = float(np.mean(ref[:n] ** 2))
        e = float(np.mean(err**2))
        snr = 10 * np.log10(p / max(e, 1e-300)) if e else 999.0
        ok = snr >= floor_db
        print(f"{name:28s} SNR {snr:7.1f} dB  (floor {floor_db})  {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    # All device programs take f32 (complex transfer may be unavailable)
    n = 80_000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.3
    xf = jax.device_put(np.ascontiguousarray(x).view(np.float32))

    def cplx(v):
        return jax.lax.complex(v[0::2], v[1::2])

    # 1. freq shift
    f = jax.jit(lambda v: ops.freq_shift(cplx(v), 12_500.0, 200_000.0)[0].real)
    t = np.arange(n) / 200_000.0
    check("freq_shift", f(xf), (x * np.exp(2j * np.pi * 12_500.0 * t)).real, 55)

    # 2. FIR decimate
    taps = sps.firwin(157, 0.03).astype(np.float32)
    g = jax.jit(
        lambda v: ops.fir_decimate(cplx(v), jnp.asarray(taps), 10, ops.fir_init(157))[0].real
    )
    check("fir_decimate", g(xf), sps.lfilter(taps, 1.0, x)[::10].real, 55)

    # 3. biquad cascade (the bf16 victim)
    sos = sps.butter(5, 3000 / 24000, "low", output="sos")
    h = jax.jit(lambda v: ops.sos_filter(cplx(v).real, sos, ops.sos_init(3))[0])
    check("sos_lowpass", h(xf), sps.sosfilt(sos, x.real), 50)

    # 4. channelizer (matmul-DFT path) vs an independent numpy reference
    cfg = chz.ChannelizerConfig(sample_rate=200_000.0, channel_bandwidth=25_000.0)
    m, tpc = cfg.channel_count, cfg.taps_per_channel
    n_ch = (n // m) * m
    k = jax.jit(
        lambda v: chz.channelize(cplx(v)[:n_ch], chz.channelizer_init(cfg), cfg)[0].real
    )
    proto = chz.design_prototype(m, tpc, cfg.cutoff_scale).astype(np.float64)
    x_ext = np.concatenate([np.zeros(m * tpc, np.complex128), x[:n_ch]])
    s_steps = 2 * n_ch // m
    ref = np.zeros((m, s_steps), np.complex128)
    L = m * tpc
    for st in range(s_steps):
        u = np.zeros(m, np.complex128)
        for kk in range(m):
            for mt in range(tpc):
                u[kk] += proto[kk + mt * m] * x_ext[L + st * (m // 2) - kk - mt * m]
        y = np.fft.ifft(u) * m * np.exp(-0j)
        # forward def: y_c = (-1)^{sc} sum_k e^{2pi i k c/m} u_k
        yc = np.array([np.sum(u * np.exp(2j * np.pi * np.arange(m) * c / m)) for c in range(m)])
        if st % 2 == 1:
            yc *= np.where(np.arange(m) % 2 == 0, 1.0, -1.0)
        ref[:, st] = yc
    check("channelizer", k(xf), ref.real, 45)

    # 5. quadrature demod exact vs host
    q = jax.jit(
        lambda v: ops.quadrature_demod(cplx(v), 48_000.0, jnp.zeros((), jnp.complex64))[0]
    )
    prod = x * np.conj(np.concatenate([[0], x[:-1]]))
    ref_q = np.angle(prod) * (48_000.0 / (2 * np.pi * 75_000.0))
    check("quadrature_demod", q(xf), ref_q, 55)

    # 6. spectrum
    s = jax.jit(lambda v: ops.power_spectrum(cplx(v), 2048))
    w = np.hanning(2048)
    ref_s = 10 * np.log10(
        np.maximum(np.abs(np.fft.fftshift(np.fft.fft(x[:2048] * w))) ** 2 / 2048, 1e-20)
    )
    check("power_spectrum", s(xf), ref_s, 40)

    # 7. CQPSK demod on-device vs transmitted ground truth (round 3:
    # the O&M-envelope block timing must survive device numerics)
    from wavecap_tpu.decoders.p25_frames import DIBIT_SYMBOLS
    from wavecap_tpu.models.p25 import cqpsk as cq

    dibits = rng.integers(0, 4, 4000).astype(np.uint8)
    iq_cq = cq.modulate_cqpsk(dibits, 48_000.0, 4800.0)
    ccfg = cq.CqpskConfig(sample_rate=48_000)
    # state must be BORN on-device inside a jitted program: the relay
    # cannot pass eagerly-created complex64 buffers across the executable
    # boundary (UNIMPLEMENTED transfer), while jit-output -> jit-input
    # complex residency is fine — the exact pattern the capture engine
    # uses for its demod state
    cst = jax.jit(lambda: cq.cqpsk_init(ccfg))()
    dem = jax.jit(cq.cqpsk_demodulate, static_argnums=2)
    softs = []
    vbuf = jax.device_put(np.ascontiguousarray(iq_cq).view(np.float32))
    B = 4800
    for i in range(len(iq_cq) // B):
        soft, _, cst = dem(cplx(vbuf[2 * i * B : 2 * (i + 1) * B]), cst, ccfg)
        softs.append(np.asarray(soft))
    soft = np.concatenate(softs)
    tx = DIBIT_SYMBOLS[dibits].astype(np.float64)
    best = min(
        (
            (off, float(np.mean(np.abs(soft[off : off + 3000] - tx[8 : 8 + 3000]) > 1.0)))
            for off in range(0, 60)
        ),
        key=lambda x: x[1],
    )
    ok = best[1] < 0.02
    print(
        f"{'cqpsk_demod(block)':28s} SER {best[1]*100:6.2f} %  (floor 2 %)  "
        f"{'OK' if ok else 'FAIL'}"
    )
    if not ok:
        failures.append("cqpsk_demod")

    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    print("all kernels OK", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
