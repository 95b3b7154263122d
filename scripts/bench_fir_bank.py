"""Measure the Pallas banked-FIR kernel against the XLA conv path on-chip.

VERDICT r1 ("Pallas: measure or delete"): ``ops/pallas/fir_bank.py`` must
either demonstrate a measured win inside the bank step or be removed, with
a roofline estimate recorded in docs/perf.md either way.

Protocol (axon-relay-safe, same rules as bench.py):
  * one subprocess per (variant, shape) — a wedged session can't poison
    the other measurements;
  * exactly two compiled programs per worker (init is folded into step's
    donated carry), sync via scalar checksum fetch;
  * per-dispatch overhead amortized with a lax.scan macro-batch.

Shapes are the production bank's: C channel rows x N audio samples per
0.2 s block, T real taps (voice band shaping FIR in the demod bank).

Usage:  python scripts/bench_fir_bank.py            # all measurements
        python scripts/bench_fir_bank.py --worker pallas 800 5000 63
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def worker(variant: str, c: int, n: int, t: int) -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    scan_len = 32 if platform == "tpu" else 2

    taps_np = np.hanning(t).astype(np.float32)
    taps_np /= taps_np.sum()

    if variant == "pallas":
        from wavecap_tpu.ops.pallas.fir_bank import fir_bank_valid

        def apply(x_ext, taps):
            return fir_bank_valid(x_ext, taps, interpret=platform != "tpu")

    else:
        from wavecap_tpu.ops.fir import conv_valid

        # production path: demod bank vmaps the per-channel FIR over rows
        def apply(x_ext, taps):
            return jax.vmap(lambda row: conv_valid(row, taps))(x_ext)

    @jax.jit
    def step(x_ext, taps):
        def body(carry, _):
            y = apply(x_ext + carry * 1e-12, taps)  # carry dep: forces sequential
            return jnp.sum(y[:, -1]), jnp.sum(y)

        carry, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=scan_len)
        return jnp.sum(sums).reshape(1)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((c, n + t - 1)).astype(np.float32))
    taps = jax.device_put(taps_np)

    t0 = time.perf_counter()
    _ = float(np.asarray(step(x, taps))[0])
    compile_s = time.perf_counter() - t0

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        for _ in range(iters):
            cs = step(x, taps)
        _ = float(np.asarray(cs)[0])
        return time.perf_counter() - t0

    lo, hi = (3, 13) if platform == "tpu" else (1, 3)
    run(lo)
    t_lo = run(lo)
    t_hi = run(hi)
    dt = max((t_hi - t_lo) / (hi - lo) / scan_len, 1e-9)

    # Roofline: bytes moved >= in + out f32 (taps negligible); HBM BW v5e ~819 GB/s
    bytes_moved = 4 * (c * (n + t - 1) + c * n)
    bw_gbs = bytes_moved / dt / 1e9
    print(
        json.dumps(
            {
                "variant": variant,
                "platform": platform,
                "C": c,
                "N": n,
                "T": t,
                "compile_s": round(compile_s, 1),
                "block_us": round(dt * 1e6, 1),
                "gbytes_per_s": round(bw_gbs, 1),
                "hbm_frac_v5e": round(bw_gbs / 819.0, 3),
            }
        )
    )


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]),
               int(sys.argv[i + 4]))
        return

    shapes = [(800, 5000, 63), (800, 5000, 127), (32, 9600, 63), (8, 9600, 127)]
    results = []
    for c, n, t in shapes:
        for variant in ("xla", "pallas"):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker",
                     variant, str(c), str(n), str(t)],
                    capture_output=True, text=True, timeout=1200,
                )
                for line in out.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        rec = json.loads(line)
                        results.append(rec)
                        print(json.dumps(rec), flush=True)
                        break
                else:
                    print(json.dumps({"variant": variant, "C": c, "N": n, "T": t,
                                      "error": (out.stderr or "")[-300:]}), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({"variant": variant, "C": c, "N": n, "T": t,
                                  "error": "timeout"}), flush=True)
    with open("/tmp/fir_bank_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
