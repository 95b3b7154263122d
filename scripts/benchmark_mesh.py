"""Multi-chip scaling rig for the PRODUCTION mesh capture program.

Measures sustained samples/s of ``capture/mesh.jit_mesh_capture_multi``
(the exact per-block program a ``--mesh`` server dispatches) at mesh
sizes 1/2/4/8, and reports weak-scaling efficiency against the
BASELINE.md >=85 % target.

Weak scaling is the right frame for this workload: adding chips to a
capture grows the bandwidth it can channelize (block size and bin count
scale with the time axis), it does not shrink a fixed problem.  Each
mesh size therefore processes ``n_time`` times the 1-device per-step
work; efficiency = rate(n) / (n * rate(1)).

Each mesh size runs in a fresh subprocess because the virtual device
count (``xla_force_host_platform_device_count``) is a process-startup
flag.  On this image the 8 virtual devices share the host's physical
cores, so virtual-mesh numbers validate the rig and the program's
collective overhead, not real ICI scaling — run the same script on a
real slice for the production figure (no code changes needed: the mesh
spec maps onto ``jax.devices()`` whatever they are).

Usage: python scripts/benchmark_mesh.py [--sizes 1,2,4,8] [--steps 20]
Writes a JSON summary to stdout; docs/perf.md records the results.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = """
import os, sys, time, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=%(n)d"
)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from wavecap_tpu.capture import CaptureConfig, CaptureManager, ChannelSpec
from wavecap_tpu.devices import FakeDriver, FakeStation

n_time = %(n)d
mode = "%(mode)s"
if mode == "p25":
    # flagship digital path: C4FM soft symbols demodulated on the grid
    m = 64 if 64 %% n_time == 0 else 8 * n_time
    fs = int(m * 12_500)
    drv = FakeDriver()
    cap = CaptureManager(drv).create_capture(
        config=CaptureConfig(
            center_hz=851e6, sample_rate=fs, mesh=f"stream=1,time={n_time}",
            block_seconds=%(block_s)f * n_time,
            wide_capacity=0, narrow_capacity=0, p25_capacity=1,
        )
    )
    cap.create_channel(
        ChannelSpec(id="cc", mode="p25", frequency_hz=851e6 + 12_500 * 3)
    )
else:
    m = 32 if 32 %% n_time == 0 else 4 * n_time
    fs = int(m * 25_000)
    drv = FakeDriver(stations=[FakeStation(offset_hz=100_000.0, kind="nbfm",
                                           tone_hz=1000.0, deviation_hz=4000.0)])
    cap = CaptureManager(drv).create_capture(
        config=CaptureConfig(
            center_hz=155e6, sample_rate=fs, mesh=f"stream=1,time={n_time}",
            # weak scaling: per-shard work constant -> block grows with n_time
            block_seconds=%(block_s)f * n_time,
            wide_capacity=0, p25_capacity=0,
        )
    )
    cap.create_channel(ChannelSpec(id="c1", mode="nbfm", frequency_hz=155.1e6))
jit_step = cap._jit_step
state = cap._dev_state
ctl = cap._build_control()
rng = np.random.default_rng(0)
batch = jnp.asarray(
    (rng.standard_normal((1, 2 * cap.block_size)) * 0.1).astype(np.float32))

out, state = jit_step(batch, state, ctl)          # compile
jax.block_until_ready((out, state))
steps = %(steps)d
t0 = time.perf_counter()
for _ in range(steps):
    out, state = jit_step(batch, state, ctl)
jax.block_until_ready((out, state))
dt = time.perf_counter() - t0
print(json.dumps({
    "devices": n_time, "block_size": cap.block_size, "steps": steps,
    "samples_per_s": steps * cap.block_size / dt,
}))
"""


def run_size(n: int, steps: int, block_s: float, mode: str) -> dict:
    code = _CHILD % {"n": n, "steps": steps, "block_s": block_s, "mode": mode}
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"size {n} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument(
        "--block-s", type=float, default=0.25,
        help="per-device seconds of IQ per step (weak-scaling unit)",
    )
    ap.add_argument(
        "--mode", default="nbfm", choices=("nbfm", "p25"),
        help="grid demod: narrow analog bank or the P25 soft-symbol path",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for n in sizes:
        r = run_size(n, args.steps, args.block_s, args.mode)
        rows.append(r)
        print(
            f"devices={r['devices']} block={r['block_size']} "
            f"rate={r['samples_per_s'] / 1e6:.2f} Msps",
            file=sys.stderr,
        )
    base = rows[0]["samples_per_s"] / rows[0]["devices"]
    for r in rows:
        r["weak_scaling_eff"] = round(
            r["samples_per_s"] / (r["devices"] * base), 3
        )
    print(json.dumps(
        {"host_cores": os.cpu_count(), "mode": args.mode, "results": rows}
    ))


if __name__ == "__main__":
    main()
