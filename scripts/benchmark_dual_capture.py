"""Two simultaneous 2.4 Msps trunking captures on one device.

The reference caps concurrent captures at 2 by default
(reference ``config.py:34-38`` limits section); this measures whether the
TPU path sustains BOTH at realtime — the binding constraint is sustained
host->device ingest plus two interleaved capture programs contending for
the same chip, which the single-capture benchmark
(``scripts/benchmark_p25.py``) does not exercise.

Each capture is the full trunking shape: channelizer + 1 control + 20
voice P25 (C4FM) slots with timing recovery, i8 transport, software
pipelining.  Both run concurrently from independent fake drivers; the
reported realtime factor is per-capture warm wall-time per 150 ms block.
``grant_reaction_ms`` is the worst-case time from a TSBK hitting the
antenna to its decode being visible: one block of buffering (the symbol
must be inside a fetched block) plus the measured dispatch->fetch
latency.

One JSON line per capture plus a combined line.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_SECONDS = float(os.environ.get("BENCH_BLOCK_SECONDS", "0.15"))
N_VOICE = int(os.environ.get("BENCH_N_VOICE", "20"))
BLOCKS_PER_DISPATCH = int(os.environ.get("BENCH_BPD", "2"))
WARM_N, END_N = 5, 45


def run_capture(idx: int, results: dict) -> None:
    from wavecap_tpu.capture import CaptureConfig, CaptureManager, ChannelSpec
    from wavecap_tpu.devices import FakeDriver

    mgr = CaptureManager(FakeDriver())
    cap = mgr.create_capture(
        config=CaptureConfig(
            center_hz=851.5e6 + idx * 10e6,
            sample_rate=2_400_000,
            block_seconds=BLOCK_SECONDS,
            narrow_capacity=0,
            wide_capacity=0,
            p25_capacity=1 + N_VOICE,
            transport="i8",
            pipeline_depth=2,
            blocks_per_dispatch=BLOCKS_PER_DISPATCH,
        )
    )
    cap.create_channel(ChannelSpec(id="cc", mode="p25", frequency_hz=cap.config.center_hz - 0.3e6))
    for i in range(N_VOICE):
        cap.create_channel(
            ChannelSpec(
                id=f"v{i}", mode="p25",
                frequency_hz=cap.config.center_hz - 0.2e6 + i * 12_500.0,
            )
        )
    cap.start()
    deadline = time.time() + 900
    t_warm = n_warm = None
    while time.time() < deadline:
        n = cap.blocks_processed
        if t_warm is None and n >= WARM_N:
            t_warm, n_warm = time.time(), n
        if n >= END_N:
            break
        time.sleep(0.05)
    elapsed = time.time() - t_warm if t_warm else 0.0
    n_blocks = cap.blocks_processed
    block_lat_ms = cap.block_ms
    cap.stop()
    wall_ms = elapsed * 1e3 / max(n_blocks - n_warm, 1) if t_warm else 0.0
    rt = BLOCK_SECONDS * 1e3 / wall_ms if wall_ms else 0.0
    results[idx] = {
        "capture": idx,
        "config": f"trunking_{1 + N_VOICE}ch_p25_2p4Msps",
        "blocks": n_blocks,
        "block_wall_ms": round(wall_ms, 1),
        "block_latency_ms": round(block_lat_ms, 1),
        "realtime_x": round(rt, 2),
        "grant_reaction_ms": round(BLOCK_SECONDS * 1e3 + block_lat_ms, 1),
    }


def main() -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()

    results: dict = {}
    threads = [
        threading.Thread(target=run_capture, args=(i, results), daemon=True)
        for i in range(2)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=1200)
    for i in sorted(results):
        print(json.dumps(results[i]), flush=True)
    if len(results) == 2:
        worst = min(r["realtime_x"] for r in results.values())
        print(
            json.dumps(
                {
                    "config": "dual_capture_combined",
                    "wall_s": round(time.time() - t0, 1),
                    "worst_realtime_x": worst,
                    "aggregate_msps": round(2 * 2.4 * worst, 1),
                    "pass_1p5x": worst >= 1.5,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
