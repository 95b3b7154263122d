"""P25 trunking-path throughput on the current device.

Runs a real Capture (fake driver) whose whole per-block program is the
trunking shape — channelizer + 1 control + N voice p25 slots with timing
recovery — and reports the measured on-device block time.  One JSON line
per config.

--protocol phase2 benches the Phase 2 dual-rate program: a CQPSK/LSM
control slot + a dedicated probe slot (4800-baud p25 bank) plus N
6000-baud H-DQPSK voice slots (p25p2 bank) in ONE compiled step — the
exact capture a ``protocol: p25_phase2`` trunking system creates.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    from wavecap_tpu.capture import CaptureConfig, CaptureManager, ChannelSpec
    from wavecap_tpu.devices import FakeDriver

    ap = argparse.ArgumentParser()
    ap.add_argument("--protocol", default="phase1", choices=("phase1", "phase2"))
    args = ap.parse_args()
    phase2 = args.protocol == "phase2"

    rate = 2_400_000
    for n_voice in (4, 20):
        mgr = CaptureManager(FakeDriver())
        cap = mgr.create_capture(
            config=CaptureConfig(
                center_hz=851.5e6,
                sample_rate=rate,
                block_seconds=0.15,
                narrow_capacity=0,
                wide_capacity=0,
                p25_capacity=2 if phase2 else 1 + n_voice,
                p25p2_capacity=n_voice if phase2 else 0,
                p25_modulation="cqpsk" if phase2 else "c4fm",
                transport="i8",  # matches the trunking system's captures
                pipeline_depth=2,
                blocks_per_dispatch=2,
            )
        )
        cap.create_channel(ChannelSpec(id="cc", mode="p25", frequency_hz=851.2e6))
        if phase2:
            cap.create_channel(
                ChannelSpec(id="probe", mode="p25", frequency_hz=851.25e6)
            )
        voice_mode = "p25p2" if phase2 else "p25"
        for i in range(n_voice):
            cap.create_channel(
                ChannelSpec(
                    id=f"v{i}", mode=voice_mode,
                    frequency_hz=851.3e6 + i * 12_500.0,
                )
            )
        cap.start()
        deadline = time.time() + 600
        warm_n, end_n = 5, 45
        t_warm = None
        while time.time() < deadline:
            n = cap.blocks_processed
            if t_warm is None and n >= warm_n:
                t_warm, n_warm = time.time(), n
            if n >= end_n:
                break
            time.sleep(0.05)
        n_blocks = cap.blocks_processed
        block_lat_ms = cap.block_ms  # dispatch->fetch latency incl. pipeline wait
        elapsed = time.time() - t_warm if t_warm else 0.0
        cap.stop()
        # throughput: wall time per block once warm (uploads overlap fetches)
        wall_ms = elapsed * 1e3 / max(n_blocks - n_warm, 1) if t_warm else 0.0
        rt = 150.0 / wall_ms if wall_ms else 0.0
        print(
            json.dumps(
                {
                    "config": (
                        f"trunking_phase2_{2+n_voice}ch"
                        if phase2
                        else f"trunking_{1+n_voice}ch_p25"
                    ),
                    "blocks": n_blocks,
                    "block_wall_ms": round(wall_ms, 1),
                    "block_latency_ms": round(block_lat_ms, 1),
                    "realtime_x": round(rt, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
