"""P25 trunking-path throughput on the current device.

Runs a real Capture (fake driver) whose whole per-block program is the
trunking shape — channelizer + 1 control + N voice p25 (C4FM) slots with
timing recovery — and reports the measured on-device block time.  One
JSON line per config.
"""

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

    rate = 2_400_000
    for n_voice in (4, 20):
        mgr = CaptureManager(FakeDriver())
        cap = mgr.create_capture(
            config=CaptureConfig(
                center_hz=851.5e6,
                sample_rate=rate,
                block_seconds=0.2,
                narrow_capacity=0,
                wide_capacity=0,
                p25_capacity=1 + n_voice,
            )
        )
        cap.create_channel(ChannelSpec(id="cc", mode="p25", frequency_hz=851.2e6))
        for i in range(n_voice):
            cap.create_channel(
                ChannelSpec(
                    id=f"v{i}", mode="p25", frequency_hz=851.3e6 + i * 12_500.0
                )
            )
        cap.start()
        deadline = time.time() + 600
        while time.time() < deadline and cap.blocks_processed < 25:
            time.sleep(0.5)
        n_blocks = cap.blocks_processed
        block_ms = cap.block_ms
        cap.stop()
        rt = 200.0 / block_ms if block_ms else 0.0
        print(
            json.dumps(
                {
                    "config": f"trunking_{1+n_voice}ch_p25",
                    "blocks": n_blocks,
                    "block_ms": round(block_ms, 1),
                    "realtime_x": round(rt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
