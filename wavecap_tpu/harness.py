"""End-to-end correctness harness (reference ``harness.py:42-120``).

Boots the in-process server with a chosen driver, creates a capture +
channel via REST, collects PCM over the audio WebSocket for a duration,
writes a WAV + JSON report with audio statistics.  Presets mirror the
reference harness (kexp = broadcast WBFM; tone = fake tone; marine = AM).

Run:  python -m wavecap_tpu.harness --preset tone --duration 5
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time
from dataclasses import asdict, dataclass
from pathlib import Path

import httpx
import numpy as np
import websockets.asyncio.client as ws_client

from wavecap_tpu.server.app import AppServer
from wavecap_tpu.utils.config import config_from_dict
from wavecap_tpu.utils.wavio import write_audio_wav


PRESETS = {
    "tone": {
        "driver": "fake",
        "center_hz": 155e6,
        "sample_rate": 800_000,
        "channel": {"mode": "nbfm", "frequencyHz": 155.1e6},
        "stations": [
            {"offset_hz": 100_000.0, "kind": "nbfm", "tone_hz": 1000.0}
        ],
    },
    "kexp": {
        # broadcast WBFM shape (fake station unless an IQ file is given)
        "driver": "fake",
        "center_hz": 90.3e6,
        "sample_rate": 2_400_000,
        "channel": {"mode": "wbfm", "frequencyHz": 90.3e6 + 100_000},
        "stations": [
            {
                "offset_hz": 100_000.0,
                "kind": "wbfm",
                "tone_hz": 440.0,
                "deviation_hz": 75_000.0,
            }
        ],
    },
    "marine": {
        "driver": "fake",
        "center_hz": 156.8e6,
        "sample_rate": 800_000,
        "channel": {"mode": "am", "frequencyHz": 156.85e6},
        "stations": [{"offset_hz": 50_000.0, "kind": "am", "tone_hz": 700.0}],
    },
    # synthesized P25 control channel -> full trunking stack via REST:
    # lock, IDEN learn, voice grant -> call bookkeeping (reference's
    # harness has no trunking preset; this validates the whole control
    # plane end-to-end without hardware)
    "p25-trunk": {
        "driver": "fake",
        "trunking": True,
        "center_hz": 851.5e6,
        "sample_rate": 960_000,
        "cc_freq": 851.2e6,
        "nac": 0x293,
    },
    # Phase 2 system: CQPSK/LSM control channel through the dual-rate
    # capture (4800-baud CC + probe slots, 6000-baud H-DQPSK voice bank)
    "p25-phase2-trunk": {
        "driver": "fake",
        "trunking": True,
        "protocol": "p25_phase2",
        "center_hz": 851.5e6,
        "sample_rate": 960_000,
        "cc_freq": 851.2e6,
        "nac": 0x293,
    },
}


def _make_p25_cc_iq(
    capture_rate: int, offset_hz: float, nac: int, modulation: str = "c4fm"
) -> np.ndarray:
    """Seamlessly loopable control-channel IQ: TSDUs with IDEN + group
    grant + RFSS.

    The loop must be wrap-continuous or every loop period corrupts a
    frame at the seam (observed as a periodic TSBK CRC failure every
    2.25 s): the RRC shaping is applied as a *circular* convolution, the
    FM phase is closed to a multiple of 2pi by a sub-Hz frequency trim,
    and the channel-offset mixer completes an integer number of cycles
    over the loop.
    """
    from wavecap_tpu.decoders import p25_frames as pf
    from wavecap_tpu.decoders import p25_tsbk as tsbk
    from wavecap_tpu.models.p25.c4fm import modulate_c4fm_cyclic

    iden = pf.encode_tsbk_block(
        tsbk.TSBKOpcode.IDEN_UP,
        tsbk.make_iden_up_data(
            identifier=1, base_freq_mhz=851.0, channel_spacing_khz=12.5,
            tx_offset_mhz=-45.0,
        ),
        last=False,
    )
    grant = pf.encode_tsbk_block(
        tsbk.TSBKOpcode.GRP_V_CH_GRANT,
        tsbk.make_group_grant_data(
            tgid=2001, source_id=700123, band=1, channel_number=56
        ),
        last=False,
    )
    rfss = pf.encode_tsbk_block(
        tsbk.TSBKOpcode.RFSS_STS_BCAST,
        tsbk.make_rfss_status_data(
            system_id=0x123, rfss_id=1, site_id=7, band=1, channel_number=16
        ),
        last=True,
    )
    dibits = np.concatenate(
        [pf.build_tsdu_frame(nac, [iden, grant, rfss]) for _ in range(30)]
    )
    if modulation == "cqpsk":
        from wavecap_tpu.models.p25.cqpsk import modulate_cqpsk_cyclic

        iq = modulate_cqpsk_cyclic(dibits, capture_rate)
    else:
        iq = modulate_c4fm_cyclic(dibits, capture_rate)
    n = len(iq)
    # integer number of mixer cycles over the loop -> phase-continuous wrap
    cycles = round(offset_hz * n / capture_rate)
    t = np.arange(n) / n
    return (iq * np.exp(2j * np.pi * cycles * t)).astype(np.complex64)


async def run_trunking_harness(args) -> dict:
    """P25 trunking preset: boot server, create system, report lock/calls."""
    preset = PRESETS[args.preset]
    cfg = config_from_dict(
        {"server": {"host": "127.0.0.1", "port": 0}, "device": {"driver": "fake"}}
    )
    server = AppServer(cfg)
    from wavecap_tpu.devices import FakeDriver, FakeStation

    center, rate = preset["center_hz"], preset["sample_rate"]
    station = FakeStation(offset_hz=0.0, kind="iq_loop", amplitude=1.0)
    station.iq_loop = _make_p25_cc_iq(
        rate,
        preset["cc_freq"] - center,
        preset["nac"],
        modulation=(
            "cqpsk" if preset.get("protocol") == "p25_phase2" else "c4fm"
        ),
    )
    server.state.driver = FakeDriver(stations=[station])
    server.state.captures.driver = server.state.driver
    await server.start()
    base = f"http://127.0.0.1:{server.port}/api/v1"
    t0 = time.perf_counter()
    try:
        async with httpx.AsyncClient(base_url=base, timeout=120) as client:
            r = await client.post(
                "/trunking/systems",
                json={
                    "id": "harness", "control_channels": [preset["cc_freq"]],
                    "center_hz": center, "sample_rate": rate,
                    "protocol": preset.get("protocol", "p25_phase1"),
                    "recording_dir": str(Path(args.out_dir) / "rec"),
                    "autoStart": True,
                },
            )
            assert r.status_code < 300, r.text
            deadline = time.time() + args.duration + 300  # cold jit headroom
            st: dict = {}
            while time.time() < deadline:
                st = (await client.get("/trunking/systems/harness")).json()
                calls = (await client.get(
                    "/trunking/systems/harness/calls"
                )).json()
                n_calls = len(calls.get("active", [])) + len(
                    calls.get("history", [])
                )
                # exit only after the receiver reaches steady state: the
                # lifetime CRC rate at the instant of first lock is
                # dominated by the acquisition transient (and flaky);
                # tsbkCountSteady >= 30 is ~10 TSDUs of post-lock signal
                if (
                    st.get("synced")
                    and st.get("tsbkCountSteady", 0) >= 30
                    and n_calls
                ):
                    break
                await asyncio.sleep(0.5)
            report = {
                "preset": args.preset,
                "synced": bool(st.get("synced")),
                "nac": st.get("nac"),
                "tsbkCount": st.get("tsbkCount"),
                "tsbkCrcRate": st.get("tsbkCrcRate"),
                "tsbkCountSteady": st.get("tsbkCountSteady"),
                "tsbkCrcRateSteady": st.get("tsbkCrcRateSteady"),
                "systemId": st.get("systemId"),
                "siteId": st.get("siteId"),
                "calls": n_calls,
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            out_dir = Path(args.out_dir)
            out_dir.mkdir(parents=True, exist_ok=True)
            (out_dir / f"harness_{args.preset}.json").write_text(
                json.dumps(report, indent=2)
            )
            return report
    finally:
        await server.stop()


@dataclass
class HarnessReport:
    preset: str
    duration_s: float
    samples: int
    audio_rate: int
    rms: float
    peak: float
    dominant_hz: float
    wav_path: str
    realtime_factor: float


async def run_harness(args) -> HarnessReport:
    preset = PRESETS[args.preset]
    cfg = config_from_dict(
        {
            "server": {"host": "127.0.0.1", "port": 0},
            "device": {
                "driver": "file" if args.iq_file else preset["driver"],
                "file_path": args.iq_file,
            },
        }
    )
    server = AppServer(cfg)
    if not args.iq_file and preset["driver"] == "fake":
        from wavecap_tpu.devices import FakeDriver, FakeStation

        server.state.driver = FakeDriver(
            stations=[FakeStation(**s) for s in preset["stations"]]
        )
        server.state.captures.driver = server.state.driver
    await server.start()
    base = f"http://127.0.0.1:{server.port}/api/v1"
    try:
        async with httpx.AsyncClient(base_url=base, timeout=60) as client:
            r = await client.post(
                "/captures",
                json={
                    "centerHz": preset["center_hz"],
                    "sampleRate": preset["sample_rate"],
                },
            )
            cap = r.json()
            r = await client.post(
                f"/captures/{cap['id']}/channels", json=preset["channel"]
            )
            ch = r.json()
            await client.post(f"/captures/{cap['id']}/start")

            t0 = time.perf_counter()
            pcm_chunks: list[bytes] = []
            uri = f"ws://127.0.0.1:{server.port}/api/v1/stream/channels/{ch['id']}"
            first_timeout = float(os.environ.get("WAVECAP_WS_TIMEOUT", "600"))
            async with ws_client.connect(uri, open_timeout=120) as ws:
                need = int(args.duration * 48_000) * 2
                got = 0
                while got < need:
                    data = await asyncio.wait_for(ws.recv(), timeout=first_timeout)
                    pcm_chunks.append(data)
                    got += len(data)
            wall = time.perf_counter() - t0

        audio = np.frombuffer(b"".join(pcm_chunks), np.int16).astype(np.float32) / 32768.0
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        wav_path = out_dir / f"harness_{args.preset}.wav"
        write_audio_wav(wav_path, audio, 48_000)

        seg = audio[len(audio) // 4 :]
        spec = np.abs(np.fft.rfft((seg - seg.mean()) * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), 1 / 48_000)
        report = HarnessReport(
            preset=args.preset,
            duration_s=args.duration,
            samples=len(audio),
            audio_rate=48_000,
            rms=float(np.sqrt(np.mean(seg**2))),
            peak=float(np.abs(seg).max()),
            dominant_hz=float(freqs[int(np.argmax(spec))]),
            wav_path=str(wav_path),
            realtime_factor=round(args.duration / wall, 2),
        )
        (out_dir / f"harness_{args.preset}.json").write_text(
            json.dumps(asdict(report), indent=2)
        )
        return report
    finally:
        await server.stop()


def main() -> int:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    p = argparse.ArgumentParser("wavecap_tpu harness")
    p.add_argument("--preset", choices=sorted(PRESETS), default="tone")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--iq-file", default=None)
    p.add_argument("--out-dir", default="harness_out")
    args = p.parse_args()
    if PRESETS[args.preset].get("trunking"):
        out = asyncio.run(run_trunking_harness(args))
        print(json.dumps(out, indent=2))
        return 0 if out.get("synced") and out.get("calls") else 1
    report = asyncio.run(run_harness(args))
    print(json.dumps(asdict(report), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
