"""Trunking worker-process manager: grouping, liveness, RPC.

The reference's cluster-free strategy (``tests/unit/test_trunking_worker_
liveness.py``): fake Process handles + real multiprocessing Pipes — no
actual child processes needed for the supervision logic; one real-worker
smoke test exercises the true process path.
"""

import multiprocessing as mp
import threading
import time

import pytest

from wavecap_tpu.trunking.process_manager import TrunkingProcessManager, WorkerHandle


class _AliveProcess:
    def __init__(self):
        self.terminated = False

    def is_alive(self):
        return not self.terminated

    def join(self, timeout=None):
        pass

    def terminate(self):
        self.terminated = True


class _DeadProcess(_AliveProcess):
    def is_alive(self):
        return False


def make_manager(proc_cls=_AliveProcess):
    spawned = []

    def factory(target, args):
        p = proc_cls()
        spawned.append((p, target, args))
        return p

    mgr = TrunkingProcessManager(process_factory=factory, pipe_factory=mp.Pipe)
    mgr._spawned = spawned
    return mgr


class TestGrouping:
    def test_systems_group_by_device(self):
        mgr = make_manager()
        mgr.add_system({"id": "a", "device_id": "dev1", "control_channels": [851e6]})
        mgr.add_system({"id": "b", "device_id": "dev1", "control_channels": [852e6]})
        mgr.add_system({"id": "c", "device_id": "dev2", "control_channels": [853e6]})
        mgr.add_system({"id": "d", "control_channels": [854e6]})
        groups = mgr.group_systems()
        assert set(groups) == {"dev1", "dev2", "default"}
        assert [s["id"] for s in groups["dev1"]] == ["a", "b"]

    def test_start_spawns_one_worker_per_group(self):
        mgr = make_manager()
        mgr.add_system({"id": "a", "device_id": "dev1", "control_channels": [851e6]})
        mgr.add_system({"id": "b", "device_id": "dev2", "control_channels": [852e6]})
        mgr.start()
        try:
            assert set(mgr.workers) == {"dev1", "dev2"}
            assert len(mgr._spawned) == 2
        finally:
            mgr._stop.set()


class TestLiveness:
    def test_dead_worker_restarted(self):
        mgr = make_manager(_DeadProcess)
        mgr.add_system({"id": "a", "device_id": "dev1", "control_channels": [851e6]})
        mgr.start()
        try:
            restarted = mgr.check_liveness()
            assert restarted == ["dev1"]
            assert mgr.workers["dev1"].restarts == 1
        finally:
            mgr._stop.set()

    def test_restart_cap(self):
        mgr = make_manager(_DeadProcess)
        mgr.add_system({"id": "a", "device_id": "dev1", "control_channels": [851e6]})
        mgr.start()
        try:
            for _ in range(10):
                mgr.check_liveness()
            assert mgr.workers["dev1"].restarts == mgr.MAX_RESTARTS
        finally:
            mgr._stop.set()


class TestRpc:
    def test_rpc_roundtrip_over_real_pipe(self):
        """RPC against a thread standing in for the worker loop."""
        parent, child = mp.Pipe()
        handle = WorkerHandle(
            key="k", process=_AliveProcess(), cmd_conn=parent, evt_conn=None,
            worker_cfg={},
        )

        def fake_worker():
            msg = child.recv()
            child.send({"id": msg["id"], "result": {"pong": 1}})

        t = threading.Thread(target=fake_worker, daemon=True)
        t.start()
        assert handle.rpc("ping")["pong"] == 1

    def test_rpc_timeout(self):
        parent, child = mp.Pipe()
        handle = WorkerHandle(
            key="k", process=_AliveProcess(), cmd_conn=parent, evt_conn=None,
            worker_cfg={},
        )
        with pytest.raises(TimeoutError):
            handle.rpc("ping", timeout=0.3)


@pytest.mark.slow
class TestRealWorker:
    def test_real_process_status_rpc(self, tmp_path):
        mgr = TrunkingProcessManager(state_dir=tmp_path, driver="fake")
        mgr.add_system(
            {
                "id": "w1",
                "control_channels": [851.2e6],
                "sample_rate": 800_000,
                "auto_start": False,
            }
        )
        mgr.start()
        try:
            t0 = time.time()
            while time.time() - t0 < 60:
                try:
                    st = mgr.rpc("default", "status", timeout=5.0)
                    break
                except (TimeoutError, RuntimeError, KeyError):
                    time.sleep(0.5)
            else:
                pytest.fail("worker never answered status RPC")
            assert st and st[0]["id"] == "w1"
            assert mgr.rpc("default", "ping")["pong"] > 0
        finally:
            mgr.stop_all()
        assert not mgr.workers


class TestOrphanReaping:
    """Boot-time cleanup of workers a crashed previous run left behind
    (reference app.py:44)."""

    def test_recorded_orphan_is_killed_exactly(self, tmp_path):
        import json
        import subprocess
        import sys

        from wavecap_tpu.trunking.process_manager import (
            proc_starttime,
            reap_orphan_workers,
        )

        # stand-in orphan: our own child, killed by exact (pid, starttime)
        child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
        try:
            start = proc_starttime(child.pid)
            assert start is not None
            (tmp_path / "workers.json").write_text(
                json.dumps(
                    [
                        {"pid": child.pid, "start": start},
                        {"pid": child.pid, "start": start - 12345},  # stale/recycled
                        {"pid": 2**22 + 999, "start": 1},  # long dead
                    ]
                )
            )
            killed = reap_orphan_workers(tmp_path)
            assert killed == [child.pid]
            child.wait(timeout=10)
            assert not (tmp_path / "workers.json").exists()
        finally:
            if child.poll() is None:
                child.kill()

    def test_recycled_pid_not_touched(self, tmp_path):
        import json
        import os

        from wavecap_tpu.trunking.process_manager import (
            proc_starttime,
            reap_orphan_workers,
        )

        # the reaper must never signal its own process, and must skip any
        # pid whose starttime no longer matches (recycled pid)
        (tmp_path / "workers.json").write_text(
            json.dumps(
                [
                    {"pid": os.getpid(), "start": proc_starttime(os.getpid())},
                    {"pid": os.getppid(), "start": -1},  # starttime mismatch
                ]
            )
        )
        assert reap_orphan_workers(tmp_path) == []

    def test_manager_records_and_clears_workers_file(self, tmp_path):
        import json
        import os

        class _PidProcess(_AliveProcess):
            pid = os.getpid()  # a live pid whose starttime is readable

        def factory(target, args):
            return _PidProcess()

        mgr = TrunkingProcessManager(
            state_dir=tmp_path, process_factory=factory, pipe_factory=mp.Pipe
        )
        mgr.add_system({"id": "s1", "device_id": "dev0", "control_channels": [851e6]})
        mgr.start()
        try:
            recs = json.loads((tmp_path / "workers.json").read_text())
            assert recs and recs[0]["pid"] == os.getpid()
            assert recs[0]["start"] is not None
        finally:
            mgr.workers["dev0"].process.terminated = True  # skip rpc wait
            mgr.stop_all()
        assert json.loads((tmp_path / "workers.json").read_text()) == []


class TestWorkerStreaming:
    """Round-2 gap 3: workers forward spectrum frames + voice PCM over
    the event pipe so clients can stream from process-isolated systems
    (reference process_manager.py:262+, process_worker.py:32-120)."""

    def test_event_pump_routes_spectrum_and_voice(self):
        import numpy as np

        mgr = make_manager()
        mgr.add_system({"id": "s1", "control_channels": [851e6]})
        mgr.start()
        handle = mgr.workers["default"]
        spectra, voices = [], []
        mgr.on_spectrum = lambda sid, msg: spectra.append((sid, msg))
        mgr.on_voice = lambda sid, rid, pcm: voices.append((sid, rid, pcm))
        # the child end of the evt pipe: pipe_factory returned (parent, child)
        # but _spawn passed child into args; recover it from the spawn record
        _proc, _target, args = mgr._spawned[0]
        _cmd_child, evt_child, _cfg = args
        evt_child.send(
            {
                "type": "spectrum",
                "systemId": "s1",
                "centerHz": 851.5e6,
                "sampleRate": 960_000,
                "db": np.full(16, -70.0, np.float32),
            }
        )
        evt_child.send(
            {"type": "voice_pcm", "systemId": "s1", "recorderId": 1,
             "pcm": b"\x01\x02" * 160}
        )
        t0 = time.time()
        while time.time() - t0 < 10 and not (spectra and voices):
            time.sleep(0.05)
        assert spectra and spectra[0][0] == "s1"
        assert mgr.latest_spectrum["s1"]["centerHz"] == 851.5e6
        assert voices == [("s1", 1, b"\x01\x02" * 160)]
        mgr.stop_all()

    def test_server_streams_worker_voice_and_spectrum(self):
        """WS /trunking/stream/{sid}/voice and the spectrum snapshot
        must serve a WORKER-hosted system (no in-process TrunkingSystem
        exists for the id)."""
        import asyncio

        import httpx
        import numpy as np
        import websockets.asyncio.client as ws_client

        from tests.test_server import ServerHarness
        from wavecap_tpu.utils.config import config_from_dict

        h = ServerHarness(
            config_from_dict(
                {"server": {"host": "127.0.0.1", "port": 0},
                 "device": {"driver": "fake"}}
            )
        ).start()
        try:
            mgr = make_manager()
            h.server.state.trunking_workers = mgr
            h.server.state.attach_worker_streams(mgr)
            mgr.add_system({"id": "wsys", "control_channels": [851e6]})
            mgr.start()
            _proc, _target, args = mgr._spawned[0]
            _cmd_child, evt_child, _cfg = args

            pcm = (np.arange(160, dtype=np.int16)).tobytes()

            async def grab():
                uri = f"{h.ws_base}/trunking/stream/wsys/voice"
                async with ws_client.connect(uri, open_timeout=20) as ws:
                    # push voice AFTER subscribing so the fanout delivers it
                    for _ in range(5):
                        evt_child.send(
                            {"type": "voice_pcm", "systemId": "wsys",
                             "recorderId": 0, "pcm": pcm}
                        )
                        await asyncio.sleep(0.05)
                    return await asyncio.wait_for(ws.recv(), 20)

            data = h.run(grab())
            assert data == pcm

            evt_child.send(
                {
                    "type": "spectrum",
                    "systemId": "wsys",
                    "centerHz": 851.5e6,
                    "sampleRate": 960_000,
                    "db": np.linspace(-100, -40, 32).astype(np.float32),
                }
            )
            with httpx.Client(base_url=h.base, timeout=20) as c:
                t0 = time.time()
                while time.time() - t0 < 10:
                    r = c.get("/trunking/systems/wsys/spectrum")
                    if r.status_code == 200:
                        break
                    time.sleep(0.1)
                body = r.json()
                assert body["centerHz"] == 851.5e6 and len(body["db"]) == 32
                # unknown system still 404s
                assert c.get(
                    "/trunking/systems/nosuch/spectrum"
                ).status_code == 404
            mgr.stop_all()
        finally:
            h.stop()

    @pytest.mark.slow
    def test_real_worker_forwards_spectrum(self, tmp_path):
        """A REAL child process hosting a trunking system on a synthetic
        station must forward spectrum frames to the parent."""
        import numpy as np

        mgr = TrunkingProcessManager(
            state_dir=tmp_path,
            driver="fake",
            stations=[{"offset_hz": -300_000.0, "kind": "tone",
                       "amplitude": 0.8}],
        )
        mgr.add_system(
            {
                "id": "rw1",
                "control_channels": [851.2e6],
                "center_hz": 851.5e6,
                "sample_rate": 960_000,
                "max_voice_channels": 1,
                "recording_dir": str(tmp_path / "rec"),
            }
        )
        got = []
        mgr.on_spectrum = lambda sid, msg: got.append(msg)
        mgr.start()
        try:
            t0 = time.time()
            while time.time() - t0 < 240 and not got:
                time.sleep(0.5)
            assert got, "no spectrum frame forwarded from the real worker"
            msg = got[0]
            assert msg["systemId"] == "rw1"
            assert msg["sampleRate"] == 960_000
            db = np.asarray(msg["db"])
            assert db.ndim == 1 and len(db) >= 512
        finally:
            mgr.stop_all()
