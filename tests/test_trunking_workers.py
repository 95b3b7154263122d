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
