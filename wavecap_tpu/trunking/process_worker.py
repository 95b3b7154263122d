"""Trunking worker process body (reference ``trunking/process_worker.py:32``).

Each worker process hosts its own CaptureManager + TrunkingManager for
one SDR device's systems, isolated from the main server (the reference's
motivation: the SDRplay API tolerates one device per process; ours adds
JAX-runtime isolation).  RPC commands arrive on ``cmd_conn``; events and
periodic status flow back on ``evt_conn``.
"""

from __future__ import annotations

import logging
import time
import traceback

logger = logging.getLogger(__name__)


def run_trunking_worker(cmd_conn, evt_conn, worker_cfg: dict) -> None:
    """Entry point executed in the child process."""
    try:
        _worker_main(cmd_conn, evt_conn, worker_cfg)
    except Exception:
        try:
            evt_conn.send(
                {"type": "worker_error", "traceback": traceback.format_exc()}
            )
        except (OSError, BrokenPipeError):
            pass


def _worker_main(cmd_conn, evt_conn, worker_cfg: dict) -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()

    from wavecap_tpu.capture import CaptureManager
    from wavecap_tpu.devices import FakeDriver
    from .config import TrunkingSystemConfig
    from .manager import TrunkingManager

    driver_kind = worker_cfg.get("driver", "fake")
    if driver_kind == "native":
        from wavecap_tpu.devices.native import NativeDriver

        driver = NativeDriver()
    else:
        driver = FakeDriver()

    captures = CaptureManager(driver)
    manager = TrunkingManager(captures, state_dir=worker_cfg.get("state_dir"))
    manager.on_event = lambda et, evt: _safe_send(evt_conn, {"type": "event", "event": evt})

    for sys_cfg in worker_cfg.get("systems", []):
        manager.create_system(TrunkingSystemConfig.from_dict(sys_cfg))
    if worker_cfg.get("auto_start", True):
        manager.start()

    last_status = 0.0
    while True:
        if cmd_conn.poll(0.2):
            try:
                msg = cmd_conn.recv()
            except (EOFError, OSError):
                break
            rid = msg.get("id")
            cmd = msg.get("cmd")
            try:
                if cmd == "status":
                    result = manager.status()
                elif cmd == "start":
                    manager.start(msg.get("systemId"))
                    result = {"ok": True}
                elif cmd == "stop_system":
                    manager.get(msg["systemId"]).stop()
                    result = {"ok": True}
                elif cmd == "ping":
                    result = {"pong": time.time()}
                elif cmd == "shutdown":
                    cmd_conn.send({"id": rid, "result": {"ok": True}})
                    break
                else:
                    result = {"error": f"unknown command {cmd}"}
                cmd_conn.send({"id": rid, "result": result})
            except Exception as e:
                _safe_send(cmd_conn, {"id": rid, "error": str(e)})
        now = time.time()
        if now - last_status > 2.0:
            _safe_send(evt_conn, {"type": "status", "systems": manager.status()})
            last_status = now
    manager.stop_all()


def _safe_send(conn, obj) -> None:
    try:
        conn.send(obj)
    except (OSError, BrokenPipeError):  # pragma: no cover
        pass
