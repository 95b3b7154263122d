"""Cold-boot smoke: ``python -m wavecap_tpu.cli serve`` from the shipped
example config, as a real subprocess.

The in-process harness (``tests/test_server.py``) constructs ``AppServer``
directly, so it never executes the CLI → ``server.__main__`` → YAML-file
glue.  That gap let a boot crash ship (YAML 1.1 resolves ``2.4e6`` as a
*string*; ``int()`` on it raised at ``load_config``) — this test walks the
exact production path: shipped ``wavecap.yaml.example`` → fake driver →
autostarted capture → REST live.  Reference analog: its ``app.py`` boot
path restoring captures from YAML (reference ``backend/wavecapsdr/app.py``).
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(url: str, timeout: float = 5.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode())


@pytest.mark.slow
def test_serve_boots_from_example_config(tmp_path):
    shutil.copy(REPO / "wavecap.yaml.example", tmp_path / "wavecap.yaml")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"  # subprocess must not grab the TPU
    proc = subprocess.Popen(
        [sys.executable, "-m", "wavecap_tpu.cli", "serve", "--port", str(port)],
        cwd=tmp_path,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}/api/v1"
    try:
        deadline = time.monotonic() + 90.0
        health = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                pytest.fail(f"serve exited rc={proc.returncode}:\n{out[-3000:]}")
            try:
                health = _get(f"{base}/health")
                break
            except OSError:
                time.sleep(0.5)
        assert health and health["status"] == "ok", "server never became healthy"

        # The example config autostarts the `fm` capture on the fake driver;
        # wait for it to actually process blocks (engine compiled + running).
        # Fresh budget for this phase: a slow JAX CPU pipeline compile during
        # boot must not eat the block-processing wait.
        deadline = time.monotonic() + 90.0
        blocks = 0
        while time.monotonic() < deadline:
            caps = _get(f"{base}/captures")
            cap = next((c for c in caps if c["id"] == "fm"), None)
            assert cap is not None, f"fm capture missing from {caps}"
            if cap["state"] == "running" and cap.get("blocksProcessed", 0) > 0:
                blocks = cap["blocksProcessed"]
                break
            assert cap["state"] != "error", f"capture errored: {cap}"
            time.sleep(0.5)
        assert blocks > 0, "autostarted capture never processed a block"

        # Trunking systems from the example YAML parsed (851.2e6 strings).
        systems = _get(f"{base}/trunking/systems")
        assert systems and systems[0]["controlChannelHz"] == pytest.approx(851.2e6)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=10)
