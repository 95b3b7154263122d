"""Server integration: REST + WebSocket against a live in-process server.

Reference tier: ``tests/test_captures_channels.py`` (TestClient + fake
driver, asserting real bytes flow capture -> channel -> WS).  Here the
server is the real asyncio HTTP/WS stack on an ephemeral port, driven
with httpx (REST) and the ``websockets`` client (streams).
"""

import asyncio
import json
import threading
import time

import httpx
import numpy as np
import pytest
import websockets.asyncio.client as ws_client

from wavecap_tpu.server.app import AppServer
from wavecap_tpu.utils.config import AppConfig, config_from_dict


class ServerHarness:
    """Run AppServer in a background event loop thread."""

    def __init__(self, cfg: AppConfig):
        self.server = AppServer(cfg)
        self.loop = asyncio.new_event_loop()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = threading.Event()

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def boot():
            await self.server.start()
            self._started.set()

        self.loop.create_task(boot())
        self.loop.run_forever()

    def start(self):
        self._thread.start()
        assert self._started.wait(60)
        return self

    @property
    def base(self) -> str:
        return f"http://127.0.0.1:{self.server.port}/api/v1"

    @property
    def ws_base(self) -> str:
        return f"ws://127.0.0.1:{self.server.port}/api/v1"

    def stop(self):
        async def shutdown():
            await self.server.stop()
            self.loop.stop()

        asyncio.run_coroutine_threadsafe(shutdown(), self.loop)
        self._thread.join(timeout=10)

    def run(self, coro):
        return asyncio.run_coroutine_threadsafe(coro, self.loop).result(60)


@pytest.fixture(scope="module")
def harness():
    cfg = config_from_dict(
        {
            # the whole module shares one server: stay clear of the per-IP
            # rate limiter (its own behavior is pinned in
            # test_httpd_hardening)
            "server": {"host": "127.0.0.1", "port": 0,
                       "rate_limit_per_min": 100000},
            "device": {"driver": "fake"},
        }
    )
    h = ServerHarness(cfg).start()
    yield h
    h.stop()


@pytest.fixture(scope="module")
def client(harness):
    with httpx.Client(base_url=harness.base, timeout=30) as c:
        yield c


class TestRest:
    def test_health_and_devices(self, client):
        r = client.get("/health")
        assert r.status_code == 200 and r.json()["status"] == "ok"
        devices = client.get("/devices").json()
        assert len(devices) >= 1 and devices[0]["driver"] == "fake"

    def test_capture_crud_and_lifecycle(self, client):
        r = client.post(
            "/captures",
            json={"centerHz": 155e6, "sampleRate": 800_000},
        )
        assert r.status_code == 201, r.text
        cap = r.json()
        cid = cap["id"]
        assert cap["state"] == "created"

        r = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.1e6, "name": "test"},
        )
        assert r.status_code == 201, r.text
        ch = r.json()
        assert ch["captureId"] == cid

        r = client.post(f"/captures/{cid}/start")
        assert r.json()["state"] in ("starting", "running")

        # runs and produces blocks
        for _ in range(120):
            st = client.get(f"/captures/{cid}").json()
            if st["blocksProcessed"] >= 2:
                break
            time.sleep(0.25)
        assert st["blocksProcessed"] >= 2

        # snapshot serves the cached last frame instantly while running
        # (even during a bank-change recompile) — previously it hung up
        # to 10 s waiting for the NEXT frame
        t0 = time.monotonic()
        spec = client.get(f"/captures/{cid}/spectrum").json()
        assert len(spec["db"]) == 2048
        assert time.monotonic() - t0 < 5.0

        # channel metrics + update
        r = client.patch(f"/channels/{ch['id']}", json={"name": "renamed"})
        assert r.json()["name"] == "renamed"

        r = client.delete(f"/channels/{ch['id']}")
        assert r.json()["ok"]
        r = client.post(f"/captures/{cid}/stop")
        assert r.json()["state"] == "stopped"

        # round 5 (ADVICE): a stopped capture must NOT serve a stale
        # frame forever — the cache clears on stop and the route answers
        # 404 immediately instead of burning the 10 s next-frame wait
        t0 = time.monotonic()
        r = client.get(f"/captures/{cid}/spectrum")
        assert r.status_code == 404
        assert time.monotonic() - t0 < 5.0

        assert client.delete(f"/captures/{cid}").json()["ok"]

    def test_errors(self, client):
        assert client.get("/captures/nope").status_code == 404
        assert client.delete("/channels/nope").status_code == 404
        r = client.post("/captures", content=b"{bad json")
        assert r.status_code == 400
        r = client.post("/captures", json={})  # defaults fine
        cid = r.json()["id"]
        r = client.post(f"/captures/{cid}/channels", json={"mode": "nbfm"})
        assert r.status_code == 422
        r = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 999e9},
        )
        assert r.status_code == 422
        client.delete(f"/captures/{cid}")

    def test_system_metrics_and_logs(self, client):
        m = client.get("/system/metrics").json()
        assert "uptimeS" in m
        assert client.get("/logs").status_code == 200
        assert client.get("/errors").status_code == 200
        assert client.get("/debug/perf").status_code == 200

    def test_trunking_endpoints(self, client):
        r = client.post(
            "/trunking/systems",
            json={
                "id": "tsys",
                "control_channels": [851.2e6],
                "sample_rate": 960_000,
                "talkgroups": [{"tgid": 100, "name": "Dispatch"}],
            },
        )
        assert r.status_code == 201, r.text
        assert client.get("/trunking/systems").json()[0]["id"] == "tsys"
        tgs = client.get("/trunking/systems/tsys/talkgroups").json()
        assert tgs[0]["name"] == "Dispatch"
        calls = client.get("/trunking/systems/tsys/calls").json()
        assert calls["active"] == [] and calls["history"] == []
        assert client.delete("/trunking/systems/tsys").json()["ok"]


class TestWebSockets:
    def test_audio_stream_delivers_pcm(self, harness, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.005e6},
        ).json()
        client.post(f"/captures/{cid}/start")

        async def grab():
            async with ws_client.connect(
                f"{harness.ws_base}/stream/channels/{ch['id']}", open_timeout=30
            ) as ws:
                chunks = []
                for _ in range(3):
                    chunks.append(await asyncio.wait_for(ws.recv(), 60))
                return chunks

        chunks = harness.run(grab())
        assert all(isinstance(c, (bytes, bytearray)) for c in chunks)
        pcm = np.frombuffer(b"".join(chunks), np.int16)
        assert len(pcm) > 4800
        client.post(f"/captures/{cid}/stop")
        client.delete(f"/captures/{cid}")

    def test_spectrum_stream(self, harness, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        client.post(f"/captures/{cid}/start")

        async def grab():
            async with ws_client.connect(
                f"{harness.ws_base}/stream/captures/{cid}/spectrum", open_timeout=30
            ) as ws:
                return json.loads(await asyncio.wait_for(ws.recv(), 60))

        msg = harness.run(grab())
        assert msg["type"] == "spectrum" and len(msg["db"]) == 2048
        client.post(f"/captures/{cid}/stop")
        client.delete(f"/captures/{cid}")

    def test_state_stream_sees_channel_creation(self, harness, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]

        async def watch():
            async with ws_client.connect(
                f"{harness.ws_base}/stream/state", open_timeout=30
            ) as ws:
                await asyncio.sleep(0.2)
                resp = await asyncio.to_thread(
                    client.post,
                    f"/captures/{cid}/channels",
                    json={"mode": "nbfm", "frequencyHz": 155.01e6},
                )
                assert resp.status_code == 201
                evt = json.loads(await asyncio.wait_for(ws.recv(), 30))
                return evt

        evt = watch()
        evt = harness.run(evt)
        assert evt["entity"] == "channel" and evt["change"] == "created"
        client.delete(f"/captures/{cid}")


class TestMcp:
    def test_mcp_rpc_surface(self, harness, client):
        base = harness.base.rsplit("/api/v1", 1)[0]
        with httpx.Client(base_url=base, timeout=30) as mc:
            r = mc.post(
                "/mcp",
                json={"jsonrpc": "2.0", "id": 1, "method": "initialize"},
            )
            assert r.json()["result"]["serverInfo"]["name"] == "wavecap-tpu"
            r = mc.post(
                "/mcp", json={"jsonrpc": "2.0", "id": 2, "method": "tools/list"}
            )
            tools = {t["name"] for t in r.json()["result"]["tools"]}
            assert {"list_devices", "create_capture", "tune_channel"} <= tools
            r = mc.post(
                "/mcp",
                json={
                    "jsonrpc": "2.0",
                    "id": 3,
                    "method": "tools/call",
                    "params": {"name": "list_devices", "arguments": {}},
                },
            )
            content = json.loads(r.json()["result"]["content"][0]["text"])
            assert content[0]["driver"] == "fake"
            # unknown method -> JSON-RPC error
            r = mc.post(
                "/mcp", json={"jsonrpc": "2.0", "id": 4, "method": "bogus"}
            )
            assert r.json()["error"]["code"] == -32601


class TestScannerAndAttachments:
    def test_scanner_crud(self, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.1e6},
        ).json()
        r = client.post(
            "/scanners",
            json={
                "captureId": cid,
                "channelId": ch["id"],
                "entries": [
                    {"frequencyHz": 155.1e6, "name": "a"},
                    {"frequencyHz": 155.2e6, "name": "b"},
                ],
                "dwellS": 0.1,
                "autoStart": False,
            },
        )
        assert r.status_code == 201, r.text
        sid = r.json()["id"]
        assert client.get(f"/scanners/{sid}").json()["state"] == "stopped"
        client.post(f"/scanners/{sid}/start")
        time.sleep(0.5)
        st = client.get(f"/scanners/{sid}").json()
        assert st["state"] in ("scanning", "holding")
        r = client.post(f"/scanners/{sid}/lockout", json={"frequencyHz": 155.2e6})
        assert any(e["lockedOut"] for e in r.json()["entries"])
        assert client.delete(f"/scanners/{sid}").json()["ok"]
        client.delete(f"/captures/{cid}")

    def test_attachment_lifecycle(self, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.05e6},
        ).json()
        r = client.post(f"/channels/{ch['id']}/attachments", json={"kind": "pocsag"})
        assert r.status_code == 201, r.text
        assert client.post(
            f"/channels/{ch['id']}/attachments", json={"kind": "pocsag"}
        ).status_code == 409
        assert client.post(
            f"/channels/{ch['id']}/attachments", json={"kind": "bogus"}
        ).status_code == 422
        atts = client.get(f"/channels/{ch['id']}/attachments").json()
        assert atts[0]["kind"] == "pocsag"
        assert client.get(f"/channels/{ch['id']}/messages").json() == []
        assert client.delete(
            f"/channels/{ch['id']}/attachments/pocsag"
        ).json()["ok"]
        client.delete(f"/captures/{cid}")


class TestMiscEndpoints:
    def test_frequency_identify(self, client):
        r = client.get("/frequencies/identify?hz=90300000")
        assert r.json()["name"] == "FM 90.3"
        assert r.json()["modeHint"] == "wbfm"
        assert client.get("/frequencies/identify").status_code == 422

    def test_recipes_listing(self, client):
        r = client.get("/recipes")
        assert r.status_code == 200
        # repo ships presets/recipes; when cwd is repo root they appear
        assert isinstance(r.json(), list)

    def test_metrics_history(self, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.02e6},
        ).json()
        client.post(f"/captures/{cid}/start")
        for _ in range(120):
            st = client.get(f"/captures/{cid}").json()
            if st["blocksProcessed"] >= 2:
                break
            time.sleep(0.25)
        m = client.get(f"/channels/{ch['id']}/metrics?history=1").json()
        assert "history" in m and len(m["history"]) >= 1
        client.post(f"/captures/{cid}/stop")
        client.delete(f"/captures/{cid}")


class TestTrunkingWorkerMode:
    def test_per_device_mode_boots_workers(self, tmp_path):
        cfg = config_from_dict(
            {
                "server": {"host": "127.0.0.1", "port": 0},
                "device": {"driver": "fake"},
                "trunking_workers": {"mode": "per_device"},
                "trunking_systems": [
                    {
                        "id": "w1",
                        "control_channels": [851.2e6],
                        "sample_rate": 800_000,
                        "auto_start": False,
                    }
                ],
            }
        )
        h = ServerHarness(cfg).start()
        try:
            with httpx.Client(base_url=h.base, timeout=60) as c:
                for _ in range(120):
                    workers = c.get("/trunking/workers").json()
                    if workers and workers[0]["systems"]:
                        break
                    time.sleep(0.5)
                assert workers and workers[0]["alive"]
                assert workers[0]["systems"][0]["id"] == "w1"
                systems = c.get("/trunking/systems").json()
                assert any(s["id"] == "w1" for s in systems)
        finally:
            h.stop()


class TestDeviceHealthAndClassifier:
    def test_device_health_endpoint(self, client):
        r = client.get("/devices/health")
        assert r.status_code == 200
        body = r.json()
        assert "recovery" in body and "captures" in body
        assert body["recovery"]["service"] == "sdrplay"

    def test_service_restart_endpoint_applies_policy(self, client, harness):
        calls = []
        harness.server.state.recovery.runner = lambda cmd, timeout=30.0: (
            calls.append(cmd) or (0, "ok")
        )
        r = client.post("/devices/service/restart")
        assert r.status_code == 200 and r.json()["ok"]
        assert calls and calls[0][:2] == ["systemctl", "restart"]
        # cooldown: immediate second attempt is denied
        r2 = client.post("/devices/service/restart")
        assert r2.status_code == 429 and r2.json()["reason"] == "cooldown"

    def test_device_nickname_roundtrip(self, client):
        devs = client.get("/devices").json()
        did = devs[0]["id"]
        r = client.put(f"/devices/{did}/nickname", json={"nickname": "rooftop"})
        assert r.status_code == 200
        devs = client.get("/devices").json()
        assert devs[0]["nickname"] == "rooftop"

    def test_classified_channels_endpoint(self, client):
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.02e6},
        )
        client.post(f"/captures/{cid}/start")
        try:
            for _ in range(120):
                body = client.get(f"/captures/{cid}/classified-channels").json()
                if body["frames"] >= 20:
                    break
                time.sleep(0.25)
            assert body["captureId"] == cid
            assert body["frames"] >= 20
            assert isinstance(body["channels"], list)
        finally:
            client.post(f"/captures/{cid}/stop")


class TestHttpChunkedAudio:
    def test_pcm_http_stream(self, harness, client):
        """GET /stream/channels/{id}.pcm serves chunked int16 PCM
        (reference api.py:2483-2650 StreamingResponse parity)."""
        r = client.post("/captures", json={"centerHz": 155e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.005e6},
        ).json()
        client.post(f"/captures/{cid}/start")
        try:
            url = f"{harness.base}/stream/channels/{ch['id']}.pcm"
            buf = b""
            with httpx.stream("GET", url, timeout=60) as resp:
                assert resp.status_code == 200
                assert resp.headers["content-type"] == "audio/x-raw"
                assert "chunked" in resp.headers.get("transfer-encoding", "")
                for chunk in resp.iter_bytes():
                    buf += chunk
                    if len(buf) >= 9600:
                        break
            pcm = np.frombuffer(buf[: len(buf) // 2 * 2], np.int16)
            assert len(pcm) >= 4800
        finally:
            client.post(f"/captures/{cid}/stop")
            client.delete(f"/captures/{cid}")

    def test_unknown_format_404(self, client):
        r = client.post("/captures", json={"centerHz": 100e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 100.1e6},
        ).json()
        # ffmpeg may or may not exist in the image: if absent, mp3 must 404
        from wavecap_tpu.server.encoders import available_formats

        if "mp3" not in available_formats():
            assert (
                client.get(f"/stream/channels/{ch['id']}.mp3").status_code == 404
            )
        client.delete(f"/captures/{cid}")


class TestRecipes:
    def test_list_and_apply(self, client):
        recipes = client.get("/recipes").json()
        ids = {r["id"] for r in recipes}
        assert len(recipes) >= 20, f"only {len(recipes)} recipes"
        assert "noaa-weather" in ids and "p25-800" in ids

        r = client.post("/recipes/noaa-weather/apply", json={})
        assert r.status_code == 201, r.text
        body = r.json()
        cid = body["capture"]["id"]
        try:
            assert len(body["channels"]) == 3
            assert body["capture"]["state"] == "created"
        finally:
            client.delete(f"/captures/{cid}")

    def test_apply_with_frequency_override(self, client):
        r = client.post(
            "/recipes/p25-vhf/apply", json={"frequencyHz": 154.0e6}
        )
        assert r.status_code == 201, r.text
        body = r.json()
        cid = body["capture"]["id"]
        try:
            assert body["capture"]["centerHz"] == pytest.approx(154.0e6)
            assert body["channels"][0]["frequencyHz"] == pytest.approx(154.0e6)
        finally:
            client.delete(f"/captures/{cid}")

    def test_apply_unknown_404(self, client):
        assert client.post("/recipes/nope/apply", json={}).status_code == 404


class TestClientDisconnectRelease:
    """Abandoned clients must release their connection handlers.

    A client that half-closes (FIN, no RST) never fails server writes and
    leaves ``is_closing()`` False; before the eof-watch fix, quiet WS and
    chunked-stream handlers leaked until (and then hung) shutdown, because
    Python 3.12's ``Server.wait_closed()`` waits on every handler task.
    """

    @staticmethod
    def _conn_count(harness) -> int:
        async def n():
            return len(harness.server.http._conns)

        return harness.run(n())

    def _await_conn_drop(self, harness, baseline: int, deadline: float = 8.0):
        t0 = time.time()
        while time.time() - t0 < deadline:
            if self._conn_count(harness) <= baseline:
                return
            time.sleep(0.2)
        raise AssertionError(
            f"handler not released: {self._conn_count(harness)} > {baseline}"
        )

    def _raw_socket(self, harness):
        import socket

        s = socket.create_connection(("127.0.0.1", harness.server.port), timeout=5)
        s.settimeout(5)
        return s

    def test_ws_abandoned_without_close_frame(self, harness, client):
        baseline = self._conn_count(harness)
        s = self._raw_socket(harness)
        s.sendall(
            b"GET /api/v1/stream/state HTTP/1.1\r\n"
            b"Host: x\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            b"Sec-WebSocket-Version: 13\r\n\r\n"
        )
        assert b" 101 " in s.recv(4096)
        assert self._conn_count(harness) == baseline + 1
        s.close()  # FIN, no WS close frame; /stream/state never sends
        self._await_conn_drop(harness, baseline)

    def test_idle_chunked_stream_abandoned(self, harness, client):
        # capture exists but is never started: the pcm generator only
        # produces empty liveness ticks, so only the eof watch can notice
        r = client.post("/captures", json={"centerHz": 101e6, "sampleRate": 800_000})
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 101.1e6},
        ).json()
        baseline = self._conn_count(harness)
        s = self._raw_socket(harness)
        s.sendall(
            f"GET /api/v1/stream/channels/{ch['id']}.pcm HTTP/1.1\r\n"
            "Host: x\r\n\r\n".encode()
        )
        assert b" 200 " in s.recv(4096)
        s.close()
        try:
            self._await_conn_drop(harness, baseline)
        finally:
            client.delete(f"/captures/{cid}")

    def test_stop_completes_with_parked_handler(self):
        """server.stop() must finish promptly even with a live quiet WS."""
        cfg = config_from_dict(
            {"server": {"host": "127.0.0.1", "port": 0}, "device": {"driver": "fake"}}
        )
        h = ServerHarness(cfg).start()
        import socket

        s = socket.create_connection(("127.0.0.1", h.server.port), timeout=5)
        s.sendall(
            b"GET /api/v1/stream/state HTTP/1.1\r\n"
            b"Host: x\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            b"Sec-WebSocket-Version: 13\r\n\r\n"
        )
        assert b" 101 " in s.recv(4096)
        t0 = time.time()
        h.stop()  # joins the loop thread; hang here was the bug
        assert time.time() - t0 < 8.0
        s.close()


class TestTalkgroupEditing:
    """Live talkgroup directory mutation (reference trunking/api.py
    talkgroup update + config.py load_talkgroups_csv)."""

    @pytest.fixture()
    def sid(self, client):
        r = client.post(
            "/trunking/systems",
            json={
                "id": "tged",
                "control_channels": [851.2e6],
                "sample_rate": 960_000,
                "talkgroups": [{"tgid": 100, "name": "Dispatch"}],
            },
        )
        assert r.status_code == 201, r.text
        yield "tged"
        client.delete("/trunking/systems/tged")

    def test_put_replaces_and_merges(self, client, sid):
        r = client.put(
            f"/trunking/systems/{sid}/talkgroups",
            json=[{"tgid": 200, "name": "Fire", "priority": 1}],
        )
        assert r.status_code == 200 and r.json()["count"] == 1
        tgs = client.get(f"/trunking/systems/{sid}/talkgroups").json()
        assert [t["tgid"] for t in tgs] == [200]
        r = client.put(
            f"/trunking/systems/{sid}/talkgroups",
            json={"merge": True, "talkgroups": [{"tgid": 300, "name": "EMS"}]},
        )
        assert r.json()["count"] == 2

    def test_patch_single_talkgroup(self, client, sid):
        r = client.patch(
            f"/trunking/systems/{sid}/talkgroups/100",
            json={"name": "Dispatch North", "priority": 2, "record": False},
        )
        assert r.status_code == 200, r.text
        out = r.json()
        assert out["name"] == "Dispatch North"
        assert out["priority"] == 2 and out["record"] is False
        # patching an unknown tgid materializes the default entry
        r = client.patch(
            f"/trunking/systems/{sid}/talkgroups/999", json={"monitor": False}
        )
        assert r.status_code == 200 and r.json()["monitor"] is False
        tgs = {t["tgid"] for t in
               client.get(f"/trunking/systems/{sid}/talkgroups").json()}
        assert {100, 999} <= tgs

    def test_csv_import_merges(self, client, sid):
        csv_text = (
            "Decimal,Alpha Tag,Category,Priority\n"
            "501,PD Patrol,Police,1\n"
            "502,FD Tac 2,Fire,3\n"
        )
        r = client.post(
            f"/trunking/systems/{sid}/talkgroups/import", json={"csv": csv_text}
        )
        assert r.status_code == 200, r.text
        assert r.json()["imported"] == 2
        tgs = {t["tgid"]: t for t in
               client.get(f"/trunking/systems/{sid}/talkgroups").json()}
        assert tgs[501]["name"] == "PD Patrol"
        assert tgs[501]["category"] == "Police"
        assert tgs[100]["name"] == "Dispatch"  # merge keeps existing

    def test_csv_import_rejects_empty(self, client, sid):
        r = client.post(
            f"/trunking/systems/{sid}/talkgroups/import", json={"csv": "  "}
        )
        assert r.status_code == 422


class TestTrunkingApiLongTail:
    """Hunt-mode, CC enable/lock, scan trigger, vocoders, voice-streams,
    global calls, message clear (reference trunking/api.py surface)."""

    @pytest.fixture()
    def sid(self, client):
        r = client.post(
            "/trunking/systems",
            json={
                "id": "tlt",
                "control_channels": [851.2e6, 852.5e6],
                "sample_rate": 2_400_000,
            },
        )
        assert r.status_code == 201, r.text
        yield "tlt"
        client.delete("/trunking/systems/tlt")

    def test_vocoders_always_available(self, client):
        v = client.get("/trunking/vocoders").json()
        assert v["imbe"] and v["ambe2"] and v["anyAvailable"]
        assert v["ambe2Backend"] == "native"

    def test_hunt_mode_get_patch(self, client, sid):
        assert client.get(f"/trunking/systems/{sid}/hunt-mode").json() == {
            "huntMode": "hunt"
        }
        r = client.patch(
            f"/trunking/systems/{sid}/hunt-mode", json={"huntMode": "scan"}
        )
        assert r.json() == {"huntMode": "scan"}
        assert client.patch(
            f"/trunking/systems/{sid}/hunt-mode", json={"huntMode": "bogus"}
        ).status_code == 422

    def test_cc_channels_enable_and_lock(self, client, sid):
        chans = client.get(f"/trunking/systems/{sid}/channels").json()
        assert {c["frequencyHz"] for c in chans} == {851.2e6, 852.5e6}
        assert all(c["enabled"] and c["configured"] for c in chans)
        # disable one: it leaves the hunt list but stays visible
        r = client.patch(
            f"/trunking/systems/{sid}/channels/852500000/enabled",
            json={"enabled": False},
        )
        assert r.json()["enabled"] is False
        chans = {c["frequencyHz"]: c for c in
                 client.get(f"/trunking/systems/{sid}/channels").json()}
        assert chans[852.5e6]["enabled"] is False
        # lock the other
        r = client.post(
            f"/trunking/systems/{sid}/channels/851200000/lock", json={}
        )
        assert r.json()["locked"] is True
        chans = {c["frequencyHz"]: c for c in
                 client.get(f"/trunking/systems/{sid}/channels").json()}
        assert chans[851.2e6]["locked"] is True
        # unlock
        client.post(
            f"/trunking/systems/{sid}/channels/851200000/lock",
            json={"locked": False},
        )
        chans = {c["frequencyHz"]: c for c in
                 client.get(f"/trunking/systems/{sid}/channels").json()}
        assert chans[851.2e6]["locked"] is False

    def test_scan_voice_streams_calls_messages(self, client, sid):
        assert client.post(f"/trunking/systems/{sid}/scan").json()["ok"]
        # not started: no recorder pool yet
        assert client.get(f"/trunking/systems/{sid}/voice-streams").json() == []
        assert client.get("/trunking/calls").json() == []
        assert client.delete(f"/trunking/systems/{sid}/messages").json() == {
            "cleared": 0
        }


class TestReferencePathParity:
    """Reference api.py path aliases and the remaining endpoint long tail:
    capture channels/snapshot, channel start/stop + metrics history/extended,
    device name/refresh/sdrplay aliases, frequency identify alias,
    frontend-log ingestion, scanner pause/lock/patch, shutdown."""

    def test_capture_channel_aliases_and_stop(self, client):
        cid = client.post(
            "/captures", json={"centerHz": 155e6, "sampleRate": 800_000}
        ).json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.05e6},
        ).json()
        chans = client.get(f"/captures/{cid}/channels").json()
        assert [c["id"] for c in chans] == [ch["id"]]
        # per-channel stop/start toggles the publish gate
        assert client.post(f"/channels/{ch['id']}/stop").json()["state"] == "stopped"
        assert client.post(f"/channels/{ch['id']}/start").json()["state"] == "active"
        hist = client.get(f"/channels/{ch['id']}/metrics/history").json()
        assert isinstance(hist, list)
        ext = client.get(f"/channels/{ch['id']}/metrics/extended").json()
        assert ext["id"] == ch["id"] and "audioSubscribers" in ext
        assert client.get(f"/channels/{ch['id']}/decode/pocsag").json() == []
        client.delete(f"/captures/{cid}")

    def test_device_name_alias_and_refresh(self, client):
        did = client.get("/devices").json()[0]["id"]
        r = client.patch(f"/devices/{did}/name", json={"nickname": "roof"})
        assert r.json()["nickname"] == "roof"
        assert client.get(f"/devices/{did}/name").json()["nickname"] == "roof"
        assert client.post("/devices/refresh").json()["count"] >= 1
        assert client.get("/devices/sdrplay/health").status_code == 200

    def test_frequency_identify_alias(self, client):
        a = client.get("/frequencies/identify?hz=100100000").json()
        b = client.get("/frequency/identify?hz=100100000").json()
        assert a == b

    def test_frontend_logs_roundtrip(self, client):
        client.delete("/frontend-logs")
        r = client.post(
            "/frontend-logs",
            json=[{"level": "error", "message": "boom", "source": "spa"}],
        )
        assert r.json()["ok"]
        logs = client.get("/frontend-logs").json()
        assert logs[-1]["message"] == "boom"
        # /log/frontend is the same store
        assert client.get("/log/frontend").json()[-1]["message"] == "boom"
        assert client.delete("/frontend-logs").json()["cleared"] >= 1

    def test_scanner_pause_lock_patch_lockouts(self, client):
        cid = client.post(
            "/captures", json={"centerHz": 155e6, "sampleRate": 800_000}
        ).json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 155.05e6},
        ).json()
        sc = client.post("/scanners", json={
            "captureId": cid, "channelId": ch["id"], "autoStart": True,
            "entries": [
                {"frequencyHz": 155.05e6}, {"frequencyHz": 155.10e6},
            ],
        }).json()
        sid = sc["id"]
        assert client.post(f"/scanners/{sid}/pause").json()["state"] == "paused"
        assert client.post(f"/scanners/{sid}/resume").json()["state"] == "scanning"
        assert client.post(f"/scanners/{sid}/lock").json()["state"] == "locked"
        assert client.post(f"/scanners/{sid}/unlock").json()["state"] == "scanning"
        st = client.patch(f"/scanners/{sid}", json={"dwellS": 1.5, "mode": "priority"}).json()
        assert st["mode"] == "priority"
        client.post(f"/scanners/{sid}/lockout",
                    json={"frequencyHz": 155.10e6})
        st = client.get(f"/scanners/{sid}").json()
        assert any(e["lockedOut"] for e in st["entries"])
        st = client.delete(f"/scanners/{sid}/lockout/155100000").json()
        assert not any(e["lockedOut"] for e in st["entries"])
        client.post(f"/scanners/{sid}/lockout", json={"frequencyHz": 155.05e6})
        st = client.delete(f"/scanners/{sid}/lockouts").json()
        assert not any(e["lockedOut"] for e in st["entries"])
        client.delete(f"/scanners/{sid}")
        client.delete(f"/captures/{cid}")

    def test_shutdown_endpoint_fires_runner_callback(self):
        cfg = config_from_dict(
            {"server": {"host": "127.0.0.1", "port": 0,
                        "rate_limit_per_min": 100000},
             "device": {"driver": "fake"}}
        )
        h = ServerHarness(cfg).start()
        fired = threading.Event()
        h.server.state.on_shutdown_request = fired.set
        try:
            with httpx.Client(base_url=h.base, timeout=30) as c:
                r = c.post("/shutdown")
                assert r.json()["shuttingDown"]
            assert fired.wait(10)
            assert h.server.state.shutdown_requested
        finally:
            h.stop()


class TestTalkgroupPostAndActiveCalls:
    def test_post_talkgroups_and_active_calls_alias(self, client):
        r = client.post(
            "/trunking/systems",
            json={"id": "tpa", "control_channels": [851.2e6]},
        )
        assert r.status_code == 201
        try:
            r = client.post(
                "/trunking/systems/tpa/talkgroups",
                json=[{"tgid": 7, "name": "Ops"}],
            )
            assert r.status_code == 201 and r.json()["count"] == 1
            assert client.get(
                "/trunking/systems/tpa/calls/active"
            ).json() == []
        finally:
            client.delete("/trunking/systems/tpa")


class TestRecordingsBrowser:
    def test_list_and_fetch_wav(self, client, tmp_path):
        import wave

        r = client.post(
            "/trunking/systems",
            json={"id": "trec", "control_channels": [851.2e6],
                  "recording_dir": str(tmp_path)},
        )
        assert r.status_code == 201, r.text
        try:
            # artifacts land where the recorders write them:
            # <recording_dir>/<system_id>/ (system.py _end_call)
            sysdir = tmp_path / "trec"
            sysdir.mkdir()
            name = "20260818_120000_tg42_src7"
            with wave.open(str(sysdir / f"{name}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(b"\x00\x01" * 800)
            (sysdir / f"{name}.json").write_text(json.dumps({
                "tgid": 42, "talkgroup": "Ops", "sourceId": 7,
                "startTime": 1787000000.0, "audioSeconds": 0.1,
            }))
            recs = client.get("/trunking/systems/trec/recordings").json()
            assert len(recs) == 1
            assert recs[0]["name"] == name and recs[0]["hasAudio"]
            assert recs[0]["tgid"] == 42
            wav = client.get(f"/trunking/systems/trec/recordings/{name}.wav")
            assert wav.status_code == 200
            assert wav.headers["content-type"] == "audio/wav"
            assert wav.content[:4] == b"RIFF"
            # traversal attempts are rejected
            bad = client.get(
                "/trunking/systems/trec/recordings/..%2Fetc%2Fpasswd.wav"
            )
            assert bad.status_code in (404, 422)
            assert client.get(
                "/trunking/systems/trec/recordings/nope123.wav"
            ).status_code == 404
        finally:
            client.delete("/trunking/systems/trec")


class TestPerSystemEventStream:
    def test_filtered_ws_only_sees_own_system(self, harness, client):
        for sid in ("evta", "evtb"):
            r = client.post(
                "/trunking/systems",
                json={"id": sid, "control_channels": [851.2e6]},
            )
            assert r.status_code == 201
        try:
            sys_a = harness.server.state.trunking.get("evta")
            sys_b = harness.server.state.trunking.get("evtb")

            async def grab():
                async with ws_client.connect(
                    f"{harness.ws_base}/trunking/stream/evta", open_timeout=30
                ) as ws:
                    await asyncio.sleep(0.2)  # subscribe before emitting
                    sys_b._emit("call_start", {"tgid": 1})
                    sys_a._emit("call_start", {"tgid": 2})
                    return json.loads(await asyncio.wait_for(ws.recv(), 30))

            evt = harness.run(grab())
            # system B's event was filtered; the first delivery is A's
            assert evt["systemId"] == "evta" and evt["tgid"] == 2
        finally:
            client.delete("/trunking/systems/evta")
            client.delete("/trunking/systems/evtb")


class TestMcpToolCoverage:
    """Exercise the full MCP tool lifecycle end-to-end (the 24-tool
    registry matches the reference's mcp_server.py set)."""

    def call(self, mc, name, arguments=None, rid=1):
        r = mc.post("/mcp", json={
            "jsonrpc": "2.0", "id": rid, "method": "tools/call",
            "params": {"name": name, "arguments": arguments or {}},
        })
        body = r.json()
        assert "error" not in body, body
        return json.loads(body["result"]["content"][0]["text"])

    def test_capture_channel_lifecycle_via_tools(self, harness):
        base = harness.base.rsplit("/api/v1", 1)[0]
        with httpx.Client(base_url=base, timeout=60) as mc:
            listing = mc.post("/mcp", json={
                "jsonrpc": "2.0", "id": 0, "method": "tools/list"}).json()
            assert len(listing["result"]["tools"]) == 24
            cap = self.call(mc, "create_capture",
                            {"centerHz": 155e6, "sampleRate": 800_000})
            cid = cap["id"]
            try:
                got = self.call(mc, "get_capture", {"captureId": cid})
                assert got["id"] == cid
                ch = self.call(mc, "create_channel", {
                    "captureId": cid, "mode": "nbfm", "frequencyHz": 155.05e6,
                })
                chans = self.call(mc, "list_channels", {})
                assert any(c["id"] == ch["id"] for c in chans)
                tuned = self.call(mc, "tune_channel", {
                    "channelId": ch["id"], "frequencyHz": 155.10e6,
                })
                assert abs(tuned["frequencyHz"] - 155.10e6) < 1
                met = self.call(mc, "get_channel_metrics",
                                {"channelId": ch["id"]})
                assert "rssiDb" in met
                # DSP overrides + front-end tuning through the MCP tools
                upd = self.call(mc, "update_channel", {
                    "channelId": ch["id"],
                    "dsp": {"notch_frequencies": [900.0]},
                    "squelchDb": -70.0,
                })
                assert upd["dsp"] == {"notch_frequencies": [900.0]}
                assert upd["squelchDb"] == -70.0
                upd = self.call(mc, "update_channel", {
                    "channelId": ch["id"],
                    "dsp": {"notch_frequencies": None},
                    "squelchDb": None,
                })
                assert upd["dsp"] == {} and upd["squelchDb"] is None
                capst = self.call(mc, "update_capture", {
                    "captureId": cid, "ppm": 4.5, "agc": True,
                })
                assert capst["ppm"] == 4.5 and capst["agc"] is True
                ident = self.call(mc, "identify_frequency", {"hz": 100.1e6})
                assert ident["modeHint"] == "wbfm"
                health = self.call(mc, "get_system_health", {})
                assert health
                recipes = self.call(mc, "get_recipes", {})
                assert len(recipes) >= 20
                self.call(mc, "delete_channel", {"channelId": ch["id"]})
                chans = self.call(mc, "list_channels", {})
                assert not any(c["id"] == ch["id"] for c in chans)
            finally:
                with httpx.Client(base_url=harness.base, timeout=30) as c:
                    c.delete(f"/captures/{cid}")

    def test_trunking_tools(self, harness, client):
        base = harness.base.rsplit("/api/v1", 1)[0]
        r = client.post("/trunking/systems", json={
            "id": "mcpt", "control_channels": [851.2e6],
            "talkgroups": [{"tgid": 9, "name": "Ops"}],
        })
        assert r.status_code == 201
        try:
            with httpx.Client(base_url=base, timeout=60) as mc:
                systems = self.call(mc, "list_trunking_systems", {})
                assert any(s["id"] == "mcpt" for s in systems)
                tgs = self.call(mc, "get_talkgroups", {"systemId": "mcpt"})
                assert tgs[0]["name"] == "Ops"
                calls = self.call(mc, "get_active_calls", {})
                assert calls == [] or isinstance(calls, list)
        finally:
            client.delete("/trunking/systems/mcpt")


class TestRound3ApiCrumbs:
    """VERDICT round-2 item 8: decode/flex, /trunking/recipes, and the
    per-recorder HTTP `.pcm` voice stream routes."""

    def test_decode_flex_empty_and_limit(self, harness, client):
        r = client.post(
            "/captures", json={"centerHz": 929e6, "sampleRate": 800_000}
        )
        if r.status_code >= 400:  # shared module server at capture limit
            for cap in client.get("/captures").json():
                client.delete(f"/captures/{cap['id']}")
            r = client.post(
                "/captures", json={"centerHz": 929e6, "sampleRate": 800_000}
            )
        cid = r.json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 929.2e6},
        ).json()
        r = client.get(f"/channels/{ch['id']}/decode/flex")
        assert r.status_code == 200 and r.json() == []
        # attach a flex decoder, inject a message through the attachment
        r = client.post(
            f"/channels/{ch['id']}/attachments", json={"kind": "flex"}
        )
        assert r.status_code < 300, r.text
        att = harness.server.state.attachments.get((ch["id"], "flex"))
        assert att is not None
        att.messages.append({"protocol": "FLEX", "address": 1234, "text": "hi"})
        msgs = client.get(f"/channels/{ch['id']}/decode/flex").json()
        assert msgs and msgs[-1]["address"] == 1234
        client.delete(f"/captures/{cid}")

    def test_trunking_recipes_filtered(self, client):
        recs = client.get("/trunking/recipes").json()
        assert recs, "expected bundled trunking recipes"
        assert all(r.get("trunking") for r in recs)
        all_recs = client.get("/recipes").json()
        assert len(all_recs) > len(recs)

    def test_voice_pcm_http_routes(self, client):
        client.post(
            "/trunking/systems",
            json={
                "id": "pcmtest",
                "control_channels": [851.2e6],
                "sample_rate": 2_400_000,
            },
        )
        try:
            # not started -> no recorder pool -> 409 / 404
            r = client.get("/stream/trunking/pcmtest/voice.pcm")
            assert r.status_code == 409
            r = client.get("/stream/trunking/pcmtest/voice/0.pcm")
            assert r.status_code == 404
            r = client.get("/stream/trunking/pcmtest/voice/bogus.pcm")
            assert r.status_code == 404
            r = client.get("/stream/trunking/nosuch/voice.pcm")
            assert r.status_code == 404
        finally:
            client.delete("/trunking/systems/pcmtest")


class TestPagerAttachmentDsp:
    def test_pocsag_attachment_disables_voice_filters(self, client):
        """POSTing a pocsag/flex attachment on an nbfm channel must turn
        off the voice band shaping (300 Hz highpass / 3 kHz lowpass
        forced on by bank_cfg) — pager FSK does not survive it
        (round-3 RF-path audit; e2e decode pinned in
        test_attachments_live.py)."""
        cid = client.post(
            "/captures", json={"centerHz": 152e6, "sampleRate": 800_000}
        ).json()["id"]
        ch = client.post(
            f"/captures/{cid}/channels",
            json={"mode": "nbfm", "frequencyHz": 152.1e6},
        ).json()
        r = client.post(
            f"/channels/{ch['id']}/attachments", json={"kind": "pocsag"}
        )
        assert r.status_code == 201, r.text
        dsp = client.get(f"/channels/{ch['id']}").json()["dsp"]
        assert dsp.get("enable_highpass") is False
        assert dsp.get("enable_lowpass") is False
        assert dsp.get("enable_deemphasis") is False
        client.delete(f"/channels/{ch['id']}/attachments/pocsag")
        client.delete(f"/captures/{cid}")
