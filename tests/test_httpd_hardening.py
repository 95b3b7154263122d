"""Protocol-edge hardening tests for the stdlib HTTP/WS server.

The reference rides uvicorn/h11 which enforces header limits and
slow-client timeouts; our hand-rolled httpd must hold the same line.
These drive raw sockets against a live server: oversized heads, bad
content-length, slow-loris trickle, connection cap, pipelining.
"""

import asyncio
import socket
import threading

import pytest

from wavecap_tpu.server import httpd
from wavecap_tpu.server.httpd import HttpServer, Response, Router


class RawHarness:
    def __init__(self, router: Router):
        self.server = HttpServer(router, host="127.0.0.1", port=0)
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
        assert self._started.wait(30)
        return self

    def stop(self):
        async def shutdown():
            await self.server.stop()
            self.loop.stop()

        asyncio.run_coroutine_threadsafe(shutdown(), self.loop)
        self._thread.join(timeout=10)

    @property
    def port(self) -> int:
        return self.server.bound_port

    def connect(self, timeout=5.0) -> socket.socket:
        s = socket.create_connection(("127.0.0.1", self.port), timeout=timeout)
        return s


@pytest.fixture(scope="module")
def harness():
    router = Router()

    @router.get("/ping")
    async def ping(req):
        return Response.json({"ok": True})

    @router.post("/echo")
    async def echo(req):
        return Response.json({"n": len(req.body)})

    h = RawHarness(router).start()
    yield h
    h.stop()


def _recv_head(sock: socket.socket) -> str:
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(4096)
        if not chunk:
            break
        data += chunk
    return data.decode("latin1", "replace")


class TestProtocolEdges:
    def test_plain_request_ok(self, harness):
        s = harness.connect()
        s.sendall(b"GET /ping HTTP/1.1\r\nHost: x\r\n\r\n")
        head = _recv_head(s)
        assert head.startswith("HTTP/1.1 200")
        s.close()

    def test_pipelined_keepalive(self, harness):
        s = harness.connect()
        s.sendall(
            b"GET /ping HTTP/1.1\r\nHost: x\r\n\r\n"
            b"GET /ping HTTP/1.1\r\nHost: x\r\n\r\n"
        )
        data = b""
        while data.count(b'{"ok": true}') < 2:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        assert data.count(b'{"ok": true}') == 2
        s.close()

    def test_oversized_headers_431(self, harness):
        s = harness.connect()
        s.sendall(b"GET /ping HTTP/1.1\r\n")
        s.sendall(b"X-Pad: " + b"a" * 8000 + b"\r\n")
        s.sendall(b"X-Pad2: " + b"a" * 9000 + b"\r\n\r\n")
        head = _recv_head(s)
        assert "431" in head.split("\r\n")[0]
        s.close()

    def test_too_many_headers_431(self, harness):
        s = harness.connect()
        req = b"GET /ping HTTP/1.1\r\n"
        for i in range(150):
            req += b"X-H%d: v\r\n" % i
        req += b"\r\n"
        s.sendall(req)
        head = _recv_head(s)
        assert "431" in head.split("\r\n")[0]
        s.close()

    def test_overlong_request_line_414(self, harness):
        s = harness.connect()
        s.sendall(b"GET /" + b"a" * 20000 + b" HTTP/1.1\r\n\r\n")
        head = _recv_head(s)
        assert "414" in head.split("\r\n")[0]
        s.close()

    def test_bad_content_length_400(self, harness):
        s = harness.connect()
        s.sendall(b"POST /echo HTTP/1.1\r\nContent-Length: abc\r\n\r\n")
        head = _recv_head(s)
        assert "400" in head.split("\r\n")[0]
        s.close()

    def test_negative_content_length_400(self, harness):
        s = harness.connect()
        s.sendall(b"POST /echo HTTP/1.1\r\nContent-Length: -5\r\n\r\n")
        head = _recv_head(s)
        assert "400" in head.split("\r\n")[0]
        s.close()

    def test_huge_body_413(self, harness):
        s = harness.connect()
        s.sendall(b"POST /echo HTTP/1.1\r\nContent-Length: 999999999\r\n\r\n")
        head = _recv_head(s)
        assert "413" in head.split("\r\n")[0]
        s.close()

    def test_garbage_request_line_closes(self, harness):
        s = harness.connect()
        s.sendall(b"\x00\x01\x02 garbage\r\n\r\n")
        # server closes without crashing; next connection still works
        s.recv(4096)
        s.close()
        s2 = harness.connect()
        s2.sendall(b"GET /ping HTTP/1.1\r\n\r\n")
        assert _recv_head(s2).startswith("HTTP/1.1 200")
        s2.close()

    def test_slow_loris_head_times_out(self, harness, monkeypatch):
        monkeypatch.setattr(httpd, "HEAD_TIMEOUT", 0.3)
        s = harness.connect()
        s.sendall(b"GET /ping HTTP/1.1\r\n")  # first line arrives...
        s.sendall(b"X-Trickle: 1")  # ...headers never finish
        s.settimeout(5.0)
        # server must hang up rather than hold the slot forever
        assert s.recv(4096) == b""
        s.close()

    def test_connection_cap_503(self, harness, monkeypatch):
        monkeypatch.setattr(httpd, "MAX_CONNECTIONS", 0)
        s = harness.connect()
        s.sendall(b"GET /ping HTTP/1.1\r\n\r\n")
        head = _recv_head(s)
        assert "503" in head.split("\r\n")[0]
        s.close()
