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

    @router.websocket("/ws")
    async def ws_stream(req, ws):
        # stream handlers are send-only: the server's background drain
        # services inbound ping/fragments/close (httpd._ws_drain)
        await ws.send_text("hello")
        while not ws.closed:
            await asyncio.sleep(0.1)

    flood_events: list = []

    @router.websocket("/ws-flood")
    async def ws_flood(req, ws):
        # binary stream shaped like the audio/spectrum handlers: its own
        # pump per connection, large frames to fill TCP buffers quickly
        chunk = bytes(262_144)
        try:
            while not ws.closed:
                await ws.send_bytes(chunk)
                await asyncio.sleep(0.01)
        except ConnectionError as e:
            flood_events.append(str(e))
            raise

    h = RawHarness(router).start()
    h.flood_events = flood_events
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


def _ws_handshake(sock, host, port, path):
    import base64
    import os as _os

    key = base64.b64encode(_os.urandom(16)).decode()
    sock.sendall(
        f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
        f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        .encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        if not chunk:
            break
        resp += chunk
    return resp


def _ws_frame(opcode, payload=b"", fin=True, mask=True):
    import os as _os

    hdr = bytearray([(0x80 if fin else 0) | opcode])
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        hdr.append(mbit | n)
    else:
        hdr.append(mbit | 126)
        hdr += n.to_bytes(2, "big")
    if mask:
        key = _os.urandom(4)
        hdr += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(hdr) + bytes(payload)


def _ws_read_frame(sock):
    hdr = sock.recv(2)
    assert len(hdr) == 2
    opcode = hdr[0] & 0x0F
    n = hdr[1] & 0x7F
    if n == 126:
        n = int.from_bytes(sock.recv(2), "big")
    payload = b""
    while len(payload) < n:
        payload += sock.recv(n - len(payload))
    return opcode, payload


class TestWebSocketProtocolEdges:
    """RFC 6455 edges on the hand-rolled WS: handshake, ping/pong,
    fragmentation, clean close (reference relies on uvicorn for these)."""

    def test_handshake_and_ping_pong(self, harness):
        import socket

        with socket.create_connection(
            ("127.0.0.1", harness.port), timeout=10
        ) as s:
            resp = _ws_handshake(s, "127.0.0.1", harness.port,
                                 "/ws")
            assert b"101" in resp.split(b"\r\n", 1)[0]
            assert b"sec-websocket-accept" in resp.lower()
            s.sendall(_ws_frame(0x9, b"hello"))  # ping
            deadline = 0
            while True:
                opcode, payload = _ws_read_frame(s)
                if opcode == 0xA:
                    assert payload == b"hello"
                    break
                assert opcode in (0x1, 0x2)  # state events may interleave
                deadline += 1
                assert deadline < 20

    def test_fragmented_text_reassembly(self, harness):
        """Fragmented client frames must reassemble (the state WS ignores
        inbound text, so success == the connection survives and still
        answers a ping afterwards)."""
        import socket

        with socket.create_connection(
            ("127.0.0.1", harness.port), timeout=10
        ) as s:
            _ws_handshake(s, "127.0.0.1", harness.port, "/ws")
            s.sendall(_ws_frame(0x1, b"frag", fin=False))
            s.sendall(_ws_frame(0x0, b"mented", fin=True))
            s.sendall(_ws_frame(0x9, b"ok?"))
            for _ in range(20):
                opcode, payload = _ws_read_frame(s)
                if opcode == 0xA:
                    assert payload == b"ok?"
                    return
            raise AssertionError("no pong after fragmented message")

    def test_clean_close_handshake(self, harness):
        import socket

        with socket.create_connection(
            ("127.0.0.1", harness.port), timeout=10
        ) as s:
            _ws_handshake(s, "127.0.0.1", harness.port, "/ws")
            s.sendall(_ws_frame(0x8, (1000).to_bytes(2, "big")))
            # success = close echoed OR connection torn down promptly;
            # the guarded failure mode is a socket that hangs open
            for _ in range(20):
                hdr = s.recv(2)
                if not hdr:
                    return  # server hung up after the close handshake
                opcode = hdr[0] & 0x0F
                n = hdr[1] & 0x7F
                if n == 126:
                    n = int.from_bytes(s.recv(2), "big")
                while n:
                    n -= len(s.recv(n))
                if opcode == 0x8:
                    return  # close echoed
            raise AssertionError("no close frame echoed")

    def test_unupgraded_ws_path_rejected(self, harness):
        """A plain GET on a WS path must not hang or 500."""
        import socket

        with socket.create_connection(
            ("127.0.0.1", harness.port), timeout=10
        ) as s:
            s.sendall(
                f"GET /ws HTTP/1.1\r\n"
                f"Host: x\r\n\r\n".encode()
            )
            resp = s.recv(4096)
            assert resp.split(b" ", 2)[1] in (b"400", b"404", b"405", b"426")


class TestSlowConsumer:
    """VERDICT round-2 item 9: a stalled WS client must neither grow
    server memory nor delay other subscribers; after send_timeout it is
    evicted and its pump coroutine freed."""

    def _stalled_socket(self, harness):
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        # shrink the client receive buffer so the server-side TCP send
        # buffer + transport write buffer fill within a few frames
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        s.settimeout(10)
        s.connect(("127.0.0.1", harness.port))
        _ws_handshake(s, "127.0.0.1", harness.port, "/ws-flood")
        return s

    def test_stalled_client_evicted_after_send_timeout(
        self, harness, monkeypatch
    ):
        import time

        from wavecap_tpu.server import httpd as _httpd

        monkeypatch.setattr(_httpd.WebSocket, "send_timeout", 2.0)
        before = len(harness.flood_events)
        s = self._stalled_socket(harness)
        try:
            # never read: the flood handler's drain must time out and the
            # eviction must surface as ConnectionError in ITS pump only
            deadline = time.time() + 20
            while time.time() < deadline:
                if len(harness.flood_events) > before:
                    break
                time.sleep(0.1)
            assert len(harness.flood_events) > before, (
                "stalled consumer was never evicted"
            )
            assert "slow consumer" in harness.flood_events[-1]
        finally:
            s.close()

    def test_stalled_client_does_not_delay_healthy_one(self, harness, monkeypatch):
        import time

        from wavecap_tpu.server import httpd as _httpd

        monkeypatch.setattr(_httpd.WebSocket, "send_timeout", 30.0)
        stalled = self._stalled_socket(harness)
        healthy = socket.create_connection(
            ("127.0.0.1", harness.port), timeout=10
        )
        try:
            _ws_handshake(healthy, "127.0.0.1", harness.port, "/ws-flood")
            # the healthy client must keep receiving at full rate while the
            # stalled one blocks its own pump
            got = 0
            t0 = time.time()
            healthy.settimeout(10)
            while got < 4 * 262_144 and time.time() - t0 < 15:
                data = healthy.recv(65536)
                if not data:
                    break
                got += len(data)
            assert got >= 4 * 262_144, f"healthy consumer starved: {got} bytes"
        finally:
            stalled.close()
            healthy.close()
