"""Route-walking smoke test: every registered GET route must respond —
with real ids where we can supply them, with clean 4xx for dummies —
and NEVER with a 5xx.  Catches handler wiring/shape bugs across the
whole REST surface in one sweep (the reference relies on per-route
tests; this guards the long tail)."""

from __future__ import annotations

import re

import httpx
import pytest

from tests.test_server import ServerHarness
from wavecap_tpu.utils.config import config_from_dict


@pytest.fixture(scope="module")
def harness():
    cfg = config_from_dict(
        {
            "server": {"host": "127.0.0.1", "port": 0,
                       "rate_limit_per_min": 1_000_000},
            "device": {"driver": "fake"},
        }
    )
    h = ServerHarness(cfg).start()
    yield h
    h.stop()


@pytest.fixture(scope="module")
def ids(harness):
    """Create one of everything so id-bearing routes have live targets."""
    with httpx.Client(base_url=harness.base, timeout=60) as c:
        cap = c.post("/captures", json={"centerHz": 155e6,
                                        "sampleRate": 800_000}).json()
        ch = c.post(f"/captures/{cap['id']}/channels",
                    json={"mode": "nbfm", "frequencyHz": 155.05e6}).json()
        tsys = c.post("/trunking/systems", json={
            "id": "smoke1", "control_channels": [851.2e6],
            "sample_rate": 2_400_000,
        }).json()
        scn = c.post("/scanners", json={
            "captureId": cap["id"], "channelId": ch["id"],
            "entries": [{"frequencyHz": 155.05e6}],
        })
        scanner_id = scn.json().get("id", "s-dummy") if scn.status_code < 300 else "s-dummy"
        yield {
            "cid": cap["id"], "chid": ch["id"],
            "sid": tsys.get("id", "smoke1"), "rid": "airband",
            "did": "fake0", "scanner": scanner_id,
        }


PARAM_FILL = {
    "cid": "cid", "chid": "chid", "did": "did", "sid": "scanner",
}


def test_all_get_routes_respond_without_500(harness, ids):
    router = harness.server.router
    seen = 0
    with httpx.Client(
        base_url=f"http://127.0.0.1:{harness.server.port}", timeout=60
    ) as c:
        for method, rx, _fn in router.routes:
            if method != "GET":
                continue
            pat = rx.pattern.strip("^$")
            # substitute named groups with live ids where names match
            def fill(m):
                name = m.group(1)
                if name in ("cid",):
                    return ids["cid"]
                if name in ("chid",):
                    return ids["chid"]
                if name in ("did",):
                    return ids["did"]
                if name in ("sid",):
                    # trunking routes use sid for system; scanner routes too —
                    # try the trunking id (scanner falls back to 404, fine)
                    return ids["sid"] if "/trunking/" in pat else ids["scanner"]
                if name in ("rid",):
                    return ids["rid"]
                return "dummy"

            url = re.sub(r"\(\?P<(\w+)>[^)]*\)", fill, pat)
            if "(" in url or ")" in url:
                continue  # unresolvable residue; skip defensively
            r = c.get(url)
            # 501 = deliberate "optional tool not installed" (uhubctl)
            assert r.status_code < 500 or r.status_code == 501, (
                f"{url} -> {r.status_code}: {r.text[:200]}"
            )
            seen += 1
    assert seen >= 45, f"route walk only covered {seen} GET routes"


def test_all_ws_routes_handshake(harness, ids):
    """Every registered WS route completes an upgrade handshake with live
    ids and closes cleanly — none hang or slam the connection shut."""
    import asyncio

    import websockets.asyncio.client as ws_client

    router = harness.server.router
    urls = []
    for rx, _fn in router.ws_routes:
        pat = rx.pattern.strip("^$")

        def fill(m):
            name = m.group(1)
            return {
                "cid": ids["cid"], "chid": ids["chid"], "sid": ids["sid"],
            }.get(name, "dummy")

        url = re.sub(r"\(\?P<(\w+)>[^)]*\)", fill, pat)
        if "(" not in url:
            urls.append(url)
    assert len(urls) >= 10, urls

    async def probe(url):
        full = f"ws://127.0.0.1:{harness.server.port}{url}"
        async with ws_client.connect(full, open_timeout=20) as ws:
            # state/health/system push periodically; data streams may stay
            # silent on an idle capture — receiving is optional, the
            # handshake + clean close is the contract under test
            try:
                await asyncio.wait_for(ws.recv(), timeout=0.5)
            except (asyncio.TimeoutError, Exception):
                pass

    async def run_all():
        for u in urls:
            await probe(u)

    asyncio.run(run_all())
