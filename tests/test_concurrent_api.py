"""Concurrent API operations against a live server (reference
``tests/test_concurrent_operations.py``): parallel channel churn and mixed
lifecycle calls must leave the server consistent and responsive."""

import threading

import httpx
import pytest

from wavecap_tpu.utils.config import config_from_dict

from test_server import ServerHarness


@pytest.fixture(scope="module")
def harness():
    cfg = config_from_dict(
        {
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
    with httpx.Client(base_url=harness.base, timeout=60) as c:
        yield c


class TestConcurrentOperations:
    def test_parallel_channel_churn(self, harness, client):
        cid = client.post(
            "/captures", json={"centerHz": 155e6, "sampleRate": 800_000}
        ).json()["id"]
        errors = []

        def churn(worker):
            try:
                with httpx.Client(base_url=harness.base, timeout=60) as c:
                    for i in range(6):
                        r = c.post(
                            f"/captures/{cid}/channels",
                            json={
                                "mode": "nbfm",
                                "frequencyHz": 155e6 + (worker * 20 + i) * 5e3,
                            },
                        )
                        if r.status_code == 201:
                            chid = r.json()["id"]
                            c.patch(f"/channels/{chid}",
                                    json={"name": f"w{worker}-{i}"})
                            c.delete(f"/channels/{chid}")
                        elif r.status_code not in (409, 422):
                            # capacity exhaustion is fine; anything else isn't
                            errors.append((worker, i, r.status_code, r.text))
            except Exception as e:  # pragma: no cover
                errors.append((worker, "exc", str(e)))

        threads = [threading.Thread(target=churn, args=(w,)) for w in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert not errors, errors[:3]
        # all churned channels were deleted; server still consistent
        st = client.get(f"/captures/{cid}").json()
        assert st["channels"] == []
        assert client.get("/health").json()["status"] == "ok"
        client.delete(f"/captures/{cid}")

    def test_parallel_capture_lifecycle(self, harness, client):
        """Start/stop races on one capture never 500 or wedge it."""
        cid = client.post(
            "/captures", json={"centerHz": 155e6, "sampleRate": 800_000}
        ).json()["id"]
        codes = []
        lock = threading.Lock()

        def flip(n):
            with httpx.Client(base_url=harness.base, timeout=60) as c:
                for i in range(4):
                    r = c.post(
                        f"/captures/{cid}/{'start' if (n + i) % 2 else 'stop'}"
                    )
                    with lock:
                        codes.append(r.status_code)

        threads = [threading.Thread(target=flip, args=(n,)) for n in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(180)
        assert all(c < 500 for c in codes), codes
        # settle to a definite state and clean up
        client.post(f"/captures/{cid}/stop")
        st = client.get(f"/captures/{cid}").json()
        assert st["state"] in ("stopped", "created")
        assert client.delete(f"/captures/{cid}").json()["ok"]
