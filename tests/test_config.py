"""Config system: base + .local overlay, camelCase fallbacks, reload route
(reference test tier ``tests/test_config_overlay.py`` / ``test_config_reload.py``)."""

import threading

import numpy as np
import pytest

from wavecap_tpu.utils.config import config_from_dict, load_config


class TestOverlay:
    def test_local_overlay_wins_key_by_key(self, tmp_path):
        base = tmp_path / "wavecap.yaml"
        base.write_text(
            "server:\n  port: 8087\n  host: 0.0.0.0\n"
            "stream:\n  audio_rate: 48000\n"
            "pocsag_aliases:\n  '100': Base Name\n"
        )
        (tmp_path / "wavecap.local.yaml").write_text(
            "server:\n  port: 9000\n"
            "pocsag_aliases:\n  '200': Local Name\n"
        )
        cfg = load_config(base)
        assert cfg.server.port == 9000          # overlay wins
        assert cfg.server.host == "0.0.0.0"     # base survives untouched keys
        assert cfg.stream.audio_rate == 48000
        # dict sections deep-merge
        assert cfg.pocsag_aliases == {100: "Base Name", 200: "Local Name"}
        assert len(cfg.config_paths) == 2

    def test_no_overlay(self, tmp_path):
        base = tmp_path / "only.yaml"
        base.write_text("server:\n  port: 8500\n")
        cfg = load_config(base)
        assert cfg.server.port == 8500
        assert len(cfg.config_paths) == 1

    def test_camelcase_fallbacks(self):
        cfg = config_from_dict(
            {
                "captures": [
                    {
                        "id": "c1",
                        "centerHz": 100e6,
                        "sampleRate": 1_000_000,
                        "autoStart": False,
                        "channels": [
                            {"id": "ch", "frequencyHz": 100.1e6, "squelchDb": -60}
                        ],
                    }
                ],
                "trunkingSystems": [{"id": "t1"}],
            }
        )
        cap = cfg.captures[0]
        assert cap.center_hz == 100e6 and cap.sample_rate == 1_000_000
        assert cap.auto_start is False
        assert cap.channels[0].frequency_hz == 100.1e6
        assert cfg.trunking_systems == [{"id": "t1"}]

    def test_bad_alias_keys_ignored(self):
        cfg = config_from_dict({"pocsag_aliases": {"abc": "X", "42": "Y"}})
        assert cfg.pocsag_aliases == {42: "Y"}

    def test_shipped_example_config_loads(self):
        """The example YAML uses ``2.4e6``-style literals, which YAML 1.1
        resolves as *strings* (no sign after the exponent marker) — the
        loader must coerce them; a regression here crashes `serve` at boot."""
        import pathlib

        import yaml

        example = pathlib.Path(__file__).resolve().parents[1] / "wavecap.yaml.example"
        d = yaml.safe_load(example.read_text())
        assert isinstance(d["captures"][0]["sample_rate"], str)  # the YAML trap
        cfg = config_from_dict(d)
        assert cfg.captures[0].sample_rate == 2_400_000
        assert cfg.captures[0].center_hz == pytest.approx(90.3e6)
        from wavecap_tpu.trunking.config import TrunkingSystemConfig

        ts = TrunkingSystemConfig.from_dict(cfg.trunking_systems[0])
        assert ts.sample_rate == 2_400_000
        assert ts.control_channels[0] == pytest.approx(851.2e6)


class TestConcurrentOperations:
    """Channel CRUD racing the capture block loop (reference
    ``tests/test_concurrent_operations.py`` tier)."""

    def test_concurrent_channel_crud_while_running(self):
        from wavecap_tpu.capture import CaptureConfig, CaptureManager, ChannelSpec
        from wavecap_tpu.devices import FakeDriver

        mgr = CaptureManager(FakeDriver())
        cap = mgr.create_capture(
            config=CaptureConfig(center_hz=100e6, sample_rate=960_000)
        )
        cap.create_channel(
            ChannelSpec(id="keep", mode="nbfm", frequency_hz=100.05e6)
        )
        cap.start()
        errors = []

        def churn(tid):
            try:
                for i in range(8):
                    cid = f"t{tid}_{i}"
                    cap.create_channel(
                        ChannelSpec(
                            id=cid, mode="nbfm", frequency_hz=100.0e6 + tid * 1e4
                        )
                    )
                    cap.update_channel(cid, frequency_hz=100.02e6 + i * 1e3)
                    cap.remove_channel(cid)
            except RuntimeError:
                pass  # capacity exhaustion under contention is acceptable
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=churn, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        # wait for a few blocks post-churn: pipeline still healthy
        import time

        deadline = time.time() + 60
        start_blocks = cap.blocks_processed
        while time.time() < deadline and cap.blocks_processed < start_blocks + 3:
            time.sleep(0.5)
        assert not errors, errors
        assert cap.state == "running"
        assert cap.blocks_processed >= start_blocks + 3
        assert "keep" in cap.channels
        cap.stop()


class TestConfigReload:
    """POST /config/reload re-reads YAML; apply=true rebuilds captures
    (reference api.py:743 semantics)."""

    def test_reload_and_apply_rebuilds_captures(self, tmp_path):
        import httpx

        from tests.test_server import ServerHarness
        from wavecap_tpu.utils import config as config_mod

        cfg_file = tmp_path / "wavecap.yaml"
        cfg_file.write_text(
            "server: {host: 127.0.0.1, port: 0, rate_limit_per_min: 100000}\n"
            "device: {driver: fake}\n"
            "captures:\n"
            "  - id: boot1\n"
            "    center_hz: 155.0e6\n"
            "    sample_rate: 800000\n"
            "    auto_start: false\n"
            "    channels:\n"
            "      - {id: c1, mode: nbfm, frequency_hz: 155.05e6,\n"
            "         dsp: {enable_deemphasis: true}}\n"
        )
        cfg = config_mod.load_config(cfg_file)
        h = ServerHarness(cfg).start()
        try:
            with httpx.Client(base_url=h.base, timeout=60) as c:
                # lifespan autostart ran apply_config? (harness doesn't) —
                # apply now to materialize the YAML captures
                r = c.post("/config/reload", json={"apply": True})
                assert r.status_code == 200 and r.json()["applied"]
                caps = c.get("/captures").json()
                assert any(cp["id"] == "boot1" for cp in caps)
                ch = c.get("/channels").json()[0]
                assert ch["dsp"] == {"enable_deemphasis": True}
                # edit the file: different channel set; reload+apply swaps it
                cfg_file.write_text(
                    "server: {host: 127.0.0.1, port: 0, rate_limit_per_min: 100000}\n"
                    "device: {driver: fake}\n"
                    "captures:\n"
                    "  - id: boot2\n"
                    "    center_hz: 100.0e6\n"
                    "    sample_rate: 800000\n"
                    "    auto_start: false\n"
                    "    channels: [{id: c2, mode: am, frequency_hz: 100.1e6}]\n"
                )
                r = c.post("/config/reload", json={"apply": True})
                assert r.status_code == 200
                ids = {cp["id"] for cp in c.get("/captures").json()}
                assert ids == {"boot2"}
                # reload without apply only refreshes the config object
                r = c.post("/config/reload", json={})
                assert r.json()["ok"] and not r.json()["applied"]
                assert {cp["id"] for cp in c.get("/captures").json()} == {"boot2"}
        finally:
            h.stop()
