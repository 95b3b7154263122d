"""Recovery policy state machine, uhubctl parsing, RadioReference parsing,
talkgroup CSV import."""

import pytest

from wavecap_tpu.devices.recovery import (
    RecoveryPolicy,
    ServiceRecovery,
    UsbPowerCycler,
)
from wavecap_tpu.utils.radioreference import parse_talkgroups_response
from wavecap_tpu.trunking.config import load_talkgroups_csv


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


class TestServiceRecovery:
    def make(self, runner_rc=0):
        calls = []

        def runner(cmd, timeout=30.0):
            calls.append(cmd)
            return runner_rc, "ok"

        clock = FakeClock()
        svc = ServiceRecovery(
            RecoveryPolicy(cooldown_s=60, max_per_hour=3), runner, clock
        )
        svc._calls = calls
        svc._clock = clock
        return svc

    def test_restart_and_cooldown(self):
        svc = self.make()
        assert svc.restart_service()["ok"]
        assert svc._calls[0][:2] == ["systemctl", "restart"]
        denied = svc.restart_service()
        assert not denied["ok"] and denied["reason"] == "cooldown"
        svc._clock.t += 61
        assert svc.restart_service()["ok"]

    def test_hourly_cap(self):
        svc = self.make()
        for _ in range(3):
            assert svc.restart_service()["ok"]
            svc._clock.t += 61
        denied = svc.restart_service()
        assert denied["reason"] == "hourly cap"
        svc._clock.t += 3600
        assert svc.restart_service()["ok"]

    def test_fallback_to_service_cmd(self):
        calls = []

        def runner(cmd, timeout=30.0):
            calls.append(cmd)
            return (1 if cmd[0] == "systemctl" else 0), ""

        svc = ServiceRecovery(runner=runner, clock=FakeClock())
        assert svc.restart_service()["ok"]
        assert calls[1][0] == "service"


class TestUhubctl:
    def test_parse_hub_listing(self):
        output = (
            "Current status for hub 1-1 [dead:beef]\n"
            "  Port 1: 0503 power highspeed enable connect\n"
            "  Port 2: 0100 power\n"
            "Current status for hub 2-1 [cafe:f00d]\n"
            "  Port 1: 0100 power\n"
        )
        cyc = UsbPowerCycler(runner=lambda cmd, timeout=30.0: (0, output))
        hubs = cyc.list_hubs()
        assert len(hubs) == 2
        assert hubs[0]["hub"] == "1-1"
        assert len(hubs[0]["ports"]) == 2

    def test_power_cycle_invokes_uhubctl(self):
        calls = []
        cyc = UsbPowerCycler(
            runner=lambda cmd, timeout=30.0: (calls.append(cmd) or 0, "")
        )
        assert cyc.power_cycle("1-1", "2")["ok"]
        assert "-a" in calls[0] and "cycle" in calls[0]


class TestRadioReference:
    def test_parse_soap_response(self):
        xml = """
        <response><item>
          <tgDec>1001</tgDec><tgAlpha>PD Dispatch</tgAlpha><tgCat>Law</tgCat>
        </item><item>
          <tgDec>2002</tgDec><tgDescr>Fire Ops</tgDescr>
        </item><item><bogus>x</bogus></item></response>
        """
        tgs = parse_talkgroups_response(xml)
        assert tgs[1001].name == "PD Dispatch"
        assert tgs[1001].category == "Law"
        assert tgs[2002].name == "Fire Ops"
        assert len(tgs) == 2


class TestTalkgroupCsv:
    def test_radioreference_csv(self, tmp_path):
        p = tmp_path / "tg.csv"
        p.write_text(
            "Decimal,Hex,Alpha Tag,Mode,Description,Tag,Category\n"
            "101,65,PD-1,D,Police Dispatch 1,Law Dispatch,City\n"
            "202,CA,FD-1,D,Fire Dispatch,Fire Dispatch,City\n"
            "bad,,X,,,,\n"
        )
        tgs = load_talkgroups_csv(p)
        assert tgs[101].name == "PD-1"
        assert tgs[202].tgid == 202
        assert len(tgs) == 2


class TestImportPurity:
    def test_no_backend_init_at_import(self):
        """Importing the full server stack must NOT initialize a jax backend.

        A module-level ``jnp.*`` call (e.g. a NamedTuple field default)
        initializes whatever platform sitecustomize pre-registered (axon)
        before entry points can force CPU — wedging every later fetch.
        Regression for WbfmState.rs_tail et al.
        """
        import subprocess
        import sys

        code = (
            "import jax\n"
            "import wavecap_tpu.server.app\n"
            "import wavecap_tpu.cli\n"
            "import wavecap_tpu.harness\n"
            "b = getattr(jax._src.xla_bridge, '_backends', {})\n"
            "assert not b, f'backend initialized at import: {list(b)}'\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=180
        )
        assert proc.returncode == 0, proc.stderr


class TestPersistentCompileCache:
    def test_warm_recompile_hits_disk_cache(self, tmp_path, monkeypatch):
        """A capture-pipeline program compiled once must be served from the
        persistent cache after the in-memory caches are dropped (the
        warm-restart contract: a server restart skips the minutes-long
        XLA compile of its capture shapes)."""
        import time

        import jax
        import jax.numpy as jnp

        import wavecap_tpu.capture.pipeline as pl
        from wavecap_tpu.utils.jaxenv import ensure_platform

        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        ensure_platform()
        # cache everything for the test, not just >=2 s compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # the cache backend binds its directory on first use; an earlier
        # test in the session may already have initialized it elsewhere
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.reset_cache()
        try:
            cfg = pl.CapturePipelineConfig(
                sample_rate=256_000, block_size=25_600,
                narrow_modes=("nbfm",), narrow_capacity=4,
            )
            state = pl.pipeline_init(cfg)
            ctl = pl.control_init(cfg)
            step = pl.jit_capture_step(cfg)
            x = jnp.zeros(2 * cfg.block_size, jnp.float32)

            # Time ONLY the XLA compile via lower()/compile(): Python
            # tracing is never cached on disk and can rival the compile
            # itself for this program, so end-to-end first-call timing
            # made the ratio below flaky.
            lowered = step.lower(x, state, ctl)
            t0 = time.perf_counter()
            lowered.compile()
            cold_s = time.perf_counter() - t0
            entries = list(tmp_path.iterdir())
            assert entries, "no persistent cache entry written"

            # fresh executable required: drop every in-memory cache
            jax.clear_caches()
            lowered2 = pl.jit_capture_step(cfg).lower(x, state, ctl)
            t0 = time.perf_counter()
            lowered2.compile()
            warm_s = time.perf_counter() - t0
            # A disk-cache hit skips XLA entirely (deserialize-only load
            # vs multi-second compile).  Only assert the ratio when the
            # cold compile was long enough to measure against CI load
            # noise, and grant an absolute floor so a saturated host
            # (parallel jobs stealing the cores) can't flake a genuine
            # cache hit.
            if cold_s > 1.5:
                assert warm_s < max(0.6 * cold_s, 1.0), (cold_s, warm_s)
            # and the executable still runs
            out, _ = step(x, state, ctl)
            jax.block_until_ready(out)
        finally:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
            jax.config.update("jax_compilation_cache_dir", None)
