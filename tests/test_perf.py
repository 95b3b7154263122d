"""Opt-in performance tier (reference ``perf`` marker + RUN_PERF_TESTS):
micro-benchmarks of the hot paths with loose realtime floors.  Skipped by
default — enable with ``RUN_PERF_TESTS=1 pytest tests/test_perf.py -s``.
On-chip numbers live in bench.py / scripts/benchmark_p25.py; this tier
guards against order-of-magnitude CPU regressions."""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_PERF_TESTS"),
    reason="perf tier is opt-in (RUN_PERF_TESTS=1)",
)


def measure(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        out = fn(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    return (time.perf_counter() - t0) / iters, out


class TestPerf:
    def test_wbfm_block_realtime(self):
        import jax

        from wavecap_tpu import models

        rate, block = 240_000, 48_000
        cfg = models.make_config("wbfm", rate, audio_rate=48_000)
        spec = models.get_demod("wbfm")
        step = jax.jit(lambda x, st: spec.demod(x, st, cfg))
        state = jax.jit(lambda: spec.init(cfg))()
        rng = np.random.default_rng(0)
        iq = (rng.standard_normal(block) + 1j * rng.standard_normal(block))
        iq = (0.1 * iq).astype(np.complex64)

        def run(x, st):
            y, st2 = step(x, st)
            np.asarray(y)
            return st2

        dt, _ = measure(run, iq, state)
        factor = (block / rate) / dt
        print(f"\nwbfm: {factor:.1f}x realtime per core ({dt*1e3:.1f} ms/block)")
        assert factor > 1.0, factor

    def test_channelized_bank_realtime(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        import jax

        jfn = jax.jit(fn)

        def run():
            out = jfn(*args)
            jax.tree_util.tree_map(np.asarray, out)

        dt, _ = measure(run)
        n_samples = args[0].shape[-1] if hasattr(args[0], "shape") else 0
        print(f"\nbank step: {dt*1e3:.1f} ms for {n_samples} samples")
        assert dt < 5.0  # order-of-magnitude guard

    def test_c4fm_demod_realtime(self):
        import jax
        from jax import lax

        from wavecap_tpu.models.p25.c4fm import (
            C4fmConfig,
            c4fm_demodulate,
            c4fm_init,
            modulate_c4fm,
        )

        cfg = C4fmConfig(sample_rate=48_000)
        rng = np.random.default_rng(1)
        dibits = rng.integers(0, 4, 4800).astype(np.uint8)
        iq = modulate_c4fm(dibits, 48_000).astype(np.complex64)[:48_000]
        step = jax.jit(lambda x, st: c4fm_demodulate(x, st, cfg))
        state = jax.jit(lambda: c4fm_init(cfg))()

        def run(x, st):
            soft, dib, st2 = step(x, st)
            np.asarray(soft)
            return st2

        dt, _ = measure(run, iq, state)
        factor = 1.0 / dt
        print(f"\nc4fm: {factor:.1f}x realtime per core")
        assert factor > 1.0, factor

    def test_ambe_vocoder_realtime(self):
        from wavecap_tpu.decoders.ambe_vocoder import AmbeDecoder, AmbeEncoder

        t = np.arange(8000) / 8000.0
        tone = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        frames = AmbeEncoder().encode(tone)

        def run():
            return AmbeDecoder().decode_frames(frames)

        dt, pcm = measure(run)
        factor = (len(pcm) / 8000.0) / dt
        print(f"\nambe synth: {factor:.1f}x realtime per core")
        assert factor > 1.0, factor
