"""Per-stage on-chip profile of the headline 800-channel program.

VERDICT round-4 weak #2: the fused capture program ran at ~2 % of HBM
roofline and nobody had measured what the top on-chip term even was.
This script times the SAME scan harness as ``bench.py`` with the program
cut down to each stage subset, so per-stage wall time falls out by
differencing, and prints a roofline table: measured time vs the
bytes-moved bound (v5e HBM ~819 GB/s) and the FLOP bound per stage.

Stages (cumulative program subsets, one compiled step each):
  input    — read the resident pool, reduce to a checksum (baseline)
  polyphase— + the NMDPFB arm filtering (u stacks), no DFT
  chan     — + the cross-arm DFT (= full channelizer)
  spectrum — chan + the 2048-point spectrum FFT
  full     — spectrum + freq-shift/RSSI + vmapped NBFM demod bank
             (exactly bench.py's program)

Run on the real chip:  python scripts/profile_roofline.py
One JSON line per stage on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from wavecap_tpu.utils.jaxenv import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    from wavecap_tpu import models, ops
    from wavecap_tpu.models.registry import get_demod
    from wavecap_tpu.ops import channelizer as chz

    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    fs = 10_000_000.0 if on_accel else 1_000_000.0
    ch = chz.ChannelizerConfig(
        sample_rate=fs, channel_bandwidth=12_500.0,
        dft_impl=os.environ.get("WAVECAP_BENCH_DFT", "auto"),
    )
    m = ch.channel_count
    chan_rate = int(ch.channel_rate)
    n_block = m * (2500 if on_accel else 500)
    demod_cfg = models.NbfmConfig(
        sample_rate=chan_rate, audio_rate=chan_rate,
        max_deviation_hz=4000.0,
        enable_highpass=True, highpass_hz=300.0,
        enable_lowpass=True, lowpass_hz=3000.0,
        filter_impl="fir", fast_discriminator=True,
    )
    spec = get_demod("nbfm")
    BLOCKS = int(os.environ.get("WAVECAP_BENCH_BLOCKS", "32" if on_accel else "2"))
    N_DISTINCT = min(8, BLOCKS)
    ROUNDS = BLOCKS // N_DISTINCT
    t_taps = ch.taps_per_channel

    def arm_stacks(x, hist):
        """The channelizer's polyphase arm filtering WITHOUT the DFT
        (mirrors ops.channelizer.channelize stages 1-2)."""
        proto = chz.design_prototype(m, t_taps, ch.cutoff_scale)
        arms_rev = jnp.asarray(proto.reshape(t_taps, m)[:, ::-1].copy())
        x_ext = jnp.concatenate([hist, x])
        r_steps = x.shape[-1] // m

        def parity_stack(offset):
            seg = jax.lax.dynamic_slice_in_dim(
                x_ext, offset, (r_steps + t_taps - 1) * m
            )
            w = seg.reshape(r_steps + t_taps - 1, m)
            u = jnp.zeros((r_steps, m), x.dtype)
            for mt in range(t_taps):
                u = u + w[t_taps - 1 - mt : t_taps - 1 - mt + r_steps, :] * arms_rev[mt][None, :]
            return u

        return parity_stack(1), parity_stack(1 + m // 2), x_ext[-m * t_taps :]

    def make_step(stage: str):
        @jax.jit
        def init():
            hist = chz.channelizer_init(ch)
            dstates = jax.tree.map(
                lambda v: jnp.broadcast_to(v, (m,) + v.shape),
                spec.init(demod_cfg),
            )
            return hist, dstates, jnp.zeros(m, jnp.uint32)

        def one_block(carry, x):
            hist, dstates, phases = carry
            if stage == "input":
                return carry, jnp.sum(x.real) + jnp.sum(x.imag[-1])
            if stage == "polyphase":
                ue, uo, hist = arm_stacks(x, hist)
                # sum EVERY column: a single-column checksum lets XLA
                # dead-code 799/800 of the arm work (measured round 5)
                return (hist, dstates, phases), (
                    jnp.sum(ue.real) + jnp.sum(uo.real)
                )
            chans, hist = chz.channelize(x, hist, ch)
            if stage == "chan":
                return (hist, dstates, phases), jnp.sum(chans.real)
            spectrum = ops.power_spectrum(x, 2048)
            if stage == "spectrum":
                return (hist, dstates, phases), (
                    jnp.sum(chans.real) + jnp.sum(spectrum)
                )
            if stage == "shift":
                # + per-channel NCO freq shift and RSSI only

                def per_shift(iq_c, ph0):
                    shifted, ph1 = ops.freq_shift(
                        iq_c, jnp.float32(0.0), chan_rate, ph0
                    )
                    return ops.rssi_dbfs(shifted), ph1

                rssi, phases = jax.vmap(per_shift)(chans, phases)
                return (hist, dstates, phases), (
                    jnp.sum(rssi) + jnp.sum(spectrum[..., 0])
                )
            if stage == "disc":
                # + the FM discriminator (no voice filtering/AGC)

                def per_disc(iq_c, ph0, dstate):
                    shifted, ph1 = ops.freq_shift(
                        iq_c, jnp.float32(0.0), chan_rate, ph0
                    )
                    rssi = ops.rssi_dbfs(shifted)
                    fm, _prev = ops.quadrature_demod(
                        shifted, chan_rate, dstate.disc_prev
                    )
                    return rssi, fm, ph1

                rssi, fm, phases = jax.vmap(per_disc)(
                    chans, phases, dstates
                )
                return (hist, dstates, phases), (
                    jnp.sum(rssi) + jnp.sum(fm[:, -1]) + jnp.sum(spectrum[..., 0])
                )

            def per_chan(iq_c, ph0, dstate):
                shifted, ph1 = ops.freq_shift(
                    iq_c, jnp.float32(0.0), chan_rate, ph0
                )
                rssi = ops.rssi_dbfs(shifted)
                audio, dstate = spec.demod(shifted, dstate, demod_cfg)
                return audio, rssi, ph1, dstate

            audio, rssi, phases, dstates = jax.vmap(per_chan)(
                chans, phases, dstates
            )
            return (hist, dstates, phases), (
                jnp.sum(rssi) + jnp.sum(audio[:, -1]) + jnp.sum(spectrum[..., 0])
            )

        @jax.jit
        def step(xs_c, carry):
            def one_round(c, _):
                c, checks = jax.lax.scan(one_block, c, xs_c)
                return c, jnp.sum(checks)

            carry, cs = jax.lax.scan(one_round, carry, None, length=ROUNDS)
            return carry, jnp.sum(cs).reshape(1)

        return init, step

    @jax.jit
    def prep(xs_f32):
        return jax.lax.complex(xs_f32[:, 0::2], xs_f32[:, 1::2])

    rng = np.random.default_rng(0)
    xs_c = prep(
        jax.device_put(
            (rng.standard_normal((N_DISTINCT, 2 * n_block)) * 0.1).astype(
                np.float32
            )
        )
    )

    results = {}
    stages = os.environ.get(
        "WAVECAP_PROF_STAGES", "input,polyphase,chan,spectrum,shift,disc,full"
    ).split(",")
    for stage in stages:
        init, step = make_step(stage)
        t0 = time.perf_counter()
        carry = init()
        carry, cs = step(xs_c, carry)
        _ = float(np.asarray(cs)[0])
        compile_s = time.perf_counter() - t0

        def run(iters):
            nonlocal carry
            t0 = time.perf_counter()
            for _ in range(iters):
                carry, cs = step(xs_c, carry)
            _ = float(np.asarray(cs)[0])
            return time.perf_counter() - t0

        lo, hi = (3, 13) if on_accel else (1, 3)
        run(lo)
        t_lo = run(lo)
        t_hi = run(hi)
        dt = max((t_hi - t_lo) / (hi - lo), 1e-9)
        per_block_ms = dt * 1e3 / BLOCKS
        results[stage] = per_block_ms
        print(
            json.dumps(
                {
                    "stage": stage,
                    "per_block_ms": round(per_block_ms, 3),
                    "per_iter_ms": round(dt * 1e3, 2),
                    "compile_s": round(compile_s, 1),
                    "msps": round(BLOCKS * n_block / dt / 1e6, 1),
                }
            ),
            flush=True,
        )

    # stage deltas (what each added component costs)
    pairs = [
        ("input_read", "input", None),
        ("polyphase_arms", "polyphase", "input"),
        ("cross_arm_dft", "chan", "polyphase"),
        ("spectrum_fft", "spectrum", "chan"),
        ("nco_shift_rssi", "shift", "spectrum"),
        ("fm_discriminator", "disc", "shift"),
        ("voice_filter_agc", "full", "disc"),
        ("demod_bank_total", "full", "spectrum"),
    ]
    deltas = {
        name: results[a] - (results[b] if b else 0.0)
        for name, a, b in pairs
        if a in results and (b is None or b in results)
    }
    print(
        json.dumps(
            {"deltas_ms_per_block": {k: round(v, 3) for k, v in deltas.items()}}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
