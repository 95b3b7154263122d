"""Mesh capture backend: the production multi-chip path.

Plugs :mod:`wavecap_tpu.parallel.sharded` (time-sharded channelizer with
``ppermute`` halo exchange, ``all_to_all`` re-shard to channel-parallel
stateful demod) into the capture engine behind the same
``(x_rows, state, ctl) -> (outs, state)`` calling convention as the
single-chip slot-bank program (``pipeline.jit_capture_multi``), so the
engine's reader/dispatch/fetch/fan-out machinery — transport packing,
overflow reset, watchdogs, WS streaming — is identical in both modes.

Enable with ``CaptureConfig.mesh = "stream=1,time=8"`` (axis sizes over
``jax.devices()``; a 1-device mesh is the trivial degenerate case).  The
mesh backend demodulates every channelizer bin (channel specs map to
bins; activation/fine-offset/squelch are traced per-bin control).
Narrow analog modes mix freely in one capture — the grid runs one bank
per (mode, dsp) group and a per-bin ``bank_idx`` selects each bin's
output on device, so changing a mesh channel's mode costs NO recompile
(round 4) — and the p25 family rides the (dual-rate) grid.  Wide (WBFM)
channels need ~200 kHz the 25 kHz bin grid does not synthesize, so they
run a separate time-sharded stage off the RAW stream (per-slot
freq-shift + decimating FIR with the channelizer's halo, ``all_gather``
of the small IF, replicated demod — ``parallel/sharded.py``).  Round 5
removed the mode exclusions entirely: ANY combination of narrow analog,
wide, p25 (4800) and p25p2 (6000) channels runs in one mesh capture —
the soft-symbol banks ride the grid's own-output bank tuple
(``ShardedGridConfig.modes2``) and block geometry is the lcm of the
audio and symbol constraints.

SURVEY §7.2 step 8; the reference's analog is its process-per-device
scale-out (``trunking/manager.py:49``) — here one capture scales across
chips instead of processes.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from wavecap_tpu import ops
from wavecap_tpu.parallel.sharded import (
    GridControl,
    ShardedGridConfig,
    grid_init,
    sharded_grid_step,
)


def parse_mesh_spec(spec: str) -> dict[str, int]:
    """``"stream=1,time=8"`` -> ``{"stream": 1, "time": 8}``.

    Both axes are required by the sharded grid; order in the string is
    preserved as the mesh axis order."""
    axes: dict[str, int] = {}
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        try:
            name, size = part.split("=")
            axes[name.strip()] = int(size)
        except ValueError:
            raise ValueError(f"bad mesh spec segment {part!r} in {spec!r}")
    if set(axes) != {"stream", "time"}:
        raise ValueError(
            f"mesh spec must name exactly 'stream' and 'time' axes, got {spec!r}"
        )
    if any(v < 1 for v in axes.values()):
        raise ValueError(f"mesh axis sizes must be >= 1: {spec!r}")
    return axes


def build_mesh(spec: str) -> Mesh:
    axes = parse_mesh_spec(spec)
    n = int(np.prod(list(axes.values())))
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(
            f"mesh {spec!r} needs {n} devices; only {len(devices)} available"
        )
    arr = np.array(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def mesh_banks2(pipe_cfg, entry) -> tuple:
    """Own-output grid banks beyond the base: ``((label, mode, cfg), ...)``.

    Round 5 (generalized from the single round-4 ``mode2``): any
    combination of {analog base, p25 @ 4800, p25p2 @ 6000} runs in one
    mesh capture — the last structural mode exclusion is gone.
    ``label`` is the engine-facing output key ("p25" / "p25p2")."""
    from wavecap_tpu.capture.pipeline import p25_cfg_for, p25p2_cfg_for

    banks = []
    if entry != "p25" and pipe_cfg.p25_capacity > 0:
        mode = (
            "p25-cqpsk-soft"
            if pipe_cfg.p25_modulation == "cqpsk"
            else "p25-soft"
        )
        banks.append(("p25", mode, p25_cfg_for(pipe_cfg)))
    if pipe_cfg.p25p2_capacity > 0:
        banks.append(("p25p2", "p25-cqpsk-soft", p25p2_cfg_for(pipe_cfg)))
    return tuple(banks)


def mesh_grid_cfg(pipe_cfg, entry) -> ShardedGridConfig:
    """Grid config for the capture's single mode group ``entry``.

    ``entry == "p25"`` shards the flagship digital path: every bin runs
    the C4FM (or CQPSK) demod and the grid's output is soft symbols the
    host framer / trunking stack consumes, exactly like the single-chip
    p25 bank."""
    # wide (WBFM) slot groups ride the grid's raw-stream stage (round 4)
    wide_kw = dict(
        wide_groups=tuple(pipe_cfg.wide_groups),
        wide_cfgs=tuple(
            pipe_cfg.wide_cfg(g) for g in pipe_cfg.wide_groups
        ),
        wide_export_baseband=pipe_cfg.export_wide_baseband,
    )
    banks2 = mesh_banks2(pipe_cfg, entry)
    banks2_kw = dict(
        modes2=tuple(b[1] for b in banks2),
        demod_cfgs2=tuple(b[2] for b in banks2),
    )
    if entry == "p25":
        from wavecap_tpu.capture.pipeline import p25_cfg_for

        mode = (
            "p25-cqpsk-soft"
            if pipe_cfg.p25_modulation == "cqpsk"
            else "p25-soft"
        )
        # Phase 2 dual-rate: the 6000-baud H-DQPSK bank rides banks2
        return ShardedGridConfig(
            channelizer=pipe_cfg.channelizer(),
            mode=mode,
            demod_cfg=p25_cfg_for(pipe_cfg),
            **banks2_kw,
            **wide_kw,
        )
    if entry is None:
        # wide-only mesh capture: the bin grid still needs a base bank
        # (all bins inactive) — nbfm is the cheapest placeholder
        from wavecap_tpu.models.registry import make_config

        ch = pipe_cfg.channelizer()
        return ShardedGridConfig(
            channelizer=ch,
            mode="nbfm",
            demod_cfg=make_config(
                "nbfm", int(ch.channel_rate), audio_rate=pipe_cfg.audio_rate
            ),
            **banks2_kw,
            **wide_kw,
        )
    bank = pipe_cfg.bank_cfg(entry)
    # Mixed analog modes (round 4): every OTHER narrow (mode, dsp) group
    # present becomes an extra grid bank; per-bin bank_idx selects which
    # bank's audio each bin emits (a traced control — changing a mesh
    # channel's mode never recompiles, unlike the single-chip slot bank)
    extras = tuple(g for g in pipe_cfg.narrow_modes if g != entry)
    extra_banks = tuple(pipe_cfg.bank_cfg(g) for g in extras)
    # Mixed analog + p25 (+ p25p2) — round 5, the last mesh mode
    # exclusion is gone: the soft-symbol banks ride the grid's own-output
    # bank tuple (``banks2``), so a mixed site capture (NBFM mutual-aid +
    # a P25 system — FDMA and/or Phase 2 TDMA — in one pass-band) runs on
    # the mesh like it does single-chip.  Block geometry is already the
    # lcm of the audio and symbol constraints (engine _compute_block_size
    # when p25_capacity > 0).
    return ShardedGridConfig(
        channelizer=pipe_cfg.channelizer(),
        mode=bank.mode,
        demod_cfg=bank.demod_cfg,
        **banks2_kw,
        extra_modes=tuple(b.mode for b in extra_banks),
        extra_demod_cfgs=tuple(b.demod_cfg for b in extra_banks),
        **wide_kw,
    )


def jit_mesh_init(pipe_cfg, entry, mesh: Mesh):
    gcfg = mesh_grid_cfg(pipe_cfg, entry)
    return jax.jit(lambda: grid_init(gcfg, 1))


def mesh_control(pipe_cfg, channels, center_hz: float) -> GridControl:
    """Traced per-bin control from the engine's channel handles.

    ``channels`` are engine ``ChannelHandle``s whose ``slot`` is the
    channelizer bin index (set by the engine in mesh mode)."""
    ch_cfg = pipe_cfg.channelizer()
    m = ch_cfg.channel_count
    fine = np.zeros((1, m), np.float32)
    active = np.zeros((1, m), bool)
    squelch = np.full((1, m), -1e9, np.float32)
    bank = np.zeros((1, m), np.int32)
    # mixed analog modes: bank 0 is narrow_modes[0] (the grid entry),
    # banks 1.. follow the remaining narrow group order of mesh_grid_cfg
    narrow = tuple(pipe_cfg.narrow_modes)
    wide_ctl = None
    if pipe_cfg.wide_groups:
        w = pipe_cfg.wide_capacity
        wide_ctl = {
            g: {
                "offset_hz": np.zeros((1, w), np.float32),
                "active": np.zeros((1, w), bool),
                "squelch_db": np.full((1, w), -1e9, np.float32),
            }
            for g in pipe_cfg.wide_groups
        }
    for ch in channels:
        if isinstance(ch.mode_group, tuple) and ch.mode_group[0] == "wide":
            wct = (wide_ctl or {}).get(ch.mode_group[1])
            if wct is None:
                continue
            wct["offset_hz"][0, ch.slot] = ch.spec.frequency_hz - center_hz
            wct["active"][0, ch.slot] = True
            if ch.spec.squelch_db is not None:
                wct["squelch_db"][0, ch.slot] = ch.spec.squelch_db
            continue
        bin_idx = ch.slot
        off = ch.spec.frequency_hz - center_hz
        fine[0, bin_idx] = off - ch_cfg.channel_offset_hz(bin_idx)
        active[0, bin_idx] = True
        if ch.spec.squelch_db is not None:
            squelch[0, bin_idx] = ch.spec.squelch_db
        if narrow and ch.mode_group in narrow:
            bank[0, bin_idx] = narrow.index(ch.mode_group)
    return GridControl(
        fine_offset_hz=jnp.asarray(fine),
        active=jnp.asarray(active),
        squelch_db=jnp.asarray(squelch),
        bank_idx=jnp.asarray(bank),
        wide=(
            jax.tree.map(jnp.asarray, wide_ctl)
            if wide_ctl is not None
            else None
        ),
    )


def jit_mesh_capture_multi(pipe_cfg, n_blocks: int, mesh: Mesh, entry):
    """Mesh analog of ``pipeline.jit_capture_multi``: scan over stacked
    transport rows, one sharded grid step per block, slot-bank-shaped
    outputs (``spectrum`` + ``banks[entry]`` + ``_packed``)."""
    from wavecap_tpu.capture.pipeline import _to_complex

    gcfg = mesh_grid_cfg(pipe_cfg, entry)
    banks2_labels = tuple(b[0] for b in mesh_banks2(pipe_cfg, entry))
    gstep = sharded_grid_step(mesh, gcfg)
    fft_size = pipe_cfg.fft_size
    spectrum_frames = pipe_cfg.spectrum_frames

    def one_block(x, state, ctl):
        spectrum = ops.spectrogram_sampled(
            x, fft_size, n_out=max(spectrum_frames, 1)
        )
        g_out, state = gstep(x[None, :], state, ctl)
        if entry == "p25":
            # the engine's p25 fan-out reads out["p25"]["soft"/"rssi"]
            out = {
                "spectrum": spectrum,
                "p25": {"soft": g_out["audio"][0], "rssi": g_out["rssi"][0]},
            }
        else:
            out = {
                "spectrum": spectrum,
                "banks": (
                    {
                        entry: {
                            "audio": g_out["audio"][0],
                            "rssi": g_out["rssi"][0],
                        }
                    }
                    if entry is not None
                    else {}
                ),
            }
        # own-output soft banks (round 5 tuple): dual-rate p25p2 and/or
        # the 4800-baud bank of a mixed analog+p25 capture
        for i, label in enumerate(banks2_labels):
            out[label] = {
                "soft": g_out["audio2"][i][0],
                "rssi": g_out["rssi"][0],
            }
        if "wide" in g_out:
            # wide slots off the raw-stream stage; same shape contract as
            # the slot-bank program's out["wide"][dsp_key]
            out["wide"] = jax.tree.map(lambda v: v[0], g_out["wide"])
        from wavecap_tpu.capture.pipeline import pack_wire

        out["_packed"] = pack_wire(out)
        return out, state

    def multi(x_rows, state, ctl):
        if isinstance(x_rows, tuple):
            rows, scales = x_rows

            def body_scaled(st, rs):
                row, s = rs
                out, st2 = one_block(_to_complex(row, s), st, ctl)
                return st2, out

            state, outs = jax.lax.scan(body_scaled, state, (rows, scales))
            return outs, state

        def body(st, row):
            out, st2 = one_block(_to_complex(row), st, ctl)
            return st2, out

        state, outs = jax.lax.scan(body, state, x_rows)
        return outs, state

    return jax.jit(multi)
