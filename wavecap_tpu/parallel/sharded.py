"""Sharded multi-chip pipeline: time-sharded channelizer, channel-sharded demod.

The flagship multi-chip step (SURVEY §7 design):

  stage 1 — each ``time`` shard channelizes its sub-block of the wideband
            stream; the filter history it needs is its left neighbor's
            last ``M*T`` samples, exchanged with ``ppermute`` over ICI
            (shard 0 uses the carry from the previous block — this is the
            reference's streaming-``zi`` contract made collective);
  stage 2 — an ``all_to_all`` over the ``time`` axis re-shards the
            channelizer output from (all channels, local time) to
            (local channels, all time), so each device runs the stateful
            demodulators for a fixed subset of channels and the demod
            state never migrates between devices;
  stream axis — pure data parallelism over independent captures.

Unlike the single-chip slot bank (``models/channel_bank.py``), the sharded
grid demodulates *every* channelizer bin, gated by a traced active mask —
channel count is static, activation is dynamic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wavecap_tpu import ops
from wavecap_tpu.ops.channelizer import ChannelizerConfig, channelize, design_prototype
from wavecap_tpu.models.registry import get_demod


@dataclass(frozen=True)
class ShardedGridConfig:
    channelizer: ChannelizerConfig
    mode: str
    demod_cfg: Any
    # Optional SECOND demod bank over the same bins (round 4): each bin is
    # frequency-shifted once and demodulated by BOTH configs — how Phase 2
    # trunking (4800-baud FDMA control + 6000-baud H-DQPSK voice in one
    # capture) runs on the mesh.  The host consumes whichever output a
    # bin's channel mode calls for.  Compute doubles on the grid's demod
    # stage; the channelizer/collectives are shared.
    mode2: str | None = None
    demod_cfg2: Any = None
    # Mixed analog modes (round 4): additional demod banks whose outputs
    # share the base bank's audio shape (the narrow analog family —
    # nbfm/am/sam/usb/lsb — all resample to the same audio rate).  Every
    # bin is shifted once and demodulated by EVERY bank; the per-bin
    # ``GridControl.bank_idx`` (0 = the base ``mode``) selects which
    # bank's audio the bin emits.  Because selection is traced control,
    # changing a channel's mode on a mesh capture costs NO recompile —
    # the single-chip slot bank pays one.  Unlike ``mode2`` (a second
    # OUTPUT for dual-rate trunking), extra banks fold into the one
    # ``audio`` output.
    extra_modes: tuple = ()
    extra_demod_cfgs: tuple = ()
    # Benchmark-only ablations (scripts/benchmark_mesh.py --ablate):
    # produce WRONG results but identical shapes/compute minus one
    # collective, so the per-step delta attributes wall time to the halo
    # ppermute/all_gather or the all_to_all re-shard (VERDICT round-3
    # weak #5: the >=85 % scaling claim needs a measured collective share).
    debug_skip_halo: bool = False
    debug_skip_reshard: bool = False


class GridState(NamedTuple):
    hist: jnp.ndarray  # (n_streams, M*T) channelizer history carry
    demod_states: Any  # stacked pytree, leading dims (n_streams, M)
    nco_phase: jnp.ndarray  # (n_streams, M) uint32
    demod_states2: Any = None  # second bank (dual-rate grids) or None
    demod_states_extra: Any = ()  # tuple of stacked pytrees (mixed modes)


class GridControl(NamedTuple):
    """Traced per-channel control (n_streams, M) — no recompiles."""

    fine_offset_hz: jnp.ndarray
    active: jnp.ndarray
    squelch_db: jnp.ndarray
    bank_idx: Any = None  # (n_streams, M) int32 mixed-mode bank select


def grid_init(cfg: ShardedGridConfig, n_streams: int) -> GridState:
    m = cfg.channelizer.channel_count
    t = cfg.channelizer.taps_per_channel
    spec = get_demod(cfg.mode)
    base = spec.init(cfg.demod_cfg)
    states2 = None
    if cfg.mode2 is not None:
        base2 = get_demod(cfg.mode2).init(cfg.demod_cfg2)
        states2 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape), base2
        )
    extras = tuple(
        jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape),
            get_demod(mk).init(ck),
        )
        for mk, ck in zip(cfg.extra_modes, cfg.extra_demod_cfgs)
    )
    return GridState(
        hist=jnp.zeros((n_streams, m * t), jnp.complex64),
        demod_states=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape), base
        ),
        nco_phase=jnp.zeros((n_streams, m), jnp.uint32),
        demod_states2=states2,
        demod_states_extra=extras,
    )


def control_init(cfg: ShardedGridConfig, n_streams: int) -> GridControl:
    m = cfg.channelizer.channel_count
    return GridControl(
        fine_offset_hz=jnp.zeros((n_streams, m), jnp.float32),
        active=jnp.zeros((n_streams, m), bool),
        squelch_db=jnp.full((n_streams, m), -1e9, jnp.float32),
        bank_idx=jnp.zeros((n_streams, m), jnp.int32),
    )


def sharded_grid_step(mesh: Mesh, cfg: ShardedGridConfig):
    """Build the jitted sharded step for ``mesh``.

    Returns ``step(x, state, ctl) -> (out, state)`` where ``x`` is
    ``(n_streams, N)`` wideband IQ sharded ``P('stream', 'time')``.
    """
    m = cfg.channelizer.channel_count
    t = cfg.channelizer.taps_per_channel
    hist_len = m * t
    n_time = mesh.shape["time"]
    if m % n_time != 0:
        raise ValueError(f"channel count {m} must divide by time shards {n_time}")
    spec = get_demod(cfg.mode)
    spec2 = get_demod(cfg.mode2) if cfg.mode2 is not None else None
    dual = spec2 is not None
    specs_extra = tuple(get_demod(mk) for mk in cfg.extra_modes)
    rate = cfg.channelizer.channel_rate

    def one_stream(
        x_local, hist, demod_states, nco_phase, fine, active, squelch,
        bank_idx, ds_extra, demod_states2=None,
    ):
        if x_local.shape[-1] < hist_len:
            raise ValueError(
                f"per-shard block ({x_local.shape[-1]}) must be >= channelizer "
                f"history M*T ({hist_len}) for halo exchange"
            )
        t_idx = jax.lax.axis_index("time")

        # --- halo exchange: left neighbor's tail becomes my history ---
        tail = x_local[-hist_len:]
        if cfg.debug_skip_halo:
            my_hist = hist  # ablation: no ppermute (wrong at shard seams)
        else:
            left_tail = jax.lax.ppermute(
                tail, "time", [(i, i + 1) for i in range(n_time - 1)]
            )
            my_hist = jnp.where(t_idx == 0, hist, left_tail)

        # --- stage 1: local channelize ---
        chans_local, _ = channelize(x_local, my_hist, cfg.channelizer)
        # (M, S_local)

        # --- re-shard: (M, S_local) -> (M/n_time, S_full) ---
        if cfg.debug_skip_reshard:
            # ablation: same output shape via local tile, no all_to_all
            chans_mine = jnp.tile(chans_local[: m // n_time], (1, n_time))
        else:
            chans_mine = jax.lax.all_to_all(
                chans_local, "time", split_axis=0, concat_axis=1, tiled=True
            )

        # --- stage 2: demod my channel subset ---
        def per_chan(iq_c, off, ph0, dstate):
            shifted, ph1 = ops.freq_shift(iq_c, -off, rate, ph0)
            rssi = ops.rssi_dbfs(shifted)
            audio, dstate = spec.demod(shifted, dstate, cfg.demod_cfg)
            return audio, rssi, ph1, dstate, shifted

        audio, rssi, nco_phase, demod_states, shifted_all = jax.vmap(per_chan)(
            chans_mine, fine, nco_phase, demod_states
        )

        # mixed analog modes: every extra bank demodulates every bin;
        # the per-bin bank_idx selects which bank's audio the bin emits
        new_extra = []
        for k, sp_k in enumerate(specs_extra):
            cfg_k = cfg.extra_demod_cfgs[k]

            def per_chan_k(shifted, dstate, _sp=sp_k, _cfg=cfg_k):
                out_k, dstate = _sp.demod(shifted, dstate, _cfg)
                return out_k, dstate

            audio_k, ds_k = jax.vmap(per_chan_k)(shifted_all, ds_extra[k])
            new_extra.append(ds_k)
            audio = jnp.where((bank_idx == k + 1)[:, None], audio_k, audio)
        ds_extra = tuple(new_extra)

        audio = ops.squelch_gate(audio, rssi, squelch)
        audio = jnp.where(active[:, None], audio, jnp.zeros_like(audio))
        rssi = jnp.where(active, rssi, jnp.full_like(rssi, -200.0))

        if dual:
            # second bank over the SAME shifted bins (dual-rate trunking)
            def per_chan2(shifted, dstate2):
                out2, dstate2 = spec2.demod(shifted, dstate2, cfg.demod_cfg2)
                return out2, dstate2

            audio2, demod_states2 = jax.vmap(per_chan2)(
                shifted_all, demod_states2
            )
            audio2 = jnp.where(
                active[:, None], audio2, jnp.zeros_like(audio2)
            )
        else:
            audio2 = audio  # unused placeholder (never returned)

        # --- next-block history: the global stream tail (last shard's) ---
        if cfg.debug_skip_halo:
            new_hist = tail  # ablation: no all_gather
        else:
            all_tails = jax.lax.all_gather(tail, "time")  # (n_time, hist_len)
            new_hist = all_tails[-1]

        if dual:
            return (
                audio, rssi, new_hist, demod_states, nco_phase, ds_extra,
                audio2, demod_states2,
            )
        return audio, rssi, new_hist, demod_states, nco_phase, ds_extra

    base_in = (
        P("stream", "time"),  # x
        P("stream", None),  # hist (replicated over time)
        P("stream", "time"),  # demod states (prefix)
        P("stream", "time"),  # nco
        P("stream", "time"),  # fine
        P("stream", "time"),  # active
        P("stream", "time"),  # squelch
        P("stream", "time"),  # bank_idx
        P("stream", "time"),  # extra demod states (tuple prefix)
    )
    base_out = (
        P("stream", "time", None),  # audio (M sharded)
        P("stream", "time"),  # rssi
        P("stream", None),  # new hist (replicated)
        P("stream", "time"),  # demod states
        P("stream", "time"),  # nco
        P("stream", "time"),  # extra demod states
    )

    if dual:

        def body(x, hist, ds, nco, fine, active, squelch, bidx, dse, ds2):
            f = jax.vmap(one_stream)
            return f(x, hist, ds, nco, fine, active, squelch, bidx, dse, ds2)

        shard = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=base_in + (P("stream", "time"),),
            out_specs=base_out
            + (P("stream", "time", None), P("stream", "time")),
            check_vma=False,
        )

        @jax.jit
        def step(x, state: GridState, ctl: GridControl):
            bidx = ctl.bank_idx
            if bidx is None:
                bidx = jnp.zeros(ctl.active.shape, jnp.int32)
            audio, rssi, hist, dstates, nco, dse, audio2, dstates2 = shard(
                x,
                state.hist,
                state.demod_states,
                state.nco_phase,
                ctl.fine_offset_hz,
                ctl.active,
                ctl.squelch_db,
                bidx,
                state.demod_states_extra,
                state.demod_states2,
            )
            return (
                {"audio": audio, "rssi": rssi, "audio2": audio2},
                GridState(hist, dstates, nco, dstates2, dse),
            )

        return step

    def body(x, hist, demod_states, nco_phase, fine, active, squelch, bidx, dse):
        f = jax.vmap(one_stream)  # over local stream axis
        return f(x, hist, demod_states, nco_phase, fine, active, squelch, bidx, dse)

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=base_in,
        out_specs=base_out,
        check_vma=False,
    )

    @jax.jit
    def step(x, state: GridState, ctl: GridControl):
        bidx = ctl.bank_idx
        if bidx is None:
            bidx = jnp.zeros(ctl.active.shape, jnp.int32)
        audio, rssi, hist, dstates, nco, dse = shard(
            x,
            state.hist,
            state.demod_states,
            state.nco_phase,
            ctl.fine_offset_hz,
            ctl.active,
            ctl.squelch_db,
            bidx,
            state.demod_states_extra,
        )
        return {"audio": audio, "rssi": rssi}, GridState(
            hist, dstates, nco, None, dse
        )

    return step
