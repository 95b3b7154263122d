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
    # Additional demod banks with their OWN outputs over the same bins
    # (round 4 as a single optional "mode2"; round 5 generalized to a
    # tuple): each bin is frequency-shifted once and demodulated by every
    # bank; the host consumes whichever output a bin's channel mode calls
    # for.  This is how Phase 2 dual-rate trunking (4800-baud FDMA CC +
    # 6000-baud H-DQPSK voice) and mixed analog+p25(+p25p2) captures run
    # on the mesh.  Compute scales with bank count on the demod stage;
    # the channelizer/collectives are shared.  Unlike ``extra_modes``
    # (which fold into the one ``audio`` output via bank_idx), each entry
    # here is a separate output array (different shapes allowed).
    modes2: tuple = ()
    demod_cfgs2: tuple = ()
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
    # Wide (WBFM) slots on the mesh (round 4): wide channels need ~200 kHz
    # of bandwidth the 25 kHz bin grid does not synthesize, so they run a
    # separate time-sharded stage on the RAW stream: per-slot freq-shift +
    # full-rate decimating FIR on each time shard (history = the same
    # ppermute'd raw halo the channelizer uses — the decimator's taps are
    # always shorter than M*T, checked at build), then an ``all_gather``
    # of the small ~240 kHz IF stream and a replicated WBFM demod (the
    # demod is ~40x cheaper than the decimation, so replicating it across
    # time shards costs nothing and keeps its state unsharded).  One
    # entry per wide (dsp) group, mirroring the slot-bank's wide groups.
    wide_groups: tuple = ()  # dsp keys
    wide_cfgs: tuple = ()  # pipeline.WideSlotConfig per group (duck-typed)
    wide_export_baseband: bool = False
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
    demod_states2: Any = ()  # tuple of own-output bank states (modes2)
    demod_states_extra: Any = ()  # tuple of stacked pytrees (mixed modes)
    wide: Any = None  # {dsp_key: {"nco": (S,W) u32, "demod": pytree}} or None


class GridControl(NamedTuple):
    """Traced per-channel control (n_streams, M) — no recompiles."""

    fine_offset_hz: jnp.ndarray
    active: jnp.ndarray
    squelch_db: jnp.ndarray
    bank_idx: Any = None  # (n_streams, M) int32 mixed-mode bank select
    wide: Any = None  # {dsp_key: {"offset_hz"/"active"/"squelch_db": (S,W)}}


def grid_init(cfg: ShardedGridConfig, n_streams: int) -> GridState:
    m = cfg.channelizer.channel_count
    t = cfg.channelizer.taps_per_channel
    spec = get_demod(cfg.mode)
    base = spec.init(cfg.demod_cfg)
    states2 = tuple(
        jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape),
            get_demod(mk).init(ck),
        )
        for mk, ck in zip(cfg.modes2, cfg.demod_cfgs2)
    )
    extras = tuple(
        jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape),
            get_demod(mk).init(ck),
        )
        for mk, ck in zip(cfg.extra_modes, cfg.extra_demod_cfgs)
    )
    wide = None
    if cfg.wide_groups:
        from wavecap_tpu import models

        wide = {}
        for gk, wcfg in zip(cfg.wide_groups, cfg.wide_cfgs):
            w = wcfg.capacity
            dbase = models.wbfm_init(wcfg.wbfm_cfg())
            wide[gk] = {
                "nco": jnp.zeros((n_streams, w), jnp.uint32),
                "demod": jax.tree.map(
                    lambda x: jnp.broadcast_to(x, (n_streams, w) + x.shape),
                    dbase,
                ),
            }
    return GridState(
        hist=jnp.zeros((n_streams, m * t), jnp.complex64),
        demod_states=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, m) + x.shape), base
        ),
        nco_phase=jnp.zeros((n_streams, m), jnp.uint32),
        demod_states2=states2,
        demod_states_extra=extras,
        wide=wide,
    )


def control_init(cfg: ShardedGridConfig, n_streams: int) -> GridControl:
    m = cfg.channelizer.channel_count
    wide = None
    if cfg.wide_groups:
        wide = {
            gk: {
                "offset_hz": jnp.zeros((n_streams, wcfg.capacity), jnp.float32),
                "active": jnp.zeros((n_streams, wcfg.capacity), bool),
                "squelch_db": jnp.full(
                    (n_streams, wcfg.capacity), -1e9, jnp.float32
                ),
            }
            for gk, wcfg in zip(cfg.wide_groups, cfg.wide_cfgs)
        }
    return GridControl(
        fine_offset_hz=jnp.zeros((n_streams, m), jnp.float32),
        active=jnp.zeros((n_streams, m), bool),
        squelch_db=jnp.full((n_streams, m), -1e9, jnp.float32),
        bank_idx=jnp.zeros((n_streams, m), jnp.int32),
        wide=wide,
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
    specs2 = tuple(get_demod(mk) for mk in cfg.modes2)
    specs_extra = tuple(get_demod(mk) for mk in cfg.extra_modes)
    rate = cfg.channelizer.channel_rate
    rate_full = float(cfg.channelizer.sample_rate)
    wide_prep = []
    for gk, wcfg in zip(cfg.wide_groups, cfg.wide_cfgs):
        taps_np = ops.design_decimation_fir(wcfg.decim, rate_full)
        if len(taps_np) - 1 > hist_len:
            raise ValueError(
                f"wide decimator ({len(taps_np)} taps) exceeds the mesh "
                f"halo (M*T = {hist_len}); raise taps_per_channel"
            )
        wide_prep.append((gk, wcfg, taps_np))

    def one_stream(
        x_local, hist, demod_states, nco_phase, fine, active, squelch,
        bank_idx, ds_extra, wide_state, wide_ctl, demod_states2=(),
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

        # --- wide (WBFM) slots: time-sharded decimation off the raw
        # stream, replicated demod on the gathered ~240 kHz IF ---
        wide_out = {}
        new_wide = {}
        local_n = x_local.shape[-1]
        total_n = local_n * n_time
        for gk, wcfg, taps_np in wide_prep:
            if local_n % wcfg.decim != 0:
                raise ValueError(
                    f"per-shard block ({local_n}) must divide by the wide "
                    f"decimation ({wcfg.decim}); adjust block_seconds"
                )
            from wavecap_tpu.ops.nco import tuning_word

            taps_j = jnp.asarray(taps_np)
            ntail = len(taps_np) - 1
            wst, wct = wide_state[gk], wide_ctl[gk]

            def per_slot(off, phase0, _taps=taps_j, _nt=ntail, _d=wcfg.decim):
                tw = tuning_word(off, rate_full)
                ph_shard = phase0 + jnp.uint32(t_idx * local_n) * tw
                seg = jnp.concatenate([my_hist[-_nt:], x_local])
                shifted, _ = ops.freq_shift(
                    seg, -off, rate_full, ph_shard - jnp.uint32(_nt) * tw
                )
                dec, _ = ops.fir_decimate(
                    shifted[_nt:], _taps, _d, shifted[:_nt]
                )
                return dec, phase0 + jnp.uint32(total_n) * tw

            dec_local, nco_new = jax.vmap(per_slot)(
                wct["offset_hz"], wst["nco"]
            )
            gathered = jax.lax.all_gather(dec_local, "time")
            dec_full = jnp.transpose(gathered, (1, 0, 2)).reshape(
                dec_local.shape[0], -1
            )
            rssi_w = jax.vmap(ops.rssi_dbfs)(dec_full)
            wb_cfg = wcfg.wbfm_cfg()

            def per_wdemod(dec, dstate):
                from wavecap_tpu import models

                audio_w, fm_w, dstate = models.wbfm_demod_baseband(
                    dec, dstate, wb_cfg
                )
                return audio_w, fm_w, dstate

            audio_w, fm_w, wd_states = jax.vmap(per_wdemod)(
                dec_full, wst["demod"]
            )
            audio_w = ops.squelch_gate(audio_w, rssi_w, wct["squelch_db"])
            audio_w = jnp.where(
                wct["active"][:, None], audio_w, jnp.zeros_like(audio_w)
            )
            rssi_w = jnp.where(
                wct["active"], rssi_w, jnp.full_like(rssi_w, -200.0)
            )
            wide_out[gk] = {"audio": audio_w, "rssi": rssi_w}
            if cfg.wide_export_baseband:
                wide_out[gk]["baseband"] = fm_w
            new_wide[gk] = {"nco": nco_new, "demod": wd_states}

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

        # own-output extra banks over the SAME shifted bins (dual-rate
        # trunking, mixed analog+p25(+p25p2) — round 5 generalized tuple)
        audio2_list = []
        ds2_list = []
        for k, sp2 in enumerate(specs2):
            cfg2_k = cfg.demod_cfgs2[k]

            def per_chan2(shifted, dstate2, _sp=sp2, _cfg=cfg2_k):
                out2, dstate2 = _sp.demod(shifted, dstate2, _cfg)
                return out2, dstate2

            a2, d2 = jax.vmap(per_chan2)(shifted_all, demod_states2[k])
            audio2_list.append(
                jnp.where(active[:, None], a2, jnp.zeros_like(a2))
            )
            ds2_list.append(d2)
        audio2 = tuple(audio2_list)
        demod_states2 = tuple(ds2_list)

        # --- next-block history: the global stream tail (last shard's) ---
        if cfg.debug_skip_halo:
            new_hist = tail  # ablation: no all_gather
        else:
            all_tails = jax.lax.all_gather(tail, "time")  # (n_time, hist_len)
            new_hist = all_tails[-1]

        return (
            audio, rssi, new_hist, demod_states, nco_phase, ds_extra,
            wide_out, new_wide, audio2, demod_states2,
        )

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
        P("stream"),  # wide state (unsharded over time)
        P("stream"),  # wide control
    )
    base_out = (
        P("stream", "time", None),  # audio (M sharded)
        P("stream", "time"),  # rssi
        P("stream", None),  # new hist (replicated)
        P("stream", "time"),  # demod states
        P("stream", "time"),  # nco
        P("stream", "time"),  # extra demod states
        P("stream"),  # wide outputs (replicated over time)
        P("stream"),  # wide state
        P("stream", "time", None),  # own-output bank audio tuple (M sharded)
        P("stream", "time"),  # own-output bank states tuple
    )

    def body(x, hist, ds, nco, fine, active, squelch, bidx, dse, ws, wc, ds2):
        f = jax.vmap(one_stream)  # over local stream axis
        return f(
            x, hist, ds, nco, fine, active, squelch, bidx, dse, ws, wc, ds2
        )

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=base_in + (P("stream", "time"),),
        out_specs=base_out,
        check_vma=False,
    )

    @jax.jit
    def step(x, state: GridState, ctl: GridControl):
        bidx = ctl.bank_idx
        if bidx is None:
            bidx = jnp.zeros(ctl.active.shape, jnp.int32)
        (
            audio, rssi, hist, dstates, nco, dse, wide_out, wide_st,
            audio2, dstates2,
        ) = shard(
            x,
            state.hist,
            state.demod_states,
            state.nco_phase,
            ctl.fine_offset_hz,
            ctl.active,
            ctl.squelch_db,
            bidx,
            state.demod_states_extra,
            state.wide,
            ctl.wide,
            state.demod_states2,
        )
        out = {"audio": audio, "rssi": rssi}
        if audio2:
            out["audio2"] = audio2
        if wide_out:
            out["wide"] = wide_out
        return out, GridState(
            hist, dstates, nco, dstates2, dse, wide_st or None
        )

    return step
