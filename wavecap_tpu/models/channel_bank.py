"""Channel bank: one wideband stream -> many demodulated audio channels.

This is the TPU-native replacement for the reference capture loop's
per-channel thread-pool fan-out (reference ``capture.py:2489-2597``,
``_process_channel_dsp_stateless`` at ``capture.py:298``): the polyphase
channelizer produces every channel in one batched kernel, and the
narrowband demodulator runs ``vmap``-ped over a static number of slots.

Static/dynamic split (XLA-friendly, SURVEY hard part #3):
  * static : slot capacity, demod mode, channelizer geometry  -> recompile
  * traced : per-slot channel index, fine offset, active mask,
             squelch threshold                                -> no recompile

Inactive slots process channel 0 with a zeroed mask — wasted work is
bounded by capacity, and channel create/delete never recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from wavecap_tpu import ops
from wavecap_tpu.ops.channelizer import (
    ChannelizerConfig,
    channelize,
    channelizer_init,
)
from .registry import get_demod


@dataclass(frozen=True)
class ChannelBankConfig:
    channelizer: ChannelizerConfig
    mode: str  # demod mode for every slot in this bank
    demod_cfg: Any  # demod config at the channelizer's channel rate
    capacity: int = 8  # static slot count


class ChannelBankState(NamedTuple):
    chan_state: jnp.ndarray  # channelizer history
    demod_states: Any  # stacked demod state pytree, leading axis = capacity
    nco_phase: jnp.ndarray  # (capacity,) uint32 fine-shift phase


class ChannelAssignment(NamedTuple):
    """Traced per-slot routing (update freely without recompiling)."""

    channel_index: jnp.ndarray  # (capacity,) int32 channelizer bin
    fine_offset_hz: jnp.ndarray  # (capacity,) f32 residual offset
    active: jnp.ndarray  # (capacity,) bool
    squelch_db: jnp.ndarray  # (capacity,) f32 dBFS threshold (-inf = open)


def assignment_init(capacity: int) -> ChannelAssignment:
    return ChannelAssignment(
        channel_index=jnp.zeros(capacity, jnp.int32),
        fine_offset_hz=jnp.zeros(capacity, jnp.float32),
        active=jnp.zeros(capacity, bool),
        squelch_db=jnp.full(capacity, -1e9, jnp.float32),
    )


def _stack_states(state, capacity: int):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (capacity,) + x.shape), state
    )


def bank_init(cfg: ChannelBankConfig) -> ChannelBankState:
    spec = get_demod(cfg.mode)
    return ChannelBankState(
        chan_state=channelizer_init(cfg.channelizer),
        demod_states=_stack_states(spec.init(cfg.demod_cfg), cfg.capacity),
        nco_phase=jnp.zeros(cfg.capacity, jnp.uint32),
    )


def bank_demod_step(
    chans: jnp.ndarray,
    state: ChannelBankState,
    assign: ChannelAssignment,
    cfg: ChannelBankConfig,
):
    """Demod bank over pre-channelized output ``chans`` of shape (M, S).

    Returns ``(out, state)``; ``state.chan_state`` passes through untouched
    (the caller owns the shared channelizer history).
    """
    spec = get_demod(cfg.mode)
    rate = cfg.channelizer.channel_rate

    selected = chans[assign.channel_index]  # (capacity, S)

    def per_slot(iq_slot, offset_hz, phase0, demod_state):
        shifted, phase1 = ops.freq_shift(iq_slot, -offset_hz, rate, phase0)
        rssi = ops.rssi_dbfs(shifted)
        audio, demod_state = spec.demod(shifted, demod_state, cfg.demod_cfg)
        return audio, rssi, phase1, demod_state

    audio, rssi, nco_phase, demod_states = jax.vmap(per_slot)(
        selected, assign.fine_offset_hz, state.nco_phase, state.demod_states
    )

    audio = ops.squelch_gate(audio, rssi, assign.squelch_db)
    audio = jnp.where(assign.active[:, None], audio, jnp.zeros_like(audio))
    rssi = jnp.where(assign.active, rssi, jnp.full_like(rssi, -200.0))

    out = {"audio": audio, "rssi": rssi}
    return out, ChannelBankState(state.chan_state, demod_states, nco_phase)


def bank_step(
    iq: jnp.ndarray,
    state: ChannelBankState,
    assign: ChannelAssignment,
    cfg: ChannelBankConfig,
):
    """Standalone wideband step: channelize + demod bank (single-bank use)."""
    chans, chan_state = channelize(iq, state.chan_state, cfg.channelizer)
    out, state = bank_demod_step(chans, state, assign, cfg)
    return out, state._replace(chan_state=chan_state)
