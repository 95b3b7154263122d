"""Per-capture jitted pipeline: spectrum + channel banks + wideband channels.

This is the device-side compute for one capture block.  It replaces the
reference's per-chunk hot loop (reference ``capture.py:3052-3331``):
instead of a Python thread fanning out per-channel tasks to a thread pool,
one jitted function consumes a whole IQ block and produces, in a single
device program:

  * the windowed FFT spectrum frames (reference ``_calculate_fft``),
  * every narrowband channel via one polyphase channelizer + vmapped
    demod bank per active mode (reference ``_process_channels_parallel``),
  * wideband (WBFM) channels via a vmapped direct freq-shift ->
    polyphase-decimate -> demod path (reference ``freq_shift`` +
    ``wbfm_demod``),
  * per-channel RSSI and squelch gating (reference
    ``update_signal_metrics`` / squelch at ``capture.py:2919``).

The jit cache key is the *static* shape of the capture: (modes present,
slot capacities, rates, block size).  Channel tuning/activation is traced.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from wavecap_tpu import ops
from wavecap_tpu import models
from wavecap_tpu.models.channel_bank import (
    ChannelBankConfig,
    ChannelAssignment,
    ChannelBankState,
    assignment_init,
    bank_init,
    bank_step,
)
from wavecap_tpu.models.registry import get_demod
from wavecap_tpu.ops.channelizer import ChannelizerConfig


from wavecap_tpu.models.p25.c4fm import (
    C4fmConfig,
    C4fmState,
    c4fm_init,
    c4fm_demodulate,
)
from wavecap_tpu.models.p25.cqpsk import (
    CqpskConfig,
    cqpsk_init,
    cqpsk_demodulate,
)

NARROW_MODES = ("nbfm", "am", "sam", "usb", "lsb")
WIDE_RATE = 240_000  # WBFM intermediate rate

# --- device->host wire formats ---------------------------------------------
# The remote-TPU fetch path costs ~27 ms fixed + ~25 us/KB (measured round
# 4), so fetched bytes are the real-time budget at high channel counts.
# Each output leaf rides its natural wire width instead of f32:
#   * audio        -> i16 (the WS PCM stream is 16-bit anyway; demod output
#                     is soft-clipped to [-1, 1])
#   * P25 soft     -> i8 at 1/16 resolution (constellation is +-1/+-3; the
#                     trellis soft metric is insensitive far below this)
#   * baseband     -> i16 at +-8 range (wide pre-MPX discriminator for RDS)
#   * everything else (spectrum dB, rssi) -> f32
# ``pack_wire`` builds the single fetched uint8 buffer on device;
# ``unpack_wire`` (host, engine._finish_batch) reverses it using only the
# shape/dtype metadata of the un-fetched leaves.
_WIRE_SPECS: dict[str, tuple] = {
    "audio": (jnp.int16, 32767.0),
    "soft": (jnp.int8, 16.0),
    "baseband": (jnp.int16, 4095.0),
}


def _wire_leaf_name(path) -> str:
    key = path[-1]
    return str(getattr(key, "key", key))


def wire_spec(name: str) -> tuple:
    """Wire (dtype, scale) for an output-leaf name; f32 passthrough default."""
    return _WIRE_SPECS.get(name, (jnp.float32, 1.0))


def pack_wire(out: dict) -> jnp.ndarray:
    """Concatenate every output leaf into ONE uint8 buffer (one fetch RPC)."""
    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(out)[0]:
        dtype, scale = wire_spec(_wire_leaf_name(path))
        if dtype == jnp.float32:
            enc = leaf.astype(jnp.float32)
        else:
            info = jnp.iinfo(dtype)
            enc = jnp.clip(
                jnp.round(leaf.astype(jnp.float32) * scale), info.min + 1, info.max
            ).astype(dtype)
        parts.append(jax.lax.bitcast_convert_type(enc, jnp.uint8).ravel())
    return jnp.concatenate(parts)


def unpack_wire(unpacked: dict, flat_u8: np.ndarray) -> dict:
    """Host-side inverse of :func:`pack_wire` for a stacked batch.

    ``unpacked`` holds the un-fetched device leaves (shape/dtype metadata
    only, leading block axis); ``flat_u8`` is the fetched ``(n, bytes)``
    uint8 buffer."""
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(unpacked)
    rebuilt = []
    off = 0
    for path, leaf in leaves_p:
        dtype, scale = wire_spec(_wire_leaf_name(path))
        np_dtype = np.dtype(str(jnp.dtype(dtype)))
        per = int(np.prod(leaf.shape[1:])) if len(leaf.shape) > 1 else 1
        nb = per * np_dtype.itemsize
        raw = np.ascontiguousarray(flat_u8[:, off : off + nb]).view(np_dtype)
        arr = raw.reshape(leaf.shape)
        if np_dtype != np.float32:
            arr = arr.astype(np.float32) * np.float32(1.0 / scale)
        rebuilt.append(arr)
        off += nb
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


def bank_key_parts(entry) -> tuple[str, tuple]:
    """A ``narrow_modes`` entry -> ``(mode, dsp_overrides)``.

    Entries are either a bare mode string (``"nbfm"``) or a
    ``(mode, ((field, value), ...))`` tuple carrying per-channel DSP
    config overrides (reference api.py ChannelSettings fields).  Channels
    sharing (mode, overrides) share one vmapped bank; a new combination
    is a static change (one recompile), like a new mode."""
    if isinstance(entry, str):
        return entry, ()
    mode, opts = entry
    return mode, tuple(opts)


@dataclass(frozen=True)
class WideSlotConfig:
    """Direct-path (WBFM) slot group config."""

    sample_rate: int
    capacity: int = 2
    audio_rate: int = 48_000
    dsp: tuple = ()  # WbfmConfig overrides ((field, value), ...)

    @property
    def decim(self) -> int:
        return max(1, int(self.sample_rate) // WIDE_RATE)

    @property
    def if_rate(self) -> int:
        return int(self.sample_rate) // self.decim

    def wbfm_cfg(self) -> "models.WbfmConfig":
        return models.WbfmConfig(
            sample_rate=self.if_rate, audio_rate=self.audio_rate,
            **dict(self.dsp),
        )


@dataclass(frozen=True)
class CapturePipelineConfig:
    sample_rate: int
    block_size: int
    fft_size: int = 2048
    # bank keys present: mode strings and/or (mode, dsp_overrides) tuples
    # (see bank_key_parts)
    narrow_modes: tuple = ()
    narrow_capacity: int = 8
    channel_bandwidth: float = 25_000.0
    wide_capacity: int = 0
    p25_capacity: int = 0
    p25_modulation: str = "c4fm"  # c4fm | cqpsk (LSM/simulcast)
    # P25 Phase 2 TDMA voice bank: 6000-baud H-DQPSK (alpha=1.0) slots,
    # separate from the 4800-baud p25 bank because a vmapped bank shares
    # ONE traced demod config — Phase 2 systems run their FDMA control
    # channel at 4800 and voice at 6000 simultaneously
    p25p2_capacity: int = 0
    # CQPSK/LSM simulcast equalizer taps (0 = off): analytic echo-fit
    # MMSE ahead of the slicer (models/p25/cqpsk.py).  Opt-in for LSM
    # systems on simulcast networks; known interaction: under a large
    # uncorrected CFO the echo fit can engage spuriously (docs/perf.md)
    p25_equalizer_taps: int = 0
    audio_rate: int = 48_000
    # export the per-slot pre-MPX FM discriminator at the wide IF rate
    # (RDS consumers need the 57 kHz subcarrier, which cannot survive the
    # 48 kHz audio path) — costs ~1 MB/s/slot of fetch, so opt-in
    export_wide_baseband: bool = False
    # Wide (WBFM) slot groups present, keyed by their DSP-override tuples
    # ((field, value), ...) — one vmapped group per distinct override set,
    # so per-channel deemphasis/notch/NR match the reference's per-channel
    # ChannelSettings semantics (round 4; narrow banks already worked this
    # way).  Each group has ``wide_capacity`` slots.
    wide_groups: tuple = ()
    # Audio fetch slots (round 4): when > 0, only this many narrow-bank
    # audio rows are gathered into the fetched buffer per bank, selected
    # by traced indices (listener-driven, no recompile).  Demodulation
    # still runs for EVERY active slot (RSSI/squelch/classifier are
    # full-capacity); this gates only the device->host audio bytes, which
    # at 100 channels dominate the shared relay link (48 kHz i16 = 96
    # KB/s/ch).  Reference semantics: audio streams are per-subscriber
    # on demand (reference Channel.subscribe_audio); 0 = fetch all.
    audio_fetch_slots: int = 0
    # spectrum frames fetched per block: raw FFT frames are averaged down
    # (in the power domain, on-device) to this many.  Raw frames at
    # block_size/fft_size per block dominated the device->host fetch
    # (~475 KB/block at 2.4 Msps); ~10 fps is plenty for waterfall UIs and
    # the averaging improves the dB estimate for the classifier
    spectrum_frames: int = 2

    def channelizer(self) -> ChannelizerConfig:
        return ChannelizerConfig(
            sample_rate=float(self.sample_rate),
            channel_bandwidth=self.channel_bandwidth,
        )

    def bank_cfg(self, entry) -> ChannelBankConfig:
        ch = self.channelizer()
        rate = int(ch.channel_rate)
        mode, opts = bank_key_parts(entry)
        spec = get_demod(mode)
        kwargs: dict[str, Any] = dict(sample_rate=rate, audio_rate=self.audio_rate)
        if mode == "nbfm":
            kwargs.update(enable_highpass=True, enable_lowpass=True)
        if mode in ("usb", "lsb"):
            kwargs.update(mode=mode)
        kwargs.update(dict(opts))  # per-channel DSP overrides win
        return ChannelBankConfig(
            channelizer=ch,
            mode=mode,
            demod_cfg=spec.config_cls(**kwargs),
            capacity=self.narrow_capacity,
        )

    def wide_cfg(self, dsp: tuple = ()) -> WideSlotConfig:
        return WideSlotConfig(
            sample_rate=self.sample_rate,
            capacity=self.wide_capacity,
            audio_rate=self.audio_rate,
            dsp=dsp,
        )


class WideState(NamedTuple):
    nco_phase: jnp.ndarray  # (W,) uint32
    fir_tail: jnp.ndarray  # (W, taps-1) complex64
    demod_states: Any  # stacked WbfmState


class WideAssignment(NamedTuple):
    offset_hz: jnp.ndarray  # (W,) f32 from capture center
    active: jnp.ndarray  # (W,) bool
    squelch_db: jnp.ndarray  # (W,) f32


class P25BankState(NamedTuple):
    nco_phase: jnp.ndarray  # (P,) uint32
    c4fm: Any  # stacked C4fmState


class CaptureState(NamedTuple):
    chan_state: jnp.ndarray | None  # shared channelizer history
    banks: dict  # mode -> ChannelBankState
    wide: dict | None  # dsp-key -> WideState (one vmapped group per DSP set)
    p25: P25BankState | None
    p25p2: P25BankState | None = None  # Phase 2 6000-baud H-DQPSK bank


class CaptureControl(NamedTuple):
    banks: dict  # mode -> ChannelAssignment
    wide: dict | None  # dsp-key -> WideAssignment
    p25: ChannelAssignment | None  # channel_index/fine/active reused
    p25p2: ChannelAssignment | None = None
    # mode -> (audio_fetch_slots,) int32 slot indices whose audio rides
    # the fetched buffer (present only when cfg.audio_fetch_slots > 0)
    audio_sel: dict | None = None


def wide_assignment_init(capacity: int) -> WideAssignment:
    return WideAssignment(
        offset_hz=jnp.zeros(capacity, jnp.float32),
        active=jnp.zeros(capacity, bool),
        squelch_db=jnp.full(capacity, -1e9, jnp.float32),
    )


def _wide_taps(cfg: WideSlotConfig) -> np.ndarray:
    return ops.design_decimation_fir(cfg.decim, float(cfg.sample_rate))


def wide_init(cfg: WideSlotConfig) -> WideState:
    taps = _wide_taps(cfg)
    base = models.wbfm_init(cfg.wbfm_cfg())
    w = cfg.capacity
    return WideState(
        nco_phase=jnp.zeros(w, jnp.uint32),
        fir_tail=jnp.zeros((w, len(taps) - 1), jnp.complex64),
        demod_states=jax.tree.map(lambda x: jnp.broadcast_to(x, (w,) + x.shape), base),
    )


def p25_cfg_for(cfg: CapturePipelineConfig):
    import os

    rate = int(cfg.channelizer().channel_rate)
    timing = os.environ.get("WAVECAP_P25_TIMING", "block")
    if cfg.p25_modulation == "cqpsk":
        return CqpskConfig(
            sample_rate=rate,
            timing_impl=timing,
            equalizer_taps=cfg.p25_equalizer_taps,
        )
    return C4fmConfig(
        sample_rate=rate,
        timing_impl=timing,
        equalizer_taps=cfg.p25_equalizer_taps,
    )


def _p25_fns(cfg: CapturePipelineConfig):
    if cfg.p25_modulation == "cqpsk":
        return cqpsk_init, cqpsk_demodulate
    return c4fm_init, c4fm_demodulate


def p25p2_cfg_for(cfg: CapturePipelineConfig) -> CqpskConfig:
    """Phase 2 TDMA voice: 6000-baud H-DQPSK, full-excess-bandwidth RRC
    (reference dsp/p25/cqpsk.py Phase 2 path uses alpha=1.0)."""
    import os

    rate = int(cfg.channelizer().channel_rate)
    timing = os.environ.get("WAVECAP_P25_TIMING", "block")
    return CqpskConfig(
        sample_rate=rate, symbol_rate=6000.0, rrc_alpha=1.0,
        timing_impl=timing,
    )


def p25_init(cfg: CapturePipelineConfig) -> P25BankState:
    init_fn, _ = _p25_fns(cfg)
    base = init_fn(p25_cfg_for(cfg))
    p = cfg.p25_capacity
    return P25BankState(
        nco_phase=jnp.zeros(p, jnp.uint32),
        c4fm=jax.tree.map(lambda x: jnp.broadcast_to(x, (p,) + x.shape), base),
    )


def p25p2_init(cfg: CapturePipelineConfig) -> P25BankState:
    base = cqpsk_init(p25p2_cfg_for(cfg))
    p = cfg.p25p2_capacity
    return P25BankState(
        nco_phase=jnp.zeros(p, jnp.uint32),
        c4fm=jax.tree.map(lambda x: jnp.broadcast_to(x, (p,) + x.shape), base),
    )


def pipeline_init(cfg: CapturePipelineConfig) -> CaptureState:
    from wavecap_tpu.ops.channelizer import channelizer_init

    banks = {m: bank_init(cfg.bank_cfg(m)) for m in cfg.narrow_modes}
    wide = (
        {g: wide_init(cfg.wide_cfg(g)) for g in cfg.wide_groups}
        if cfg.wide_capacity > 0
        else None
    )
    p25 = p25_init(cfg) if cfg.p25_capacity > 0 else None
    p25p2 = p25p2_init(cfg) if cfg.p25p2_capacity > 0 else None
    needs_chan = (
        bool(cfg.narrow_modes) or cfg.p25_capacity > 0 or cfg.p25p2_capacity > 0
    )
    chan = channelizer_init(cfg.channelizer()) if needs_chan else None
    return CaptureState(
        chan_state=chan, banks=banks, wide=wide, p25=p25, p25p2=p25p2
    )


def control_init(cfg: CapturePipelineConfig) -> CaptureControl:
    banks = {m: assignment_init(cfg.narrow_capacity) for m in cfg.narrow_modes}
    wide = (
        {g: wide_assignment_init(cfg.wide_capacity) for g in cfg.wide_groups}
        if cfg.wide_capacity > 0
        else None
    )
    p25 = assignment_init(cfg.p25_capacity) if cfg.p25_capacity > 0 else None
    p25p2 = assignment_init(cfg.p25p2_capacity) if cfg.p25p2_capacity > 0 else None
    audio_sel = (
        {m: jnp.zeros(cfg.audio_fetch_slots, jnp.int32) for m in cfg.narrow_modes}
        if cfg.audio_fetch_slots > 0
        else None
    )
    return CaptureControl(
        banks=banks, wide=wide, p25=p25, p25p2=p25p2, audio_sel=audio_sel
    )


def _wide_step(
    iq,
    state: WideState,
    assign: WideAssignment,
    cfg: WideSlotConfig,
    export_baseband: bool = False,
):
    taps = jnp.asarray(_wide_taps(cfg))
    wb_cfg = cfg.wbfm_cfg()

    def per_slot(offset, phase0, tail, dstate):
        shifted, phase1 = ops.freq_shift(iq, -offset, cfg.sample_rate, phase0)
        dec, tail = ops.fir_decimate(shifted, taps, cfg.decim, tail)
        rssi = ops.rssi_dbfs(dec)
        audio, fm, dstate = models.wbfm_demod_baseband(dec, dstate, wb_cfg)
        return audio, fm, rssi, phase1, tail, dstate

    audio, fm, rssi, phases, tails, dstates = jax.vmap(per_slot)(
        assign.offset_hz, state.nco_phase, state.fir_tail, state.demod_states
    )
    audio = ops.squelch_gate(audio, rssi, assign.squelch_db)
    audio = jnp.where(assign.active[:, None], audio, jnp.zeros_like(audio))
    rssi = jnp.where(assign.active, rssi, jnp.full_like(rssi, -200.0))
    out = {"audio": audio, "rssi": rssi}
    if export_baseband:
        out["baseband"] = fm
    return out, WideState(phases, tails, dstates)


def capture_step(
    x: jnp.ndarray,
    state: CaptureState,
    ctl: CaptureControl,
    cfg: CapturePipelineConfig,
):
    """One block through the whole capture.  Returns (outputs, state)."""
    from wavecap_tpu.ops.channelizer import channelize
    from wavecap_tpu.models.channel_bank import bank_demod_step

    out: dict[str, Any] = {}
    out["spectrum"] = ops.spectrogram_sampled(
        x, cfg.fft_size, n_out=max(cfg.spectrum_frames, 1)
    )
    out["rssi"] = ops.rssi_dbfs(x)

    # One channelizer pass feeds every narrowband bank and the P25 bank.
    chans = None
    new_chan_state = state.chan_state
    if state.chan_state is not None:
        chans, new_chan_state = channelize(x, state.chan_state, cfg.channelizer())

    new_banks = {}
    bank_out = {}
    for key in cfg.narrow_modes:
        o, s = bank_demod_step(
            chans, state.banks[key], ctl.banks[key], cfg.bank_cfg(key)
        )
        if (
            cfg.audio_fetch_slots > 0
            and cfg.audio_fetch_slots < cfg.narrow_capacity
            and ctl.audio_sel is not None
        ):
            # gate fetched audio bytes to the listener-selected slots;
            # rssi (and demod state) stay full-capacity
            o = dict(o)
            o["audio"] = o["audio"][ctl.audio_sel[key]]
        bank_out[key] = o
        new_banks[key] = s
    out["banks"] = bank_out

    new_wide = state.wide
    if cfg.wide_capacity > 0 and state.wide is not None and ctl.wide is not None:
        wide_out = {}
        new_wide = {}
        for g in cfg.wide_groups:
            wo, ws = _wide_step(
                x,
                state.wide[g],
                ctl.wide[g],
                cfg.wide_cfg(g),
                cfg.export_wide_baseband,
            )
            wide_out[g] = wo
            new_wide[g] = ws
        out["wide"] = wide_out

    new_p25 = state.p25
    if cfg.p25_capacity > 0 and state.p25 is not None and ctl.p25 is not None:
        _, demod_fn = _p25_fns(cfg)
        po, new_p25 = _p25_step(
            chans, state.p25, ctl.p25, cfg, p25_cfg_for(cfg), demod_fn
        )
        out["p25"] = po

    new_p25p2 = state.p25p2
    if cfg.p25p2_capacity > 0 and state.p25p2 is not None and ctl.p25p2 is not None:
        po2, new_p25p2 = _p25_step(
            chans, state.p25p2, ctl.p25p2, cfg, p25p2_cfg_for(cfg),
            cqpsk_demodulate,
        )
        out["p25p2"] = po2

    # Single-buffer output packing: remote TPU runtimes pay a full RPC
    # roundtrip PER fetched array, so the host fetches out["_packed"] once
    # and reslices it from the (local) shape/dtype metadata of the other
    # leaves.  Leaves ride per-name wire dtypes (audio i16, soft i8) — see
    # pack_wire — because fetched bytes are the real-time budget at the
    # BASELINE 100-channel operating point.
    out["_packed"] = pack_wire(out)

    return out, CaptureState(
        chan_state=new_chan_state, banks=new_banks, wide=new_wide,
        p25=new_p25, p25p2=new_p25p2,
    )


def _p25_step(chans, state: P25BankState, assign, cfg: CapturePipelineConfig,
              c4, demod_fn):
    """4FSK/DQPSK symbol bank over the shared channelizer output; ``c4``
    and ``demod_fn`` select the variant (4800-baud C4FM/CQPSK bank or the
    Phase 2 6000-baud H-DQPSK bank)."""
    ch = cfg.channelizer()
    selected = chans[assign.channel_index]
    rate = ch.channel_rate

    def per_slot(iq_slot, offset_hz, phase0, c4state):
        shifted, phase1 = ops.freq_shift(iq_slot, -offset_hz, rate, phase0)
        rssi = ops.rssi_dbfs(shifted)
        if getattr(c4, "equalizer_taps", 0) > 0:
            # equalizer runtime guard (round 5): the echo-fit template
            # assumes a near-bin-centered channel — an off-center slot's
            # asymmetric passband mis-fits as a strong echo (models/p25/
            # equalizer.py), so gate the fit on THIS slot's fine offset
            eq_ok = jnp.abs(offset_hz) <= jnp.float32(
                c4.eq_max_fine_offset_hz
            )
            soft, dibits, c4state = demod_fn(
                shifted, c4state, c4, eq_enable=eq_ok
            )
        else:
            soft, dibits, c4state = demod_fn(shifted, c4state, c4)
        return soft, dibits, rssi, phase1, c4state

    soft, dibits, rssi, phases, c4states = jax.vmap(per_slot)(
        selected, assign.fine_offset_hz, state.nco_phase, state.c4fm
    )
    rssi = jnp.where(assign.active, rssi, jnp.full_like(rssi, -200.0))
    # hard decisions ("dibits") are NOT exported: every host consumer
    # re-derives them from soft symbols (framer/trellis take soft), and
    # fetching them doubled the p25 payload per block
    del dibits
    return (
        {"soft": soft, "rssi": rssi},
        P25BankState(phases, c4states),
    )


def _to_complex(x_in: jnp.ndarray, scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Packed I/Q words -> complex64 on device.

    Integer transport arrives as one WORD per complex sample — the host
    views the interleaved byte stream in place (free) and the device
    splits I/Q with arithmetic shifts, which lower to pure elementwise
    vector ops.  The previous stride-2 deinterleave (``x[0::2]``) forced
    a lane-stride relayout that cost ~160 ms per second of 10 Msps IQ on
    its own (round-4 bisect) — tiny-minor-dim layouts are TPU poison.

      int8 word + ``scale``:  adaptive-i4 NIBBLE pairs (lo nibble I, hi
                              nibble Q; scale = block_max/7).  Halves the
                              upload again vs i8: quantization noise is
                              white across the whole capture bandwidth,
                              so a 12.5 kHz channel in a 10 MHz capture
                              sees ~1/800 of it — ~25 dB per-channel SNR
                              even at 4 bits with 100 equal channels
                              (docs/perf.md round-4 measurement)
      int16 word + ``scale``: adaptive-i8 pairs (lo byte I, hi byte Q,
                              little-endian; scale = block_max/127)
      int32 word:             i16 pairs, scaled 1/32768
      f32:                    interleaved floats (tests; stride path)
    """
    if x_in.dtype == jnp.int8:
        assert scale is not None, "packed-i4 transport carries a scale"
        i = ((x_in << 4) >> 4).astype(jnp.float32) * scale
        q = (x_in >> 4).astype(jnp.float32) * scale
        return jax.lax.complex(i, q)
    if x_in.dtype == jnp.int16:
        assert scale is not None, "packed-i8 transport carries a scale"
        i = ((x_in << 8) >> 8).astype(jnp.float32) * scale
        q = (x_in >> 8).astype(jnp.float32) * scale
        return jax.lax.complex(i, q)
    if x_in.dtype == jnp.int32:
        s = jnp.float32(1.0 / 32768.0)
        i = ((x_in << 16) >> 16).astype(jnp.float32) * s
        q = (x_in >> 16).astype(jnp.float32) * s
        return jax.lax.complex(i, q)
    x_f32 = x_in
    return jax.lax.complex(x_f32[..., 0::2], x_f32[..., 1::2])


def jit_capture_step(cfg: CapturePipelineConfig):
    """Jitted step taking interleaved i16/f32 IQ (complex64 host<->device
    transfer is unimplemented on some TPU runtimes; complex math inside
    the program is fine, so the boundary crossing is planar)."""

    def step(x_in, state, ctl):
        return capture_step(_to_complex(x_in), state, ctl, cfg)

    return jax.jit(step)


def jit_capture_multi(cfg: CapturePipelineConfig, n_blocks: int):
    """Jitted multi-block step: ``lax.scan`` over ``n_blocks`` stacked
    blocks in ONE dispatch.  Outputs gain a leading block axis; the packed
    buffer is fetched once for the whole batch.  Amortizes the fixed
    relay round trip (the reference has no equivalent — its per-block
    Python loop pays the dispatch cost every block)."""

    def multi(x_rows, state, ctl):
        # x_rows: stacked interleaved rows, or (rows_i8, per-row scales)
        # for adaptive-scale int8 transport
        if isinstance(x_rows, tuple):
            rows, scales = x_rows

            def body_scaled(st, rs):
                row, s = rs
                out, st2 = capture_step(_to_complex(row, s), st, ctl, cfg)
                return st2, out

            state, outs = jax.lax.scan(body_scaled, state, (rows, scales))
            return outs, state

        def body(st, row):
            out, st2 = capture_step(_to_complex(row), st, ctl, cfg)
            return st2, out

        state, outs = jax.lax.scan(body, state, x_rows)
        return outs, state

    return jax.jit(multi)


def jit_pipeline_init(cfg: CapturePipelineConfig):
    """State built on-device inside one program (no eager complex buffers)."""
    return jax.jit(lambda: pipeline_init(cfg))
