"""Host-side capture runtime: device reads -> jitted block pipeline -> fan-out.

Behavioral port of the reference capture engine (reference ``capture.py``:
``Capture`` :1810, ``Channel`` :505, ``CaptureManager`` :3340,
``_run_thread`` :2925) redesigned around the TPU block pipeline:

  * one reader thread per capture accumulates device chunks into fixed
    blocks (default 200 ms), runs the jitted ``capture_step``, and fans
    audio/spectrum/IQ out to subscribers;
  * subscribers are bounded queues with drop-oldest backpressure
    (reference ``Channel._broadcast`` :884, queue maxsize semantics);
  * overflow from the device resets all carried DSP state but keeps
    channel assignments (reference overflow contract ``capture.py:3058``);
  * channels are slots in per-mode banks; create/remove/retune only
    touches traced assignment arrays (no recompile), while adding the
    first channel of a new *mode* rebuilds the pipeline (static change);
  * per-capture health monitoring: watchdog timestamps + error counters
    (reference health monitor thread :2012 and error_tracker).
"""

from __future__ import annotations

import itertools
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from wavecap_tpu.devices.base import Device, DeviceConfig
from wavecap_tpu.utils.broadcast import FanOut
from . import pipeline as pl

logger = logging.getLogger(__name__)

WIDE_MODES = ("wbfm",)
# "dmr" rides the same 4800-baud 4FSK symbol bank as P25 C4FM (the DMR
# attachment consumes the channel's soft symbols)
P25_MODES = ("p25", "dmr")


def dsp_key(dsp: dict) -> tuple:
    """Canonical hashable form of per-channel DSP overrides (bank key part)."""
    return tuple(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in sorted(dsp.items())
    )


@dataclass
class ChannelSpec:
    """User-facing channel definition."""

    id: str
    mode: str  # wbfm | nbfm | am | sam | usb | lsb | p25 | dmr
    frequency_hz: float  # absolute RF frequency
    squelch_db: float | None = None
    name: str = ""
    # demod-config overrides (snake_case field -> value), e.g.
    # {"enable_deemphasis": False, "notch_frequencies": (1000.0,)};
    # reference api.py ChannelSettings surface
    dsp: dict = field(default_factory=dict)


@dataclass
class CaptureConfig:
    center_hz: float = 100_000_000.0
    sample_rate: int = 2_400_000
    gain_db: float | None = None
    # front-end tuning extras (reference api.py capture config: ppm
    # frequency correction, analog bandwidth, antenna port, hardware AGC)
    ppm: float = 0.0
    bandwidth_hz: float | None = None
    antenna: str | None = None
    agc: bool = False
    block_seconds: float = 0.2
    fft_size: int = 2048
    narrow_capacity: int = 8
    wide_capacity: int = 2
    p25_capacity: int = 2
    p25_modulation: str = "c4fm"  # c4fm | cqpsk
    # P25 Phase 2 TDMA voice slots (mode "p25p2"): 6000-baud H-DQPSK in a
    # second vmapped bank — Phase 2 systems run a 4800-baud FDMA control
    # channel and 6000-baud TDMA voice channels in the SAME capture
    p25p2_capacity: int = 0
    # CQPSK/LSM simulcast equalizer taps (0 = off; odd, e.g. 127):
    # analytic echo-fit MMSE ahead of the slicer for simulcast networks
    p25_equalizer_taps: int = 0
    audio_rate: int = 48_000
    channel_bandwidth: float = 25_000.0
    # > 0: fetch only this many narrow-bank audio rows per bank, selected
    # by which channels have live audio listeners (traced — listener
    # changes never recompile).  Demod/RSSI still run for every slot; this
    # gates device->host audio bytes, the dominant fetch cost at high
    # channel counts.  0 = fetch all slots' audio (small captures).
    audio_fetch_slots: int = 0
    # Host->device IQ transport format.  Remote TPU relays are upload-
    # bandwidth bound (~27 MB/s), so int16 halves the dominant cost of a
    # real-time capture vs interleaved f32; SDR front ends are <=16 bit so
    # nothing real is lost.  "f32" keeps full float fidelity for tests.
    # "i8" quarters the upload using a per-block adaptive scale (the block
    # max rides along as one f32 and is folded back on-device), i.e. the
    # same dynamic-range model as an 8-bit front end (RTL-SDR): ~42 dB
    # below the strongest in-band signal.  Right for digital-voice
    # (P25/DMR) trunking captures where upload is the real-time budget.
    # "i4" halves upload AGAIN (one byte per complex sample, adaptive
    # nibble pairs): quantization noise is white across the capture band,
    # so each narrowband channel sees only its slice (~25 dB per-channel
    # at 100 equal channels in 10 MHz — docs/perf.md); opt-in for
    # many-channel captures on upload-bound relays.
    transport: str = "i16"  # i4 | i8 | i16 | f32
    # Adaptive transport (round 5): when the measured per-batch processing
    # budget approaches realtime (congested relay link, slow hour), the
    # capture auto-degrades the IQ transport one step down the
    # i16 -> i8 -> i4 ladder and recovers when the link clears, instead of
    # falling behind and overflowing at a statically configured width.
    # The configured ``transport`` is the FIDELITY CEILING — adaptation
    # only ever steps below it, and an explicit "f32" ceiling disables
    # adaptation entirely (test/measurement fidelity stays exact).
    # Switching costs one cached jit retrace (the block program is
    # polymorphic over the batch pytree); no pipeline rebuild, no DSP
    # state reset.  Reference analog: adaptive FFT FPS under load
    # (reference capture.py:3144).
    adaptive_transport: bool = True
    # Software pipeline depth: 1 overlaps the host fetch of block k-1 with
    # the upload+compute of block k (jax dispatch is async), hiding the
    # device round trip when the stream keeps up.  0 = fully synchronous.
    pipeline_depth: int = 1
    # Blocks per device dispatch (lax.scan inside one jitted program).
    # >1 amortizes the fixed relay round trip for throughput-bound offline
    # runs at the cost of latency; real-time captures should keep 1.
    blocks_per_dispatch: int = 1
    # OpenWebRX-style scheduled restart (reference capture.py:1989,
    # disabled by default): > 0 restarts the capture every N seconds to
    # clear slow driver leaks on always-on deployments.  Does not count
    # against the health monitor's restart caps.
    restart_interval_s: float = 0.0
    # Multi-chip backend: a mesh spec like "stream=1,time=8" runs this
    # capture's block step through the sharded grid
    # (parallel/sharded.py: ppermute halo channelizer + all_to_all
    # channel-parallel demod) over jax.devices().  Mesh captures
    # demodulate every channelizer bin; analog modes mix freely (per-bin
    # bank select), wide (WBFM) slots ride a raw-stream stage, and the
    # p25 family (soft symbols out; capacities > 0 required at creation
    # for symbol-commensurate block geometry) rides the grid's
    # own-output soft banks — round 5: ANY mode mix runs in one capture.
    # None = single-chip slot-bank program (capture/pipeline.py).
    mesh: str | None = None


class ChannelHandle:
    """Host-side channel: slot routing + audio subscriber fan-out."""

    def __init__(self, spec: ChannelSpec, mode_group: str, slot: int):
        self.spec = spec
        self.mode_group = mode_group  # "wide", "p25", or (mode, dsp_key)
        self.slot = slot
        self.audio = FanOut(maxsize=32)
        self.symbols = FanOut(maxsize=32)  # P25 soft-symbol batches
        self.baseband = FanOut(maxsize=16)  # wide pre-MPX discriminator
        self.rssi_db: float = -200.0
        self.rssi_history: list = []  # (time, rssi) ring, ~5 min at 5 Hz
        self.state = "active"

    def record_rssi(self, rssi: float, now: float) -> None:
        self.rssi_db = rssi
        h = self.rssi_history
        if not h or now - h[-1][0] >= 1.0:
            h.append((round(now, 1), round(rssi, 1)))
            if len(h) > 300:
                del h[: len(h) - 300]

    @property
    def id(self) -> str:
        return self.spec.id


class Capture:
    """One device stream + its block pipeline."""

    _ids = itertools.count(1)

    def __init__(self, device: Device, config: CaptureConfig, capture_id: str | None = None):
        self.id = capture_id or f"cap{next(self._ids)}"
        self.device = device
        self.config = config
        self.state = "created"  # created|starting|running|stopped|failed
        self.error: str | None = None

        self.channels: dict[str, ChannelHandle] = {}
        self.iq_subs = FanOut(maxsize=8)
        self.spectrum_subs = FanOut(maxsize=8)
        # Last published frame, so REST snapshots answer instantly even while
        # a bank-change recompile stalls the block loop (previously they hung
        # up to 10 s waiting for the NEXT frame).
        self.last_spectrum: np.ndarray | None = None

        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._jit_step: Callable | None = None
        self._pipe_cfg: pl.CapturePipelineConfig | None = None
        self._dev_state = None
        self._pipe_gen = 0
        self._ctl = None
        self._ctl_dirty = True
        self._retune_pending = False
        # in-flight dispatched batches: (out, blocks, channels, t0).
        # A dedicated fetch thread drains this so the device->host fetch of
        # batch k-1 overlaps the host->device upload of batch k (both ride
        # the same relay link but different directions); serializing them in
        # the capture thread was the real-time bottleneck for small captures.
        self._pending: deque = deque()
        self._pend_cv = threading.Condition()
        self._fetching = 0  # batches popped by the fetch thread, not yet done
        self._fetch_thread: threading.Thread | None = None
        self._wide_baseband = False
        self._audio_fp: frozenset = frozenset()
        self._audio_pos: dict = {}
        # adaptive transport (see CaptureConfig.adaptive_transport):
        # transport_active is the width actually used for the next batch
        self.transport_active: str = config.transport
        self._adapt_ema = 0.0  # EMA of busy/budget load ratio
        self._adapt_good = 0  # consecutive low-load batches at degraded width
        self._last_fetch_busy_ms = 0.0  # fetch-thread cost of the last batch
        # test/simulation hook: when set, _dispatch_blocks sleeps
        # nbytes/bps after conversion, emulating a congested upload link
        self._upload_throttle_bps: float | None = None
        # adaptation only makes sense for a source that paces in real
        # time: a non-realtime source (fake tests, file replay, offline
        # decode) routinely runs busy>budget without anything "falling
        # behind", and degrading there just churns retraces.  Set from
        # the stream's own declaration at start (_run).
        self._stream_realtime = True
        # driver-service recovery escalation (set by the CaptureManager)
        self.recovery = None

        # channel-activity classifier fed from every spectrum frame
        # (reference capture.py:2399 -> channel_classifier.py)
        from wavecap_tpu.capture.classifier import ChannelClassifier

        self.classifier = ChannelClassifier(
            config.center_hz, config.sample_rate, config.fft_size
        )

        # metrics
        self.blocks_processed = 0
        self.overflow_count = 0
        self.last_block_time: float = 0.0
        self.block_ms: float = 0.0
        # per-stage wall-time accumulators (ms totals + dispatch count),
        # exposed via status()["perf"] and GET /debug/perf — the host-side
        # analog of the reference's rolling loop/dsp/fft timings
        # (reference capture.py:1866-1905)
        self.perf: dict[str, float] = {}

        # health monitoring (reference capture.py:2012-2151)
        self.startup_timeout_s = 120.0
        self.watchdog_timeout_s = 30.0
        # bound on device.configure + start_stream: a driver hang (SDRplay
        # service wedge is the canonical case, reference sdrplay_recovery)
        # leaves the thread stuck in a C call — the watchdog can't kill it,
        # but it CAN restart the capture and, once restarts are exhausted,
        # escalate to the driver-service recovery that actually clears it
        self.device_open_timeout_s = 30.0
        # first dispatch of a freshly built program compiles synchronously;
        # remote TPU compiles can take many minutes, so the stall watchdog
        # must not fire during them (it would restart into a recompile loop)
        self.compile_timeout_s = 900.0
        self._compiling = False
        self._compile_started = 0.0
        self._program_warm = False
        self.auto_restart = True
        self.restart_count = 0
        self.max_restarts_per_hour = 6
        self._restart_times: list[float] = []
        self._health_thread: threading.Thread | None = None
        self._started_at = 0.0
        # owner intent: True between start() and stop(); health-monitor
        # restarts may only run while this holds
        self._desired_running = False
        # incremented on every start(): a reader thread that was hung in a
        # driver C call past the stop() join timeout must exit (not race
        # the replacement thread) if it ever wakes up
        self._gen = 0

        self._compute_block_size()

    # -- geometry ---------------------------------------------------------

    def _compute_block_size(self) -> None:
        cfg = self.config
        ch = pl.ChannelizerConfig(
            sample_rate=float(cfg.sample_rate), channel_bandwidth=cfg.channel_bandwidth
        )
        m = ch.channel_count
        decim = max(1, int(cfg.sample_rate) // pl.WIDE_RATE)
        unit = int(np.lcm(m, decim))
        if cfg.p25_capacity > 0 or cfg.p25p2_capacity > 0:
            # whole symbols per block: device samples n map to
            # n*symbol_rate/fs symbols at the channelized rate — keep that
            # integral or the demod slips a symbol every few blocks
            # (channel rates like 50.526 kHz are not symbol-commensurate)
            from math import gcd

            for sym_rate in (4800, 6000):  # C4FM / Phase 2 H-DQPSK
                unit = int(np.lcm(unit, cfg.sample_rate // gcd(int(cfg.sample_rate), sym_rate)))
        min_block = unit
        if cfg.mesh:
            from wavecap_tpu.capture.mesh import parse_mesh_spec

            n_time = parse_mesh_spec(cfg.mesh)["time"]
            # each time shard channelizes a whole number of M-sample
            # steps, and its local block must cover the M*T halo history
            unit = int(np.lcm(unit, m * n_time))
            min_block = -(-(m * ch.taps_per_channel * n_time) // unit) * unit
        n = int(round(cfg.sample_rate * cfg.block_seconds))
        self.block_size = max(min_block, unit, (n // unit) * unit)
        self._channelizer = ch
        self._mesh = None  # built lazily on first mesh program rebuild

    # -- channel management ----------------------------------------------

    def _mode_group(self, mode: str) -> str:
        m = mode.lower()
        if m in WIDE_MODES:
            return "wide"
        if m == "p25p2":  # Phase 2 TDMA voice: 6000-baud H-DQPSK bank
            return "p25p2"
        if m in P25_MODES:
            return "p25"
        return m

    def _group_for(self, spec: ChannelSpec):
        """Bank group key: "wide", "p25", "p25p2", or (mode, dsp_key) for
        narrow channels — same (mode, DSP overrides) share one vmapped
        bank."""
        g = self._mode_group(spec.mode)
        if g == "wide":
            # per-channel wide DSP (round 4): like narrow banks, wide
            # channels sharing (mode, overrides) share one vmapped group —
            # reference per-channel ChannelSettings semantics
            self._validate_dsp("wbfm", spec.dsp)
            return ("wide", dsp_key(spec.dsp))
        if g in ("p25", "p25p2"):
            if spec.dsp:
                raise ValueError(f"dsp options not supported for {spec.mode}")
            return g
        from wavecap_tpu.models.registry import get_demod

        get_demod(g)  # unknown narrow modes fail here, before slotting
        self._validate_dsp(g, spec.dsp)
        return (g, dsp_key(spec.dsp))

    @staticmethod
    def _validate_dsp(mode: str, dsp: dict) -> None:
        if not dsp:
            return
        import dataclasses

        from wavecap_tpu.models.registry import get_demod

        cfg_cls = (
            pl.models.WbfmConfig if mode == "wbfm" else get_demod(mode).config_cls
        )
        allowed = {f.name for f in dataclasses.fields(cfg_cls)} - {
            "sample_rate",
            "audio_rate",
            "mode",
        }
        bad = set(dsp) - allowed
        if bad:
            raise ValueError(
                f"unknown dsp option(s) for {mode}: {sorted(bad)}; "
                f"allowed: {sorted(allowed)}"
            )

    def _alloc_slot(self, group, exclude_id: str | None = None) -> int:
        if isinstance(group, tuple) and group[0] == "wide":
            cap = self.config.wide_capacity
        elif group == "p25":
            cap = self.config.p25_capacity
        elif group == "p25p2":
            cap = self.config.p25p2_capacity
        else:
            cap = self.config.narrow_capacity
        used = {
            c.slot
            for c in self.channels.values()
            if c.mode_group == group and c.spec.id != exclude_id
        }
        free = [s for s in range(cap) if s not in used]
        if not free:
            name = group if isinstance(group, str) else group[0]
            raise RuntimeError(f"no free {name} slots (capacity {cap})")
        return free[0]

    def _mesh_bin(self, spec: ChannelSpec, exclude_id: str | None = None) -> int:
        """Mesh-backend slot = channelizer bin index for the frequency.

        Channels at the SAME frequency may share a bin (both handles read
        the one demodulated stream — how mesh trunking parks idle voice
        slots on the control channel); two different frequencies mapping
        to one bin would need different fine offsets the per-bin control
        cannot hold, so that collision is rejected."""
        off = spec.frequency_hz - self.config.center_hz
        bin_idx = self._channelizer.channel_index(off)
        for c in self.channels.values():
            if (
                c.spec.id != exclude_id
                and not self._is_wide(c.mode_group)  # wide slots aren't bins
                and c.slot == bin_idx
                and c.spec.frequency_hz != spec.frequency_hz
            ):
                raise ValueError(
                    f"channelizer bin {bin_idx} already carries channel "
                    f"{c.spec.id!r} at {c.spec.frequency_hz} Hz (mesh "
                    f"backend: one frequency per bin)"
                )
        return bin_idx

    def _check_mesh_group(self, group, exclude_id: str | None = None) -> None:
        if group == "p25p2" and self.config.p25p2_capacity <= 0:
            raise ValueError(
                "mesh p25p2 channels need p25p2_capacity > 0 at creation "
                "(enables the dual-rate grid)"
            )
        # Round 5: no mode-mix exclusions remain — any combination of
        # narrow analog (mode, dsp) groups, wide groups, p25 (4800) and
        # p25p2 (6000) runs in one mesh capture: analog banks are the
        # grid's base (per-bin bank_idx selects) and the soft-symbol
        # banks ride the grid's own-output bank tuple
        # (parallel/sharded.py modes2); block geometry is the lcm of the
        # audio and symbol constraints (_compute_block_size).
        p25_family = {"p25", "p25p2"}
        if group in p25_family and self.config.p25_capacity <= 0:
            # block geometry must be symbol-commensurate, and that is
            # decided at capture creation from p25_capacity (single-chip
            # has the same capacity-at-creation contract)
            raise ValueError(
                "mesh p25 channels need p25_capacity > 0 at capture creation"
            )

    def create_channel(self, spec: ChannelSpec) -> ChannelHandle:
        with self._lock:
            if spec.id in self.channels:
                raise ValueError(f"channel {spec.id!r} exists")
            group = self._group_for(spec)
            off = spec.frequency_hz - self.config.center_hz
            half = self.config.sample_rate / 2
            if not (-half < off < half):
                raise ValueError(
                    f"frequency {spec.frequency_hz} outside capture span"
                )
            if self.config.mesh:
                self._check_mesh_group(group)
                # wide mesh channels use slot-bank-style slots (they run
                # off the raw stream, not the bin grid)
                slot = (
                    self._alloc_slot(group)
                    if self._is_wide(group)
                    else self._mesh_bin(spec)
                )
            else:
                slot = self._alloc_slot(group)
            ch = ChannelHandle(spec, group, slot)
            self.channels[spec.id] = ch
            self._rebuild_pipeline_if_needed()
            self._ctl_dirty = True
            return ch

    def remove_channel(self, channel_id: str) -> None:
        with self._lock:
            self.channels.pop(channel_id, None)
            self._ctl_dirty = True

    def update_channel(self, channel_id: str, **kwargs) -> ChannelHandle:
        with self._lock:
            ch = self.channels[channel_id]
            freq = kwargs.get("frequency_hz")
            if freq is not None:
                # Same span check as create_channel: channel_index wraps
                # modulo bank size, so an out-of-span retune would silently
                # alias onto a wrong in-band frequency.
                off = float(freq) - self.config.center_hz
                half = self.config.sample_rate / 2
                if not (-half < off < half):
                    raise ValueError(f"frequency {freq} outside capture span")
            new_mode = kwargs.pop("mode", None)
            dsp_patch = kwargs.pop("dsp", None)
            if new_mode is not None or dsp_patch is not None:
                # mode / DSP-settings change: re-slot into the target bank
                # group (static change -> one pipeline rebuild); None values
                # in the patch remove that override
                cand_dsp = dict(ch.spec.dsp)
                if dsp_patch is not None:
                    for k, v in dsp_patch.items():
                        if v is None:
                            cand_dsp.pop(k, None)
                        else:
                            cand_dsp[k] = tuple(v) if isinstance(v, list) else v
                cand = ChannelSpec(
                    id=ch.spec.id,
                    mode=new_mode or ch.spec.mode,
                    frequency_hz=ch.spec.frequency_hz,
                    dsp=cand_dsp,
                )
                group = self._group_for(cand)  # validates mode + dsp
                if self.config.mesh:
                    self._check_mesh_group(group, exclude_id=ch.spec.id)
                    if self._is_wide(group) != self._is_wide(ch.mode_group):
                        # wide <-> narrow flip changes slot semantics
                        # (wide slot index vs channelizer bin)
                        ch.slot = (
                            self._alloc_slot(group, exclude_id=ch.spec.id)
                            if self._is_wide(group)
                            else self._mesh_bin(ch.spec, exclude_id=ch.spec.id)
                        )
                    ch.mode_group = group
                elif group != ch.mode_group:
                    ch.slot = self._alloc_slot(group, exclude_id=ch.spec.id)
                    ch.mode_group = group
                ch.spec.mode = cand.mode
                ch.spec.dsp = cand_dsp
            for k, v in kwargs.items():
                if k == "squelch_db":
                    ch.spec.squelch_db = v  # explicit None = open squelch
                elif v is not None and hasattr(ch.spec, k):
                    setattr(ch.spec, k, v)
            if (
                self.config.mesh
                and freq is not None
                and not self._is_wide(ch.mode_group)
            ):
                # retune re-bins the channel on the grid (wide mesh slots
                # retune via their traced offset, no re-binning)
                ch.slot = self._mesh_bin(ch.spec, exclude_id=ch.spec.id)
            self._rebuild_pipeline_if_needed()
            self._ctl_dirty = True
            return ch

    def update_config(
        self,
        center_hz: float | None = None,
        gain_db: float | None = None,
        sample_rate: int | None = None,
        ppm: float | None = None,
        bandwidth_hz: float | None = None,
        antenna: str | None = None,
        agc: bool | None = None,
    ) -> None:
        """Retune the capture (reference ``api.py`` update_capture).

        Center/gain/ppm/bandwidth/antenna/AGC changes retune the running
        device live (the reader thread calls ``device.configure`` between
        reads — no stream teardown, so scanner retunes take one block, not
        a restart).  A sample-rate change rebuilds block geometry and must
        restart."""
        rate_change = (
            sample_rate is not None and int(sample_rate) != self.config.sample_rate
        )
        fe_change = False  # front-end-only knobs: live reconfigure
        if ppm is not None:
            self.config.ppm = float(ppm)
            fe_change = True
        if bandwidth_hz is not None:
            self.config.bandwidth_hz = float(bandwidth_hz) or None
            fe_change = True
        if antenna is not None:
            self.config.antenna = antenna or None
            fe_change = True
        if agc is not None:
            self.config.agc = bool(agc)
            fe_change = True
        was_running = self.state == "running"
        if was_running and rate_change:
            self.stop()
        if center_hz is not None:
            self.config.center_hz = float(center_hz)
        if gain_db is not None:
            self.config.gain_db = float(gain_db)
        if rate_change:
            assert sample_rate is not None
            self.config.sample_rate = int(sample_rate)
            # Recompute block geometry (block_size, channelizer bin spacing)
            # for the new rate BEFORE the pipeline rebuild, or channel offsets
            # map through stale bin spacing and P25 blocks slip symbols.
            self._compute_block_size()
            self._pipe_cfg = None  # block size changes: full rebuild
        if center_hz is not None or rate_change:
            from wavecap_tpu.capture.classifier import ChannelClassifier

            self.classifier = ChannelClassifier(
                self.config.center_hz, self.config.sample_rate, self.config.fft_size
            )
            # The cached snapshot frame is from the OLD frequency/rate; serving
            # it labeled with the new centerHz would lie to the client.
            self.last_spectrum = None
        self._ctl_dirty = True
        if was_running and rate_change:
            self.start()
        elif self.state == "running" and (
            center_hz is not None or gain_db is not None or fe_change
        ):
            self._retune_pending = True

    # -- pipeline build ----------------------------------------------------

    @staticmethod
    def _is_wide(group) -> bool:
        return isinstance(group, tuple) and group[0] == "wide"

    @property
    def _audio_gated(self) -> bool:
        # the mesh grid has no row-gated audio fetch (bins are fetched
        # wholesale); gating is a slot-bank-program feature
        if self.config.mesh:
            return False
        return 0 < self.config.audio_fetch_slots < self.config.narrow_capacity

    def _narrow_modes(self) -> tuple:
        return tuple(
            sorted(
                {
                    c.mode_group
                    for c in self.channels.values()
                    if c.mode_group not in ("p25", "p25p2")
                    and not self._is_wide(c.mode_group)
                }
            )
        )

    def _wide_groups(self) -> tuple:
        """Distinct wide DSP-override sets present (one vmapped group
        each; reference per-channel ChannelSettings semantics)."""
        return tuple(
            sorted(
                {
                    c.mode_group[1]
                    for c in self.channels.values()
                    if self._is_wide(c.mode_group)
                }
            )
        )

    def enable_wide_baseband(self) -> None:
        """Turn on the 240 kHz pre-MPX baseband export for wide slots
        (RDS consumers); triggers a pipeline rebuild on the next block."""
        if not self._wide_baseband:
            with self._lock:
                self._wide_baseband = True
                self._rebuild_pipeline_if_needed()
                self._ctl_dirty = True

    def _make_pipe_cfg(self) -> pl.CapturePipelineConfig:
        cfg = self.config
        groups = {c.mode_group for c in self.channels.values()}
        wide_groups = self._wide_groups()
        # Only compile/run the bank types that have channels: an idle
        # capture costs just the FFT, and the first wbfm/p25 channel
        # triggers one recompile (same contract as narrow modes).
        return pl.CapturePipelineConfig(
            sample_rate=cfg.sample_rate,
            block_size=self.block_size,
            fft_size=cfg.fft_size,
            narrow_modes=self._narrow_modes(),
            narrow_capacity=cfg.narrow_capacity,
            channel_bandwidth=cfg.channel_bandwidth,
            wide_capacity=cfg.wide_capacity if wide_groups else 0,
            p25_capacity=cfg.p25_capacity if "p25" in groups else 0,
            p25_modulation=cfg.p25_modulation,
            p25_equalizer_taps=cfg.p25_equalizer_taps,
            p25p2_capacity=cfg.p25p2_capacity if "p25p2" in groups else 0,
            audio_rate=cfg.audio_rate,
            export_wide_baseband=self._wide_baseband and bool(wide_groups),
            wide_groups=wide_groups,
            audio_fetch_slots=cfg.audio_fetch_slots,
        )

    def _rebuild_pipeline_if_needed(self) -> None:
        new_cfg = self._make_pipe_cfg()
        if new_cfg != self._pipe_cfg:
            self._flush_pending()
            self._pipe_cfg = new_cfg
            if self.config.mesh and (
                new_cfg.narrow_modes
                or new_cfg.p25_capacity
                or new_cfg.wide_groups
            ):
                from wavecap_tpu.capture import mesh as mesh_mod

                if self._mesh is None:
                    self._mesh = mesh_mod.build_mesh(self.config.mesh)
                entry = (
                    new_cfg.narrow_modes[0]
                    if new_cfg.narrow_modes
                    else ("p25" if new_cfg.p25_capacity else None)
                )
                self._jit_step = mesh_mod.jit_mesh_capture_multi(
                    new_cfg,
                    max(1, self.config.blocks_per_dispatch),
                    self._mesh,
                    entry,
                )
                self._init_state = mesh_mod.jit_mesh_init(
                    new_cfg, entry, self._mesh
                )
            else:
                self._jit_step = pl.jit_capture_multi(
                    new_cfg, max(1, self.config.blocks_per_dispatch)
                )
                self._init_state = pl.jit_pipeline_init(new_cfg)
            self._dev_state = self._init_state()
            # Tag the state with the program that produced it: an in-flight
            # dispatch snapshot from the OLD program must not write its
            # output state back over this fresh one (the structures differ —
            # e.g. a bank mode that only exists in the new config).
            self._pipe_gen += 1
            self._program_warm = False

    def _build_control(self) -> Any:
        assert self._pipe_cfg is not None
        cfg = self._pipe_cfg
        if self.config.mesh and (
            cfg.narrow_modes or cfg.p25_capacity or cfg.wide_groups
        ):
            from wavecap_tpu.capture import mesh as mesh_mod

            groups = set(cfg.narrow_modes) | {
                ("wide", g) for g in cfg.wide_groups
            }
            if cfg.p25_capacity or cfg.p25p2_capacity:
                # p25 bins ride the grid too — as the base bank (p25-only
                # capture) or the second output (mixed with analog)
                groups |= {"p25", "p25p2"}
            chans = [
                c for c in self.channels.values() if c.mode_group in groups
            ]
            return mesh_mod.mesh_control(cfg, chans, self.config.center_hz)
        ctl = pl.control_init(cfg)
        ch_cfg = self._channelizer
        wide_arrays = {
            g: dict(
                off=[0.0] * cfg.wide_capacity,
                act=[False] * cfg.wide_capacity,
                sq=[-1e9] * cfg.wide_capacity,
            )
            for g in cfg.wide_groups
        }
        bank_arrays = {
            m: dict(
                idx=np.zeros(cfg.narrow_capacity, np.int32),
                fine=np.zeros(cfg.narrow_capacity, np.float32),
                act=np.zeros(cfg.narrow_capacity, bool),
                sq=np.full(cfg.narrow_capacity, -1e9, np.float32),
            )
            for m in cfg.narrow_modes
        }
        p25 = dict(
            idx=np.zeros(cfg.p25_capacity, np.int32),
            fine=np.zeros(cfg.p25_capacity, np.float32),
            act=np.zeros(cfg.p25_capacity, bool),
            sq=np.full(cfg.p25_capacity, -1e9, np.float32),
        )
        p25p2 = dict(
            idx=np.zeros(cfg.p25p2_capacity, np.int32),
            fine=np.zeros(cfg.p25p2_capacity, np.float32),
            act=np.zeros(cfg.p25p2_capacity, bool),
            sq=np.full(cfg.p25p2_capacity, -1e9, np.float32),
        )
        for ch in self.channels.values():
            off = ch.spec.frequency_hz - self.config.center_hz
            sq = ch.spec.squelch_db if ch.spec.squelch_db is not None else -1e9
            if ch.mode_group == "p25":
                ci = ch_cfg.channel_index(off)
                p25["idx"][ch.slot] = ci
                p25["fine"][ch.slot] = off - ch_cfg.channel_offset_hz(ci)
                p25["act"][ch.slot] = True
            elif ch.mode_group == "p25p2":
                ci = ch_cfg.channel_index(off)
                p25p2["idx"][ch.slot] = ci
                p25p2["fine"][ch.slot] = off - ch_cfg.channel_offset_hz(ci)
                p25p2["act"][ch.slot] = True
            elif self._is_wide(ch.mode_group):
                warr = wide_arrays[ch.mode_group[1]]
                warr["off"][ch.slot] = off
                warr["act"][ch.slot] = True
                warr["sq"][ch.slot] = sq
            else:
                arr = bank_arrays[ch.mode_group]
                ci = ch_cfg.channel_index(off)
                arr["idx"][ch.slot] = ci
                arr["fine"][ch.slot] = off - ch_cfg.channel_offset_hz(ci)
                arr["act"][ch.slot] = True
                arr["sq"][ch.slot] = sq
        new_banks = {
            m: pl.ChannelAssignment(
                channel_index=jnp.asarray(a["idx"]),
                fine_offset_hz=jnp.asarray(a["fine"]),
                active=jnp.asarray(a["act"]),
                squelch_db=jnp.asarray(a["sq"]),
            )
            for m, a in bank_arrays.items()
        }
        new_p25 = (
            pl.ChannelAssignment(
                channel_index=jnp.asarray(p25["idx"]),
                fine_offset_hz=jnp.asarray(p25["fine"]),
                active=jnp.asarray(p25["act"]),
                squelch_db=jnp.asarray(p25["sq"]),
            )
            if cfg.p25_capacity > 0
            else None
        )
        new_p25p2 = (
            pl.ChannelAssignment(
                channel_index=jnp.asarray(p25p2["idx"]),
                fine_offset_hz=jnp.asarray(p25p2["fine"]),
                active=jnp.asarray(p25p2["act"]),
                squelch_db=jnp.asarray(p25p2["sq"]),
            )
            if cfg.p25p2_capacity > 0
            else None
        )
        new_wide = (
            {
                g: pl.WideAssignment(
                    offset_hz=jnp.asarray(np.asarray(a["off"], np.float32)),
                    active=jnp.asarray(np.asarray(a["act"], bool)),
                    squelch_db=jnp.asarray(np.asarray(a["sq"], np.float32)),
                )
                for g, a in wide_arrays.items()
            }
            if cfg.wide_capacity > 0
            else None
        )
        k = cfg.audio_fetch_slots
        audio_sel = None
        self._audio_pos: dict = {}
        if k > 0:
            audio_sel = {}
            for m in cfg.narrow_modes:
                listeners = sorted(
                    c.slot
                    for c in self.channels.values()
                    if c.mode_group == m and c.audio.active
                )[:k]
                for pos, slot in enumerate(listeners):
                    self._audio_pos[(m, slot)] = pos
                sel = np.zeros(k, np.int32)
                sel[: len(listeners)] = listeners
                audio_sel[m] = jnp.asarray(sel)
        return pl.CaptureControl(
            banks=new_banks, wide=new_wide, p25=new_p25, p25p2=new_p25p2,
            audio_sel=audio_sel,
        )

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        self._desired_running = True
        self._start_locked()

    def _start_internal(self) -> None:
        """Health-monitor restart path: only starts if no external stop()
        landed since the restart decision (a restart must never resurrect
        a capture its owner just shut down)."""
        self._start_locked()

    def _start_locked(self) -> None:
        with self._lock:
            if not self._desired_running or self.state == "running":
                return
            self.state = "starting"
            self._stop.clear()
            self._retune_pending = False
            self._started_at = time.time()
            # a fresh stream starts at the configured fidelity ceiling
            self.transport_active = self.config.transport
            self._adapt_ema = 0.0
            self._adapt_good = 0
            self._gen += 1
            self._rebuild_pipeline_if_needed()
            # publish the attributes only AFTER .start(): a concurrent
            # stop() (health monitor vs external caller) must never join a
            # constructed-but-unstarted Thread (RuntimeError)
            t = threading.Thread(
                target=self._run, name=f"Capture-{self.id}", daemon=True
            )
            t.start()
            self._thread = t
            ft = threading.Thread(
                target=self._fetch_loop, name=f"CaptureFetch-{self.id}", daemon=True
            )
            ft.start()
            self._fetch_thread = ft
            if self._health_thread is None or not self._health_thread.is_alive():
                self._health_thread = threading.Thread(
                    target=self._health_monitor,
                    name=f"HealthMon-{self.id}",
                    daemon=True,
                )
                self._health_thread.start()

    def warmup(self) -> threading.Thread:
        """Background-compile this capture's program before ``start()``.

        Builds the jitted step for the current channel/config shape and
        pushes one zeros batch through it, so the multi-minute XLA compile
        (and the persistent-cache write, ``utils/jaxenv.py``) happens at
        boot instead of on first start — a later start reaches first
        audio without the compile stall.  No device interaction; the
        carried DSP state is rebuilt by ``start()`` as usual.  Returns
        the worker thread (joinable in tests)."""

        def _go() -> None:
            try:
                with self._lock:
                    self._rebuild_pipeline_if_needed()
                    jit_step = self._jit_step
                    state = self._dev_state
                    ctl = self._build_control()
                if jit_step is None:  # pragma: no cover - no banks configured
                    return
                n = max(1, self.config.blocks_per_dispatch)
                size = self.block_size

                def zeros_batch(transport: str) -> Any:
                    if transport == "i4":
                        return (
                            np.zeros((n, size), np.int8),
                            np.full(n, 1.0 / 7.0, np.float32),
                        )
                    if transport == "i8":
                        return (
                            np.zeros((n, size), np.int16),
                            np.full(n, 1.0 / 127.0, np.float32),
                        )
                    if transport == "i16":
                        return np.zeros((n, size), np.int32)
                    return np.zeros((n, 2 * size), np.float32)

                # adaptive transport may step down the ladder mid-stream;
                # warming those variants too means a congested-hour
                # degradation never pays a cold compile while already behind
                widths = [self.config.transport]
                if (
                    self.config.adaptive_transport
                    and self.config.transport in self._TRANSPORT_LADDER
                ):
                    i = self._TRANSPORT_LADDER.index(self.config.transport)
                    widths = list(self._TRANSPORT_LADDER[i:])
                self._compile_started = time.time()
                self._compiling = True
                try:
                    for transport in widths:
                        out, _ = jit_step(
                            jax.tree_util.tree_map(
                                jnp.asarray, zeros_batch(transport)
                            ),
                            state,
                            ctl,
                        )
                        jax.block_until_ready(out)
                finally:
                    self._compiling = False
                self._program_warm = True
            except Exception:  # pragma: no cover - warmup is best-effort
                logger.exception("capture %s warmup failed", self.id)

        t = threading.Thread(target=_go, name=f"Warmup-{self.id}", daemon=True)
        t.start()
        return t

    def _health_monitor(self) -> None:
        """Watchdog: thread death / stalled blocks -> failed (+auto restart).

        Reference semantics: startup watchdog + IQ watchdog
        (``capture.py:2012-2151``) with restart caps
        (``sdrplay_recovery`` cooldown pattern).
        """
        from wavecap_tpu.utils.observability import ERROR_TRACKER

        while not self._stop.is_set():
            time.sleep(1.0)
            if self.state not in ("running", "starting", "failed"):
                continue
            now = time.time()
            if (
                self.config.restart_interval_s > 0
                and self.state == "running"
                and self.blocks_processed > 0
                and now - self._started_at > self.config.restart_interval_s
            ):
                # scheduled restart (reference capture.py:1989): routine
                # hygiene, not a failure — no restart-cap accounting
                logger.info("capture %s scheduled restart", self.id)
                try:
                    self._do_stop()
                    self._start_internal()
                except Exception:  # pragma: no cover
                    logger.exception("scheduled restart failed")
                if not self._desired_running:
                    return
                continue
            failed = self.state == "failed"
            thread_dead = self._thread is not None and not self._thread.is_alive()
            stalled = False
            in_flight = bool(self._pending) or self._fetching > 0
            if self._compiling or (self.blocks_processed == 0 and in_flight):
                # program warm-up: the first dispatch compiles synchronously
                # and the first batch's *execution* completes on the fetch
                # thread (during which the reader is paced by the pipeline
                # limit, so no heartbeats arrive) — only a blown compile
                # budget counts as a stall until the first block lands
                stalled = (
                    now - max(self._compile_started, self.last_block_time)
                    > self.compile_timeout_s
                )
            elif self.state == "running" and self.blocks_processed == 0:
                # last_block_time doubles as a pre-dispatch heartbeat, so a
                # long first compile extends the startup window
                stalled = (
                    now - max(self._started_at, self.last_block_time)
                    > self.startup_timeout_s
                )
            elif self.state == "running" and self.blocks_processed > 0:
                stalled = now - self.last_block_time > self.watchdog_timeout_s
            elif self.state == "starting":
                # stuck inside device.configure/start_stream (reference
                # opens devices under a subprocess timeout for this reason)
                stalled = now - self._started_at > self.device_open_timeout_s
            if not (failed or thread_dead or stalled):
                continue
            reason = (
                f"failed: {self.error}"
                if failed
                else "thread died" if thread_dead else "no blocks (watchdog)"
            )
            ERROR_TRACKER.record("capture_watchdog", self.id, reason)
            logger.warning("capture %s unhealthy: %s", self.id, reason)
            self._restart_times = [t for t in self._restart_times if now - t < 3600]
            if self.auto_restart and len(self._restart_times) < self.max_restarts_per_hour:
                self._restart_times.append(now)
                self.restart_count += 1
                try:
                    self._do_stop()
                    self._start_internal()
                except Exception:
                    self.state = "failed"
                    self.error = reason
                    return
                if not self._desired_running:
                    return  # owner shut us down mid-restart: stay stopped
                continue  # keep monitoring from this thread
            # plain restarts exhausted: escalate to driver-service recovery
            # (reference sdrplay_recovery.py health monitor) before failing
            if self.recovery is not None:
                result = self.recovery.restart_service()
                ERROR_TRACKER.record(
                    "capture_recovery", self.id, f"service restart: {result}"
                )
                if result.get("ok"):
                    self._restart_times = []
                    try:
                        self._do_stop()
                        self._start_internal()
                        if not self._desired_running:
                            return
                        continue
                    except Exception:  # pragma: no cover
                        pass
            # out of options: tear the worker threads down too — a capture
            # declared failed must not keep reading the device forever
            self._do_stop()
            self.state = "failed"
            self.error = reason
            return

    def stop(self) -> None:
        with self._lock:
            # under the same lock as _start_locked: a health-monitor
            # restart in flight must observe the shutdown and stand down
            self._desired_running = False
        self._do_stop()

    def _do_stop(self) -> None:
        """Teardown without clearing owner intent (health-monitor restarts
        stop-then-start while the capture is still desired running)."""
        with self._lock:
            self._stop.set()
        with self._pend_cv:
            self._pend_cv.notify_all()
        for attr in ("_thread", "_fetch_thread"):
            t = getattr(self, attr)
            if t is not None and t is not threading.current_thread():
                try:
                    t.join(timeout=10)
                except RuntimeError:  # pragma: no cover - start/stop race
                    pass
            setattr(self, attr, None)
        self.state = "stopped"
        # A stopped capture must not serve a stale snapshot indefinitely.
        self.last_spectrum = None

    def restart(self) -> None:
        self.stop()
        self.start()

    # -- the loop ----------------------------------------------------------

    def _device_config(self) -> DeviceConfig:
        return DeviceConfig(
            center_hz=self.config.center_hz,
            sample_rate=self.config.sample_rate,
            gain_db=self.config.gain_db,
            ppm=self.config.ppm,
            bandwidth_hz=self.config.bandwidth_hz,
            antenna=self.config.antenna,
            agc=self.config.agc,
        )

    def _run(self) -> None:
        gen = self._gen
        try:
            self.device.configure(self._device_config())
            stream = self.device.start_stream()
        except Exception as e:  # pragma: no cover - device failures
            if gen == self._gen:
                self.state = "failed"
                self.error = f"device start failed: {e}"
            logger.exception("capture %s failed to start", self.id)
            return
        if gen != self._gen:
            # a watchdog restart replaced this thread while it was hung in
            # the driver open: leave the replacement alone
            stream.close()
            return
        self.state = "running"
        # real SDR streams pace in realtime (no attribute = assume so);
        # fake/file streams declare realtime=False and disable adaptation
        self._stream_realtime = bool(getattr(stream, "realtime", True))
        chunk = max(8192, self.config.sample_rate // 20)
        # chunk accumulator: a LIST of read buffers concatenated once per
        # block boundary — concatenating into one growing buffer per read
        # was O(block^2) memcpy (~240 MB/s of copies at 10 Msps)
        chunks: list[np.ndarray] = []
        pending_n = 0
        n_batch = max(1, self.config.blocks_per_dispatch)
        blocks: list[np.ndarray] = []
        try:
            while not self._stop.is_set() and gen == self._gen:
                if self._retune_pending:
                    self._retune_pending = False
                    self.device.configure(self._device_config())
                    # IQ buffered at the old frequency is stale, and the
                    # retune is a phase discontinuity: same reset contract
                    # as an overflow.
                    self._flush_pending()
                    chunks, pending_n, blocks = [], 0, []
                    if self._pipe_cfg is not None:
                        self._dev_state = self._init_state()
                samples, overflow = stream.read(chunk)
                if overflow:
                    self.overflow_count += 1
                    self._flush_pending()
                    chunks, pending_n, blocks = [], 0, []
                    if self._pipe_cfg is not None:
                        self._dev_state = self._init_state()
                    continue
                chunks.append(samples)
                pending_n += samples.size
                while pending_n >= self.block_size:
                    cat = (
                        np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
                    )
                    block = cat[: self.block_size]
                    rest = cat[self.block_size :]
                    chunks = [rest] if rest.size else []
                    pending_n = rest.size
                    blocks.append(block)
                    if len(blocks) == n_batch:
                        self._dispatch_blocks(blocks)
                        blocks = []
                if (
                    pending_n < self.block_size
                    and not blocks
                    and (
                        self._fetch_thread is None
                        or not self._fetch_thread.is_alive()
                    )
                ):
                    # no fetch thread (tests poking the loop directly):
                    # drain in-flight results inline.  With the fetch
                    # thread running this was a BLOCKING wait for every
                    # in-flight batch after each dispatch — it serialized
                    # the whole pipeline (the fetch thread already drains
                    # continuously, so waiting here adds latency, not
                    # delivery)
                    self._drain_inline()
        except Exception as e:  # pragma: no cover
            self.state = "failed"
            self.error = str(e)
            logger.exception("capture %s crashed", self.id)
        finally:
            self._flush_pending()
            stream.close()

    def _dispatch_blocks(self, blocks: list[np.ndarray]) -> None:
        """Send one batch to the device; fetch completed batches.

        With pipeline_depth=1 the fetch of batch k-1 overlaps the
        upload+compute of batch k (jax dispatch is async), hiding the
        device round trip whenever the stream can run ahead."""
        t0 = time.perf_counter()
        with self._lock:
            if self._audio_gated:
                # listener set drives which audio rows are fetched; a
                # subscribe/unsubscribe flips the traced selection (no
                # recompile)
                fp = frozenset(
                    (c.mode_group, c.slot)
                    for c in self.channels.values()
                    if c.mode_group not in ("p25", "p25p2")
                    and not self._is_wide(c.mode_group)
                    and c.audio.active
                )
                if fp != self._audio_fp:
                    self._audio_fp = fp
                    self._ctl_dirty = True
            if self._ctl_dirty or self._ctl is None:
                self._ctl = self._build_control()
                self._ctl_dirty = False
            jit_step = self._jit_step
            ctl = self._ctl
            state = self._dev_state
            pipe_gen = self._pipe_gen
            channels = list(self.channels.values())
            audio_pos = dict(getattr(self, "_audio_pos", {}))
        assert jit_step is not None
        t_conv0 = time.perf_counter()
        # Integer transports ship ONE word per complex sample (i8 pairs in
        # an int16, i16 pairs in an int32 — a free np .view of the
        # quantized interleaved bytes); the device splits I/Q with shifts
        # (see pipeline._to_complex for why not stride-2 slicing).
        transport = self.transport_active
        if transport == "i16":
            rows = [
                np.clip(
                    np.round(np.ascontiguousarray(b).view(np.float32) * 32767.0),
                    -32768,
                    32767,
                )
                .astype(np.int16)
                .view(np.int32)
                for b in blocks
            ]
            batch: Any = np.stack(rows)
        elif transport == "i8":
            f_rows = [np.ascontiguousarray(b).view(np.float32) for b in blocks]
            # peak from a stride-8 subsample: within ~0.1 dB for real IQ
            # and the clip below bounds any stragglers; the full |x| scan
            # was ~1/3 of the host conversion budget at 10 Msps
            peaks = np.array(
                [max(float(np.max(np.abs(r[::8]))), 1e-12) for r in f_rows],
                np.float32,
            )
            rows = []
            for r, p in zip(f_rows, peaks):
                q = r * np.float32(127.0 / p)
                np.rint(q, out=q)
                np.clip(q, -127, 127, out=q)
                rows.append(q.astype(np.int8).view(np.int16))
            # per-block scale folded back on-device: x_f32 = x_i8 * scale
            batch = (np.stack(rows), peaks * np.float32(1.0 / 127.0))
        elif transport == "i4":
            # adaptive 4-bit nibbles, ONE BYTE per complex sample: halves
            # the upload again vs i8.  Quantization noise is white across
            # the whole capture bandwidth, so narrowband channels see only
            # their slice of it (~25 dB per-channel at 100 equal channels
            # in 10 MHz — docs/perf.md); opt-in for upload-bound relays.
            f_rows = [np.ascontiguousarray(b).view(np.float32) for b in blocks]
            peaks = np.array(
                [max(float(np.max(np.abs(r[::8]))), 1e-12) for r in f_rows],
                np.float32,
            )
            rows = []
            for r, p in zip(f_rows, peaks):
                q = r * np.float32(7.0 / p)
                np.rint(q, out=q)
                np.clip(q, -7, 7, out=q)
                qi = q.astype(np.int8)
                rows.append((qi[1::2] << 4) | (qi[0::2] & 0x0F))
            batch = (np.stack(rows), peaks * np.float32(1.0 / 7.0))
        else:
            rows = [np.ascontiguousarray(b).view(np.float32) for b in blocks]
            batch = np.stack(rows)
        t_conv1 = time.perf_counter()
        if self._upload_throttle_bps:
            # congested-link simulation (tests/benchmarks): charge the
            # upload at the throttled byte rate so adaptation is observable
            nbytes = sum(
                a.nbytes for a in jax.tree_util.tree_leaves(batch)
            )
            time.sleep(nbytes / self._upload_throttle_bps)
        # heartbeat BEFORE dispatch: a cold jit compile (tens of seconds on
        # first block / after a mode-set change) must not trip the stall
        # watchdog and trigger a pointless restart loop
        self.last_block_time = time.time()
        warm_at_dispatch = self._program_warm
        if not self._program_warm:
            self._compile_started = time.time()
            self._compiling = True
        try:
            dev_batch = jax.tree_util.tree_map(jnp.asarray, batch)
            t_up = time.perf_counter()
            out, state = jit_step(dev_batch, state, ctl)
            t_disp = time.perf_counter()
        finally:
            self._compiling = False
            self._program_warm = True
            # heartbeat AFTER dispatch too: the fetch of this batch happens
            # on the fetch thread, so blocks_processed can stay 0 for a
            # moment after a long first compile — without this the startup
            # watchdog sees a stale last_block_time and restarts needlessly
            self.last_block_time = time.time()
        p = self.perf
        p["conv_ms"] = p.get("conv_ms", 0.0) + (t_conv1 - t_conv0) * 1e3
        p["upload_ms"] = p.get("upload_ms", 0.0) + (t_up - t_conv1) * 1e3
        p["dispatch_ms"] = p.get("dispatch_ms", 0.0) + (t_disp - t_up) * 1e3
        p["dispatches"] = p.get("dispatches", 0) + 1
        with self._lock:
            if self._pipe_gen == pipe_gen:
                self._dev_state = state
            # else: the pipeline was rebuilt while this batch was in flight;
            # its output state belongs to the old program — drop it.
        # Hand the device handles to the fetch thread; block here only when
        # more than pipeline_depth batches are already in flight (device or
        # relay can't keep up) so dispatch paces itself to the real rate.
        limit = max(0, self.config.pipeline_depth)
        t_wait0 = time.perf_counter()
        with self._pend_cv:
            self._pending.append((out, blocks, channels, audio_pos, t0))
            self._pend_cv.notify_all()
            while (
                len(self._pending) + self._fetching > limit
                and not self._stop.is_set()
                and self._fetch_thread is not None
                and self._fetch_thread.is_alive()
            ):
                self._pend_cv.wait(0.1)
        p["wait_ms"] = p.get("wait_ms", 0.0) + (time.perf_counter() - t_wait0) * 1e3
        if warm_at_dispatch:
            # compile batches are not load samples
            busy_ms = (time.perf_counter() - t0) * 1e3
            budget_ms = len(blocks) * self.block_size / self.config.sample_rate * 1e3
            self._adapt_transport(
                max(busy_ms, self._last_fetch_busy_ms), budget_ms
            )
        if self._fetch_thread is None or not self._fetch_thread.is_alive():
            self._drain_inline()

    _TRANSPORT_LADDER = ("i16", "i8", "i4")

    def _adapt_transport(self, busy_ms: float, budget_ms: float) -> None:
        """Auto-degrade/recover the IQ transport width under link pressure.

        ``busy_ms`` is the slower of the capture thread's per-batch cost
        (conv + upload + dispatch + pipeline wait) and the fetch thread's
        (device fetch + fan-out); whichever thread exceeds the realtime
        budget first is the one that makes the stream fall behind.  The
        controller keeps an EMA of the load ratio with hysteresis:

        * EMA > 0.90 -> step DOWN one width (the next batch ships fewer
          bytes; one cached retrace, no state reset);
        * predicted post-upgrade load (~2x: upload dominates and doubles
          per step) < 0.85 sustained for 40 batches -> step back UP,
          never above the configured ceiling.

        Reference analog: load-adaptive FFT FPS (capture.py:3144); here
        the lever is the dominant term — host->device bytes."""
        cfg = self.config
        if not cfg.adaptive_transport or cfg.transport not in ("i16", "i8"):
            return
        if not self._stream_realtime or budget_ms <= 0:
            return
        ladder = self._TRANSPORT_LADDER
        load = busy_ms / budget_ms
        # converge from 0 rather than seeding with the first sample: one
        # loaded batch is never enough to degrade (~9 batches at load 0.95
        # cross the 0.90 threshold), while a hard overload (load > 3)
        # still trips on the first sample
        self._adapt_ema = 0.7 * self._adapt_ema + 0.3 * load
        cur = ladder.index(self.transport_active)
        base = ladder.index(cfg.transport)
        if self._adapt_ema > 0.90 and cur < len(ladder) - 1:
            self.transport_active = ladder[cur + 1]
            self._adapt_good = 0
            self._adapt_ema = 0.0  # fresh window at the new width
            logger.warning(
                "capture %s: load %.2f of realtime — degrading transport to %s",
                self.id,
                load,
                self.transport_active,
            )
        elif cur > base and self._adapt_ema * 2.0 < 0.85:
            self._adapt_good += 1
            if self._adapt_good >= 40:
                self.transport_active = ladder[cur - 1]
                self._adapt_good = 0
                self._adapt_ema = 0.0
                logger.info(
                    "capture %s: link recovered — transport back to %s",
                    self.id,
                    self.transport_active,
                )
        else:
            self._adapt_good = 0

    def _fetch_loop(self) -> None:
        """Drain dispatched batches: device fetch + host fan-out.

        Runs concurrently with the capture thread's uploads; a single
        consumer keeps publish order FIFO."""
        while True:
            with self._pend_cv:
                while not self._pending:
                    if self._stop.is_set():
                        return
                    self._pend_cv.wait(0.2)
                item = self._pending.popleft()
                self._fetching += 1
                self._pend_cv.notify_all()
            try:
                self._finish_batch(item)
            except Exception:  # pragma: no cover
                logger.exception("capture %s fetch failed", self.id)
                self.state = "failed"
                self.error = "fetch failed"
            finally:
                with self._pend_cv:
                    self._fetching -= 1
                    self._pend_cv.notify_all()

    def _drain_inline(self) -> None:
        """Synchronous drain for callers without a fetch thread (tests that
        poke _dispatch_blocks directly)."""
        while True:
            with self._pend_cv:
                if not self._pending:
                    return
                item = self._pending.popleft()
            self._finish_batch(item)

    def _flush_pending(self) -> None:
        """Wait until every dispatched batch has been fetched and fanned out."""
        if self._fetch_thread is None or not self._fetch_thread.is_alive():
            self._drain_inline()
            return
        with self._pend_cv:
            while self._pending or self._fetching:
                self._pend_cv.wait(0.1)

    def _finish_batch(self, item) -> None:
        """Fetch one in-flight batch (single packed transfer) and fan out."""
        out, blocks, channels, audio_pos, t0 = item
        import jax as _jax

        n = len(blocks)
        t_f0 = time.perf_counter()
        unpacked = dict(out)
        packed_dev = unpacked.pop("_packed", None)
        if packed_dev is not None:
            # wait for upload+compute with a sleep poll BEFORE the blocking
            # fetch: np.asarray on a not-yet-ready jax Array holds the GIL
            # for the whole device wait, starving the reader/conv thread
            # (measured: the capture thread lost ~700 ms/s to this at
            # 10 Msps).  is_ready() + sleep releases the GIL; the final
            # asarray then only pays the actual transfer.
            is_ready = getattr(packed_dev, "is_ready", None)
            if is_ready is not None:
                while not packed_dev.is_ready():
                    if self._stop.is_set():
                        break
                    time.sleep(0.002)
            flat = np.asarray(packed_dev).reshape(n, -1)
            out = pl.unpack_wire(unpacked, flat)
        else:  # pragma: no cover - packing always on in capture_step
            out = _jax.tree_util.tree_map(np.asarray, unpacked)
        t_f1 = time.perf_counter()
        now = time.time()
        for b in range(n):
            spec = np.asarray(out["spectrum"][b])
            self.last_spectrum = spec
            self.spectrum_subs.publish(spec)
            self.classifier.update(spec)
            if self.iq_subs.active:
                self.iq_subs.publish(blocks[b])
            for ch in channels:
                if ch.state == "stopped":
                    # per-channel stop (reference POST /channels/{id}/stop):
                    # slot keeps running traced, host just stops publishing
                    continue
                if ch.mode_group in ("p25", "p25p2"):
                    grp = out.get(ch.mode_group)
                    if grp is None:
                        continue
                    ch.record_rssi(float(grp["rssi"][b][ch.slot]), now)
                    ch.symbols.publish(
                        {
                            "soft": grp["soft"][b][ch.slot],
                            "rssi": ch.rssi_db,
                        }
                    )
                    continue
                if self._is_wide(ch.mode_group):
                    grp = (out.get("wide") or {}).get(ch.mode_group[1])
                elif self.config.mesh:
                    # the mesh grid emits ONE bank (per-bin bank_idx
                    # already selected each bin's mode on device)
                    grp = next(iter(out["banks"].values()), None)
                else:
                    grp = out["banks"].get(ch.mode_group)
                if grp is None:
                    continue
                ch.record_rssi(float(grp["rssi"][b][ch.slot]), now)
                if self._audio_gated and not self._is_wide(ch.mode_group):
                    # gated audio: only listener-selected rows were fetched
                    pos = audio_pos.get((ch.mode_group, ch.slot))
                    if pos is not None:
                        ch.audio.publish(grp["audio"][b][pos])
                else:
                    ch.audio.publish(grp["audio"][b][ch.slot])
                if "baseband" in grp and ch.baseband.active:
                    ch.baseband.publish(grp["baseband"][b][ch.slot])
        self.blocks_processed += n
        self.last_block_time = time.time()
        self.block_ms = (time.perf_counter() - t0) * 1e3 / n
        p = self.perf
        p["fetch_ms"] = p.get("fetch_ms", 0.0) + (t_f1 - t_f0) * 1e3
        p["fanout_ms"] = p.get("fanout_ms", 0.0) + (time.perf_counter() - t_f1) * 1e3
        # feed the adaptive-transport controller the fetch thread's cost
        self._last_fetch_busy_ms = (time.perf_counter() - t_f0) * 1e3

    # -- info --------------------------------------------------------------

    def status(self) -> dict:
        return {
            "id": self.id,
            "state": self.state,
            "error": self.error,
            "centerHz": self.config.center_hz,
            "sampleRate": self.config.sample_rate,
            "gainDb": self.config.gain_db,
            "ppm": self.config.ppm,
            "bandwidthHz": self.config.bandwidth_hz,
            "antenna": self.config.antenna,
            "agc": self.config.agc,
            "blockSize": self.block_size,
            "mesh": self.config.mesh,
            "blocksProcessed": self.blocks_processed,
            "overflowCount": self.overflow_count,
            "blockMs": round(self.block_ms, 2),
            "transport": self.config.transport,
            "transportActive": self.transport_active,
            "perf": {k: round(v, 1) for k, v in self.perf.items()},
            "channels": [
                {
                    "id": c.id,
                    "mode": c.spec.mode,
                    "frequencyHz": c.spec.frequency_hz,
                    "rssiDb": round(c.rssi_db, 1),
                    "name": c.spec.name,
                    "squelchDb": c.spec.squelch_db,
                    "state": c.state,
                    "dsp": {
                        k: list(v) if isinstance(v, tuple) else v
                        for k, v in c.spec.dsp.items()
                    },
                }
                for c in self.channels.values()
            ],
        }


class CaptureManager:
    """Create/start/stop captures over a device driver (reference :3340)."""

    def __init__(self, driver, max_captures: int = 4, recovery=None):
        self.driver = driver
        self.max_captures = max_captures
        self.captures: dict[str, Capture] = {}
        # shared ServiceRecovery for driver-level escalation (cooldown +
        # hourly caps live in the policy, so sharing one is what you want)
        self.recovery = recovery
        self._lock = threading.RLock()

    def list_devices(self):
        return self.driver.enumerate()

    def create_capture(
        self,
        device_id: str | None = None,
        config: CaptureConfig | None = None,
        capture_id: str | None = None,
    ) -> Capture:
        with self._lock:
            if len(self.captures) >= self.max_captures:
                raise RuntimeError(f"capture limit {self.max_captures} reached")
            if capture_id is not None and capture_id in self.captures:
                raise RuntimeError(f"capture {capture_id!r} exists")
            devices = self.driver.enumerate()
            if not devices:
                raise RuntimeError("no devices")
            dev_id = device_id or devices[0].id
            device = self.driver.open(dev_id)
            cap = Capture(device, config or CaptureConfig(), capture_id)
            cap.recovery = self.recovery
            self.captures[cap.id] = cap
            return cap

    def get(self, capture_id: str) -> Capture:
        return self.captures[capture_id]

    def remove_capture(self, capture_id: str) -> None:
        with self._lock:
            cap = self.captures.pop(capture_id, None)
        if cap:
            cap.stop()
            cap.device.close()

    def stop_all(self) -> None:
        for cap in list(self.captures.values()):
            cap.stop()
