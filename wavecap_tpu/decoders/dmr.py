"""DMR decoder: basic framing + CACH/CSBK surface (reference ``decoders/dmr.py``).

DMR is 4FSK at 4800 symbols/s like P25 C4FM (different deviation map), so
the same on-device demodulator feeds this host-side framer.  Scope
mirrors the reference's "basic DMR framing, CSBK callback" — burst sync
detection (BS/MS data & voice patterns), slot typing, and payload
extraction; voice goes to DSD/AMBE when available.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

logger = logging.getLogger(__name__)

# 48-bit DMR sync patterns (ETSI TS 102 361-1)
SYNC_PATTERNS = {
    "BS_DATA": 0xDFF57D75DF5D,
    "BS_VOICE": 0x755FD7DF75F7,
    "MS_DATA": 0xD5D7F77FD757,
    "MS_VOICE": 0x7F7D5DD57DFD,
}

DIBIT_SYMBOLS = np.array([1.0, 3.0, -1.0, -3.0], np.float32)


def _pattern_dibits(pattern: int) -> np.ndarray:
    return np.array([(pattern >> (46 - 2 * i)) & 3 for i in range(24)], np.uint8)


SYNC_DIBITS = {k: _pattern_dibits(v) for k, v in SYNC_PATTERNS.items()}
SYNC_SYMBOLS = {k: DIBIT_SYMBOLS[v] for k, v in SYNC_DIBITS.items()}

BURST_DIBITS = 144  # 288 bits per burst (incl. 48-bit sync mid-burst)
SYNC_OFFSET = 66  # sync starts at dibit 66 of the 144-dibit burst


@dataclass
class DMRBurst:
    kind: str  # BS_DATA | BS_VOICE | MS_DATA | MS_VOICE
    dibits: np.ndarray  # full 144-dibit burst
    sync_quality: float

    @property
    def payload_bits(self) -> np.ndarray:
        """196 info bits: 98 dibits surrounding the sync (no CACH)."""
        d = np.concatenate(
            [self.dibits[:SYNC_OFFSET], self.dibits[SYNC_OFFSET + 24 :]]
        )
        out = np.empty(2 * len(d), np.uint8)
        out[0::2] = (d >> 1) & 1
        out[1::2] = d & 1
        return out


class DMRDecoder:
    """Streaming soft-symbol DMR burst framer."""

    def __init__(self, sync_threshold: float = 0.75):
        self.sync_threshold = sync_threshold
        self._buf = np.zeros(0, np.float32)
        self.bursts_found = 0
        self.on_burst: Callable[[DMRBurst], None] | None = None

    def process(self, soft: np.ndarray) -> list[DMRBurst]:
        self._buf = np.concatenate([self._buf, np.asarray(soft, np.float32)])
        out: list[DMRBurst] = []
        while True:
            n = len(self._buf)
            if n < BURST_DIBITS:
                break
            win = np.lib.stride_tricks.sliding_window_view(self._buf, 24)
            energies = np.einsum("ij,ij->i", win, win)
            best_kind, best_off, best_q = None, -1, 0.0
            for kind, sym in SYNC_SYMBOLS.items():
                nc = (win @ sym) / np.sqrt(
                    np.maximum(energies * float(sym @ sym), 1e-12)
                )
                hits = np.nonzero(nc > self.sync_threshold)[0]
                if len(hits) and (best_off < 0 or hits[0] < best_off):
                    best_kind, best_off, best_q = kind, int(hits[0]), float(nc[hits[0]])
            if best_off < 0:
                keep = BURST_DIBITS
                if n > keep:
                    self._buf = self._buf[-keep:]
                break
            start = best_off - SYNC_OFFSET
            if start < 0:
                self._buf = self._buf[best_off + 1 :]
                continue
            if n - start < BURST_DIBITS:
                self._buf = self._buf[start:]
                break
            soft_burst = self._buf[start : start + BURST_DIBITS]
            pos = soft_burst >= 0
            outer = np.abs(soft_burst) >= 2.0
            dibits = np.where(pos, np.where(outer, 1, 0), np.where(outer, 3, 2)).astype(
                np.uint8
            )
            burst = DMRBurst(kind=best_kind, dibits=dibits, sync_quality=best_q)
            self.bursts_found += 1
            if self.on_burst:
                self.on_burst(burst)
            out.append(burst)
            self._buf = self._buf[start + BURST_DIBITS :]
        return out


def build_test_burst(kind: str = "BS_DATA", rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng(0)
    d = rng.integers(0, 4, BURST_DIBITS).astype(np.uint8)
    d[SYNC_OFFSET : SYNC_OFFSET + 24] = SYNC_DIBITS[kind]
    return d
