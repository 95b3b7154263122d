"""Dominant-NAC tracking + BCH decode assist (reference
``decoders/nac_tracker.py`` / SDRTrunk NACTracker technique)."""

from __future__ import annotations

import numpy as np
import pytest

from wavecap_tpu.decoders.nac_tracker import NacTracker
from wavecap_tpu.decoders.p25_frames import DUID, decode_nid, encode_nid
from wavecap_tpu.decoders import framer as framer_mod


class TestTracker:
    def test_dominant_needs_min_observations(self):
        t = NacTracker()
        t.observe(0x293, now=0.0)
        t.observe(0x293, now=1.0)
        assert t.dominant(now=1.0) is None
        t.observe(0x293, now=2.0)
        assert t.dominant(now=2.0) == 0x293

    def test_most_frequent_wins(self):
        t = NacTracker()
        for i in range(5):
            t.observe(0x111, now=float(i))
        for i in range(3):
            t.observe(0x222, now=float(i))
        assert t.dominant(now=5.0) == 0x111

    def test_ttl_expires_observations(self):
        t = NacTracker(ttl_s=10.0)
        for i in range(4):
            t.observe(0x293, now=float(i))
        assert t.dominant(now=5.0) == 0x293
        assert t.dominant(now=100.0) is None

    def test_eviction_keeps_strongest(self):
        t = NacTracker(max_tracked=2)
        for i in range(4):
            t.observe(0xAAA, now=float(i))
        t.observe(0xBBB, now=4.0)
        t.observe(0xCCC, now=5.0)  # evicts the weakest (0xBBB)
        assert 0xAAA in t._seen and 0xCCC in t._seen and 0xBBB not in t._seen


def _corrupt_nid_dibits(nac: int, duid: DUID, n_bit_errors: int, seed: int = 7):
    """On-air NID dibits (with status placeholder) + bit corruption."""
    rng = np.random.default_rng(seed)
    clean = encode_nid(nac, duid)  # 32 dibits, no status
    bits = np.zeros(64, np.uint8)
    for i, d in enumerate(clean):
        bits[2 * i] = (d >> 1) & 1
        bits[2 * i + 1] = d & 1
    pos = rng.choice(63, size=n_bit_errors, replace=False)  # inside the BCH cw
    bits[pos] ^= 1
    dib = (bits[0::2] << 1) | bits[1::2]
    # re-insert the status dibit at NID position 11 (decode_nid strips it)
    return np.insert(dib, 11, 0)


class TestAssistedDecode:
    def test_unassisted_fails_assisted_recovers(self):
        # 14 bit errors > t=11: cold decode fails.  If >=12 of them could
        # land in the NAC field the assist wipes them; craft errors so that
        # exactly 12 hit the NAC bits and 2 the remainder.
        nac, duid = 0x293, DUID.TSDU
        clean = encode_nid(nac, duid)
        bits = np.zeros(64, np.uint8)
        for i, d in enumerate(clean):
            bits[2 * i] = (d >> 1) & 1
            bits[2 * i + 1] = d & 1
        bits[:12] ^= 1  # all 12 NAC bits wrong
        bits[20] ^= 1
        bits[40] ^= 1
        dib = (bits[0::2] << 1) | bits[1::2]
        dib = np.insert(dib, 11, 0)

        cold = decode_nid(dib)
        assert cold is None or cold.errors >= 99  # hopeless without help
        helped = decode_nid(dib, assist_nac=nac)
        assert helped is not None and helped.assisted
        assert helped.nac == nac and helped.duid == duid and helped.errors <= 2

    def test_assist_with_wrong_nac_does_not_fabricate(self):
        dib = _corrupt_nid_dibits(0x293, DUID.TSDU, n_bit_errors=20)
        out = decode_nid(dib, assist_nac=0x111)
        assert out is None or out.errors >= 99 or out.nac == 0x111 and out.assisted is False

    def test_clean_decode_ignores_assist(self):
        dib = _corrupt_nid_dibits(0x293, DUID.TSDU, n_bit_errors=0)
        out = decode_nid(dib, assist_nac=0x111)
        assert out is not None and out.nac == 0x293 and not out.assisted


class TestFramerIntegration:
    def test_framer_learns_nac_and_recovers_mangled_nid(self):
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders import p25_tsbk as tsbk

        fr = framer_mod.P25Framer()
        # teach the tracker with clean frames
        blk = pf.encode_tsbk_block(
            tsbk.TSBKOpcode.RFSS_STS_BCAST,
            tsbk.make_rfss_status_data(
                system_id=0x123, rfss_id=1, site_id=7, band=1,
                channel_number=0,
            ),
            last=True,
        )
        frame_dibits = pf.build_tsdu_frame(0x293, [blk, blk, blk])
        sym = np.array([1.0, 3.0, -1.0, -3.0], np.float32)[frame_dibits]
        pad = np.zeros(50, np.float32)
        for _ in range(3):
            fr.process(np.concatenate([pad, sym, pad]))
        assert fr.nac_tracker.dominant() == 0x293
        # mangle every NAC bit of the next frame's NID (first 6 dibits)
        mangled = frame_dibits.copy()
        mangled[24:30] ^= 3  # dibits 24..29 = the 12 NAC bits
        sym_bad = np.array([1.0, 3.0, -1.0, -3.0], np.float32)[mangled]
        before = fr.nid_assist_count
        frames = fr.process(np.concatenate([pad, sym_bad, pad]))
        assert frames, "assisted NID should still yield the frame"
        assert fr.nid_assist_count == before + 1
        assert frames[0].nac == 0x293
