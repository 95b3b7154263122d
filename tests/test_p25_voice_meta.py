"""Voice-frame metadata codecs + LRRP + call bookkeeping."""

import numpy as np
import pytest

from wavecap_tpu.decoders import lrrp
from wavecap_tpu.decoders.p25_voice import (
    EncryptionSync,
    decode_ess_hexbits,
    decode_hdu_payload,
    decode_lc_hexbits,
    encode_hdu_payload,
    encode_lc_hexbits,
    golay186_decode,
    golay186_encode,
    hamming106_decode,
    hamming106_encode,
    make_group_lc_bits,
)
from wavecap_tpu.trunking.events import (
    CallEventTracker,
    CallSignature,
    DuplicateDetector,
)


class TestHexbitCodecs:
    def test_hamming106_roundtrip_and_correction(self, rng):
        for d in range(64):
            cw = hamming106_encode(d)
            got, n = hamming106_decode(cw)
            assert got == d and n == 0
            for pos in range(10):
                bad = cw.copy()
                bad[pos] ^= 1
                got, n = hamming106_decode(bad)
                assert got == d, (d, pos)

    def test_golay186_roundtrip_and_correction(self, rng):
        for d in (0, 0x15, 0x3F):
            cw = golay186_encode(d)
            assert cw.shape == (18,)
            for _ in range(10):
                bad = cw.copy()
                pos = rng.choice(18, size=3, replace=False)
                bad[pos] ^= 1
                got, n = golay186_decode(bad)
                assert got == d

    def test_link_control_roundtrip(self):
        bits = make_group_lc_bits(tgid=4321, source_id=6_123_456, emergency=True)
        coded = encode_lc_hexbits(bits)
        assert coded.shape == (240,)
        # corrupt one bit per hexbit codeword
        coded[::10] ^= 1
        lc = decode_lc_hexbits(coded)
        assert lc.tgid == 4321
        assert lc.source_id == 6_123_456
        assert lc.emergency

    def test_hdu_roundtrip(self):
        payload = encode_hdu_payload(tgid=999, algid=0x84, kid=0x1234, mi=bytes(range(9)))
        h = decode_hdu_payload(payload)
        assert h.tgid == 999
        assert h.algid == 0x84 and h.kid == 0x1234
        assert h.mi == bytes(range(9))


class TestLrrp:
    def test_roundtrip(self):
        pkt = lrrp.encode_location_report(47.6062, -122.3321, altitude_m=56)
        loc = lrrp.parse_lrrp(pkt, radio_id=777)
        assert loc is not None
        assert abs(loc.latitude - 47.6062) < 1e-4
        assert abs(loc.longitude + 122.3321) < 1e-4
        assert loc.altitude_m == 56

    def test_garbage_rejected(self, rng):
        assert lrrp.parse_lrrp(b"") is None
        assert lrrp.parse_lrrp(bytes(rng.integers(0x80, 0xFF, 40))) is None

    def test_cache_ttl(self):
        cache = lrrp.LocationCache(ttl_s=0.1)
        loc = lrrp.RadioLocation(radio_id=1, latitude=1.0, longitude=2.0)
        cache.update(loc)
        assert cache.get(1) is not None
        import time

        time.sleep(0.15)
        assert cache.get(1) is None


class TestCallBookkeeping:
    def test_duplicate_window(self):
        d = DuplicateDetector(window_s=10.0)
        sig = CallSignature(tgid=1, frequency_hz=851e6)
        assert not d.is_duplicate(sig, now=0.0)
        assert d.is_duplicate(sig, now=5.0)
        assert d.is_duplicate(sig, now=14.0)  # refreshed at 5.0
        assert not d.is_duplicate(CallSignature(tgid=2, frequency_hz=851e6), now=5.0)

    def test_event_tracker_lifecycle(self):
        t = CallEventTracker(stale_after_s=5, end_after_s=15)
        t.update(1, 851e6, source_id=9, now=0.0)
        t.update(1, 851e6, now=2.0)
        assert t.sweep(now=4.0) == []
        assert t.events[1].state == "active"
        t.sweep(now=8.0)
        assert t.events[1].state == "stale"
        ended = t.sweep(now=20.0)
        assert len(ended) == 1 and ended[0].updates == 1
        assert 1 not in t.events


class TestFrameLevelDecode:
    def test_tdulc_roundtrip(self):
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders.p25_voice import make_group_lc_bits

        lc_bits = make_group_lc_bits(tgid=1234, source_id=777_777)
        payload = pf.encode_tdulc_payload(lc_bits)
        payload_dibits = pf.bits_to_dibits(payload)
        head = np.concatenate(
            [pf.FRAME_SYNC_DIBITS, pf.encode_nid(0x293, pf.DUID.TDULC)]
        )
        frame = np.concatenate(
            [
                pf.insert_status_dibits(head, 0),
                pf.insert_status_dibits(payload_dibits, 57),
            ]
        )
        frame = np.pad(frame, (0, max(0, 216 - len(frame))))
        out = pf.decode_tdulc(frame)
        assert out is not None
        nid, lc = out
        assert nid.duid == pf.DUID.TDULC and nid.nac == 0x293
        assert lc.tgid == 1234 and lc.source_id == 777_777

    def test_hdu_roundtrip_frame(self):
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders.p25_voice import encode_hdu_payload

        payload_bits = encode_hdu_payload(tgid=888, algid=0x80, kid=0x55AA)
        payload_dibits = pf.bits_to_dibits(payload_bits)
        head = np.concatenate(
            [pf.FRAME_SYNC_DIBITS, pf.encode_nid(0x123, pf.DUID.HDU)]
        )
        frame = np.concatenate(
            [
                pf.insert_status_dibits(head, 0),
                pf.insert_status_dibits(payload_dibits, 57),
            ]
        )
        frame = np.pad(frame, (0, max(0, 396 - len(frame))))
        out = pf.decode_hdu(frame)
        assert out is not None
        nid, fields = out
        assert nid.duid == pf.DUID.HDU
        assert fields.tgid == 888 and fields.kid == 0x55AA
