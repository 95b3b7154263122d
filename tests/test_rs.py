"""Reed-Solomon over GF(64): the outer code on P25 hexbit structures.

The reference never corrects RS (it extracts systematic symbols only,
reference ``decoders/p25_frames.py:1027``); these tests cover the added
errors-only decoder plus its integration in the LC/ESS/HDU codecs.
"""

import numpy as np
import pytest

from wavecap_tpu.decoders.fec.rs import RS_24_12, RS_24_16, RS_36_20


@pytest.mark.parametrize("rs", [RS_24_12, RS_24_16, RS_36_20], ids=["24_12", "24_16", "36_20"])
class TestReedSolomon:
    def test_clean_roundtrip(self, rs, rng):
        data = rng.integers(0, 64, rs.k).tolist()
        cw = data + rs.encode(data)
        out = rs.decode(cw)
        assert out is not None
        corrected, n = out
        assert n == 0 and list(corrected) == data

    def test_corrects_up_to_t(self, rs, rng):
        for trial in range(20):
            data = rng.integers(0, 64, rs.k).tolist()
            cw = data + rs.encode(data)
            ne = int(rng.integers(1, rs.t + 1))
            for p in rng.choice(rs.n, ne, replace=False):
                cw[p] ^= int(rng.integers(1, 64))
            out = rs.decode(cw)
            assert out is not None and list(out[0]) == data and out[1] == ne

    def test_rejects_beyond_t(self, rs, rng):
        rejected = 0
        for trial in range(30):
            data = rng.integers(0, 64, rs.k).tolist()
            cw = data + rs.encode(data)
            for p in rng.choice(rs.n, rs.t + 3, replace=False):
                cw[p] ^= int(rng.integers(1, 64))
            if rs.decode(cw) is None:
                rejected += 1
        assert rejected >= 28  # overwhelming majority detected


class TestRsInVoiceCodecs:
    def test_lc_corrects_hexbit_burst(self, rng):
        """6 fully corrupted hexbits (beyond Hamming) still yield the LC."""
        from wavecap_tpu.decoders.p25_voice import (
            decode_lc_hexbits,
            encode_lc_hexbits,
            make_group_lc_bits,
        )

        bits = make_group_lc_bits(tgid=4321, source_id=987654)
        coded = encode_lc_hexbits(bits).copy()
        # obliterate 6 of the 24 ten-bit words (uncorrectable inner code)
        for w in rng.choice(24, 6, replace=False):
            coded[10 * w : 10 * (w + 1)] ^= 1
        lc = decode_lc_hexbits(coded)
        assert lc is not None
        assert lc.tgid == 4321 and lc.source_id == 987654

    def test_hdu_corrects_hexbit_burst(self, rng):
        from wavecap_tpu.decoders.p25_voice import (
            decode_hdu_payload,
            encode_hdu_payload,
        )

        payload = encode_hdu_payload(
            tgid=777, algid=0x84, kid=0xBEEF, mi=bytes(range(9))
        ).copy()
        for w in rng.choice(36, 8, replace=False):
            payload[18 * w : 18 * (w + 1)] ^= 1
        hdu = decode_hdu_payload(payload)
        assert hdu is not None
        assert hdu.tgid == 777 and hdu.algid == 0x84 and hdu.kid == 0xBEEF
        assert hdu.mi == bytes(range(9))

    def test_zero_parity_legacy_falls_back(self):
        """A systematic stream with zero RS parity (the reference's encode)
        still decodes via the fallback path."""
        from wavecap_tpu.decoders.p25_voice import (
            decode_lc_hexbits,
            hamming106_encode,
            make_group_lc_bits,
            _bits_to_int,
        )

        bits = make_group_lc_bits(tgid=55, source_id=66)
        hexbits = [_bits_to_int(bits[6 * i : 6 * (i + 1)]) for i in range(12)] + [0] * 12
        coded = np.concatenate([hamming106_encode(h) for h in hexbits])
        lc = decode_lc_hexbits(coded)
        assert lc is not None and lc.tgid == 55 and lc.source_id == 66
