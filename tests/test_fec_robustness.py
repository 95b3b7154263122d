"""Exhaustive / randomized FEC robustness (reference test tier
``tests/test_reference_fec.py`` known-answer + round-trip style)."""

import numpy as np
import pytest

from wavecap_tpu.decoders.fec import bch, crc, golay, trellis


class TestBchExhaustive:
    def test_all_single_and_double_errors(self, rng):
        """BCH(63,16,23) corrects any <=11 errors; check 1-2 exhaustively-ish."""
        data = 0xBEEF & 0xFFFF
        cw = bch.encode(data)
        for i in range(0, 63, 7):
            one = cw.copy()
            one[i] ^= 1
            d, n = bch.decode(one)
            assert d == data and n == 1
            for j in range(i + 3, 63, 13):
                two = one.copy()
                two[j] ^= 1
                d, n = bch.decode(two)
                assert d == data and n == 2

    def test_heavy_error_correction(self, rng):
        for trial in range(20):
            data = int(rng.integers(0, 1 << 16))
            cw = bch.encode(data)
            ne = int(rng.integers(1, 12))  # t = 11
            bad = cw.copy()
            for p in rng.choice(63, ne, replace=False):
                bad[p] ^= 1
            d, n = bch.decode(bad)
            assert d == data and n == ne

    def test_beyond_t_detected_or_fails(self, rng):
        miscorrect = 0
        for trial in range(30):
            data = int(rng.integers(0, 1 << 16))
            cw = bch.encode(data)
            bad = cw.copy()
            for p in rng.choice(63, 20, replace=False):
                bad[p] ^= 1
            d, n = bch.decode(bad)
            if n >= 0 and d == data:
                miscorrect += 1  # lucky, fine
        # mostly should NOT silently return the right data with 20 errors
        assert miscorrect <= 5


class TestGolayExhaustive:
    def test_all_3_error_patterns_sampled(self, rng):
        data = 0x5A7
        cw = golay.encode(data)
        for trial in range(100):
            bad = cw.copy()
            for p in rng.choice(24, 3, replace=False):
                bad[p] ^= 1
            d, n = golay.decode(bad)
            assert d == data and n == 3

    def test_four_errors_not_miscorrected_often(self, rng):
        data = 0x123
        cw = golay.encode(data)
        silently_right = 0
        for trial in range(60):
            bad = cw.copy()
            for p in rng.choice(24, 4, replace=False):
                bad[p] ^= 1
            d, n = golay.decode(bad)
            if n >= 0 and d == data and n <= 3:
                silently_right += 1
        # weight-4 errors are beyond t=3: the decoder must flag them
        # (n<0) or land on a different codeword, never silently "fix" 4
        assert silently_right == 0


class TestTrellisRobustness:
    def test_single_symbol_error_corrects(self, rng):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        coded = trellis.encode_bits(bits)
        for pos in (0, 40, 100, 190):
            bad = coded.copy()
            bad[pos] ^= 1
            dec, err = trellis.viterbi_decode_bits(bad)
            assert np.array_equal(dec[:96], bits), pos

    def test_adjacent_burst_damage_bounded(self, rng):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        coded = trellis.encode_bits(bits)
        bad = coded.copy()
        bad[40:44] ^= 1  # 2 adjacent symbols: beyond free distance
        dec, err = trellis.viterbi_decode_bits(bad)
        assert int(np.sum(dec[:96] ^ bits)) <= 6  # damage stays local

    def test_soft_matches_hard_on_clean(self, rng):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        coded = trellis.encode_bits(bits)
        dib = (coded[0::2] << 1) | coded[1::2]
        soft = np.array([[1.0, 3.0, -1.0, -3.0][d] for d in dib], np.float32)
        dec, err = trellis.viterbi_decode_soft(soft.reshape(-1, 2))
        hard, _ = trellis.viterbi_decode_dibits(dib)
        assert np.array_equal(dec, hard) and err < 1e-3


class TestCrcEdgeCases:
    def test_all_zero_and_all_one_blocks(self):
        for fill in (0, 1):
            bits = np.full(80, fill, np.uint8)
            block = np.concatenate([bits, crc.tsbk_crc_encode(bits)])
            assert crc.tsbk_crc_check(block)

    def test_crc32_incremental_consistency(self, rng):
        bits = rng.integers(0, 2, 256).astype(np.uint8)
        assert crc.crc32_p25(bits) == crc.crc32_p25(list(bits))

    def test_single_bit_flip_always_detected(self, rng):
        bits = rng.integers(0, 2, 80).astype(np.uint8)
        block = np.concatenate([bits, crc.tsbk_crc_encode(bits)])
        for i in range(0, 96, 5):
            bad = block.copy()
            bad[i] ^= 1
            assert not crc.tsbk_crc_check(bad), i


class TestTsbkParserCoverage:
    """Every synthesizable opcode parses back to its fields."""

    def test_vendor_and_unknown(self):
        from wavecap_tpu.decoders import p25_tsbk as t

        v = t.parse_tsbk(0x00, 0x90, bytes(8))
        assert v["type"] == "VENDOR"
        u = t.parse_tsbk(0x2E, 0, bytes(8))
        assert u["type"] in ("UNKNOWN", "GROUP_AFFILIATION_RESPONSE", "UNIT_REGISTRATION") or "type" in u

    def test_uu_grant(self):
        from wavecap_tpu.decoders import p25_tsbk as t

        data = bytes([((1 & 0xF) << 4) | 0, 0x42, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06])
        r = t.parse_tsbk(t.TSBKOpcode.UU_V_CH_GRANT, 0, data)
        assert r["type"] == "UNIT_VOICE_GRANT"

    def test_iden_tdma_all_channel_types(self):
        from wavecap_tpu.decoders import p25_tsbk as t

        for ctype, slots in ((0, 1), (3, 2), (4, 4), (5, 2)):
            r = t.parse_tsbk(
                t.TSBKOpcode.IDEN_UP_TDMA,
                0,
                t.make_iden_up_tdma_data(identifier=1, base_freq_mhz=800.0, channel_type=ctype),
            )
            assert r["slots_per_carrier"] == slots, ctype

    def test_net_status(self):
        from wavecap_tpu.decoders import p25_tsbk as t

        # NET_STS: lra, wacn(20)/sys(12), band/chan, svc
        data = bytes([0, 0xAB, 0xCD, 0xE1, 0x23, 0x10, 0x05, 0x70])
        r = t.parse_tsbk(t.TSBKOpcode.NET_STS_BCAST, 0, data)
        assert r["type"] == "NETWORK_STATUS"
