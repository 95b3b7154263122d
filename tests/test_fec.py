"""FEC round-trip and error-correction tests (reference test_p25_bch.py tier)."""

import numpy as np
import pytest

from wavecap_tpu.decoders.fec import bch, crc, golay, trellis


class TestBCH:
    def test_roundtrip_clean(self, rng):
        for _ in range(20):
            data = int(rng.integers(0, 1 << 16))
            cw = bch.encode(data)
            assert cw.shape == (63,)
            got, n = bch.decode(cw)
            assert got == data and n == 0

    @pytest.mark.parametrize("n_errors", [1, 3, 7, 11])
    def test_corrects_errors(self, rng, n_errors):
        data = 0xA5C3
        cw = bch.encode(data)
        for _ in range(10):
            pos = rng.choice(63, size=n_errors, replace=False)
            rx = cw.copy()
            rx[pos] ^= 1
            got, n = bch.decode(rx)
            assert got == data, f"{n_errors} errors"
            assert n == n_errors

    def test_detects_overload(self, rng):
        # 20 errors: must not silently return wrong data as corrected
        data = 0x1234
        cw = bch.encode(data)
        fails = 0
        for _ in range(20):
            pos = rng.choice(63, size=20, replace=False)
            rx = cw.copy()
            rx[pos] ^= 1
            got, n = bch.decode(rx)
            if n == -1 or got != data:
                fails += 1
        assert fails >= 15  # overwhelmingly detected as bad

    def test_generator_degree(self):
        g = bch.generator_poly()
        assert len(g) == 48 and g[0] == 1 and g[-1] == 1


class TestGolay:
    def test_roundtrip(self, rng):
        for _ in range(50):
            data = int(rng.integers(0, 1 << 12))
            cw = golay.encode(data)
            got, n = golay.decode(cw)
            assert got == data and n == 0

    @pytest.mark.parametrize("n_errors", [1, 2, 3])
    def test_corrects(self, rng, n_errors):
        data = 0x7B5
        cw = golay.encode(data)
        for _ in range(30):
            pos = rng.choice(24, size=n_errors, replace=False)
            rx = cw.copy()
            rx[pos] ^= 1
            got, n = golay.decode(rx)
            assert got == data and n == n_errors

    def test_min_distance(self):
        # spot check: all single-data-bit codeword pairs differ by >= 8
        cws = [golay.encode(1 << i) for i in range(12)]
        z = golay.encode(0)
        for cw in cws:
            assert int(np.sum(cw ^ z)) >= 8


class TestTrellis:
    def test_roundtrip_96_bits(self, rng):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        tx = trellis.encode_bits(bits)
        assert tx.shape == (196,)
        rx, err = trellis.viterbi_decode_bits(tx)
        assert err == 0
        np.testing.assert_array_equal(rx, bits)

    def test_corrects_dibit_errors(self, rng):
        bits = rng.integers(0, 2, 96).astype(np.uint8)
        tx = trellis.encode_bits(bits)
        ok = 0
        for _ in range(20):
            rx_bits = tx.copy()
            # corrupt 3 random dibits (6 bits) spread apart
            for p in rng.choice(range(0, 98, 7), size=3, replace=False):
                rx_bits[2 * p] ^= 1
            dec, err = trellis.viterbi_decode_bits(rx_bits)
            if np.array_equal(dec, bits):
                ok += 1
        assert ok >= 15

    def test_encoder_table_is_permutation(self):
        # each state's outputs are distinct nibbles; all 16 nibbles used once
        assert sorted(trellis.OUTPUT_NIBBLE.ravel().tolist()) == list(range(16))


class TestCRC:
    def test_roundtrip(self, rng):
        for _ in range(20):
            bits = rng.integers(0, 2, 80).astype(np.uint8)
            block = np.concatenate([bits, crc.tsbk_crc_encode(bits)])
            assert crc.tsbk_crc_check(block)

    def test_detects_errors(self, rng):
        bits = rng.integers(0, 2, 80).astype(np.uint8)
        block = np.concatenate([bits, crc.tsbk_crc_encode(bits)])
        bad = block.copy()
        bad[17] ^= 1
        assert not crc.tsbk_crc_check(bad)

    def test_reference_table_compat(self):
        """Our CRC passes the reference's table-driven acceptance rule."""
        import ast, re

        src = open(
            "/root/reference/backend/wavecapsdr/decoders/p25_frames.py"
        ).read()
        m = re.search(r"CCITT_80_CHECKSUMS\s*=\s*(\[.*?\])", src, re.S)
        if not m:
            pytest.skip("reference not available")
        table = ast.literal_eval(re.sub(r"#.*", "", m.group(1)))
        rng = np.random.default_rng(7)
        for _ in range(10):
            bits = rng.integers(0, 2, 80).astype(np.uint8)
            block = np.concatenate([bits, crc.tsbk_crc_encode(bits)])
            calculated = 0xFFFF
            for i in range(80):
                if block[i]:
                    calculated ^= table[i]
            rx = 0
            for b in block[80:96]:
                rx = (rx << 1) | int(b)
            assert (calculated ^ rx) in (0, 0xFFFF)
