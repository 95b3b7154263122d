"""GF(2^m) field algebra: the foundation under BCH/RS/Golay decoders.

Pins the field axioms and the minimal-polynomial construction the BCH
codec builds its generator from (reference ``dsp/fec/bch.py`` uses the
same GF(64) field x^6+x+1).
"""

from __future__ import annotations

import numpy as np
import pytest

from wavecap_tpu.decoders.fec.galois import GF, gf_tables

FIELDS = [(6, 0x43), (8, 0x11D)]  # GF(64) P25 hexbit, GF(256) DMR byte


@pytest.mark.parametrize("m,poly", FIELDS)
class TestFieldAxioms:
    def test_exp_log_inverse_bijection(self, m, poly):
        gf = GF(m, poly)
        # exp: [0, n) -> nonzero elements, bijectively
        nonzero = sorted(int(gf.exp[i]) for i in range(gf.n))
        assert nonzero == list(range(1, gf.n + 1))
        for a in range(1, gf.n + 1):
            assert int(gf.exp[gf.log[a]]) == a

    def test_mul_matches_polynomial_multiplication(self, m, poly):
        gf = GF(m, poly)
        rng = np.random.default_rng(m)
        for _ in range(200):
            a, b = (int(x) for x in rng.integers(0, gf.n + 1, 2))
            # carry-less multiply then reduce mod poly
            acc = 0
            aa, bb = a, b
            while bb:
                if bb & 1:
                    acc ^= aa
                aa <<= 1
                bb >>= 1
            for shift in range(2 * m, m - 1, -1):
                if acc >> shift & 1:
                    acc ^= poly << (shift - m)
            assert gf.mul(a, b) == acc, (a, b)

    def test_inverse(self, m, poly):
        gf = GF(m, poly)
        for a in range(1, gf.n + 1):
            assert gf.mul(a, gf.inv(a)) == 1
        with pytest.raises(ZeroDivisionError):
            gf.inv(0)

    def test_pow_alpha_wraps(self, m, poly):
        gf = GF(m, poly)
        assert gf.pow_alpha(0) == 1
        assert gf.pow_alpha(gf.n) == 1  # alpha^n = 1 (multiplicative order)
        assert gf.pow_alpha(-1) == gf.inv(gf.pow_alpha(1))

    def test_tables_cached(self, m, poly):
        assert gf_tables(m, poly) is gf_tables(m, poly)


class TestMinimalPoly:
    def test_gf64_alpha_minimal_poly_is_field_poly(self):
        gf = GF(6, 0x43)
        # minimal polynomial of alpha itself is the primitive polynomial
        assert gf.minimal_poly(1) == [1, 1, 0, 0, 0, 0, 1]  # x^6+x+1 ascending

    def test_minimal_poly_annihilates_conjugates(self):
        gf = GF(6, 0x43)
        for e in (1, 3, 5, 9):
            p = gf.minimal_poly(e)
            # alpha^e and its conjugates alpha^(2e), alpha^(4e)... are roots
            k = e
            for _ in range(6):
                assert gf.poly_eval(p, gf.pow_alpha(k)) == 0
                k = (k * 2) % gf.n

    def test_poly_mul_identity(self):
        gf = GF(8, 0x11D)
        p = [3, 7, 1]
        assert gf.poly_mul(p, [1]) == p
        # (x + a)(x + a) = x^2 + a^2 in characteristic 2
        a = 19
        sq = gf.poly_mul([a, 1], [a, 1])
        assert sq == [gf.mul(a, a), 0, 1]
