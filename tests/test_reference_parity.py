"""Cross-implementation golden parity: this repo's demodulators vs the
reference implementation's numpy DSP output on identical IQ.

Vectors in ``tests/golden/`` were produced offline by
``scripts/make_golden_vectors.py`` running the reference's own
``dsp/fm.py:wbfm_demod`` and ``dsp/p25/c4fm.py:C4FMDemodulator`` — an
external anchor, so a shared modulator/demodulator misunderstanding in
this repo cannot pass silently (VERDICT round 1, item 10)."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

GOLDEN = Path(__file__).parent / "golden"


def best_lag_metrics(a: np.ndarray, b: np.ndarray, max_lag: int):
    """Align b to a over +-max_lag; return (corr, lag) at the best lag."""
    best = (-1.0, 0)
    for lag in range(-max_lag, max_lag + 1):
        if lag >= 0:
            x, y = a[lag:], b[: len(b) - lag if lag else len(b)]
        else:
            x, y = a[: len(a) + lag], b[-lag:]
        n = min(len(x), len(y))
        x, y = x[:n], y[:n]
        denom = np.sqrt(np.sum(x * x) * np.sum(y * y)) + 1e-12
        c = float(np.sum(x * y) / denom)
        if c > best[0]:
            best = (c, lag)
    return best


class TestWbfmParity:
    def test_wbfm_audio_matches_reference(self):
        d = np.load(GOLDEN / "wbfm_parity.npz")
        iq = d["iq"]
        fs = int(d["sample_rate"])
        ref = d["ref_audio"]

        from wavecap_tpu.models.analog import WbfmConfig, wbfm_demod, wbfm_init

        cfg = WbfmConfig(sample_rate=fs, audio_rate=int(d["audio_rate"]))
        audio, _ = wbfm_demod(jnp.asarray(iq), wbfm_init(cfg), cfg)
        audio = np.asarray(audio)

        # skip both chains' startup transients, compare steady state
        n = min(len(audio), len(ref))
        a, r = audio[4000:n - 4000], ref[4000:n - 4000]
        a = a - a.mean()
        r = r - r.mean()
        corr, lag = best_lag_metrics(r, a, max_lag=400)
        assert corr > 0.95, f"wbfm corr {corr:.4f} @ lag {lag}"

    def test_wbfm_level_matches_reference(self):
        d = np.load(GOLDEN / "wbfm_parity.npz")
        from wavecap_tpu.models.analog import WbfmConfig, wbfm_demod, wbfm_init

        cfg = WbfmConfig(sample_rate=int(d["sample_rate"]))
        audio, _ = wbfm_demod(jnp.asarray(d["iq"]), wbfm_init(cfg), cfg)
        audio = np.asarray(audio)[4000:]
        ref = d["ref_audio"][4000:]
        db = 20 * np.log10(
            (np.sqrt(np.mean(audio**2)) + 1e-12) / (np.sqrt(np.mean(ref**2)) + 1e-12)
        )
        assert abs(db) < 3.0, f"wbfm level differs by {db:.1f} dB"


class TestC4fmParity:
    def test_c4fm_dibits_match_reference(self):
        d = np.load(GOLDEN / "c4fm_parity.npz")
        iq = d["iq"]
        ref = d["ref_dibits"].astype(np.int32)

        from wavecap_tpu.models.p25.c4fm import (
            C4fmConfig,
            c4fm_demodulate,
            c4fm_init,
        )

        cfg = C4fmConfig(sample_rate=int(d["sample_rate"]))
        _, dibits, _ = c4fm_demodulate(jnp.asarray(iq), c4fm_init(cfg), cfg)
        mine = np.asarray(dibits).astype(np.int32)

        # dibit -> symbol level for correlation-based alignment
        lvl = np.array([1, 3, -1, -3], np.float32)
        a, b = lvl[ref], lvl[mine]
        corr, lag = best_lag_metrics(a, b, max_lag=30)
        if lag >= 0:
            x, y = ref[lag:], mine[: len(mine) - lag if lag else len(mine)]
        else:
            x, y = ref[: len(ref) + lag], mine[-lag:]
        n = min(len(x), len(y))
        # both demods flush differently at the edges; compare the body
        x, y = x[24 : n - 24], y[24 : n - 24]
        agree = float(np.mean(x == y))
        assert agree >= 0.99, f"c4fm dibit agreement {agree:.4f} @ lag {lag}"

    def test_reference_recovered_transmitted_dibits(self):
        """Sanity: the golden reference output itself contains the
        transmitted TSDU dibits (guards against a broken golden file)."""
        d = np.load(GOLDEN / "c4fm_parity.npz")
        tx = d["tx_dibits"].astype(np.int32)
        ref = d["ref_dibits"].astype(np.int32)
        lvl = np.array([1, 3, -1, -3], np.float32)
        corr, _ = best_lag_metrics(lvl[tx], lvl[ref], max_lag=40)
        assert corr > 0.9


def _dibit_agreement(ref: np.ndarray, mine: np.ndarray, max_lag: int, trim: int):
    """Align by correlation on symbol levels, return (agreement, lag)."""
    lvl = np.array([1, 3, -1, -3], np.float32)
    corr, lag = best_lag_metrics(lvl[ref], lvl[mine], max_lag=max_lag)
    if lag >= 0:
        x, y = ref[lag:], mine[: len(mine) - lag if lag else len(mine)]
    else:
        x, y = ref[: len(ref) + lag], mine[-lag:]
    n = min(len(x), len(y))
    x, y = x[trim : n - trim], y[trim : n - trim]
    return float(np.mean(x == y)), lag


def _my_cqpsk_dibits(d) -> np.ndarray:
    from wavecap_tpu.models.p25.cqpsk import (
        CqpskConfig,
        cqpsk_demodulate,
        cqpsk_init,
    )

    cfg = CqpskConfig(
        sample_rate=int(d["sample_rate"]),
        symbol_rate=float(d["symbol_rate"]),
        rrc_alpha=float(d["rrc_alpha"]),
    )
    _, dibits, _ = cqpsk_demodulate(jnp.asarray(d["iq"]), cqpsk_init(cfg), cfg)
    return np.asarray(dibits).astype(np.int32)


class TestCqpskParity:
    """pi/4-DQPSK dibit parity vs the reference demodulators on identical
    IQ (VERDICT round 2, item 6):

    * ``cqpsk_parity``: Phase 2 H-DQPSK, 12000 baud, alpha=1.0 — reference
      ``dsp/p25/cqpsk.py:199`` (RRC + Costas + Mueller-Muller), output
      remapped to the standard dibit alphabet in the generator.
    * ``cqpsk_lsm_parity``: Phase 1 LSM, 4800 baud, alpha=0.2 — reference
      ``decoders/p25.py:190`` (MMSE interpolation + Gardner TED).

    The reference's per-sample loops slip a few symbols mid-stream on
    clean IQ (windowed agreement vs tx dips to ~0.84 / ~0.94), so the
    parity chain is: (a) the reference recovers the transmitted dibits —
    externally validating this repo's modulator — and (b) this repo's
    demod recovers the same transmitted dibits at >=0.99, i.e. reads the
    reference-validated waveform at least as faithfully as the reference
    itself (c) while agreeing with the reference's own decisions wherever
    its loops held lock."""

    @pytest.mark.parametrize("name", ["cqpsk_parity", "cqpsk_lsm_parity"])
    def test_reference_recovered_transmitted_dibits(self, name):
        d = np.load(GOLDEN / f"{name}.npz")
        tx = d["tx_dibits"].astype(np.int32)
        ref = d["ref_dibits"].astype(np.int32)
        # trim the reference loops' acquisition transient (~300 symbols)
        agree, lag = _dibit_agreement(tx, ref, max_lag=40, trim=400)
        assert agree > 0.90, f"{name} golden: ref vs tx agreement {agree:.4f} @ {lag}"

    @pytest.mark.parametrize("name", ["cqpsk_parity", "cqpsk_lsm_parity"])
    def test_cqpsk_dibits_match_transmitted(self, name):
        d = np.load(GOLDEN / f"{name}.npz")
        tx = d["tx_dibits"].astype(np.int32)
        mine = _my_cqpsk_dibits(d)
        agree, lag = _dibit_agreement(tx, mine, max_lag=40, trim=64)
        assert agree >= 0.99, f"{name} ours vs tx agreement {agree:.4f} @ lag {lag}"

    @pytest.mark.parametrize("name", ["cqpsk_parity", "cqpsk_lsm_parity"])
    def test_cqpsk_dibits_match_reference(self, name):
        d = np.load(GOLDEN / f"{name}.npz")
        ref = d["ref_dibits"].astype(np.int32)
        mine = _my_cqpsk_dibits(d)
        agree, lag = _dibit_agreement(ref, mine, max_lag=40, trim=400)
        assert agree >= 0.90, f"{name} ours vs ref agreement {agree:.4f} @ lag {lag}"


class TestNbfmParity:
    def test_nbfm_audio_matches_reference(self):
        d = np.load(GOLDEN / "nbfm_parity.npz")
        from wavecap_tpu.models.analog import NbfmConfig, nbfm_demod, nbfm_init

        cfg = NbfmConfig(
            sample_rate=int(d["sample_rate"]), audio_rate=int(d["audio_rate"])
        )
        audio, _ = nbfm_demod(jnp.asarray(d["iq"]), nbfm_init(cfg), cfg)
        audio = np.asarray(audio)
        ref = d["ref_audio"]
        n = min(len(audio), len(ref))
        a, r = audio[4000:n - 4000], ref[4000:n - 4000]
        a = a - a.mean()
        r = r - r.mean()
        corr, lag = best_lag_metrics(r, a, max_lag=400)
        assert corr > 0.95, f"nbfm corr {corr:.4f} @ lag {lag}"


class TestAmParity:
    def test_am_audio_matches_reference(self):
        d = np.load(GOLDEN / "am_parity.npz")
        from wavecap_tpu.models.analog import AmConfig, am_demod, am_init

        cfg = AmConfig(
            sample_rate=int(d["sample_rate"]), audio_rate=int(d["audio_rate"]),
            enable_agc=False,
        )
        audio, _ = am_demod(jnp.asarray(d["iq"]), am_init(cfg), cfg)
        audio = np.asarray(audio)
        ref = d["ref_audio"]
        n = min(len(audio), len(ref))
        a, r = audio[4000:n - 4000], ref[4000:n - 4000]
        a = a - a.mean()
        r = r - r.mean()
        corr, lag = best_lag_metrics(r, a, max_lag=400)
        assert corr > 0.95, f"am corr {corr:.4f} @ lag {lag}"
