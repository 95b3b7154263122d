"""Empty- and short-block robustness for every stateful op and demod.

The reference validates degenerate inputs throughout its DSP layer
(``backend/wavecapsdr/validation.py``); here the contract is that a
0-sample block is a legal no-op — output is empty, carried state is
returned unchanged (bitwise) — and short blocks never crash framing ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from wavecap_tpu import ops
from wavecap_tpu.models import analog

FS = 48_000.0


def _tree_equal(a, b) -> bool:
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


EMPTY_F32 = jnp.zeros(0, jnp.float32)
EMPTY_C64 = jnp.zeros(0, jnp.complex64)


class TestEmptyOps:
    def test_fir_filter(self):
        taps = jnp.asarray(ops.design_lowpass_fir(64, 0.2), jnp.float32)
        st = ops.fir_init(len(taps), jnp.float32)
        y, st2 = ops.fir_filter(EMPTY_F32, taps, st)
        assert y.shape == (0,) and _tree_equal(st, st2)

    def test_sos_filter(self):
        sos = ops.butter_sos("low", (3000.0,), 4, FS)
        st = ops.sos_init(len(sos))
        y, st2 = ops.sos_filter(EMPTY_F32, sos, st)
        assert y.shape == (0,) and _tree_equal(st, st2)

    def test_agc(self):
        st = ops.agc_init()
        y, st2 = ops.apply_agc(EMPTY_F32, FS, st)
        assert y.shape == (0,) and _tree_equal(st, st2)

    def test_resampler(self):
        st = ops.resample_stream_init(160, 441)
        y, st2 = ops.resample_poly_stream(EMPTY_F32, 160, 441, st)
        assert y.shape[-1] == 0 and _tree_equal(st, st2)

    def test_freq_shift(self):
        y, ph = ops.freq_shift(EMPTY_C64, 5e3, FS, jnp.uint32(7))
        assert y.shape == (0,) and int(np.asarray(ph)) == 7

    def test_onepole(self):
        st = ops.onepole_init()
        y, st2 = ops.onepole_filter(EMPTY_F32, 0.1, 0.9, st)
        assert y.shape == (0,) and _tree_equal(st, st2)

    def test_quadrature_demod(self):
        st = ops.fm_discriminator_init()
        y, st2 = ops.quadrature_demod(EMPTY_C64, FS, st)
        assert y.shape == (0,) and _tree_equal(st, st2)

    def test_power_spectrum_short_and_empty(self):
        # shorter than fft_size: zero-padded, still fft_size bins
        short = jnp.ones(100, jnp.complex64)
        assert ops.power_spectrum(short, 256).shape == (256,)
        assert ops.power_spectrum(EMPTY_C64, 256).shape == (256,)

    def test_spectrogram_short(self):
        out = ops.spectrogram(jnp.ones(100, jnp.complex64), fft_size=256)
        assert out.shape[-2] == 0  # no complete frames, no crash


DEMODS = [
    ("wbfm", analog.WbfmConfig, analog.wbfm_init, analog.wbfm_demod),
    ("nbfm", analog.NbfmConfig, analog.nbfm_init, analog.nbfm_demod),
    ("am", analog.AmConfig, analog.am_init, analog.am_demod),
    ("ssb", analog.SsbConfig, analog.ssb_init, analog.ssb_demod),
    ("sam", analog.SamConfig, analog.sam_init, analog.sam_demod),
]


class TestEmptyDemods:
    @pytest.mark.parametrize("name,cfg_cls,init,demod", DEMODS)
    def test_empty_block_is_identity(self, name, cfg_cls, init, demod):
        cfg = cfg_cls(sample_rate=96_000)
        st = init(cfg)
        out = demod(EMPTY_C64, st, cfg)
        audio, st2 = out[0], out[1]
        assert audio.shape[-1] == 0, f"{name}: non-empty audio from empty IQ"
        assert _tree_equal(st, st2), f"{name}: state mutated by empty block"

    @pytest.mark.parametrize("name,cfg_cls,init,demod", DEMODS)
    def test_empty_then_signal_matches_oneshot(self, name, cfg_cls, init, demod):
        """An interleaved empty block must not perturb the stream."""
        rng = np.random.default_rng(3)
        n = 9600
        iq = jnp.asarray(
            np.exp(1j * 0.3 * np.cumsum(rng.normal(size=n))).astype(np.complex64)
        )
        cfg = cfg_cls(sample_rate=96_000)

        def run(blocks):
            st = init(cfg)
            parts = []
            for blk in blocks:
                a, st = demod(blk, st, cfg)[:2]
                parts.append(np.asarray(a))
            return np.concatenate(parts, axis=-1)

        plain = run([iq[:4800], iq[4800:]])
        with_empty = run([iq[:4800], iq[:0], iq[4800:]])
        assert with_empty.shape == plain.shape
        np.testing.assert_array_equal(with_empty, plain)
