"""Polyphase channelizer: tone routing, isolation, oversampling, streaming.

Functional spec from reference ``dsp/channelizer.py`` (M = fs/bw channels,
2x oversampled outputs, FFT-bin channel ordering) verified independently:
tones injected at channel centers/offsets must appear in the right channel
at the right baseband frequency with strong isolation elsewhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wavecap_tpu.ops.channelizer import (
    ChannelizerConfig,
    channelize,
    channelizer_init,
)
from tests.conftest import make_tone, make_noise


CFG = ChannelizerConfig(sample_rate=800_000.0, channel_bandwidth=25_000.0)
# M = 32 channels, channel rate 50 kHz


def run(x):
    y, _ = channelize(jnp.asarray(x), channelizer_init(CFG), CFG)
    return np.asarray(y)


class TestChannelizer:
    def test_shapes_and_rates(self):
        assert CFG.channel_count == 32
        assert CFG.channel_rate == 50_000.0
        y = run(np.zeros(32 * 1000, np.complex64))
        assert y.shape == (32, 2000)

    @pytest.mark.parametrize("chan", [0, 1, 5, 16, 31, 27])
    def test_tone_routes_to_channel(self, chan):
        offset = CFG.channel_offset_hz(chan)
        x = make_tone(offset, CFG.sample_rate, 32 * 2000)
        y = run(x)
        power = (np.abs(y) ** 2).mean(axis=1)
        assert int(np.argmax(power)) == chan
        # Isolation: every non-adjacent channel at least 50 dB down
        others = np.delete(power, [chan, (chan - 1) % 32, (chan + 1) % 32])
        assert 10 * np.log10(power[chan] / others.max()) > 50

    def test_within_channel_offset_preserved(self):
        # Tone at channel-5 center + 7 kHz must appear at +7 kHz baseband
        offset = CFG.channel_offset_hz(5) + 7000.0
        x = make_tone(offset, CFG.sample_rate, 32 * 4000)
        y = run(x)[5]
        seg = y[200:]
        spec = np.abs(np.fft.fft(seg * np.hanning(len(seg))))
        freqs = np.fft.fftfreq(len(seg), 1.0 / CFG.channel_rate)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 7000.0) < CFG.channel_rate / len(seg) * 4

    def test_negative_channel_index(self):
        assert CFG.channel_index(-25_000.0) == 31
        assert CFG.channel_index(25_000.0) == 1
        assert CFG.channel_offset_hz(31) == -25_000.0

    def test_unit_gain_at_center(self):
        x = make_tone(CFG.channel_offset_hz(3), CFG.sample_rate, 32 * 2000, amplitude=0.7)
        y = run(x)[3]
        amp = np.abs(y[500:]).mean()
        assert 0.55 < amp < 0.85  # ~unity gain (prototype DC gain = 1)

    def test_streaming_equals_oneshot(self, rng):
        x = make_noise(rng, 32 * 600)
        full, _ = channelize(jnp.asarray(x), channelizer_init(CFG), CFG)
        st = channelizer_init(CFG)
        parts = []
        for i in range(0, len(x), 32 * 200):
            y, st = channelize(jnp.asarray(x[i : i + 32 * 200]), st, CFG)
            parts.append(np.asarray(y))
        stitched = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(stitched, np.asarray(full), atol=2e-5)

    def test_bad_block_length_raises(self):
        with pytest.raises(ValueError):
            channelize(jnp.zeros(1000, jnp.complex64), channelizer_init(CFG), CFG)

    def test_demod_through_channelizer_matches_direct(self):
        """NBFM via channelizer ~= NBFM via direct freq-shift + decimate."""
        from wavecap_tpu import ops as wops
        from wavecap_tpu import models

        fs = CFG.sample_rate
        n = 32 * 6000
        t = np.arange(n) / fs
        audio_tone = np.sin(2 * np.pi * 900 * t)
        dev = 4000.0
        offset = CFG.channel_offset_hz(7)
        phase = 2 * np.pi * (offset * t + dev * np.cumsum(audio_tone) / fs)
        x = np.exp(1j * phase).astype(np.complex64)

        # Path A: channelizer channel 7 at 50 kHz -> NBFM
        chan = run(x)[7]
        cfg_a = models.NbfmConfig(sample_rate=50_000, max_deviation_hz=dev)
        audio_a, _ = models.nbfm_demod(jnp.asarray(chan), models.nbfm_init(cfg_a), cfg_a)

        # Path B: freq shift + decimate 16x -> 50 kHz -> NBFM
        shifted, _ = wops.freq_shift(jnp.asarray(x), -offset, fs)
        taps = wops.design_decimation_fir(16, fs)
        dec, _ = wops.fir_decimate(shifted, jnp.asarray(taps), 16, wops.fir_init(len(taps)))
        audio_b, _ = models.nbfm_demod(dec, models.nbfm_init(cfg_a), cfg_a)

        def peak_freq(a):
            a = np.asarray(a)
            a = a[len(a) // 2 :]
            s = np.abs(np.fft.rfft((a - a.mean()) * np.hanning(len(a))))
            return np.fft.rfftfreq(len(a), 1 / 48_000)[np.argmax(s)]

        assert abs(peak_freq(audio_a) - 900.0) < 10
        assert abs(peak_freq(audio_b) - 900.0) < 10
