"""Channel bank: multi-station demod, slot activation, dynamic retune."""

import numpy as np

import jax
import jax.numpy as jnp

from wavecap_tpu import models
from wavecap_tpu.models.channel_bank import (
    ChannelBankConfig,
    ChannelAssignment,
    assignment_init,
    bank_init,
    bank_step,
)
from wavecap_tpu.ops.channelizer import ChannelizerConfig


def make_multistation(fs, n, stations):
    """Sum of NBFM stations: list of (offset_hz, tone_hz, deviation)."""
    t = np.arange(n) / fs
    x = np.zeros(n, np.complex128)
    for offset, tone, dev in stations:
        audio = np.sin(2 * np.pi * tone * t)
        phase = 2 * np.pi * (offset * t + dev * np.cumsum(audio) / fs)
        x += np.exp(1j * phase)
    return (x / len(stations)).astype(np.complex64)


CH = ChannelizerConfig(sample_rate=800_000.0, channel_bandwidth=25_000.0)
BANK = ChannelBankConfig(
    channelizer=CH,
    mode="nbfm",
    demod_cfg=models.NbfmConfig(sample_rate=50_000, max_deviation_hz=4000.0),
    capacity=4,
)


def peak_freq(audio, rate=48_000):
    a = np.asarray(audio)
    a = a[len(a) // 2 :]
    a = a - a.mean()
    s = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    return np.fft.rfftfreq(len(a), 1.0 / rate)[np.argmax(s)]


class TestChannelBank:
    def test_three_stations(self):
        fs, n = 800_000, 32 * 6000
        stations = [
            (CH.channel_offset_hz(3), 700.0, 4000.0),
            (CH.channel_offset_hz(10), 1100.0, 4000.0),
            (CH.channel_offset_hz(29), 1700.0, 4000.0),  # negative offset
        ]
        x = make_multistation(fs, n, stations)
        assign = ChannelAssignment(
            channel_index=jnp.asarray([3, 10, 29, 0], jnp.int32),
            fine_offset_hz=jnp.zeros(4, jnp.float32),
            active=jnp.asarray([True, True, True, False]),
            squelch_db=jnp.full(4, -1e9, jnp.float32),
        )
        out, _ = bank_step(jnp.asarray(x), bank_init(BANK), assign, BANK)
        audio = np.asarray(out["audio"])
        assert abs(peak_freq(audio[0]) - 700.0) < 10
        assert abs(peak_freq(audio[1]) - 1100.0) < 10
        assert abs(peak_freq(audio[2]) - 1700.0) < 10
        assert np.abs(audio[3]).max() == 0.0  # inactive slot silent
        rssi = np.asarray(out["rssi"])
        assert rssi[0] > -20 and rssi[3] == -200.0

    def test_retune_without_recompile(self):
        fs, n = 800_000, 32 * 3000
        x1 = make_multistation(fs, n, [(CH.channel_offset_hz(5), 500.0, 4000.0)])
        x2 = make_multistation(fs, n, [(CH.channel_offset_hz(12), 900.0, 4000.0)])
        step = jax.jit(bank_step, static_argnums=3)
        state = bank_init(BANK)
        a1 = assignment_init(4)._replace(
            channel_index=jnp.asarray([5, 0, 0, 0], jnp.int32),
            active=jnp.asarray([True, False, False, False]),
        )
        out1, state = step(jnp.asarray(x1), state, a1, BANK)
        compiles_before = step._cache_size()
        a2 = a1._replace(channel_index=jnp.asarray([12, 0, 0, 0], jnp.int32))
        out2, state = step(jnp.asarray(x2), state, a2, BANK)
        assert step._cache_size() == compiles_before  # retune didn't recompile
        assert abs(peak_freq(np.asarray(out1["audio"][0])) - 500.0) < 15
        assert abs(peak_freq(np.asarray(out2["audio"][0])) - 900.0) < 15

    def test_fine_offset_correction(self):
        # Station 6 kHz off the channel grid; fine shift recovers it
        fs, n = 800_000, 32 * 6000
        off = CH.channel_offset_hz(8) + 6000.0
        x = make_multistation(fs, n, [(off, 1300.0, 4000.0)])
        assign = assignment_init(4)._replace(
            channel_index=jnp.asarray([8, 0, 0, 0], jnp.int32),
            fine_offset_hz=jnp.asarray([6000.0, 0, 0, 0], jnp.float32),
            active=jnp.asarray([True, False, False, False]),
        )
        out, _ = bank_step(jnp.asarray(x), bank_init(BANK), assign, BANK)
        assert abs(peak_freq(np.asarray(out["audio"][0])) - 1300.0) < 10

    def test_squelch_closes_on_noise_floor(self, rng):
        fs, n = 800_000, 32 * 3000
        x = make_multistation(fs, n, [(CH.channel_offset_hz(3), 700.0, 4000.0)])
        x = x + (0.001 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(
            np.complex64
        )
        assign = assignment_init(4)._replace(
            channel_index=jnp.asarray([3, 20, 0, 0], jnp.int32),
            active=jnp.asarray([True, True, False, False]),
            squelch_db=jnp.asarray([-40.0, -40.0, -1e9, -1e9], jnp.float32),
        )
        out, _ = bank_step(jnp.asarray(x), bank_init(BANK), assign, BANK)
        audio = np.asarray(out["audio"])
        assert np.abs(audio[0]).max() > 0.01  # strong station passes
        assert np.abs(audio[1]).max() == 0.0  # empty channel squelched
