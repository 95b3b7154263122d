"""Untrusted-input validation: TSBK-derived tuning data and DSP audio.

Reference tier: ``backend/wavecapsdr/validation.py`` (finite-array and
audio guards) plus the trunking range checks on air-derived frequencies.
"""

import numpy as np

from wavecap_tpu.utils.validation import (
    plausible_iden,
    plausible_rf_hz,
    sanitize_audio,
)
from wavecap_tpu.utils.wavio import pack_pcm16


class TestRfBounds:
    def test_plausible(self):
        assert plausible_rf_hz(851.2e6)
        assert plausible_rf_hz(154.1e6)

    def test_implausible(self):
        assert not plausible_rf_hz(0.0)
        assert not plausible_rf_hz(-851e6)
        assert not plausible_rf_hz(float("nan"))
        assert not plausible_rf_hz(float("inf"))
        assert not plausible_rf_hz(99e9)
        assert not plausible_rf_hz(None)

    def test_iden_bounds(self):
        assert plausible_iden(851.0, 12.5, 12.5)
        assert not plausible_iden(0.0, 12.5, 12.5)  # base out of band
        assert not plausible_iden(851.0, 0.0, 12.5)  # zero spacing
        assert not plausible_iden(851.0, -12.5, 12.5)
        assert not plausible_iden(851.0, 5000.0, 12.5)  # absurd spacing
        assert not plausible_iden(float("nan"), 12.5, 12.5)


class TestAudioSanitize:
    def test_clean_passthrough_no_copy(self):
        a = np.linspace(-1, 1, 64, dtype=np.float32)
        assert sanitize_audio(a) is a

    def test_nan_inf_replaced(self):
        a = np.array([0.5, np.nan, np.inf, -np.inf, -0.5], np.float32)
        out = sanitize_audio(a)
        assert np.isfinite(out).all()
        assert out[0] == np.float32(0.5) and out[4] == np.float32(-0.5)
        assert out[1] == 0.0

    def test_runaway_amplitude_clamped(self):
        a = np.array([1e9, -1e9], np.float32)
        out = sanitize_audio(a)
        assert np.abs(out).max() <= 4.0

    def test_pack_pcm16_survives_nan(self):
        pcm = pack_pcm16(np.array([np.nan, 0.5, np.inf], np.float32))
        assert pcm.dtype == np.int16
        assert pcm[0] == 0
        assert pcm[1] == int(0.5 * 32767)
        assert pcm[2] == 32767  # inf -> clamp -> full scale


class TestTrunkingRejectsBadAir:
    def test_corrupt_iden_not_stored_and_grant_rejected(self, tmp_path):
        from tests.test_trunking import make_system
        from wavecap_tpu.decoders import p25_tsbk as tsbk

        sys_ = make_system(tmp_path)
        # a CRC-lucky IDEN decoding to base 0 MHz must be rejected
        bad = tsbk.parse_tsbk(
            0x3D, 0, tsbk.make_iden_up_data(identifier=2, base_freq_mhz=0.0)
        )
        sys_._handle_tsbk({**bad, "nac": 1}, None)
        assert 2 not in sys_.identifiers
        assert any(e["type"] == "iden_rejected" for e in sys_.events)

    def test_good_iden_still_stored(self, tmp_path):
        from tests.test_trunking import make_system
        from wavecap_tpu.decoders import p25_tsbk as tsbk

        sys_ = make_system(tmp_path)
        good = tsbk.parse_tsbk(
            0x3D, 0, tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0)
        )
        sys_._handle_tsbk({**good, "nac": 1}, None)
        assert 1 in sys_.identifiers
