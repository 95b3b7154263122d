"""CLI surface: list-devices / capture-iq / demod / decode-iq end-to-end.

Reference tier: ``cli.py`` offline/batch paths driven on synthetic inputs
(the reference exercises these manually via scripts/harness-*.sh; here
they are pinned in CI on the fake driver + synthesized IQ)."""

import json
import sys

import numpy as np
import pytest

from wavecap_tpu import cli
from wavecap_tpu.decoders import p25_frames as pf
from wavecap_tpu.decoders import p25_tsbk as tsbk
from wavecap_tpu.utils.wavio import read_audio_wav, read_iq_wav, write_iq_wav


def run_cli(monkeypatch, *argv) -> int:
    monkeypatch.setattr(sys, "argv", ["wavecap_tpu", *argv])
    return cli.main()


class TestListAndCapture:
    def test_list_devices_fake(self, monkeypatch, capsys):
        assert run_cli(monkeypatch, "list-devices", "--driver", "fake") == 0
        out = capsys.readouterr().out
        assert "fake0" in out and "fake" in out

    def test_capture_iq_to_wav(self, monkeypatch, tmp_path, capsys):
        out = tmp_path / "iq.wav"
        rc = run_cli(
            monkeypatch, "capture-iq", "--driver", "fake",
            "--freq", "100e6", "--rate", "800e3",  # SDR-style literal must parse
            "--duration", "0.25", "--output", str(out),
        )
        assert rc == 0 and out.exists()
        iq, rate = read_iq_wav(out)
        assert rate == 800_000
        assert len(iq) == int(0.25 * 800_000)
        assert np.iscomplexobj(iq)


class TestDemod:
    def test_wbfm_iq_file_to_audio(self, monkeypatch, tmp_path):
        # synthesize 1.2 s of WBFM (1 kHz program, 75 kHz deviation)
        rate = 240_000
        t = np.arange(int(1.2 * rate)) / rate
        phase = (
            2 * np.pi * 75e3 * np.cumsum(0.8 * np.sin(2 * np.pi * 1000 * t)) / rate
        )
        iq = np.exp(1j * phase).astype(np.complex64)
        src = tmp_path / "fm.wav"
        write_iq_wav(src, iq, rate)
        dst = tmp_path / "audio.wav"
        rc = run_cli(
            monkeypatch, "demod", "--input", str(src), "--mode", "wbfm",
            "--output", str(dst),
        )
        assert rc == 0 and dst.exists()
        audio, arate = read_audio_wav(dst)
        assert arate == 48_000 and len(audio) > 24_000
        seg = audio[4800:] - np.mean(audio[4800:])
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = float(np.fft.rfftfreq(len(seg), 1 / arate)[np.argmax(spec)])
        assert abs(f - 1000.0) < 20.0, f

    def test_demod_dsp_overrides_and_notch(self, monkeypatch, tmp_path):
        """--notch and --dsp flow into the demod config: a 900 Hz notch
        kills the 900 Hz program tone while 700 Hz survives."""
        rate = 48_000
        t = np.arange(2 * rate) / rate
        msg = 0.5 * np.sin(2 * np.pi * 700 * t) + 0.5 * np.sin(2 * np.pi * 900 * t)
        phase = 2 * np.pi * 2500 * np.cumsum(msg) / rate
        iq = np.exp(1j * phase).astype(np.complex64)
        src = tmp_path / "nbfm.wav"
        write_iq_wav(src, iq, rate)
        dst = tmp_path / "a.wav"
        rc = run_cli(
            monkeypatch, "demod", "--input", str(src), "--mode", "nbfm",
            "--notch", "900", "--dsp", "enable_lowpass=true",
            "--output", str(dst),
        )
        assert rc == 0
        audio, arate = read_audio_wav(dst)
        a = audio[len(audio) // 2:]
        sp = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2

        def band(hz):
            k = round(hz * len(a) / arate)
            return 10 * np.log10(sp[k - 3 : k + 4].sum() + 1e-30)

        assert band(700) - band(900) > 20, (band(700), band(900))

    def test_demod_bad_dsp_flag_errors(self, monkeypatch, tmp_path):
        src = tmp_path / "x.wav"
        write_iq_wav(src, np.zeros(4800, np.complex64), 48_000)
        with pytest.raises(SystemExit, match="field=value"):
            run_cli(
                monkeypatch, "demod", "--input", str(src), "--mode", "nbfm",
                "--dsp", "not-an-assignment", "--output", str(tmp_path / "o.wav"),
            )

    def test_raw_cf32_with_offset(self, monkeypatch, tmp_path):
        rate = 96_000
        t = np.arange(int(0.8 * rate)) / rate
        phase = (
            2 * np.pi * 4e3 * np.cumsum(np.sin(2 * np.pi * 700 * t)) / rate
        )
        # NBFM carrier 10 kHz off-center; --offset mixes it back
        iq = (np.exp(1j * (phase + 2 * np.pi * 10e3 * t))).astype(np.complex64)
        src = tmp_path / "raw.cf32"
        np.ascontiguousarray(iq).view(np.float32).tofile(src)
        dst = tmp_path / "nb.wav"
        rc = run_cli(
            monkeypatch, "demod", "--input", str(src), "--mode", "nbfm",
            "--rate", str(rate), "--offset", "10e3", "--output", str(dst),
        )
        assert rc == 0
        audio, arate = read_audio_wav(dst)
        seg = audio[4800:] - np.mean(audio[4800:])
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = float(np.fft.rfftfreq(len(seg), 1 / arate)[np.argmax(spec)])
        assert abs(f - 700.0) < 20.0, f

    def test_demod_requires_rate_for_raw(self, monkeypatch, tmp_path):
        src = tmp_path / "raw.cf32"
        np.zeros(1024, np.float32).tofile(src)
        with pytest.raises(SystemExit):
            run_cli(monkeypatch, "demod", "--input", str(src),
                    "--output", str(tmp_path / "o.wav"))


class TestDecodeIq:
    def test_p25_cc_statistics(self, monkeypatch, tmp_path, capsys):
        from wavecap_tpu.models.p25.c4fm import modulate_c4fm

        pieces = []
        # standard TSDUs carry exactly 3 TSBK blocks; decode-iq streams
        # 0.5 s blocks and drops the tail, so ~30 frames make ~2.7 s
        for _ in range(30):
            iden = pf.encode_tsbk_block(
                tsbk.TSBKOpcode.IDEN_UP,
                tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0),
                last=False,
            )
            grant = pf.encode_tsbk_block(
                tsbk.TSBKOpcode.GRP_V_CH_GRANT,
                tsbk.make_group_grant_data(
                    tgid=101, source_id=7, band=1, channel_number=3
                ),
                last=False,
            )
            rfss = pf.encode_tsbk_block(
                tsbk.TSBKOpcode.RFSS_STS_BCAST,
                tsbk.make_rfss_status_data(
                    system_id=0x123, rfss_id=1, site_id=7, band=1,
                    channel_number=0,
                ),
                last=True,
            )
            pieces.append(pf.build_tsdu_frame(0x293, [iden, grant, rfss]))
        iq = modulate_c4fm(np.concatenate(pieces), 48_000).astype(np.complex64)
        src = tmp_path / "cc.wav"
        write_iq_wav(src, iq, 48_000)
        msgs = tmp_path / "messages.json"
        rc = run_cli(
            monkeypatch, "decode-iq", "--input", str(src),
            "--messages", str(msgs),
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.split("wrote")[0])
        assert stats["tsdu"] >= 25
        assert stats["crc_rate"] >= 0.95, stats
        parsed = json.loads(msgs.read_text())
        types = {m.get("type") for m in parsed}
        assert "GROUP_VOICE_GRANT" in types or "GRP_V_CH_GRANT" in types, types
