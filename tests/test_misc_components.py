"""MCP server, DMR/FLEX decoders, encoders, namers."""

import json

import numpy as np
import pytest

from wavecap_tpu.decoders import dmr, flex
from wavecap_tpu.server.encoders import available_formats, make_encoder
from wavecap_tpu.utils import namers


class TestDMR:
    def test_burst_detection(self, rng):
        bursts_tx = [
            dmr.build_test_burst("BS_DATA", rng),
            dmr.build_test_burst("BS_VOICE", rng),
            dmr.build_test_burst("BS_DATA", rng),
        ]
        soft = dmr.DIBIT_SYMBOLS[np.concatenate(bursts_tx)]
        soft = soft + rng.normal(0, 0.2, len(soft)).astype(np.float32)
        dec = dmr.DMRDecoder()
        found = []
        for i in range(0, len(soft), 100):
            found += dec.process(soft[i : i + 100])
        assert len(found) >= 2
        kinds = [b.kind for b in found]
        assert "BS_DATA" in kinds and "BS_VOICE" in kinds
        assert found[0].payload_bits.shape == (240,)

    def test_noise_only(self, rng):
        dec = dmr.DMRDecoder()
        assert dec.process(rng.normal(0, 2, 2000).astype(np.float32)) == []


class TestFLEX:
    def test_roundtrip(self):
        bits = flex.encode_frame(123456, "TEST PAGE")
        audio = flex.modulate_flex(bits)
        dec = flex.FlexDecoder(48_000)
        msgs = dec.process_audio(audio)
        assert msgs and msgs[0].capcode == 123456
        assert msgs[0].content.startswith("TEST PAGE")

    def test_noise_only(self, rng):
        dec = flex.FlexDecoder(48_000)
        assert dec.process_audio(rng.normal(0, 1, 48_000).astype(np.float32)) == []


class TestEncoders:
    def test_available_formats(self):
        fmts = available_formats()
        assert "pcm16" in fmts and "f32" in fmts

    def test_passthrough(self):
        enc = make_encoder("pcm16")
        out = enc.encode(np.asarray([0.0, 0.5, -0.5], np.float32))
        pcm = np.frombuffer(out, np.int16)
        assert list(pcm) == [0, 16383, -16383]
        enc2 = make_encoder("f32")
        assert len(enc2.encode(np.zeros(10, np.float32))) == 40


class TestNamers:
    def test_frequency_names(self):
        assert namers.frequency_name(90.3e6) == "FM 90.3"
        assert "Marine" in namers.frequency_name(156.8e6)
        assert "(ch 16)" in namers.frequency_name(156.8e6)
        assert "800 MHz Trunking" in namers.frequency_name(851.0125e6)

    def test_mode_hint(self):
        assert namers.mode_hint(90.3e6) == "wbfm"
        assert namers.mode_hint(155.0e6) == "nbfm"
        assert namers.mode_hint(852.0e6) == "p25"

    def test_device_nickname(self):
        assert namers.device_nickname("Generic RTL2832U OEM", "00001234") == "RTL 1234"
        assert namers.device_nickname("Fake SDR 0") == "Fake"


class TestP25Attachment:
    def test_conventional_p25_channel_decodes_tsbk(self):
        """A p25-mode channel + 'p25' attachment surfaces TSBK messages
        from the symbol fan-out (conventional, non-trunked decode)."""
        import time as _t

        import numpy as np

        from wavecap_tpu.capture.attachments import P25Attachment
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders import p25_tsbk as tsbk
        from wavecap_tpu.utils.broadcast import FanOut

        class FakeChannel:
            id = "chx"

            def __init__(self):
                self.symbols = FanOut(maxsize=16)
                self.audio = FanOut(maxsize=16)

        ch = FakeChannel()
        att = P25Attachment(ch)
        try:
            rfss = pf.encode_tsbk_block(
                tsbk.TSBKOpcode.RFSS_STS_BCAST,
                tsbk.make_rfss_status_data(
                    system_id=0x111, rfss_id=1, site_id=4, band=1, channel_number=2
                ),
            )
            last = pf.encode_tsbk_block(
                tsbk.TSBKOpcode.IDEN_UP,
                tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0),
                last=True,
            )
            frame = pf.build_tsdu_frame(0x293, [rfss, rfss, last])
            soft = pf.DIBIT_SYMBOLS[frame].astype(np.float32)
            ch.symbols.publish({"soft": soft, "dibits": frame, "rssi": -40.0})
            deadline = _t.time() + 10
            while _t.time() < deadline and not att.messages:
                _t.sleep(0.1)
            assert att.messages, "no TSBK decoded by attachment"
            msg = att.messages[0]
            assert msg["type"] == "RFSS_STATUS" and msg["site_id"] == 4
            st = att.status()
            assert st["syncCount"] >= 1 and st["frames"].get("TSDU", 0) >= 1
        finally:
            att.stop()


class TestDmrAttachment:
    def test_dmr_channel_decodes_csbk_and_voice(self):
        """A 'dmr' attachment on a p25-mode channel's symbol fan-out
        surfaces CSBK messages and voice superframes."""
        import time as _t

        import numpy as np

        from wavecap_tpu.capture.attachments import DmrAttachment
        from wavecap_tpu.decoders import dmr
        from wavecap_tpu.utils.broadcast import FanOut

        class FakeChannel:
            id = "chd"

            def __init__(self):
                self.symbols = FanOut(maxsize=16)
                self.audio = FanOut(maxsize=16)

        ch = FakeChannel()
        att = DmrAttachment(ch)
        audio_sub = ch.audio.subscribe(maxsize=16)
        try:
            csbk_bits = dmr.make_csbk_bits(
                0x30, dst_id=800, src_id=900, channel=3  # PV_GRANT
            )
            burst = dmr.build_data_burst(csbk_bits, dmr.DataType.CSBK)
            rng = np.random.default_rng(21)
            # real encoder frames so the superframe synthesizes voice, not
            # concealment noise
            from wavecap_tpu.decoders.ambe_vocoder import AmbeEncoder

            t = np.arange(int(0.6 * 8000)) / 8000.0
            x = np.zeros_like(t)
            for k, a in ((1, 1.0), (2, 0.6), (3, 0.45), (4, 0.3), (5, 0.2)):
                x += a * np.sin(2 * np.pi * 160.0 * k * t)
            tone = (0.3 * x / np.max(np.abs(x))).astype(np.float32)
            ambe = AmbeEncoder().encode(tone)[:18]
            voice = dmr.build_voice_superframe(ambe, rng=rng)
            stream = np.concatenate([burst, voice])
            soft = dmr.DIBIT_SYMBOLS[stream].astype(np.float32)
            ch.symbols.publish({"soft": soft, "rssi": -50.0})
            deadline = _t.time() + 10
            while _t.time() < deadline and len(att.messages) < 2:
                _t.sleep(0.1)
            kinds = [m.get("type") for m in att.messages]
            assert "PV_GRANT" in kinds
            assert "VOICE_SUPERFRAME" in kinds
            st = att.status()
            assert st["voiceSuperframes"] == 1
            assert st["ambeFramesHeld"] == 18
            # the superframe must have synthesized audible PCM on the
            # channel audio stream (the reference has no DMR audio path)
            pcm = audio_sub.get_nowait()
            assert pcm is not None and len(pcm) == 18 * 160
            assert st["ambeFramesDecoded"] == 18
            seg = pcm[800:] - np.mean(pcm[800:])
            spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            f = float(np.fft.rfftfreq(len(seg), 1 / 8000)[np.argmax(spec)])
            assert abs(f - 160.0) < 25.0, f
        finally:
            audio_sub.close()
            att.stop()
