"""P25 Phase 2 MAC layer (xCCH) round trips — beyond the reference, which
captures Phase 2 bursts but never parses control content."""

import numpy as np

from wavecap_tpu.decoders import p25_mac as mac
from wavecap_tpu.decoders import p25_tsbk as tsbk


class TestMacPdus:
    def test_ptt_roundtrip(self):
        pdu = mac.make_mac_ptt(tgid=0x1234, source=0xABCDE, algid=0x80)
        parsed = mac.parse_mac_pdu(pdu)
        assert parsed["mac"] == "PTT"
        assert parsed["tgid"] == 0x1234
        assert parsed["source_id"] == 0xABCDE
        assert parsed["encrypted"] is False

    def test_encrypted_ptt_detected(self):
        pdu = mac.make_mac_ptt(
            tgid=7, source=9, algid=0xAA, keyid=0x0101, mi=bytes(range(9))
        )
        parsed = mac.parse_mac_pdu(pdu)
        assert parsed["encrypted"] is True
        assert parsed["algid"] == 0xAA and parsed["keyid"] == 0x0101
        assert parsed["mi"] == bytes(range(9)).hex()

    def test_end_ptt_roundtrip(self):
        parsed = mac.parse_mac_pdu(mac.make_mac_end_ptt(tgid=55, source=777))
        assert parsed["mac"] == "END_PTT"
        assert parsed["tgid"] == 55 and parsed["source_id"] == 777

    def test_idle_with_abbreviated_grant_and_iden(self):
        """MAC content frames carry Phase 1 TSBK layouts under 0x40|op —
        the proven TSBK parser handles the payloads."""
        grant = mac.make_mac_message(
            0x00, tsbk.make_group_grant_data(tgid=1001, source_id=42, band=1, channel_number=88)
        )
        iden = mac.make_mac_message(
            0x3D, tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0)
        )
        parsed = mac.parse_mac_pdu(mac.make_mac_content(mac.MAC_HANGTIME, [grant, iden]))
        assert parsed["mac"] == "HANGTIME"
        types = [m["type"] for m in parsed["messages"]]
        assert types == ["GROUP_VOICE_GRANT", "IDENTIFIER_UPDATE"]
        g = parsed["messages"][0]
        assert g["tgid"] == 1001 and g["channel_number"] == 88

    def test_unknown_opcode_terminates_message_list(self):
        good = mac.make_mac_message(0x00, bytes(8))
        junk = bytes([0x20]) + bytes(8)  # outside abbreviated space
        parsed = mac.parse_mac_pdu(
            mac.make_mac_content(mac.MAC_IDLE, [good, junk, good])
        )
        assert len(parsed["messages"]) == 1


class TestBurstCodec:
    def test_roundtrip_clean(self):
        payload = mac.make_mac_ptt(tgid=0x0FA0, source=0x00BEEF)[:16]
        burst = mac.encode_burst(mac.BURST_FACCH, payload)
        assert len(burst) == mac.PAYLOAD_DIBITS
        btype, got = mac.decode_burst(burst)
        assert btype == mac.BURST_FACCH
        assert got[: len(payload)] == payload

    def test_roundtrip_with_dibit_errors(self):
        """The ½-rate trellis corrects scattered dibit errors; CRC16 gates
        what it can't."""
        burst = mac.encode_burst(mac.BURST_SACCH, b"\x03")  # MAC_IDLE
        rng = np.random.default_rng(3)
        corrupted = burst.copy()
        for idx in rng.choice(
            np.arange(mac.PAYLOAD_DIBITS - 20) + 20, size=3, replace=False
        ):
            corrupted[idx] ^= 2
        out = mac.decode_burst(corrupted)
        assert out is not None and out[0] == mac.BURST_SACCH

    def test_voice_burst_rejected_by_crc(self):
        rng = np.random.default_rng(5)
        noise = rng.integers(0, 4, 180).astype(np.uint8)
        assert mac.decode_burst(noise) is None

    def test_timeslot_burst_with_sync_prefix(self):
        from wavecap_tpu.decoders.p25_phase2 import BURST_DIBITS, SYNC_DIBITS

        b = mac.encode_timeslot_burst(mac.BURST_SACCH, b"\x03", with_sync=True)
        assert len(b) == BURST_DIBITS
        assert np.array_equal(b[:20], SYNC_DIBITS)
        btype, payload = mac.decode_burst(b)
        assert btype == mac.BURST_SACCH and payload[0] == 0x03


class TestRecorderWiring:
    def _fragment_with(self, slot_bursts):
        """Build a 720-dibit fragment whose 4 bursts are given per index."""
        from wavecap_tpu.decoders.p25_phase2 import (
            FRAGMENT_DIBITS,
            build_test_fragment,
        )

        frag = np.zeros(FRAGMENT_DIBITS, np.uint8)
        for i, burst in enumerate(slot_bursts):
            frag[i * 180 : (i + 1) * 180] = burst
        return build_test_fragment(frag)  # stamps the 360/540 syncs

    def test_end_ptt_ends_call_promptly(self):
        import time

        from wavecap_tpu.decoders.p25_phase2 import DIBIT_SYMBOLS
        from wavecap_tpu.trunking.recorder import CallInfo, VoiceRecorder

        rec = VoiceRecorder(0, "voice0", protocol="p25_phase2")
        rec.assign(
            CallInfo(tgid=10, source_id=1, frequency_hz=852e6,
                     start_time=time.time(), tdma_slot=0)
        )
        assert rec.recording
        facch = mac.encode_timeslot_burst(
            mac.BURST_FACCH, mac.make_mac_end_ptt(10, 1)
        )
        voice = np.random.default_rng(0).integers(0, 4, 180).astype(np.uint8)
        frag = self._fragment_with([facch, voice, voice, voice])
        soft = DIBIT_SYMBOLS[frag]
        # preceded by noise so the detector has context, then the fragment
        rec.process_symbols(
            np.concatenate([np.zeros(50, np.float32), soft]), now=time.time()
        )
        assert rec.last_activity == 0.0  # terminator semantics

    def test_encrypted_ptt_marks_call(self):
        import time

        from wavecap_tpu.decoders.p25_phase2 import DIBIT_SYMBOLS
        from wavecap_tpu.trunking.recorder import CallInfo, VoiceRecorder

        rec = VoiceRecorder(0, "voice0", protocol="p25_phase2")
        rec.assign(
            CallInfo(tgid=10, source_id=0, frequency_hz=852e6,
                     start_time=time.time(), tdma_slot=0)
        )
        ptt = mac.make_mac_ptt(tgid=10, source=4321, algid=0x84, keyid=2)
        facch = mac.encode_timeslot_burst(mac.BURST_FACCH, ptt)
        voice = np.random.default_rng(0).integers(0, 4, 180).astype(np.uint8)
        frag = self._fragment_with([facch, voice, voice, voice])
        rec.process_symbols(DIBIT_SYMBOLS[frag].astype(np.float32), now=time.time())
        assert rec.call.encrypted is True
        assert rec.call.algid == 0x84 and rec.call.keyid == 2
        assert rec.call.source_id == 4321
