"""P25 end-to-end round trip: TSBK encode -> C4FM modulate -> demod -> decode.

The self-checking strategy the reference uses (its own trunking encoders
round-trip its decoders, reference ``tests/test_tsbk_decoder_roundtrip.py``),
extended through the full physical layer: the synthesized control channel
goes through real C4FM modulation, the JAX demodulator with timing
recovery, the streaming framer, and the FEC/TSBK decode stack.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wavecap_tpu.decoders import p25_frames as pf
from wavecap_tpu.decoders import p25_tsbk as tsbk
from wavecap_tpu.decoders.framer import P25Framer
from wavecap_tpu.models.p25.c4fm import (
    C4fmConfig,
    c4fm_init,
    c4fm_demodulate,
    modulate_c4fm,
    n_symbols_per_block,
)


def make_control_channel_dibits(nac=0x293, n_frames=8):
    """A stream of TSDU frames with idle padding between them."""
    rng = np.random.default_rng(5)
    pieces = []
    expected = []
    for k in range(n_frames):
        grant = pf.encode_tsbk_block(
            tsbk.TSBKOpcode.GRP_V_CH_GRANT,
            tsbk.make_group_grant_data(
                tgid=100 + k, source_id=7_000_000 + k, band=1, channel_number=0x123
            ),
        )
        iden = pf.encode_tsbk_block(
            tsbk.TSBKOpcode.IDEN_UP,
            tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.00625),
        )
        rfss = pf.encode_tsbk_block(
            tsbk.TSBKOpcode.RFSS_STS_BCAST,
            tsbk.make_rfss_status_data(
                system_id=0x2F5, rfss_id=1, site_id=3, band=1, channel_number=0x0AA
            ),
            last=True,
        )
        frame = pf.build_tsdu_frame(nac, [grant, iden, rfss])
        pieces.append(frame)
        expected.append((100 + k, 7_000_000 + k))
        # random idle dibits between frames (won't sync)
        pieces.append(rng.integers(0, 4, size=60).astype(np.uint8))
    return np.concatenate(pieces), expected


class TestBitLevelRoundtrip:
    """Decode directly from clean dibits (no modem)."""

    def test_tsdu_frame_roundtrip(self):
        dibits, _ = make_control_channel_dibits(n_frames=1)
        # locate sync at position 0
        frame = pf.decode_tsdu(dibits)
        assert frame is not None
        assert frame.nid.nac == 0x293
        assert frame.nid.duid == pf.DUID.TSDU
        assert len(frame.tsbk_blocks) == 3
        assert all(b.crc_valid for b in frame.tsbk_blocks)
        g = tsbk.parse_tsbk(
            frame.tsbk_blocks[0].opcode,
            frame.tsbk_blocks[0].mfid,
            frame.tsbk_blocks[0].data,
        )
        assert g["type"] == "GROUP_VOICE_GRANT"
        assert g["tgid"] == 100
        assert g["channel_number"] == 0x123
        i = tsbk.parse_tsbk(
            frame.tsbk_blocks[1].opcode,
            frame.tsbk_blocks[1].mfid,
            frame.tsbk_blocks[1].data,
        )
        assert i["type"] == "IDENTIFIER_UPDATE"
        ident = tsbk.iden_from_parsed(i)
        assert abs(ident.frequency_hz(0x123) - (851.00625e6 + 0x123 * 12500)) < 10
        r = tsbk.parse_tsbk(
            frame.tsbk_blocks[2].opcode,
            frame.tsbk_blocks[2].mfid,
            frame.tsbk_blocks[2].data,
        )
        assert r["type"] == "RFSS_STATUS"
        assert r["system_id"] == 0x2F5 and r["site_id"] == 3

    def test_tsbk_with_dibit_errors(self, rng):
        dibits, _ = make_control_channel_dibits(n_frames=1)
        rx = dibits.copy()
        # flip 2 isolated payload dibits
        for p in (80, 150):
            rx[p] ^= 2
        frame = pf.decode_tsdu(rx)
        assert frame is not None
        assert frame.tsbk_blocks[0].crc_valid


class TestModemRoundtrip:
    def test_full_physical_layer(self):
        fs = 48_000
        dibits, expected = make_control_channel_dibits(n_frames=6)
        iq = modulate_c4fm(dibits, fs)
        # pad with noise-free dead air front and back
        iq = np.concatenate(
            [np.ones(2000, np.complex64), iq, np.ones(2000, np.complex64)]
        )

        cfg = C4fmConfig(sample_rate=fs)
        state = c4fm_init(cfg)
        framer = P25Framer()
        block = 4800
        grants = []
        n_blocks = len(iq) // block
        for i in range(n_blocks):
            soft, _, state = c4fm_demodulate(
                jnp.asarray(iq[i * block : (i + 1) * block]), state, cfg
            )
            for frame in framer.process(np.asarray(soft)):
                if frame.duid != pf.DUID.TSDU:
                    continue
                payload = pf.remove_status_dibits(frame.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(payload):
                    if b.crc_valid and b.opcode == tsbk.TSBKOpcode.GRP_V_CH_GRANT:
                        g = tsbk.parse_tsbk(b.opcode, b.mfid, b.data)
                        grants.append((g["tgid"], g["source_id"]))
        assert framer.sync_count >= 4
        # at least 2/3 of the frames fully decoded with valid CRC grants
        hits = [e for e in expected if e in grants]
        assert len(hits) >= len(expected) * 2 // 3, (grants, expected)

    def test_with_noise_and_freq_offset(self):
        fs = 48_000
        rng = np.random.default_rng(11)
        dibits, expected = make_control_channel_dibits(n_frames=6)
        iq = modulate_c4fm(dibits, fs)
        # 150 Hz carrier error + AWGN at ~14 dB SNR
        t = np.arange(len(iq)) / fs
        iq = iq * np.exp(2j * np.pi * 150.0 * t)
        iq = iq + 0.2 * (
            rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq))
        ).astype(np.complex64) / np.sqrt(2)
        iq = np.concatenate([np.zeros(1000, np.complex64), iq]).astype(np.complex64)

        cfg = C4fmConfig(sample_rate=fs)
        state = c4fm_init(cfg)
        framer = P25Framer()
        ok_crc = 0
        total_tsbk = 0
        block = 4800
        for i in range(len(iq) // block):
            soft, _, state = c4fm_demodulate(
                jnp.asarray(iq[i * block : (i + 1) * block]), state, cfg
            )
            for frame in framer.process(np.asarray(soft)):
                if frame.duid != pf.DUID.TSDU:
                    continue
                payload = pf.remove_status_dibits(frame.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(payload):
                    total_tsbk += 1
                    ok_crc += int(b.crc_valid)
        assert framer.sync_count >= 3
        assert total_tsbk > 0
        assert ok_crc / total_tsbk >= 0.5


class TestFramer:
    def test_inverted_polarity(self):
        fs = 48_000
        dibits, _ = make_control_channel_dibits(n_frames=2)
        iq = modulate_c4fm(dibits, fs)
        # invert: conjugate flips the discriminator sign
        iq = np.conj(iq)
        cfg = C4fmConfig(sample_rate=fs)
        state = c4fm_init(cfg)
        framer = P25Framer()
        found = 0
        block = 4800
        for i in range(len(iq) // block):
            soft, _, state = c4fm_demodulate(
                jnp.asarray(iq[i * block : (i + 1) * block]), state, cfg
            )
            for frame in framer.process(np.asarray(soft)):
                assert frame.inverted
                if frame.duid == pf.DUID.TSDU and frame.nac == 0x293:
                    found += 1
        assert found >= 1


class TestSoftDecision:
    def test_soft_beats_hard_at_low_snr(self):
        """At the sensitivity edge, soft-metric trellis recovers more TSBKs."""
        rng = np.random.default_rng(21)
        dibits, _ = make_control_channel_dibits(n_frames=1)
        frame = dibits[:360]
        soft_clean = pf.DIBIT_SYMBOLS[frame].astype(np.float32)
        hard_wins = soft_wins = 0
        for trial in range(30):
            noisy = soft_clean + rng.normal(0, 1.25, len(frame)).astype(np.float32)
            d = np.where(
                noisy >= 0,
                np.where(np.abs(noisy) >= 2, 1, 0),
                np.where(np.abs(noisy) >= 2, 3, 2),
            ).astype(np.uint8)
            payload_d = pf.remove_status_dibits(d[57:], 57)
            payload_s = pf.remove_status_dibits(noisy[57:], 57)
            hard = pf.decode_tsbk_payload(payload_d)
            soft = pf.decode_tsbk_payload(payload_d, payload_s)
            hard_wins += sum(b.crc_valid for b in hard)
            soft_wins += sum(b.crc_valid for b in soft)
        assert soft_wins >= hard_wins
        assert soft_wins > 0

    def test_soft_equals_hard_when_clean(self):
        dibits, expected = make_control_channel_dibits(n_frames=1)
        frame = dibits[:360]
        soft = pf.DIBIT_SYMBOLS[frame].astype(np.float32)
        payload_d = pf.remove_status_dibits(frame[57:], 57)
        payload_s = pf.remove_status_dibits(soft[57:], 57)
        blocks = pf.decode_tsbk_payload(payload_d, payload_s)
        assert all(b.crc_valid for b in blocks) and len(blocks) == 3


class TestPDU:
    """Packet Data Unit decode (beyond the reference, which only
    classifies DUID 0xC — reference ``decoders/p25.py:1413,2255``)."""

    def test_bit_level_roundtrip(self):
        data = bytes(range(64))
        payload = pf.encode_pdu(sap=0x04, llid=0x123456, data=data)
        f = pf.decode_pdu(payload)
        assert f.header.crc_valid and f.crc32_valid
        assert f.header.sap == 0x04 and f.header.llid == 0x123456
        assert f.data == data

    def test_pad_and_sizes(self):
        for n in (0, 1, 11, 12, 13, 100):
            data = bytes((i * 7) & 0xFF for i in range(n))
            f = pf.decode_pdu(pf.encode_pdu(sap=1, llid=9, data=data))
            assert f.crc32_valid and f.data == data, n

    def test_corrupt_data_fails_crc32(self):
        payload = pf.encode_pdu(sap=1, llid=9, data=bytes(24))
        bad = payload.copy()
        bad[150] ^= 2  # inside a data block
        f = pf.decode_pdu(bad)
        # single dibit error is trellis-corrected; many errors break CRC32
        many = payload.copy()
        many[120:160] ^= 1
        f2 = pf.decode_pdu(many)
        assert f.crc32_valid
        assert not f2.crc32_valid

    def test_through_modem(self):
        """Variable-length PDU through C4FM + framer (dynamic frame length)."""
        fs = 48_000
        data = b"LRRP-style payload \x01\x02\x03\x04" * 3
        payload = pf.encode_pdu(sap=0x04, llid=0xBEEF, data=data)
        frame = pf.build_pdu_frame(0x293, payload)
        rng = np.random.default_rng(9)
        stream = np.concatenate(
            [
                rng.integers(0, 4, 50).astype(np.uint8),
                frame,
                rng.integers(0, 4, 300).astype(np.uint8),
            ]
        )
        iq = modulate_c4fm(stream, fs)
        iq = np.concatenate([np.ones(2000, np.complex64), iq, np.ones(2000, np.complex64)])
        cfg = C4fmConfig(sample_rate=fs)
        state = c4fm_init(cfg)
        framer = P25Framer()
        got = []
        block = 4800
        for i in range(len(iq) // block):
            soft, _, state = c4fm_demodulate(
                jnp.asarray(iq[i * block : (i + 1) * block]), state, cfg
            )
            for fr in framer.process(np.asarray(soft)):
                if fr.duid != pf.DUID.PDU:
                    continue
                pl = pf.remove_status_dibits(fr.dibits[57:], 57)
                sl = pf.remove_status_dibits(fr.soft[57:], 57)
                got.append(pf.decode_pdu(pl, sl))
        assert got, "no PDU frame recovered"
        f = got[0]
        assert f.header.crc_valid and f.crc32_valid
        assert f.data == data


class TestBlockTimingAcquisition:
    def test_acquires_within_two_blocks_any_phase(self):
        """The feedforward Oerder-Meyr phase estimator must lock the
        block-timing demod within ~2 blocks regardless of where in the
        symbol grid the stream starts (the pure Gardner-Newton search had
        a spurious stall half a symbol off center that stretched
        acquisition to multi-second, phase-dependent transients)."""
        fs = 48_000
        data = tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0)
        blocks = [
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=False),
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=False),
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=True),
        ]
        dibits = np.concatenate(
            [pf.build_tsdu_frame(0x293, blocks) for _ in range(40)]
        )
        iq = modulate_c4fm(dibits, fs)
        block = 4800  # 0.1 s, 480 symbols
        for phase0 in range(0, 10, 2):  # start offsets across one symbol
            cfg = C4fmConfig(sample_rate=fs)
            state = c4fm_init(cfg)
            framer = P25Framer()
            ok_after_two = 0
            total_after_two = 0
            x = iq[phase0:]
            for i in range(2, len(x) // block):
                soft, _, state = c4fm_demodulate(
                    jnp.asarray(x[i * block : (i + 1) * block]), state, cfg
                )
                if i < 2:
                    framer.process(np.asarray(soft))
                    continue
                for fr in framer.process(np.asarray(soft)):
                    if fr.duid != pf.DUID.TSDU:
                        continue
                    payload = pf.remove_status_dibits(fr.dibits[57:], 57)
                    sl = pf.remove_status_dibits(fr.soft[57:], 57)
                    for blk in pf.decode_tsbk_payload(payload, sl):
                        total_after_two += 1
                        ok_after_two += int(blk.crc_valid)
            assert total_after_two >= 10, f"phase {phase0}: too few TSBKs"
            rate = ok_after_two / total_after_two
            assert rate >= 0.95, f"phase {phase0}: steady CRC {rate:.2f}"


class TestSteadyStateCounters:
    def test_monitor_excludes_acquisition_window(self):
        """ControlChannelMonitor: steady counters start only after
        STEADY_MIN_OK passing blocks, so early CRC failures don't poison
        the steady-state rate."""
        from wavecap_tpu.trunking.control import (
            STEADY_MIN_OK,
            ControlChannelMonitor,
        )

        mon = ControlChannelMonitor()
        data = tsbk.make_iden_up_data(identifier=1, base_freq_mhz=851.0)
        blocks = [
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=False),
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=False),
            pf.encode_tsbk_block(tsbk.TSBKOpcode.IDEN_UP, data, last=True),
        ]
        frame = pf.build_tsdu_frame(0x293, blocks)
        sym = pf.DIBIT_SYMBOLS[frame].astype(np.float32)
        # corrupt the first few frames (acquisition), then send clean ones
        bad = sym.copy()
        bad[60:200] = -bad[60:200]
        for _ in range(4):
            mon.process_symbols(bad, now=0.0)
        for _ in range(STEADY_MIN_OK + 10):
            mon.process_symbols(sym, now=0.0)
        st = mon.stats
        assert st.tsbk_total > st.tsbk_total_steady > 0
        assert st.crc_rate_steady == 1.0
        assert st.crc_rate < 1.0


class TestC4fmSimulcastEqualizer:
    def test_70us_equal_power_echo_decodes(self):
        """Round-4: the shared echo-fit MMSE equalizer
        (models/p25/equalizer.py) with the EMPIRICAL C4FM template lifts
        the 70 us @ -1.9 dB simulcast row from 0.00 to >=0.9 CRC (the
        reference's C4FM chain has no equalizer and collapses)."""
        import numpy as np
        import jax.numpy as jnp

        from tests.test_trunking import make_p25_cc_iq
        from wavecap_tpu.decoders import p25_frames as pf
        from wavecap_tpu.decoders.framer import P25Framer
        from wavecap_tpu.models.p25.c4fm import (
            C4fmConfig,
            c4fm_demodulate,
            c4fm_init,
        )

        iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=12, modulation="c4fm")
        sig_p = float(np.mean(np.abs(iq0) ** 2))
        rng = np.random.default_rng(31)
        d = int(round(70e-6 * 48_000))
        echo = np.concatenate(
            [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
        ) * (0.8 * np.exp(1j * 2.98))
        sig = iq0 + echo
        noise_std = np.sqrt(sig_p / 10 / 2)
        x = np.concatenate(
            [
                np.zeros(1000, np.complex64),
                (
                    sig
                    + noise_std
                    * (
                        rng.standard_normal(len(sig))
                        + 1j * rng.standard_normal(len(sig))
                    )
                ).astype(np.complex64),
            ]
        )
        cfg = C4fmConfig(sample_rate=48_000, equalizer_taps=127)
        state = c4fm_init(cfg)
        framer = P25Framer()
        ok = tot = 0
        for i in range(len(x) // 4800):
            soft, _, state = c4fm_demodulate(
                jnp.asarray(x[i * 4800 : (i + 1) * 4800]), state, cfg
            )
            for f in framer.process(np.asarray(soft)):
                if f.duid != pf.DUID.TSDU:
                    continue
                pl = pf.remove_status_dibits(f.dibits[57:], 57)
                for b in pf.decode_tsbk_payload(pl):
                    tot += 1
                    ok += b.crc_valid
        assert tot >= 25 and ok / tot >= 0.88, (ok, tot)
