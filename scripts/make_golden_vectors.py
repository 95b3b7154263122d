"""One-time generator for cross-implementation golden parity vectors.

Runs the REFERENCE implementation's numpy DSP (``/root/reference/backend``:
``dsp/fm.py`` wbfm_demod, ``dsp/p25/c4fm.py`` C4FMDemodulator.demodulate)
on deterministic synthetic IQ and stores input + reference output in
``tests/golden/*.npz``.  ``tests/test_reference_parity.py`` then pins this
repo's demodulators against those vectors, so a shared spec
misunderstanding between our modulator and demodulator cannot pass
silently (VERDICT round 1, missing item 10).

Run offline:  python scripts/make_golden_vectors.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tests" / "golden"


def make_wbfm_iq(fs=240_000, seconds=1.0, seed=7):
    """Deterministic WBFM program: 1 kHz + 400 Hz tones, 75 kHz deviation."""
    t = np.arange(int(fs * seconds)) / fs
    program = 0.6 * np.sin(2 * np.pi * 1000 * t) + 0.3 * np.sin(2 * np.pi * 400 * t)
    phase = 2 * np.pi * 75_000 * np.cumsum(program) / fs
    iq = np.exp(1j * phase).astype(np.complex64)
    rng = np.random.default_rng(seed)
    iq = iq + (0.001 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))).astype(
        np.complex64
    )
    return iq


def make_c4fm_iq():
    """C4FM IQ from this repo's modulator carrying real P25 frames (TSDU
    grants + an LDU), at 48 kHz / 10 samples per symbol."""
    sys.path.insert(0, str(REPO))
    from wavecap_tpu.decoders import p25_frames as pf
    from wavecap_tpu.decoders import p25_tsbk as tsbk
    from wavecap_tpu.models.p25.c4fm import modulate_c4fm

    rng = np.random.default_rng(11)
    frames = [np.zeros(120, np.uint8)]
    for i in range(6):
        data = tsbk.make_group_grant_data(
            band=1, channel_number=0x100 + i, tgid=100 + i, source_id=7000 + i
        )
        block = pf.encode_tsbk_block(tsbk.TSBKOpcode.GRP_V_CH_GRANT, data, last=True)
        frames.append(pf.build_tsdu_frame(0x293, [block]))
        frames.append(rng.integers(0, 4, 40).astype(np.uint8))  # inter-frame noise
    dibits = np.concatenate(frames + [np.zeros(120, np.uint8)])
    iq = np.asarray(modulate_c4fm(dibits, sample_rate=48_000)).astype(np.complex64)
    noise = np.random.default_rng(13)
    iq = iq + 0.02 * (
        noise.standard_normal(len(iq)) + 1j * noise.standard_normal(len(iq))
    ).astype(np.complex64)
    return dibits, iq


def make_nbfm_iq(fs=48_000, seconds=1.0, seed=21):
    """NBFM voice-band program: 700 Hz + 300 Hz tones, 4 kHz deviation."""
    t = np.arange(int(fs * seconds)) / fs
    program = 0.7 * np.sin(2 * np.pi * 700 * t) + 0.3 * np.sin(2 * np.pi * 300 * t)
    phase = 2 * np.pi * 4_000 * np.cumsum(program) / fs
    iq = np.exp(1j * phase).astype(np.complex64)
    rng = np.random.default_rng(seed)
    return (
        iq
        + 0.002
        * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
    ).astype(np.complex64)


def make_cqpsk_iq(
    symbol_rate=12_000.0,
    alpha=1.0,
    fs=48_000.0,
    seed=31,
    noise=0.001,
    with_sync=False,
):
    """pi/4-DQPSK IQ from this repo's modulator.

    ``with_sync`` embeds the P25 frame sync periodically (exercises the
    sync-pattern phase trajectories); otherwise pure random dibits — the
    reference Phase 2 demod's per-sample Costas loop wanders on the long
    constant-rotation runs the sync pattern creates, so the Phase 2 vector
    uses random payload only."""
    sys.path.insert(0, str(REPO))
    from wavecap_tpu.models.p25.cqpsk import modulate_cqpsk

    rng = np.random.default_rng(seed)
    if with_sync:
        from wavecap_tpu.decoders.p25_frames import FRAME_SYNC_DIBITS

        parts = [np.zeros(64, np.uint8)]
        for _ in range(8):
            parts.append(np.asarray(FRAME_SYNC_DIBITS, np.uint8))
            parts.append(rng.integers(0, 4, 360).astype(np.uint8))
        dibits = np.concatenate(parts + [np.zeros(64, np.uint8)])
    else:
        dibits = rng.integers(0, 4, 3200).astype(np.uint8)
    iq = modulate_cqpsk(
        dibits, sample_rate=fs, symbol_rate=symbol_rate, alpha=alpha
    ).astype(np.complex64)
    nz = np.random.default_rng(seed + 1)
    iq = iq + noise * (
        nz.standard_normal(len(iq)) + 1j * nz.standard_normal(len(iq))
    ).astype(np.complex64)
    return dibits, iq


def make_am_iq(fs=48_000, seconds=1.0, seed=23):
    """AM: 600 Hz tone at 60% modulation depth."""
    t = np.arange(int(fs * seconds)) / fs
    env = 1.0 + 0.6 * np.sin(2 * np.pi * 600 * t)
    rng = np.random.default_rng(seed)
    return (
        0.5 * env
        + 0.002
        * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
    ).astype(np.complex64)


def main() -> None:
    sys.path.insert(0, "/root/reference/backend")
    from wavecapsdr.dsp.am import am_demod
    from wavecapsdr.dsp.fm import nbfm_demod, wbfm_demod
    from wavecapsdr.dsp.p25.c4fm import C4FMDemodulator

    OUT.mkdir(parents=True, exist_ok=True)

    iq = make_nbfm_iq()
    audio = nbfm_demod(iq, 48_000, audio_rate=48_000)
    np.savez_compressed(
        OUT / "nbfm_parity.npz",
        iq=iq,
        sample_rate=48_000,
        audio_rate=48_000,
        ref_audio=np.asarray(audio, np.float32),
    )
    print(f"nbfm: {len(iq)} iq -> {len(audio)} ref audio samples")

    iq = make_am_iq()
    # AGC/filters differ by design; compare the raw envelope detection path
    audio = am_demod(
        iq, 48_000, audio_rate=48_000, enable_agc=False,
        enable_highpass=True, enable_lowpass=True,
    )
    np.savez_compressed(
        OUT / "am_parity.npz",
        iq=iq,
        sample_rate=48_000,
        audio_rate=48_000,
        ref_audio=np.asarray(audio, np.float32),
    )
    print(f"am: {len(iq)} iq -> {len(audio)} ref audio samples")

    iq = make_wbfm_iq()
    audio = wbfm_demod(iq, 240_000, audio_rate=48_000)
    np.savez_compressed(
        OUT / "wbfm_parity.npz",
        iq=iq,
        sample_rate=240_000,
        audio_rate=48_000,
        ref_audio=audio.astype(np.float32),
    )
    print(f"wbfm: {len(iq)} iq -> {len(audio)} ref audio samples")

    # -- CQPSK: the reference has TWO pi/4-DQPSK demods with different
    # dibit alphabets.
    #
    # Phase 2 H-DQPSK (reference dsp/p25/cqpsk.py:344): its slicer maps
    # delta-phase +45deg->2, +135deg->3, -45deg->1, -135deg->0; remap
    # through [3,2,0,1] to the standard P25 convention (+45->0, +135->1,
    # -45->2, -135->3) used by this repo and by the reference's own
    # Phase 1 LSM demod (decoders/p25.py:556 slicer).
    from wavecapsdr.dsp.p25.cqpsk import CQPSKDemodulator as P2Demod

    P2_TO_STD = np.array([3, 2, 0, 1], np.uint8)
    tx, iq = make_cqpsk_iq(symbol_rate=12_000, alpha=1.0, noise=0.001)
    # carrier_loop_bw=0.005: the widest setting where the reference's
    # per-sample decision-directed Costas holds lock on this vector
    demod = P2Demod(
        sample_rate=48_000, symbol_rate=12_000, rrc_alpha=1.0,
        carrier_loop_bw=0.005,
    )
    ref_dibits = P2_TO_STD[np.asarray(demod.demodulate(iq), np.uint8)]
    np.savez_compressed(
        OUT / "cqpsk_parity.npz",
        iq=iq, sample_rate=48_000, symbol_rate=12_000, rrc_alpha=1.0,
        tx_dibits=tx.astype(np.uint8), ref_dibits=ref_dibits,
    )
    print(f"cqpsk_parity: {len(iq)} iq -> {len(ref_dibits)} ref dibits @ 12000 baud")

    # Phase 1 LSM / simulcast (reference decoders/p25.py:190): MMSE
    # interpolation + Gardner TED + differential slicing, already in the
    # standard dibit convention.
    from wavecapsdr.decoders.p25 import CQPSKDemodulator as LsmDemod

    tx, iq = make_cqpsk_iq(
        symbol_rate=4_800, alpha=0.2, noise=0.003, with_sync=True
    )
    lsm = LsmDemod(sample_rate=48_000, symbol_rate=4_800)
    ref_dibits = np.asarray(lsm.demodulate(iq), np.uint8)
    np.savez_compressed(
        OUT / "cqpsk_lsm_parity.npz",
        iq=iq, sample_rate=48_000, symbol_rate=4_800, rrc_alpha=0.2,
        tx_dibits=tx.astype(np.uint8), ref_dibits=ref_dibits,
    )
    print(f"cqpsk_lsm_parity: {len(iq)} iq -> {len(ref_dibits)} ref dibits @ 4800 baud")

    tx_dibits, c4iq = make_c4fm_iq()
    demod = C4FMDemodulator(sample_rate=48_000)
    ref_dibits, ref_soft = demod.demodulate(c4iq)
    np.savez_compressed(
        OUT / "c4fm_parity.npz",
        iq=c4iq,
        sample_rate=48_000,
        tx_dibits=tx_dibits.astype(np.uint8),
        ref_dibits=np.asarray(ref_dibits, np.uint8),
    )
    print(f"c4fm: {len(c4iq)} iq -> {len(ref_dibits)} ref dibits")


if __name__ == "__main__":
    main()
