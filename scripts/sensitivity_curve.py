"""P25 sensitivity characterization: TSBK CRC rate vs channel impairment.

Synthesizes a P25 control channel (C4FM or CQPSK/LSM), applies a
calibrated impairment, and measures the full-chain (demod -> framer ->
trellis -> CRC) TSBK pass rate, with hard vs soft trellis decisions.
The reference's recorded-signal anchor is 90.7 % CRC at 10.4 SPS on a
clean golden capture (reference ``trunking/system.py:1300-1305``).

Impairments:
  awgn       SNR sweep (the classic sensitivity curve)
  cfo        carrier frequency offset sweep at 6 dB SNR
  simulcast  a second delayed/phase-rotated path at 10 dB SNR — the
             channel LSM exists for (reference dsp/p25/cqpsk.py intent)

Usage: python scripts/sensitivity_curve.py [--mode c4fm|cqpsk]
                                           [--impair awgn|cfo|simulcast]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def run_chain(iq, mode, baud=4800, eq_taps=0):
    import jax
    import jax.numpy as jnp

    from wavecap_tpu.decoders import p25_frames as pf
    from wavecap_tpu.decoders.framer import P25Framer
    from wavecap_tpu.models.p25.c4fm import (
        C4fmConfig,
        c4fm_demodulate,
        c4fm_init,
    )
    from wavecap_tpu.models.p25.cqpsk import (
        CqpskConfig,
        cqpsk_demodulate,
        cqpsk_init,
    )

    if mode == "cqpsk":
        cfg = CqpskConfig(
            sample_rate=48_000,
            symbol_rate=float(baud),
            rrc_alpha=1.0 if baud == 6000 else 0.2,
            equalizer_taps=eq_taps,
        )
        st = cqpsk_init(cfg)
        step = jax.jit(cqpsk_demodulate, static_argnums=2)
    else:
        cfg = C4fmConfig(sample_rate=48_000, equalizer_taps=eq_taps)
        st = c4fm_init(cfg)
        step = jax.jit(c4fm_demodulate, static_argnums=2)
    fr = P25Framer()
    hard_ok = soft_ok = total = 0
    B = 4800
    for i in range(len(iq) // B):
        soft_syms, _, st = step(jnp.asarray(iq[i * B : (i + 1) * B]), st, cfg)
        for f in fr.process(np.asarray(soft_syms)):
            if f.duid != pf.DUID.TSDU:
                continue
            pl = pf.remove_status_dibits(f.dibits[57:], 57)
            sl = pf.remove_status_dibits(f.soft[57:], 57)
            for b in pf.decode_tsbk_payload(pl):
                total += 1
                hard_ok += b.crc_valid
            for b in pf.decode_tsbk_payload(pl, sl):
                soft_ok += b.crc_valid
    return {
        "sync": fr.sync_count,
        "tsbk": total,
        "crc_hard": round(hard_ok / total, 3) if total else 0.0,
        "crc_soft": round(soft_ok / total, 3) if total else 0.0,
    }


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # CPU sweep regardless of
    except Exception:  # pragma: no cover - backend already initialized
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="c4fm", choices=("c4fm", "cqpsk"))
    ap.add_argument(
        "--impair", default="awgn", choices=("awgn", "cfo", "simulcast")
    )
    ap.add_argument(
        "--baud", type=int, default=4800, choices=(4800, 6000),
        help="6000 = Phase 2 H-DQPSK symbol rate (cqpsk mode only)",
    )
    ap.add_argument(
        "--eq", type=int, default=0, metavar="TAPS",
        help="enable the CMA simulcast equalizer with this many (odd) "
        "taps ahead of the CQPSK slicer (cqpsk mode only)",
    )
    args = ap.parse_args()
    if args.baud != 4800 and args.mode != "cqpsk":
        ap.error("--baud 6000 requires --mode cqpsk")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_trunking import make_p25_cc_iq

    # --baud 6000: the same framed TSDU dibit stream modulated at the
    # Phase 2 H-DQPSK symbol rate / pulse shape (the framer is baud-agnostic)
    iq0 = make_p25_cc_iq(
        48_000, 0.0, n_frames=8, modulation=args.mode, baud=args.baud
    )
    sig_p = float(np.mean(np.abs(iq0) ** 2))
    rng = np.random.default_rng(11)

    def with_awgn(iq, snr_db):
        noise_std = np.sqrt(sig_p / (10 ** (snr_db / 10)) / 2)
        out = iq + noise_std * (
            rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq))
        )
        return np.concatenate(
            [np.zeros(1000, np.complex64), out.astype(np.complex64)]
        )

    if args.impair == "awgn":
        for snr_db in (-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 6.0):
            r = run_chain(with_awgn(iq0, snr_db), args.mode, args.baud, args.eq)
            print(json.dumps({"mode": args.mode, "snr_db": snr_db, **r}),
                  flush=True)
    elif args.impair == "cfo":
        t = np.arange(len(iq0)) / 48_000
        for cfo_hz in (0.0, 50.0, 150.0, 300.0, 500.0, 1000.0, -1000.0):
            iq = iq0 * np.exp(2j * np.pi * cfo_hz * t)
            r = run_chain(with_awgn(iq, 6.0), args.mode, args.baud, args.eq)
            print(json.dumps({"mode": args.mode, "cfo_hz": cfo_hz, **r}),
                  flush=True)
    else:  # simulcast: main path + one delayed, phase-rotated echo
        for delay_us, rel_amp in (
            (10.0, 0.5), (30.0, 0.5), (30.0, 0.8), (70.0, 0.5), (70.0, 0.8),
        ):
            d = int(round(delay_us * 1e-6 * 48_000))
            echo = np.concatenate(
                [np.zeros(d, np.complex64), iq0[: len(iq0) - d]]
            ) * (rel_amp * np.exp(1j * rng.uniform(0, 2 * np.pi)))
            iq = iq0 + echo
            r = run_chain(with_awgn(iq, 10.0), args.mode, args.baud, args.eq)
            print(
                json.dumps(
                    {
                        "mode": args.mode,
                        "delay_us": delay_us,
                        "rel_amp": rel_amp,
                        **r,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
