"""C4FM sensitivity characterization: TSBK CRC rate vs SNR.

Synthesizes a P25 control channel, adds calibrated AWGN, and measures
the full-chain (demod -> framer -> trellis -> CRC) TSBK pass rate, with
hard vs soft trellis decisions.  The reference's recorded-signal anchor
is 90.7 % CRC at 10.4 SPS on a clean golden capture
(reference ``trunking/system.py:1300-1305``).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main() -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # CPU sweep regardless of
    except Exception:  # pragma: no cover - backend already initialized
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_trunking import make_p25_cc_iq

    from wavecap_tpu.decoders import p25_frames as pf
    from wavecap_tpu.decoders.framer import P25Framer
    from wavecap_tpu.models.p25.c4fm import C4fmConfig, c4fm_init, c4fm_demodulate

    iq0 = make_p25_cc_iq(48_000, 0.0, n_frames=8)
    sig_p = float(np.mean(np.abs(iq0) ** 2))
    rng = np.random.default_rng(11)

    for snr_db in (-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 6.0):
        noise_std = np.sqrt(sig_p / (10 ** (snr_db / 10)) / 2)
        iq = iq0 + noise_std * (
            rng.standard_normal(len(iq0)) + 1j * rng.standard_normal(len(iq0))
        )
        iq = np.concatenate([np.zeros(1000, np.complex64), iq.astype(np.complex64)])
        cfg = C4fmConfig(sample_rate=48_000)
        step = jax.jit(c4fm_demodulate, static_argnums=2)
        st = c4fm_init(cfg)
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
        print(
            json.dumps(
                {
                    "snr_db": snr_db,
                    "sync": fr.sync_count,
                    "tsbk": total,
                    "crc_hard": round(hard_ok / total, 3) if total else 0.0,
                    "crc_soft": round(soft_ok / total, 3) if total else 0.0,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
