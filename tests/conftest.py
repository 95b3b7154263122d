"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's hardware-free test strategy (reference
``backend/tests/conftest.py``: synthetic-signal fixtures + fake devices) —
here additionally forcing JAX onto 8 virtual CPU devices so that all
sharding/halo-exchange code paths execute in CI without TPU hardware.
"""

from __future__ import annotations

import os

# Must be set before jax is imported anywhere.  Force CPU (the session may
# pre-set JAX_PLATFORMS to a TPU plugin); opt back into TPU with
# WAVECAP_TEST_TPU=1 for the @pytest.mark.tpu tier.
if not os.environ.get("WAVECAP_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

if not os.environ.get("WAVECAP_TEST_TPU"):
    # The session may have pre-registered a TPU plugin via sitecustomize
    # (which initializes jax before this file runs), so the env var alone
    # is not enough.
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(12345)


def make_tone(
    freq_hz: float,
    sample_rate: float,
    n: int,
    amplitude: float = 1.0,
    phase: float = 0.0,
) -> np.ndarray:
    """Complex exponential tone at ``freq_hz``."""
    t = np.arange(n, dtype=np.float64) / float(sample_rate)
    return (amplitude * np.exp(2j * np.pi * freq_hz * t + 1j * phase)).astype(
        np.complex64
    )


def make_fm_signal(
    audio_freq_hz: float,
    sample_rate: float,
    n: int,
    deviation_hz: float = 75_000.0,
    amplitude: float = 1.0,
) -> np.ndarray:
    """FM-modulate a sine at ``audio_freq_hz`` (reference conftest.py:23 analog)."""
    t = np.arange(n, dtype=np.float64) / float(sample_rate)
    audio = np.sin(2 * np.pi * audio_freq_hz * t)
    phase = 2 * np.pi * deviation_hz * np.cumsum(audio) / float(sample_rate)
    return (amplitude * np.exp(1j * phase)).astype(np.complex64)


def make_noise(rng: np.random.Generator, n: int, scale: float = 1.0) -> np.ndarray:
    return (
        scale
        * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        / np.sqrt(2)
    ).astype(np.complex64)


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against ``reference`` after trimming to common length."""
    n = min(len(reference), len(test))
    ref = np.asarray(reference[:n], dtype=np.float64)
    tst = np.asarray(test[:n], dtype=np.float64)
    err = ref - tst
    p_sig = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    if p_err == 0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_err, 1e-300))

