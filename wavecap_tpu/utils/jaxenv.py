"""JAX platform selection helper.

Some environments pre-register an accelerator PJRT plugin via
``sitecustomize`` before any user code runs, which makes the standard
``JAX_PLATFORMS`` env var ineffective.  Entry points call
:func:`ensure_platform` so the env var wins again.
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - jax not installed / already used
        pass
