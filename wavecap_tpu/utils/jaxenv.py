"""JAX platform selection helper.

Some environments pre-register an accelerator PJRT plugin via
``sitecustomize`` before any user code runs, which makes the standard
``JAX_PLATFORMS`` env var ineffective.  Entry points call
:func:`ensure_platform` so the env var wins again.
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    try:
        import jax

        plat = os.environ.get("JAX_PLATFORMS")
        if plat:
            jax.config.update("jax_platforms", plat)
        # persistent compile cache: remote-TPU compiles take minutes
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - jax not installed / already used
        pass
