"""JAX platform selection + persistent compilation cache.

Some environments pre-register an accelerator PJRT plugin via
``sitecustomize`` before any user code runs, which makes the standard
``JAX_PLATFORMS`` env var ineffective.  Entry points call
:func:`ensure_platform` so the env var wins again.

The persistent compilation cache means a server restart does not re-pay
the multi-minute XLA compiles of large capture programs (183 s observed
for an 800-channel program on a remote TPU relay): the second start of
the same capture shape loads the executable from disk in seconds.  The
cache lives under the state dir (``~/.wavecap_tpu/jax_cache``) so it
survives reboots; override with ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os
from pathlib import Path


def default_cache_dir() -> str:
    return os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".wavecap_tpu" / "jax_cache"),
    )


def ensure_platform(cache_dir: str | None = None) -> None:
    try:
        import jax

        plat = os.environ.get("JAX_PLATFORMS")
        if plat:
            jax.config.update("jax_platforms", plat)
        cache = cache_dir or default_cache_dir()
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache every compile that takes >=2 s (the big capture programs);
        # tiny CPU test programs stay out of the cache by default
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - jax not installed / already used
        pass
