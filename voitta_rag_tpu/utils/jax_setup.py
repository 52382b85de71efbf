"""Process-level JAX setup for serving/bench entrypoints.

Enables the persistent compilation cache (compiles through the remote-compile
tunnel cost 10-100 s; the cache makes them one-time) and, when requested via
VOITTA_ENGINE_PLATFORM, pins the platform.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VOITTA_JAX_CACHE", os.path.expanduser("~/.cache/voitta_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    platform = os.environ.get("VOITTA_ENGINE_PLATFORM", "auto")
    if platform in ("cpu", "tpu"):
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass
