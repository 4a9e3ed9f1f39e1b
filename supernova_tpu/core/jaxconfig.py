"""JAX runtime configuration defaults for the framework.

Compiles on this class of TPU runtime go through a remote compile service
and can take minutes per program shape; the persistent compilation cache
makes every repeat run (and stage re-entry) free.  Called by the pipeline,
CLI, bench, and driver entry points.
"""
from __future__ import annotations

import os

_DONE = False


def ensure_cache(path: str | None = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache = path or os.environ.get(
        "SUPERNOVA_TPU_JAX_CACHE", "/tmp/supernova_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
