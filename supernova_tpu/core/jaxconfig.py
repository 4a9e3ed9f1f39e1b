"""JAX runtime configuration defaults for the framework.

Compiles on this class of TPU runtime go through a remote compile service
and can take minutes per program shape; the persistent compilation cache
makes every repeat run (and stage re-entry) free.  Called by the pipeline,
CLI, bench, and driver entry points.
"""
from __future__ import annotations

import os

_DONE = False
_PLATFORM_DONE = False


def ensure_platform(platform: str | None = None):
    """Force the JAX backend (e.g. "cpu") before any computation runs.

    Setting the JAX_PLATFORMS env var is not always enough on hosts where a
    site plugin registers an experimental platform; `jax.config.update`
    wins.  No-op when neither `platform` nor SUPERNOVA_TPU_PLATFORM is set.
    """
    global _PLATFORM_DONE
    plat = platform or os.environ.get("SUPERNOVA_TPU_PLATFORM")
    if not plat or _PLATFORM_DONE:
        return
    _PLATFORM_DONE = True
    import jax

    jax.config.update("jax_platforms", plat)


def ensure_cache(path: str | None = None):
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # CPU-backend guard: (de)serializing executables compiled for the
    # multi-device CPU backend (tests + driver dryrun use 8 virtual devices)
    # segfaults flakily inside compilation_cache.{get,put}_executable_and_time
    # with the jaxlib in this image — and CPU compiles are fast anyway.  The
    # persistent cache only pays on the TPU remote-compile path.
    if jax.default_backend() != "tpu":
        return

    cache = path or os.environ.get(
        "SUPERNOVA_TPU_JAX_CACHE", "/tmp/supernova_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
