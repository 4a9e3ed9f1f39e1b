"""Stage tracing + memory checkpoints.

Analogue of the reference's wall-clock tracing (`Date()`-stamped stage
logging, WallClockTime/TimeSince around stages — DF.cc:83,711), the STAGE()
macro (RunStages.h:109: stage entry with mem/peak) and MEM() checkpoints
(DfTools.h:6-10), with TPU HBM stats from the JAX runtime in place of
jemalloc's host numbers.
"""
from __future__ import annotations

import logging
import time
from contextlib import contextmanager

log = logging.getLogger("supernova_tpu")


def device_memory_gb() -> dict:
    """Per-device HBM usage (bytes_in_use / peak) in GiB, when available."""
    out = {}
    try:
        import jax

        for d in jax.local_devices():
            ms = d.memory_stats()
            if ms:
                out[str(d)] = {
                    "in_use_gb": ms.get("bytes_in_use", 0) / 2**30,
                    "peak_gb": ms.get("peak_bytes_in_use", 0) / 2**30,
                }
    except Exception:
        pass
    return out


@contextmanager
def stage(name: str, stats=None):
    """STAGE(x) analogue: logs entry/exit with elapsed time + device memory;
    optionally records etime_/mem_peak_ stats into a StatLogger."""
    t0 = time.time()
    log.info("STAGE %s: begin", name)
    try:
        yield
    finally:
        dt = time.time() - t0
        mem = device_memory_gb()
        peak = max((m["peak_gb"] for m in mem.values()), default=0.0)
        log.info("STAGE %s: done in %.2fs (peak HBM %.2f GiB)", name, dt, peak)
        if stats is not None:
            stats.log(f"etime_{name}_h", dt / 3600.0, stage=name)
            if peak:
                stats.log(f"mem_peak_{name}_gb", peak, stage=name)


def mem(tag: str):
    """MEM(tag) analogue."""
    usage = device_memory_gb()
    log.info("MEM %s: %s", tag, usage or "host-only")
    return usage
