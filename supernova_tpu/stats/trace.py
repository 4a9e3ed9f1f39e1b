"""Stage tracing + memory checkpoints.

Analogue of the reference's wall-clock tracing (`Date()`-stamped stage
logging, WallClockTime/TimeSince around stages — DF.cc:83,711), the STAGE()
macro (RunStages.h:109: stage entry with mem/peak) and MEM() checkpoints
(DfTools.h:6-10), with TPU HBM stats from the JAX runtime in place of
jemalloc's host numbers.

The axon TPU runtime does not implement ``Device.memory_stats()`` (it
returns None), so a raw query reads 0 forever.  ``stage()`` therefore runs
a background sampler thread that records a per-stage high-water mark from
the best available source:

  1. ``memory_stats()['bytes_in_use']`` when the runtime provides it
     (CPU/TPU PJRT backends that implement the stats API);
  2. otherwise the sum of ``nbytes`` over ``jax.live_arrays()`` — the
     bytes pinned by live jax.Arrays.  This misses XLA scratch inside a
     running executable but tracks the dominant table/array residency,
     which is what the 3.2 Gb memory plan needs.

Host RSS is sampled the same way (``/proc/self/status`` VmRSS) — at scale
the host-side merge buffers are as much of a risk as HBM.
"""
from __future__ import annotations

import logging
import threading
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


def _live_array_bytes() -> int:
    """Fallback HBM estimate: total nbytes of live jax.Arrays."""
    try:
        import jax

        total = 0
        for a in jax.live_arrays():
            try:
                total += a.nbytes
            except Exception:
                pass
        return total
    except Exception:
        return 0


def _device_bytes_now() -> tuple[int, str]:
    """(bytes, source) — memory_stats if the runtime has it, else live arrays."""
    mem = device_memory_gb()
    if mem:
        return int(max(m["in_use_gb"] for m in mem.values()) * 2**30), "stats"
    return _live_array_bytes(), "live"


def _host_rss_bytes() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except Exception:
        pass
    return 0


class HighWaterSampler:
    """Samples device + host memory on a daemon thread; keeps the max."""

    def __init__(self, period_s: float = 1.0):
        self.period_s = period_s
        self.peak_device = 0
        self.peak_host = 0
        self.source = "none"
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _sample(self):
        b, src = _device_bytes_now()
        if b > self.peak_device:
            self.peak_device = b
        if src != "none":
            self.source = src
        h = _host_rss_bytes()
        if h > self.peak_host:
            self.peak_host = h

    def _run(self):
        while not self._stop.wait(self.period_s):
            try:
                self._sample()
            except Exception:
                pass

    def __enter__(self):
        self._sample()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        try:
            self._sample()
        except Exception:
            pass
        return False


@contextmanager
def stage(name: str, stats=None):
    """STAGE(x) analogue: logs entry/exit with elapsed time + device memory;
    optionally records etime_/mem_peak_ stats into a StatLogger.

    Reference analogue: per-stage `etime_*_h` / `mem_peak_*_gb` stats
    (DF.cc:705-707, CP.cc:1925-1933)."""
    t0 = time.time()
    log.info("STAGE %s: begin", name)
    with HighWaterSampler() as hw:
        try:
            yield
        finally:
            dt = time.time() - t0
    peak = hw.peak_device / 2**30
    host = hw.peak_host / 2**30
    log.info(
        "STAGE %s: done in %.2fs (peak HBM %.2f GiB [%s], host RSS %.2f GiB)",
        name, dt, peak, hw.source, host,
    )
    if stats is not None:
        stats.log(f"etime_{name}_h", dt / 3600.0, stage=name)
        if peak:
            stats.log(f"mem_peak_{name}_gb", round(peak, 3), stage=name)
        if host:
            stats.log(f"mem_peak_host_{name}_gb", round(host, 3), stage=name)


def mem(tag: str):
    """MEM(tag) analogue."""
    usage = device_memory_gb()
    if not usage:
        usage = {"live_arrays_gb": _live_array_bytes() / 2**30}
    log.info("MEM %s: %s", tag, usage)
    return usage
