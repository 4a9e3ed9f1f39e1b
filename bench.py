"""Benchmark: 48-mer counting throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json) is k-mers/s/chip.  vs_baseline is
measured against the reference's MSP stage envelope: 4 threads per 8-GB
chunk scanning ~8 fastq files (lib/tada/src/cmd_msp.rs:31,264-280); public
MSPKmerCounter-class CPU counters sustain ~10-20M kmers/s on such a budget —
we use 20M kmers/s as the reference-per-node figure (generous to the
reference).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_KMERS_PER_SEC = 20e6
# Reference pather envelope: HBVPather::algorithmTwo runs OpenMP-parallel on
# the 28-thread asmlarge node (10X/paths/ReadPathVecX.cc class machinery);
# public DISCOVAR-class pathing sustains ~20-40k reads/s on such a node — we
# use 40k reads/s as the reference-per-node figure (generous to the
# reference).
REFERENCE_READS_PER_SEC = 40e3


def probe_backend(total_wait_s: float = 420.0, try_s: int = 150) -> bool:
    """The axon TPU tunnel can hang jax backend init indefinitely when it
    is down; probe it in a child process (killable) and wait up to
    total_wait_s for it to come back before giving up."""
    import subprocess
    import sys

    deadline = time.time() + total_wait_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(int(jnp.arange(8).sum()))"],
                capture_output=True, timeout=try_s,
            )
            ok = r.returncode == 0 and b"28" in r.stdout
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return True
        if time.time() > deadline:
            return False
        print("bench: TPU backend unresponsive, retrying...", flush=True)
        time.sleep(15)


SMOKE = bool(int(__import__("os").environ.get("BENCH_SMOKE", "0")))


def main():
    if not SMOKE and not probe_backend():
        # a parseable outage record beats a null: value 0 is unambiguous
        # (never a real throughput), and the unit string carries the cause
        print(
            json.dumps(
                {
                    "metric": "kmer_count_throughput",
                    "value": 0.0,
                    "unit": "kmers/s/chip (tpu tunnel down at bench time)",
                    "vs_baseline": 0.0,
                    "extra": {"error": "axon backend unreachable"},
                }
            ),
            flush=True,
        )
        raise SystemExit(3)
    import jax

    from supernova_tpu.core.jaxconfig import ensure_cache

    ensure_cache()

    from supernova_tpu.kmer.count import count_kmers

    rng = np.random.default_rng(0)
    read_len = 150
    # ~48M bases => ~33M kmer positions per iteration
    n_reads = 320_000 if not SMOKE else 4_000
    nb = n_reads * read_len
    from supernova_tpu.core.kmer_codec import K

    # reads tile a 1 Mb genome at ~48x so the filter keeps realistic tables
    genome = rng.integers(0, 4, 1_000_000 if not SMOKE else 12_000)
    starts = rng.integers(0, len(genome) - read_len, n_reads)
    flat = genome[np.add.outer(starts, np.arange(read_len))].reshape(-1)
    codes_ext = np.zeros(nb + 128, dtype=np.int32)
    codes_ext[:nb] = flat
    pos_read = np.repeat(np.arange(n_reads, dtype=np.int32), read_len)
    glen_pos = np.full(nb, read_len, dtype=np.int32)
    bc_pos = np.repeat(
        rng.integers(1, 1_000_000, n_reads).astype(np.int32), read_len
    )

    args = tuple(
        map(jax.numpy.asarray, (codes_ext, pos_read, glen_pos, bc_pos))
    )

    @jax.jit
    def step(codes_ext, pos_read, glen_pos, bc_pos):
        t = count_kmers(
            codes_ext, pos_read, glen_pos, bc_pos, uniform_rl=read_len
        )
        return t.n_valid

    # warmup/compile (int() forces a full device round trip)
    int(step(*args))

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        int(step(*args))
    dt = (time.perf_counter() - t0) / iters

    kmer_positions = nb - n_reads * (K - 1)
    kps = kmer_positions / dt

    def count_line(extra):
        return json.dumps(
            {
                "metric": "kmer_count_throughput",
                "value": round(kps, 1),
                "unit": "kmers/s/chip",
                "vs_baseline": round(kps / REFERENCE_KMERS_PER_SEC, 3),
                "extra": extra,
            }
        )

    # Round 3 lost its number because the single JSON line printed only
    # after BOTH benches finished and the pather compile blew the driver
    # budget (BENCH_r03.json: rc 124, parsed null).  Now: print the count
    # line IMMEDIATELY, then run the pather bench under a hard SIGALRM
    # budget and print a second, enriched line — whichever line the driver
    # parses (first or last), it parses a full record.
    print(count_line({"pather": "pending"}), flush=True)

    # --- second north-star metric: reads aligned/s (pather, warm) --------
    # Run in a KILLABLE child: SIGALRM only fires between bytecodes in the
    # main thread, so a pather wedged inside a blocking C call (an XLA/axon
    # remote compile — the round-3 failure) would ignore it.  subprocess
    # timeout kills the child unconditionally (ADVICE r4 #3).
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, __file__, "--pather-child"],
            capture_output=True, timeout=60 if SMOKE else 900,
        )
        if r.returncode == 0 and r.stdout.strip():
            extra = json.loads(r.stdout.strip().splitlines()[-1])
        else:
            extra = {
                "pather_error":
                    (r.stderr.decode(errors="replace")[-200:] or
                     f"rc={r.returncode}")
            }
    except subprocess.TimeoutExpired:
        extra = {"pather_error": "pather bench budget exceeded (killed)"}
    except Exception as e:  # noqa: BLE001 — never lose the count line
        extra = {"pather_error": repr(e)[:200]}

    print(count_line(extra), flush=True)


def pather_child():
    """Child-process entry: run the pather bench alone, print ONE JSON line."""
    from supernova_tpu.core.jaxconfig import ensure_cache

    ensure_cache()
    rng = np.random.default_rng(12345)
    genome = rng.integers(0, 4, 1_000_000 if not SMOKE else 12_000)
    print(json.dumps(bench_pather(genome, rng)), flush=True)


def bench_pather(genome, rng):
    """Reads-aligned/s on the real device: build the 1 Mb DBG once, then
    time warm path_readset iterations over ~100k 150-mers."""
    from supernova_tpu.align import pather
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.ingest.reads import build_readset_flat
    from supernova_tpu.kmer import count as kcount

    read_len = 150
    n_reads = 100_000 if not SMOKE else 2_000
    starts = rng.integers(0, len(genome) - read_len, n_reads)
    flat = genome[np.add.outer(starts, np.arange(read_len))].reshape(-1)
    offsets = np.arange(n_reads + 1, dtype=np.int64) * read_len
    quals = np.full(flat.shape, 37, np.uint8)
    bc = np.zeros(n_reads // 2, dtype=np.int32)
    rs = build_readset_flat(
        flat.astype(np.uint8), offsets, quals, bc, n_barcodes=0, barcoded=False
    )

    table = dbuild.trim_table(
        kcount.count_readset(rs, min_freq=2), pad_multiple=256
    )
    bg = dgraph.from_device(dbuild.build_graph(table), table)

    # warmup/compile
    rp = pather.path_readset(bg, rs)
    int(np.asarray(rp.path_len)[0])
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        rp = pather.path_readset(bg, rs)
        np.asarray(rp.path_len)  # forces device round trip
    dt = (time.perf_counter() - t0) / iters
    rps = n_reads / dt
    # slice off the shape-bucket padding rows (they can never place and
    # dilute the fraction; the pipeline slices [: rs.n_reads] the same way)
    placed = float((np.asarray(rp.path_len)[:n_reads] > 0).mean())
    return {
        "reads_aligned_per_s": round(rps, 1),
        "pather_vs_baseline": round(rps / REFERENCE_READS_PER_SEC, 3),
        "placed_frac": round(placed, 4),
    }


if __name__ == "__main__":
    import sys as _sys

    if "--pather-child" in _sys.argv:
        pather_child()
    else:
        main()
