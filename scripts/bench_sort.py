"""Microbench: count-sort alternatives on the chip.

The count iteration is bound by the 4-key occurrence sort (~0.27 s at 33M
rows).  This measures the design space before committing to a Pallas sort:

  flat4     - current: lax.sort 5 operands, 4 keys, flat 33M
  batchK    - (R, L) batched sort along the minor axis (independent runs;
              stage 1 of a sort-then-merge scheme): depth log2(L)^2 vs
              log2(n)^2
  hash1     - 1-key sort by 32-bit mixed hash + 4 payload operands
              (grouping-only order + small final re-sort of reduced table)
  key2      - (hash, idx) 2-operand sort, payloads gathered after

Run on the real chip: python scripts/bench_sort.py [n_rows]
"""
import os
import sys
import time

import jax

# honor an explicit JAX_PLATFORMS=cpu: the env var alone loses to
# pre-registered TPU plugins (axon), whose init hangs when the tunnel is down
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

CHECK_ONLY = "--check" in sys.argv  # correctness of the round-4 bucketed
# pipeline only (small N, CPU-friendly); no timing variants
argv = [x for x in sys.argv[1:] if not x.startswith("--")]
N = int(argv[0]) if argv else 33_554_432  # 2^25


def timed(label, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        # sync via value fetch (block_until_ready broken on axon)
        leaves = jax.tree.leaves(out)
        _ = int(np.asarray(leaves[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts)*1e3:9.1f} ms")
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    pk = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    cnt = jnp.asarray(rng.integers(0, 100, N, dtype=np.int32))

    @jax.jit
    def flat4(a, b, c, pk, cnt):
        return jax.lax.sort((a, b, c, pk, cnt), num_keys=4, is_stable=False)

    @jax.jit
    def flat3(a, b, c, pk, cnt):
        return jax.lax.sort((a, b, c, pk, cnt), num_keys=3, is_stable=False)

    def batched(rows):
        cols = N // rows

        @jax.jit
        def f(a, b, c, pk, cnt):
            r = lambda x: x.reshape(rows, cols)
            out = jax.lax.sort(
                (r(a), r(b), r(c), r(pk), r(cnt)),
                num_keys=4, is_stable=False, dimension=-1,
            )
            return tuple(x.reshape(-1) for x in out)

        return f

    @jax.jit
    def hash1(a, b, c, pk, cnt):
        c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
        h = jnp.asarray(0x9E3779B9, jnp.uint32)
        for w in (a, b, c):
            k = w * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            h = (h ^ (k * c2)) * np.uint32(5) + np.uint32(0xE6546B64)
        return jax.lax.sort((h, a, b, c, pk, cnt), num_keys=1, is_stable=False)

    @jax.jit
    def key2(a, b, c, pk, cnt):
        c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
        h = jnp.asarray(0x9E3779B9, jnp.uint32)
        for w in (a, b, c):
            k = w * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            h = (h ^ (k * c2)) * np.uint32(5) + np.uint32(0xE6546B64)
        hs, idx = jax.lax.sort(
            (h, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=False
        )
        return hs, a[idx], b[idx], c[idx], pk[idx], cnt[idx]

    # --- round 4: full bucketed pipeline = on-device radix partition by
    # the top byte of `a` (tile-sort + vmapped bucket offsets + scatter)
    # followed by the batched (256, m) minor-axis sort.  The partition is
    # the part round 3 never costed; if partition + batched sort >= flat4,
    # the bucket idea dies with numbers.
    TILE = 8192
    T = N // TILE

    # per-bucket padded row capacity (static): uniform top byte -> ~N/256
    # per bucket; 1.10x headroom + 512 rounding.  Pad slots hold all-ones
    # keys so they sort to the end of each row — the count pipeline's
    # existing SENTINEL convention, so downstream consumes the padded
    # (256, M) layout directly with no re-flattening.
    M = -(-int(N / 256 * 1.10) // 512) * 512

    @jax.jit
    def partition(a, b, c, pk, cnt):
        bk = (a >> np.uint32(24)).astype(jnp.int32)
        bt = bk.reshape(T, TILE)
        iota = jnp.broadcast_to(
            jnp.arange(TILE, dtype=jnp.int32), (T, TILE)
        )
        sb, si = jax.lax.sort((bt, iota), num_keys=1, is_stable=True,
                              dimension=-1)
        edges = jnp.arange(256, dtype=jnp.int32)
        # cum[t, k] = #elements in tile t with bucket < k  (vmapped
        # searchsorted over the tile-sorted bucket rows)
        cum = jax.vmap(
            lambda row: jnp.searchsorted(row, edges, side="left")
        )(sb).astype(jnp.int32)  # (T, 256)
        counts = jnp.concatenate(
            [cum[:, 1:], jnp.full((T, 1), TILE, jnp.int32)], axis=1
        ) - cum  # (T, 256)
        bucket_total = counts.sum(axis=0)
        ex_tiles = jnp.cumsum(counts, axis=0) - counts  # (T, 256)
        run_start = jnp.take_along_axis(cum, sb, axis=1)
        pos_in_run = jnp.arange(TILE, dtype=jnp.int32)[None, :] - run_start
        dest = (
            sb * np.int32(M) + jnp.take_along_axis(ex_tiles, sb, axis=1)
            + pos_in_run
        ).reshape(-1)
        out = []
        for x, fill in (
            (a, 0xFFFFFFFF), (b, 0xFFFFFFFF), (c, 0xFFFFFFFF),
            (pk, 0xFFFFFFFF), (cnt, 0),
        ):
            xt = jnp.take_along_axis(x.reshape(T, TILE), si, axis=1)
            out.append(
                jnp.full(256 * M, fill, x.dtype).at[dest].set(
                    xt.reshape(-1), unique_indices=True
                )
            )
        return tuple(out) + (bucket_total,)

    @jax.jit
    def bucketed_full(a, b, c, pk, cnt):
        pa, pb, pc, ppk, pcnt, tot = partition(a, b, c, pk, cnt)
        r = lambda x: x.reshape(256, M)
        out = jax.lax.sort(
            (r(pa), r(pb), r(pc), r(ppk), r(pcnt)),
            num_keys=4, is_stable=False, dimension=-1,
        )
        return tuple(out) + (tot,)

    def check_bucketed():
        # correctness: per-bucket valid prefixes, concatenated, must equal
        # the flat global sort bitwise on the 4 keys (bucket = top byte of
        # the primary key); payload cnt may permute across fully-equal
        # keys -> multiset check
        ref = flat4(a, b, c, pk, cnt)
        got = bucketed_full(a, b, c, pk, cnt)
        tot = np.asarray(got[5])
        assert int(tot.max()) <= M, "bucket overflow: raise headroom"
        comp = [
            np.concatenate(
                [np.asarray(g)[k, : tot[k]] for k in range(256)]
            )
            for g in got[:5]
        ]
        agree = all(
            np.array_equal(np.asarray(r), g)
            for r, g in zip(ref[:4], comp[:4])
        )
        ok_cnt = np.array_equal(
            np.sort(np.asarray(ref[4])), np.sort(comp[4])
        )
        print(f"bucketed keys bit-identical: {agree}; "
              f"payload multiset ok: {ok_cnt}")
        return agree and ok_cnt

    if CHECK_ONLY:
        assert check_bucketed()
        return

    from supernova_tpu.ops.pallas.sort import sort_bitonic_pallas

    @jax.jit
    def flat4_4op(a, b, c, pk):
        return jax.lax.sort((a, b, c, pk), num_keys=4, is_stable=False)

    @jax.jit
    def pallas4(a, b, c, pk):
        return sort_bitonic_pallas(a, b, c, pk, num_keys=4)

    t0 = timed("flat 4-key 5-op", flat4, a, b, c, pk, cnt)
    timed("radix partition (5 ops)", partition, a, b, c, pk, cnt)
    tb = timed("bucketed: partition+batched", bucketed_full, a, b, c, pk, cnt)
    ok = check_bucketed()
    print(f"bucketed speedup vs flat4: {t0/tb:.2f}x (valid={ok})")
    timed("flat 4-key 4-op", flat4_4op, a, b, c, pk)
    timed("pallas bitonic 4-key 4-op", pallas4, a, b, c, pk)
    timed("flat 3-key 5-op", flat3, a, b, c, pk, cnt)
    for rows in (64, 256, 1024):
        timed(f"batched ({rows}, {N//rows})", batched(rows), a, b, c, pk, cnt)
    timed("hash 1-key 6-op", hash1, a, b, c, pk, cnt)
    timed("hash 2-op sort + gather", key2, a, b, c, pk, cnt)
    print(f"baseline flat4: {t0*1e3:.1f} ms at {N} rows")

    # correctness on chip: pallas output must equal lax.sort's (all-key ties
    # are identical rows, so arrays match bitwise)
    ref = flat4_4op(a, b, c, pk)
    got = pallas4(a, b, c, pk)
    ok = all(bool(jnp.array_equal(r, g)) for r, g in zip(ref, got))
    print("pallas bitonic matches lax.sort:", ok)


if __name__ == "__main__":
    main()
