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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 33_554_432  # 2^25


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

    from supernova_tpu.ops.pallas.sort import sort_bitonic_pallas

    @jax.jit
    def flat4_4op(a, b, c, pk):
        return jax.lax.sort((a, b, c, pk), num_keys=4, is_stable=False)

    @jax.jit
    def pallas4(a, b, c, pk):
        return sort_bitonic_pallas(a, b, c, pk, num_keys=4)

    t0 = timed("flat 4-key 5-op", flat4, a, b, c, pk, cnt)
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
