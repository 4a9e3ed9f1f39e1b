"""Probe compileable tile sizes for the Pallas bitonic sort on the chip.

The default TILE_ROWS=4096 (2^19 elems/tile) unrolls ~190 stages in the
phase-A kernel and OOM-kills the axon remote compile helper at n=2^25.
Smaller tiles unroll quadratically fewer stages; this finds the largest
tile that compiles and times it against lax.sort on count-block shapes.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from supernova_tpu.ops.pallas.sort import sort_bitonic_pallas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 33_554_432  # 2^25


def timed(label, fn, *args):
    out = fn(*args)
    leaves = jax.tree.leaves(out)
    _ = int(np.asarray(leaves[0].ravel()[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        _ = int(np.asarray(leaves[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} {min(ts)*1e3:9.1f} ms", flush=True)
    return min(ts), out


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    pk = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

    @jax.jit
    def ref4(a, b, c, pk):
        return jax.lax.sort((a, b, c, pk), num_keys=4, is_stable=False)

    t0, ref = timed("lax.sort 4-key 4-op", ref4, a, b, c, pk)

    for tr in (256, 512, 1024, 2048):
        try:
            f = jax.jit(
                lambda a, b, c, pk, tr=tr: sort_bitonic_pallas(
                    a, b, c, pk, num_keys=4, tile_rows=tr
                )
            )
            t, got = timed(f"pallas tile_rows={tr}", f, a, b, c, pk)
            ok = all(
                bool(jnp.array_equal(r, g)) for r, g in zip(ref, got)
            )
            print(f"  -> correct={ok}  speedup={t0/t:.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tile_rows={tr} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
