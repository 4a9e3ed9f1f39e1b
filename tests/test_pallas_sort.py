"""Pallas bitonic sort (ops/pallas/sort.py), interpret mode.

The kernel was evaluated for the count hot path and retired (see
ARCHITECTURE.md "Pallas sort postmortem"); these tests
pin exact key order vs np.lexsort and payload integrity (per-key-group
multisets) across tile counts, tie densities, and padding boundaries.
Small tile_rows drive multi-tile merge phases at test sizes."""
import jax.numpy as jnp
import numpy as np
import pytest

from supernova_tpu.ops.pallas.sort import sort_bitonic_pallas


def _check(rng, n, n_ops, num_keys, key_max, tile_rows=8):
    cols = [
        rng.integers(0, key_max if k < num_keys else 2**32, n).astype(
            np.uint32
        )
        for k in range(n_ops)
    ]
    out = sort_bitonic_pallas(
        *map(jnp.asarray, cols),
        num_keys=num_keys,
        tile_rows=tile_rows,
        interpret=True,
    )
    out = [np.asarray(o) for o in out]
    order = np.lexsort(tuple(cols[:num_keys])[::-1])
    ref = [c[order] for c in cols]
    for k in range(num_keys):
        assert np.array_equal(out[k], ref[k]), f"key {k} mismatch"
    if n_ops > num_keys:
        grp = np.unique(np.stack(out[:num_keys], 1), axis=0,
                        return_inverse=True)[1]
        for k in range(num_keys, n_ops):
            assert np.array_equal(
                np.asarray(out[k])[np.lexsort((out[k], grp))],
                np.asarray(ref[k])[np.lexsort((ref[k], grp))],
            ), f"payload {k} multiset mismatch"


@pytest.mark.parametrize(
    "n,n_ops,num_keys,key_max",
    [
        (1024, 4, 4, 2**32),      # exactly one tile
        (1000, 4, 4, 2**32),      # sub-tile with padding
        (4096, 4, 4, 64),         # heavy key ties, all keys
        (40000, 5, 3, 50),        # payloads under dense ties
        (3000, 2, 1, 8),          # single key, extreme ties
        pytest.param(131072, 4, 4, 2**32,
                     marks=pytest.mark.slow),  # 128 tiles, full cascade
        pytest.param(99999, 5, 3, 1000,
                     marks=pytest.mark.slow),  # non-pow2 multi-tile
    ],
)
def test_matches_lexsort(rng, n, n_ops, num_keys, key_max):
    _check(rng, n, n_ops, num_keys, key_max)


def test_all_keys_bitwise_equal_lax_sort(rng):
    """With every operand a key, ties are identical rows, so the output
    must be bit-identical to lax.sort's."""
    import jax

    n = 20000
    cols = [rng.integers(0, 300, n).astype(np.uint32) for _ in range(4)]
    ref = jax.lax.sort(tuple(map(jnp.asarray, cols)), num_keys=4)
    got = sort_bitonic_pallas(
        *map(jnp.asarray, cols), num_keys=4, tile_rows=8, interpret=True
    )
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))


def test_sentinel_padding_rows_sort_last(rng):
    """Real all-ones rows interleave correctly with the pad sentinel."""
    n = 1500
    cols = [np.full(n, 0xFFFFFFFF, np.uint32) for _ in range(4)]
    for c in cols[1:]:
        c[: n // 2] = rng.integers(0, 2**32, n // 2).astype(np.uint32)
    got = sort_bitonic_pallas(
        *map(jnp.asarray, cols), num_keys=4, tile_rows=8, interpret=True
    )
    order = np.lexsort(tuple(cols)[::-1])
    for k in range(4):
        assert np.array_equal(np.asarray(got[k]), cols[k][order])
