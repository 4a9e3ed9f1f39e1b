"""Streaming Pallas compactor (ops/pallas/compact.py), interpret mode.

The kernel replaces the keep-compaction sort in the count program; these
tests pin its semantics to the sort-based compact_sorted_words."""
import jax.numpy as jnp
import numpy as np
import pytest

from supernova_tpu.ops import segments as seg
from supernova_tpu.ops.pallas.compact import compact_stream_pallas


@pytest.mark.parametrize(
    "n,frac",
    [(1000, 0.03), (70000, 0.5), (32768, 0.0), (33000, 1.0)],
)
def test_compact_matches_reference(rng, n, frac):
    keep = rng.random(n) < frac
    cols = [
        rng.integers(0, 2**31, n).astype(np.uint32) for _ in range(3)
    ] + [rng.integers(-5, 2**30, n).astype(np.int32)]
    nv, out = compact_stream_pallas(
        jnp.asarray(keep), *map(jnp.asarray, cols), interpret=True
    )
    assert int(nv) == keep.sum()
    for c, o in zip(cols, out):
        assert o.dtype == c.dtype
        assert np.array_equal(np.asarray(o)[: int(nv)], c[keep])


def test_compact_agrees_with_sort_path(rng):
    """Same kept prefix as the 4-key-sort compact_sorted_words when kept
    rows are distinct sorted words (its required precondition)."""
    n = 5000
    wa = np.sort(rng.integers(0, 2**20, n).astype(np.uint32))
    wb = rng.integers(0, 2**31, n).astype(np.uint32)
    wc = rng.integers(0, 2**31, n).astype(np.uint32)
    order = np.lexsort((wc, wb, wa))
    wa, wb, wc = wa[order], wb[order], wc[order]
    # distinct kept rows: keep run-end rows of the sorted triple
    ends = np.ones(n, bool)
    ends[:-1] = (wa[1:] != wa[:-1]) | (wb[1:] != wb[:-1]) | (wc[1:] != wc[:-1])
    keep = ends & (rng.random(n) < 0.3)
    pay = rng.integers(0, 2**31, n).astype(np.uint32)
    nv_s, res_s = seg.compact_sorted_words(
        jnp.asarray(keep), *map(jnp.asarray, (wa, wb, wc, pay))
    )
    nv_p, res_p = compact_stream_pallas(
        jnp.asarray(keep), *map(jnp.asarray, (wa, wb, wc, pay)),
        interpret=True,
    )
    assert int(nv_s) == int(nv_p)
    k = int(nv_s)
    for s, p in zip(res_s, res_p):
        assert np.array_equal(np.asarray(s)[:k], np.asarray(p)[:k])


def test_compact_is_stable_with_duplicate_words(rng):
    """Unlike the sort path, the streaming kernel is stable even when kept
    rows share identical words."""
    n = 700
    wa = np.zeros(n, np.uint32)  # all-equal words
    keep = rng.random(n) < 0.4
    marker = np.arange(n, dtype=np.uint32)
    nv, (out_a, out_m) = compact_stream_pallas(
        jnp.asarray(keep), jnp.asarray(wa), jnp.asarray(marker),
        interpret=True,
    )
    assert np.array_equal(np.asarray(out_m)[: int(nv)], marker[keep])
