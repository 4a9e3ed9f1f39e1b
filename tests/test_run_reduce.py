"""Fused Pallas run-reduce kernel vs a numpy model of the reduce rules,
including cross-block run carries (interpret mode on CPU)."""
import numpy as np
import pytest

from supernova_tpu.kmer.count import BC_FIELD_IGNORED, pack_occurrence_attrs
from supernova_tpu.ops.pallas.run_reduce import BLOCK_ROWS, LANES, run_reduce_pallas


def make_sorted_stream(rng, n, n_kmers, long_run_at=None):
    """Random sorted occurrence stream: run lengths random; one giant run
    crossing block boundaries when long_run_at is set."""
    kmer_ids = np.sort(rng.integers(0, n_kmers, n))
    if long_run_at is not None:
        lo, hi = long_run_at
        kmer_ids[lo:hi] = kmer_ids[lo]
        kmer_ids = np.sort(kmer_ids)
    # words derived deterministically from the id (w2 low bits vary)
    w0 = (kmer_ids // 1000).astype(np.uint32)
    w1 = (kmer_ids % 1000).astype(np.uint32)
    w2 = (kmer_ids * 7 % 911).astype(np.uint32)
    valid = rng.random(n) < 0.9
    bc = rng.integers(1, 50, n).astype(np.int32)
    bc[rng.random(n) < 0.2] = -1  # ignored
    lm = rng.integers(0, 16, n).astype(np.uint32)
    rm = rng.integers(0, 16, n).astype(np.uint32)
    import jax.numpy as jnp

    pk = np.asarray(
        pack_occurrence_attrs(
            jnp.asarray(bc), jnp.asarray(lm), jnp.asarray(rm), jnp.asarray(valid)
        )
    )
    # invariant from extract_occurrences: invalid rows carry sentinel words,
    # so real kmer runs contain only valid rows
    w0 = np.where(valid, w0, np.uint32(0xFFFFFFFF))
    w1 = np.where(valid, w1, np.uint32(0xFFFFFFFF))
    w2 = np.where(valid, w2, np.uint32(0xFFFFFFFF))
    # attrs must be sorted within runs for the distinct-bc rule (the real
    # pipeline sorts by (words, packed))
    order = np.lexsort((pk, w2, w1, w0))
    return w0[order], w1[order], w2[order], pk[order]


def brute(w0, w1, w2, pk, min_freq, min_bc):
    n = len(w0)
    keep = np.zeros(n, bool)
    count = np.zeros(n, np.int64)
    nbc = np.zeros(n, np.int64)
    ign = np.zeros(n, bool)
    lm = np.zeros(n, np.int64)
    rm = np.zeros(n, np.int64)
    i = 0
    while i < n:
        j = i
        while j < n and (w0[j], w1[j], w2[j]) == (w0[i], w1[i], w2[i]):
            j += 1
        c = 0
        bcs = set()
        has_ign = False
        l = r = 0
        for p in range(i, j):
            v = (pk[p] >> 1) & 1
            f = pk[p] >> 10
            if v:
                c += 1
                if f == BC_FIELD_IGNORED:
                    has_ign = True
                elif f > 0:
                    bcs.add(int(f))
                l |= (pk[p] >> 6) & 15
                r |= (pk[p] >> 2) & 15
        e = j - 1
        count[e] = c
        nbc[e] = len(bcs)
        ign[e] = has_ign
        lm[e] = l
        rm[e] = r
        keep[e] = c >= min_freq and (has_ign or len(bcs) >= min_bc)
        i = j
    return keep, count, nbc, ign, lm, rm


@pytest.mark.parametrize("n,blocks", [(LANES * 64, 1), (LANES * (BLOCK_ROWS + 64), 2)])
def test_run_reduce_matches_brute(rng, n, blocks):
    long_run = (n // 3, n // 3 + LANES * 8) if blocks > 1 else None
    w0, w1, w2, pk = make_sorted_stream(rng, n, max(40, n // 50), long_run)
    keep, count, stats = run_reduce_pallas(
        w0, w1, w2, pk, min_freq=3, min_bc=2, interpret=True
    )
    keep = np.asarray(keep)[:n].astype(bool)
    count = np.asarray(count)[:n]
    stats = np.asarray(stats)[:n]
    bk, bc_, bn, bi, bl, br = brute(w0, w1, w2, pk, 3, 2)
    assert np.array_equal(keep, bk)
    ends = np.nonzero(bc_ > 0)[0]  # end rows with any valid occurrence
    assert np.array_equal(count[ends], bc_[ends])
    got_nbc = (stats >> 9) & 4095
    got_lm = (stats >> 5) & 15
    got_rm = (stats >> 1) & 15
    got_ign = stats & 1
    assert np.array_equal(got_nbc[ends], np.minimum(bn[ends], 4095))
    assert np.array_equal(got_lm[ends], bl[ends])
    assert np.array_equal(got_rm[ends], br[ends])
    assert np.array_equal(got_ign[ends].astype(bool), bi[ends])
