"""MinHash barcode sketches (tada min_hash analogue)."""
import numpy as np

from supernova_tpu.asm.minhash import (
    candidate_pairs,
    jaccard_estimate,
    sketch,
    sketch_sets,
)


def test_jaccard_estimate_tracks_truth(rng):
    pool = np.arange(1, 2001)
    a = rng.choice(pool, 400, replace=False)
    overlap_frac = 0.5
    keep = rng.choice(a, int(len(a) * overlap_frac), replace=False)
    b = np.concatenate([keep, rng.choice(pool[~np.isin(pool, a)], 200, replace=False)])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = jaccard_estimate(sketch(a, 64), sketch(b, 64))
    assert abs(est - true_j) < 0.15


def test_disjoint_sets_score_zero(rng):
    a = np.arange(1, 100)
    b = np.arange(1000, 1100)
    assert jaccard_estimate(sketch(a), sketch(b)) == 0.0


def test_candidate_pairs_prefilter(rng):
    sets = []
    base = rng.choice(np.arange(1, 5000), 300, replace=False)
    sets.append(base)
    sets.append(np.sort(rng.permutation(base)[:250]))  # strong overlap
    sets.append(rng.choice(np.arange(6000, 12000), 300, replace=False))  # disjoint
    sk = sketch_sets(sets, k=32)
    pairs = candidate_pairs(sk)
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs
