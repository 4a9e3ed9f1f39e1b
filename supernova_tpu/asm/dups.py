"""Duplicate read-pair marking.

Analogue of the reference's MarkDups (10X/SecretOps.cc:413,599): two pairs
are duplicates when they share the barcode and their reads start at the same
place on the graph (pair-identical start heuristic).  We key each pair on
(barcode, first-edge/offset of r1's path, first-edge/offset of r2's path)
and keep the first pair of each key (stable order = read order).
"""
from __future__ import annotations

import numpy as np


def mark_dups(paths_edges, path_len, offset, bc) -> np.ndarray:
    """-> bool (n_pairs,) dup flag.  Inputs are per-read arrays (2i, 2i+1
    are mates), bc per read."""
    n_reads = paths_edges.shape[0]
    n_pairs = n_reads // 2
    e0 = np.where(path_len > 0, paths_edges[:, 0], -1)
    off = np.where(path_len > 0, offset, 0)

    r1 = np.arange(0, n_reads, 2)
    r2 = r1 + 1
    key = np.stack(
        [bc[r1].astype(np.int64), e0[r1], off[r1], e0[r2], off[r2]], axis=1
    )
    # unplaced pairs (both mates pathless) are never dups
    placed = (e0[r1] >= 0) | (e0[r2] >= 0)

    order = np.lexsort(key.T[::-1])
    ks = key[order]
    first = np.ones(n_pairs, dtype=bool)
    if n_pairs > 1:
        first[1:] = np.any(ks[1:] != ks[:-1], axis=1)
    dup_sorted = ~first
    dup = np.zeros(n_pairs, dtype=bool)
    dup[order] = dup_sorted
    return dup & placed


def dup_fraction(dup: np.ndarray) -> float:
    return float(dup.mean()) if len(dup) else 0.0
