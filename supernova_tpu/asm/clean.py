"""Supergraph cleanup passes (CP's Cleaner family).

Reference analogues:
  * SimpleHangs (10X/Super.cc:3128-3165, CP.cc:838-846): delete a short
    hanging D-edge (dead end, <= MAX_KILL kmers) when a sibling branch
    continues >= MIN_RATIO times farther.
  * DistancesToEndArr (10X/Super.cc): capped longest forward distance from
    each vertex, used by the hang tests.
  * weak bubble-arm deletion / 3:0 rule (CP.cc:1692-1794): in a two-arm
    cell, an arm with no read support loses to a strongly supported sibling
    (sequencing-error arms after nucleation).

All host-side: D is supergraph-scale (SURVEY.md §7 boundary rule).
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..core.kmer_codec import K

MAX_KILL = 350  # CP.cc:838
MIN_RATIO = 25.0  # CP.cc:839
STRONG = 3  # the 3:0 bubble rule


def superedge_kmers(D) -> np.ndarray:
    """Kmers per D-edge (sum of constituent base-edge kmers)."""
    base_k = (D.bg.edges.lengths() - (K - 1)).astype(np.int64)
    out = np.zeros(D.n_edges, dtype=np.int64)
    for d in range(D.n_edges):
        out[d] = int(base_k[D.epaths.row(d)].sum())
    return out


def distances_to_end(D, lens: np.ndarray, cap: int) -> np.ndarray:
    """dfw[v] = longest forward path length from v, capped (DistancesToEndArr
    analogue; iterative relaxation, the cap bounds cycles)."""
    dfw = np.zeros(D.n_vertices, dtype=np.int64)
    for _ in range(64):
        nxt = np.zeros(D.n_vertices, dtype=np.int64)
        np.maximum.at(nxt, D.from_v, np.minimum(lens + dfw[D.to_v], cap))
        if np.array_equal(nxt, dfw):
            break
        dfw = nxt
    return dfw


def simple_hangs(
    D, max_kill: int = MAX_KILL, min_ratio: float = MIN_RATIO
) -> List[int]:
    """-> D-edge ids to delete (involution-symmetric)."""
    lens = superedge_kmers(D)
    dfw = distances_to_end(D, lens, int(max_kill * min_ratio))
    indeg = np.bincount(D.to_v, minlength=D.n_vertices)
    outdeg = np.bincount(D.from_v, minlength=D.n_vertices)
    dels: List[int] = []
    for e1 in range(D.n_edges):
        w = int(D.to_v[e1])
        if outdeg[w] != 0 or indeg[w] != 1:
            continue  # not a hanging end
        if lens[e1] > max_kill:
            continue
        v = int(D.from_v[e1])
        sibs = np.nonzero(D.from_v == v)[0]
        n2 = lens[sibs] + dfw[D.to_v[sibs]]
        n2[sibs == e1] = 0
        if (n2 >= min_ratio * max(int(lens[e1]), 1)).any():
            dels.append(e1)
            dels.append(int(D.dinv[e1]))
    return sorted(set(dels))


MAX_KILLX = 2500  # CleanThe.cc:2350
MIN_RATIOX = 20.0  # CleanThe.cc:2351


def compound_hangs(
    D, max_kill: int = MAX_KILLX, min_ratio: float = MIN_RATIOX
) -> List[int]:
    """FindCompoundHangs (CleanThe.cc:2782-2795, MAX_KILLX=2500,
    MIN_RATIOX=20): delete a branch whose
    ENTIRE forward continuation is short (<= max_kill kmers, subtree
    included via the capped distance-to-end) when a sibling continues
    >= min_ratio times farther; the orphaned subtree falls to the
    small-component pass.  -> D-edge ids (involution-symmetric)."""
    lens = superedge_kmers(D)
    dfw = distances_to_end(D, lens, int(max_kill * min_ratio))
    dels: List[int] = []
    by_from: dict = {}
    for e in range(D.n_edges):
        by_from.setdefault(int(D.from_v[e]), []).append(e)
    for v, outs in by_from.items():
        if len(outs) < 2:
            continue
        n = [int(lens[e] + dfw[int(D.to_v[e])]) for e in outs]
        best = max(n)
        for e, ne in zip(outs, n):
            if ne <= max_kill and best >= min_ratio * max(ne, 1) and ne < best:
                dels.append(int(e))
                dels.append(int(D.dinv[e]))
    return sorted(set(dels))


def weak_cell_arms(D, lines, support: np.ndarray, strong: int = STRONG) -> List[int]:
    """3:0 rule over two-arm cells: delete the unsupported arm when the
    sibling has >= `strong` read support.  Arm support is measured on edges
    unique to that arm.  -> D-edge ids (involution-symmetric)."""
    dels: List[int] = []
    for ln in lines.lines:
        for el in ln.elements:
            if len(el) != 2:
                continue
            e0 = set(el.paths[0].tolist())
            e1 = set(el.paths[1].tolist())
            only0 = list(e0 - e1)
            only1 = list(e1 - e0)
            if not only0 or not only1:
                continue
            s0 = int(support[only0].max())
            s1 = int(support[only1].max())
            weak = None
            if s0 >= strong and s1 == 0:
                weak = only1
            elif s1 >= strong and s0 == 0:
                weak = only0
            if weak:
                for d in weak:
                    dels.append(int(d))
                    dels.append(int(D.dinv[d]))
    return sorted(set(dels))


MIN_COMP_SIZE = 300  # CleanThe.cc:2801


def remove_very_small_components(D, min_kmers: int = MIN_COMP_SIZE) -> List[int]:
    """RemoveVerySmallComponents (CleanThe.cc:791-817): delete every edge of
    weakly-connected components totalling < min_kmers kmers — the residue of
    short contained closures that never glued.  -> D-edge ids."""
    lens = superedge_kmers(D)
    parent = np.arange(D.n_vertices, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for e in range(D.n_edges):
        a, b = find(int(D.from_v[e])), find(int(D.to_v[e]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp_k: dict = {}
    for e in range(D.n_edges):
        comp_k[find(int(D.from_v[e]))] = 0
    for e in range(D.n_edges):
        comp_k[find(int(D.from_v[e]))] += int(lens[e])
    dels = [
        e
        for e in range(D.n_edges)
        if comp_k[find(int(D.from_v[e]))] < min_kmers
    ]
    return dels


def clean_supergraph(D, place_fn, max_rounds: int = 4):
    """Iterate hang trimming + weak-arm deletion + inversion zapping until
    stable.  `place_fn(D) -> (dpaths, dlen)` supplies read support.
    Returns (D, total_deleted)."""
    from . import inversion as ainv
    from . import lines as alines
    from .nucleate import merge_short_overlaps
    from .place import dpath_counts

    total = 0
    for _ in range(max_rounds):
        merged = merge_short_overlaps(D)
        if merged.n_edges < D.n_edges:
            total += D.n_edges - merged.n_edges
            D = merged
        dels = simple_hangs(D)
        dels += compound_hangs(D)
        dels += remove_very_small_components(D)
        dpaths, dlen = place_fn(D)
        support = dpath_counts(D, dpaths, dlen)
        lines = alines.find_lines(D)
        dels += weak_cell_arms(D, lines, support)
        dels += ainv.zap_inversion_bubbles(D, lines)
        dels = sorted(set(dels))
        if not dels or len(dels) >= D.n_edges:
            break
        D = ainv.delete_edges(D, dels)
        total += len(dels)
    return D, total
