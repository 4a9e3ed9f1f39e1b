"""Closure paths: joined per-pair walks on the base graph (MC stage).

Reference behavior (SURVEY.md §2.1 MC): MakeClosures (SecretOps.cc:
1049-1120) turns each non-dup, non-bad read pair whose two paths dead-end
into a joined closure path (Closer/DefinePairSet, 10X/Closer.cc:8-66),
doubles the set under the involution, UniqueSorts, and adds back unused
edges >= 200 kmers as singleton closures.  Closures are the raw material the
reference glues into the supergraph (ClosuresToGraph/NucleateGraph — the
full gluing construction is a later round; today's D comes from graph
compaction and closures are emitted as the a.cpaths-equivalent artifact and
used for scaffolding evidence).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

MIN_SINGLETON_KMERS = 200  # SecretOps.cc:1086-1113


def _join_pair(p1: List[int], p2rc: List[int]) -> List[int] | None:
    """Join r1's path with rc(r2's path) on their overlap (Closer logic:
    the pair brackets one fragment, so the two walks must overlap or abut).
    Returns the joined path or None if inconsistent."""
    if not p1:
        return p2rc or None
    if not p2rc:
        return p1
    # find the longest suffix of p1 that is a prefix of p2rc
    max_ov = min(len(p1), len(p2rc))
    for ov in range(max_ov, 0, -1):
        if p1[-ov:] == p2rc[:ov]:
            return p1 + p2rc[ov:]
    # no overlap: paths may abut end-to-start on the graph; emit nothing
    # (the fragment gap is closed by the patch stage, not here)
    return None


def make_closures(
    bg, paths_edges: np.ndarray, path_len: np.ndarray, dup: np.ndarray | None
) -> List[Tuple[int, ...]]:
    """-> unique closure paths (tuples of base edge ids), involution-doubled,
    plus long unused edges as singletons."""
    n_reads = paths_edges.shape[0]
    inv = bg.inv
    closures = set()
    used = np.zeros(bg.n_edges, dtype=bool)

    for pair in range(n_reads // 2):
        if dup is not None and dup[pair]:
            continue
        r1, r2 = 2 * pair, 2 * pair + 1
        p1 = [int(e) for e in paths_edges[r1, : path_len[r1]]]
        p2 = [int(e) for e in paths_edges[r2, : path_len[r2]]]
        p2rc = [int(inv[e]) for e in reversed(p2)]
        joined = _join_pair(p1, p2rc)
        if joined:
            closures.add(tuple(joined))
            for e in joined:
                used[e] = True
                used[int(inv[e])] = True

    # double under the involution (SecretOps.cc doubles then UniqueSorts)
    doubled = set(closures)
    for c in closures:
        doubled.add(tuple(int(inv[e]) for e in reversed(c)))

    # unused long edges become singleton closures
    kmers = bg.edges.lengths() - 47  # K-1
    for e in range(bg.n_edges):
        if not used[e] and kmers[e] >= MIN_SINGLETON_KMERS:
            doubled.add((e,))

    return sorted(doubled)


def closure_spans_junctions(closures, D) -> int:
    """How many closures cross a supergraph junction (evidence density the
    gluing construction will consume)."""
    from .place import base_to_super_map

    b2s = base_to_super_map(D)
    n = 0
    for c in closures:
        ds = {b2s[e][0] for e in c if e in b2s}
        if len(ds) > 1:
            n += 1
    return n


def save_closures(path, closures: List[Tuple[int, ...]]):
    values = np.concatenate([np.asarray(c, np.int64) for c in closures]) if closures else np.zeros(0, np.int64)
    offsets = np.zeros(len(closures) + 1, np.int64)
    np.cumsum([len(c) for c in closures], out=offsets[1:])
    np.savez_compressed(path, values=values, offsets=offsets)
