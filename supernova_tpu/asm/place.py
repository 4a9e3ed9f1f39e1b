"""PlaceReads: lift base-graph read paths onto the supergraph D.

Analogue of 10X/PlaceReads.cc (Align/Align2: compressed read paths onto D)
— since every D-edge is a path of base edges, a read's D-path is its base
path translated through base->super membership and run-compressed.  The
"smart" barcode-aware placement (PlaceReadsSmart) refines ambiguous
placements with line/barcode context in a later round.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def base_to_super_map(D) -> Dict[int, Tuple[int, int]]:
    """base edge -> (D edge, index within its path)."""
    out: Dict[int, Tuple[int, int]] = {}
    for d in range(D.n_edges):
        for j, e in enumerate(D.epaths.row(d)):
            out[int(e)] = (d, j)
    return out


def super_of_base_array(D, n_base: int) -> np.ndarray:
    """base edge -> D edge id, -1 if uncovered (vectorized map)."""
    out = np.full(n_base, -1, np.int64)
    for d in range(D.n_edges):
        out[D.epaths.row(d)] = d
    return out


def place_reads(D, paths_edges: np.ndarray, path_len: np.ndarray):
    """-> (dpaths (R, MP) int32 D-edge ids -1-padded, dpath_len (R,)).
    Run-compresses consecutive base edges mapping to the same D-edge.
    Vectorized over reads (MP is a small constant)."""
    r, mp = paths_edges.shape
    n_base = D.bg.n_edges
    d_of = super_of_base_array(D, n_base)
    slot_ok = np.arange(mp)[None, :] < np.asarray(path_len)[:, None]
    mapped = np.where(
        slot_ok & (paths_edges >= 0),
        d_of[np.clip(paths_edges, 0, n_base - 1)],
        -1,
    )
    dpaths = np.full((r, mp), -1, np.int32)
    dlen = np.zeros(r, np.int32)
    prev = np.full(r, -1, np.int64)
    for j in range(mp):
        d = mapped[:, j]
        emit = (d >= 0) & (d != prev)
        k = dlen[emit]
        rows = np.nonzero(emit)[0]
        ok = k < mp
        dpaths[rows[ok], k[ok]] = d[emit][ok]
        dlen[emit] += 1
        prev = np.where(d >= 0, d, prev)
    np.minimum(dlen, mp, out=dlen)
    return dpaths, dlen


def dpath_counts(D, dpaths: np.ndarray, dlen: np.ndarray) -> np.ndarray:
    """Reads supporting each D-edge (a.dpaths.counts analogue)."""
    out = np.zeros(D.n_edges, np.int64)
    r, mp = dpaths.shape
    flat = dpaths.reshape(-1)
    slot = np.tile(np.arange(mp), r)
    keep = (flat >= 0) & (slot < np.repeat(dlen, mp))
    np.add.at(out, flat[keep], 1)
    return out
