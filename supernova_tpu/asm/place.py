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


def place_reads(D, paths_edges: np.ndarray, path_len: np.ndarray):
    """-> (dpaths (R, MP) int32 D-edge ids -1-padded, dpath_len (R,)).
    Run-compresses consecutive base edges mapping to the same D-edge."""
    b2s = base_to_super_map(D)
    r, mp = paths_edges.shape
    dpaths = np.full((r, mp), -1, np.int32)
    dlen = np.zeros(r, np.int32)
    for i in range(r):
        prev = -1
        k = 0
        for j in range(int(path_len[i])):
            e = int(paths_edges[i, j])
            ds = b2s.get(e)
            if ds is None:
                continue
            d = ds[0]
            if d != prev:
                if k < mp:
                    dpaths[i, k] = d
                k += 1
                prev = d
        dlen[i] = min(k, mp)
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
