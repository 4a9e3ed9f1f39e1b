"""Inversion-artifact handling on the supergraph D.

Reference analogues:
  * ZapInversionBubbles (10X/Super.cc:3167-3186): a cell sandwiched between
    a straight edge and that edge's own rc twin is an inversion artifact,
    not a het site — delete the cell's edges (and their dinv partners).
  * KillInversionArtifacts (10X/Super.cc:3003-3123, CP.cc:593-598): at a
    fork v (one in-edge h, two out-branches z and f) whose neighborhood
    "looks like" an inversion (some edge near one branch is the dinv of an
    edge near the other), delete the branch with almost no barcode support
    when the sibling is much better supported (MAX_CAN_INS_DEL=4,
    MIN_CAN_INS_RATIO=5).
  * RemoveUnneededVertices/CleanupCore (10X/CleanThe.cc): after deletion,
    chains through now-simple vertices are recompacted; delete_edges here
    does both in one pass, keeping the involution consistent.

InvFix proper (10X/InvFix.cc) is reference-assisted (uses galigns); its
molecule-position signal is covered by the orientation-aware scaffolder
(asm/scaffold.orient_join).

Host-side by design: D is supergraph-scale (1e5-1e6 edges, SURVEY.md §7).
"""
from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

MAX_CAN_INS_DEL = 4  # CP.cc:595
MIN_CAN_INS_RATIO = 5  # Super.h:192 default


class PairBarcodes:
    """Sorted (ordered-edge-pair, id) rows supporting O(log n) queries —
    the vectorized form of the (d_a, d_b) -> barcode-set map."""

    def __init__(self, D, dpaths: np.ndarray, dlen: np.ndarray, read_bc):
        r, mp = dpaths.shape
        dlen = np.asarray(dlen)[:r]
        self.ed = np.int64(D.n_edges + 1)
        if r == 0 or mp < 2:
            self.key = np.zeros(0, np.int64)
            self.id = np.zeros(0, np.int64)
            return
        if read_bc is None:
            ids = np.arange(r, dtype=np.int64)
        else:
            ids = np.asarray(read_bc)[:r].astype(np.int64)
        a = dpaths[:, :-1]
        b = dpaths[:, 1:]
        slot = np.arange(mp - 1)[None, :]
        ok = (slot + 1 < dlen[:, None]) & (a >= 0) & (b >= 0)
        if read_bc is not None:
            ok &= ids[:, None] > 0
        rows, cols = np.nonzero(ok)
        pair_k = a[rows, cols].astype(np.int64) * self.ed + b[rows, cols]
        uniq = np.unique(np.stack([pair_k, ids[rows]], axis=1), axis=0)
        self.key = uniq[:, 0]
        self.id = uniq[:, 1]

    def ids(self, da: int, db: int) -> np.ndarray:
        k = np.int64(da) * self.ed + db
        lo = np.searchsorted(self.key, k, side="left")
        hi = np.searchsorted(self.key, k, side="right")
        return self.id[lo:hi]


def consecutive_pair_barcodes(
    D, dpaths: np.ndarray, dlen: np.ndarray, read_bc: np.ndarray | None
) -> PairBarcodes:
    """(d_a, d_b) consecutive-traversal support index (see PairBarcodes)."""
    return PairBarcodes(D, dpaths, dlen, read_bc)


def zap_inversion_bubbles(D, lines) -> List[int]:
    """-> D-edge ids to delete (involution-symmetric)."""
    dels: List[int] = []
    dinv = D.dinv
    for ln in lines.lines:
        els = ln.elements
        for j in range(1, len(els) - 1):
            left, right = els[j - 1], els[j + 1]
            if not left.is_straight() or not right.is_straight():
                continue
            if int(dinv[int(left.paths[0][0])]) != int(right.paths[0][0]):
                continue
            for d in els[j].edge_ids():
                dels.append(int(d))
                dels.append(int(dinv[int(d)]))
    return sorted(set(dels))


def kill_inversion_artifacts(
    D,
    dpaths: np.ndarray,
    dlen: np.ndarray,
    read_bc: np.ndarray | None,
    max_del: int = MAX_CAN_INS_DEL,
    min_ratio: int = MIN_CAN_INS_RATIO,
) -> List[int]:
    """Low-depth canonical-inversion branches to delete (+ dinv partners)."""
    dinv = D.dinv
    pair_bc = consecutive_pair_barcodes(D, dpaths, dlen, read_bc)

    def branch_support(h: int, g: int) -> int:
        fwd = pair_bc.ids(h, g)
        rc = pair_bc.ids(int(dinv[g]), int(dinv[h]))
        return len(np.union1d(fwd, rc))

    dels: List[int] = []
    # adjacency once (the per-vertex nonzero scans were quadratic)
    in_at: Dict[int, List[int]] = {}
    out_at: Dict[int, List[int]] = {}
    for e in range(D.n_edges):
        out_at.setdefault(int(D.from_v[e]), []).append(e)
        in_at.setdefault(int(D.to_v[e]), []).append(e)
    # candidate forks: one in-edge, two out-edges
    indeg = np.bincount(D.to_v, minlength=D.n_vertices)
    outdeg = np.bincount(D.from_v, minlength=D.n_vertices)
    for v in np.nonzero((indeg == 1) & (outdeg == 2))[0]:
        h = in_at[int(v)][0]
        outs = out_at[int(v)]
        for z, f in ((outs[0], outs[1]), (outs[1], outs[0])):
            w = int(D.to_v[z])
            w_outs = out_at.get(w, [])
            if len(w_outs) != 1:
                continue
            # neighborhoods on each side of the fork (bounded 2-step walk,
            # the nhood construction of Super.cc:3035-3050)
            nhood0 = {int(h), int(f)}
            x = int(D.from_v[h])
            nhood0.update(int(e) for e in in_at.get(x, ()))
            nhood1 = {int(w_outs[0])}
            for e in in_at.get(w, ()):
                if e != z:
                    nhood1.add(int(e))
                    m = int(D.from_v[e])
                    nhood1.update(int(g) for g in in_at.get(m, ()))
            looks_like = any(int(dinv[a]) in nhood1 for a in nhood0)
            if not looks_like:
                continue
            s_z = branch_support(int(h), int(z))
            s_f = branch_support(int(h), int(f))
            if s_z <= max_del and s_f >= min_ratio * max(s_z, 1) and s_f > 0:
                dels.append(int(z))
                dels.append(int(dinv[z]))
                break
    return sorted(set(dels))


def _compact_chains(
    E: int,
    live: np.ndarray,
    from_e: np.ndarray,
    to_e: np.ndarray,
    n_vertices: int,
    no_merge: np.ndarray | None = None,
) -> List[np.ndarray]:
    """Maximal unbranched chains of the live edges through simple
    (in=1, out=1) vertices; cycles broken deterministically at min edge id.
    Edges flagged in `no_merge` (gap edges — their payload is not a base-edge
    path) never join a chain, mirroring RemoveUnneededVertices' DoCheck gate
    on negative payloads (10X/Super.cc:1150-1153)."""
    indeg = np.zeros(n_vertices, dtype=np.int64)
    outdeg = np.zeros(n_vertices, dtype=np.int64)
    np.add.at(indeg, to_e[live], 1)
    np.add.at(outdeg, from_e[live], 1)
    out_edge = np.full(n_vertices, -1, dtype=np.int64)
    in_edge = np.full(n_vertices, -1, dtype=np.int64)
    for e in live:
        if outdeg[from_e[e]] == 1:
            out_edge[from_e[e]] = e
        if indeg[to_e[e]] == 1:
            in_edge[to_e[e]] = e
    nxt = np.full(E, -1, dtype=np.int64)
    prv = np.full(E, -1, dtype=np.int64)
    for e in live:
        if no_merge is not None and no_merge[e]:
            continue
        v = int(to_e[e])
        if indeg[v] == 1 and outdeg[v] == 1:
            f = out_edge[v]
            if f >= 0 and f != e and not (no_merge is not None and no_merge[f]):
                nxt[e] = f
                prv[f] = e
    visited = np.zeros(E, dtype=bool)
    for e in live:
        if visited[e] or prv[e] != -1:
            continue
        c = e
        while c != -1 and not visited[c]:
            visited[c] = True
            c = nxt[c]
    for e in live:
        if not visited[e]:  # cycle member
            cyc, x = [int(e)], nxt[e]
            visited[e] = True
            while x != e:
                visited[x] = True
                cyc.append(int(x))
                x = nxt[x]
            m = min(cyc)
            prv[m] = -1
            nxt[cyc[cyc.index(m) - 1]] = -1
    chains: List[np.ndarray] = []
    for e in live:
        if prv[e] != -1:
            continue
        chain = [int(e)]
        c = nxt[e]
        while c != -1:
            chain.append(int(c))
            c = nxt[c]
        chains.append(np.asarray(chain, dtype=np.int64))
    return chains


def delete_edges(D, dels: List[int], force: bool = False):
    """Remove D-edges (involution-symmetrized) and recompact chains through
    now-simple vertices.  Returns a new SuperGraph over the same BaseGraph.
    `force` recompacts even with no deletions (after structural edits)."""
    from .supergraph import SuperGraph
    from ..core.ragged import Ragged

    ED = D.n_edges
    drop = np.zeros(ED, dtype=bool)
    for d in dels:
        drop[int(d)] = True
        drop[int(D.dinv[d])] = True
    keep = ~drop
    if (keep.all() and not force) or not keep.any():
        return D
    live = np.nonzero(keep)[0]
    chains = _compact_chains(
        ED, live, D.from_v, D.to_v, D.n_vertices, no_merge=D.gap_mask()
    )

    paths: List[np.ndarray] = []
    new_of_old = np.full(ED, -1, dtype=np.int64)
    for chain in chains:
        d = len(paths)
        for od in chain:
            new_of_old[od] = d
        paths.append(np.concatenate([D.epaths.row(int(od)) for od in chain]))
    nd = len(paths)
    dinv = np.zeros(nd, dtype=np.int64)
    tails = [int(c[-1]) for c in chains]
    for d, t in enumerate(tails):
        dinv[d] = new_of_old[int(D.dinv[t])]
    from_v = np.array([D.from_v[int(c[0])] for c in chains], dtype=np.int64)
    to_v = np.array([D.to_v[int(c[-1])] for c in chains], dtype=np.int64)
    used_v = np.unique(np.concatenate([from_v, to_v])) if nd else np.zeros(0, np.int64)
    remap = {int(v): i for i, v in enumerate(used_v)}
    from_v = np.array([remap[int(v)] for v in from_v], dtype=np.int64)
    to_v = np.array([remap[int(v)] for v in to_v], dtype=np.int64)
    return SuperGraph(
        epaths=Ragged.from_rows(paths, dtype=np.int64)
        if nd
        else Ragged(np.zeros(0, np.int64), np.zeros(1, np.int64)),
        dinv=dinv,
        from_v=from_v,
        to_v=to_v,
        n_vertices=len(used_v),
        bg=D.bg,
    )
