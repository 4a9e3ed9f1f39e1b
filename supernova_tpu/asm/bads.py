"""MarkBads + path extension.

Reference analogues:
  * MarkBads (10X/SecretOps.h:22-35): a read is "bad" when it has more than
    MAX_Q30_MISMATCHES high-quality mismatches against the assembly; bad
    reads are excluded from closures and patching evidence.
  * ExtendPathsNew (10X/Extend.cc:15): extend read placements forward /
    backward through unambiguous graph walks when the read continues past
    its matched kmers (e.g. tail kmers were filtered), tolerating low-qual
    mismatches.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.kmer_codec import K

MAX_Q30_MISMATCHES = 5  # SecretOps.h MarkBads threshold
Q_HI = 30


def spell_read_span(bg, edges, offset, length) -> np.ndarray | None:
    """Graph bases under a read placement (path edges overlap by K-1)."""
    if len(edges) == 0:
        return None
    seq = bg.edges.row(int(edges[0]))
    for e in edges[1:]:
        seq = np.concatenate([seq, bg.edges.row(int(e))[K - 1 :]])
    if offset < 0 or offset > len(seq):
        return None
    return seq[offset : offset + length]


def mark_bads(
    bg, rs, paths_edges, path_len, offset, max_mm: int = MAX_Q30_MISMATCHES
) -> np.ndarray:
    """-> bool (n_reads,): read disagrees with the assembly at > max_mm
    high-quality positions.

    Vectorized for single-edge placements (the vast majority); multi-edge
    placements fall back to per-read spelling."""
    n = rs.n_reads
    bad = np.zeros(n, dtype=bool)
    if n == 0:
        return bad
    plen = np.asarray(path_len[:n])
    off = np.asarray(offset[:n])
    rlen = np.diff(rs.offsets).astype(np.int64)
    lmax = int(rlen.max())
    gv = bg.edges.values
    goff = bg.edges.offsets

    single = np.nonzero(plen == 1)[0]
    if len(single):
        e = paths_edges[single, 0].astype(np.int64)
        span_start = goff[e] + off[single]
        span_len = np.minimum(rlen[single], goff[e + 1] - span_start)
        ok = (off[single] >= 0) & (span_len > 0)
        si = single[ok]
        if len(si):
            e = e[ok]
            span_start = span_start[ok]
            span_len = span_len[ok]
            cols = np.arange(lmax)
            gidx = span_start[:, None] + cols[None, :]
            inb = cols[None, :] < span_len[:, None]
            graph_b = gv[np.minimum(gidx, len(gv) - 1)]
            ridx = rs.offsets[si][:, None] + cols[None, :]
            rinb = cols[None, :] < rlen[si][:, None]
            read_b = rs.codes[np.minimum(ridx, len(rs.codes) - 1)]
            qual_b = rs.quals[np.minimum(ridx, len(rs.codes) - 1)]
            mm = (read_b != graph_b) & (qual_b >= Q_HI) & inb & rinb
            bad[si] = mm.sum(axis=1) > max_mm

    # multi-edge placements, vectorized over SLOTS (<= MAX_PATH) instead of
    # reads: per slot, the covered span window maps to one contiguous gv
    # range (edges overlap by K-1); chunked to bound the 2D temporaries
    multi = np.nonzero(plen > 1)[0]
    mp = paths_edges.shape[1]
    for c0 in range(0, len(multi), 131072):
        mi = multi[c0 : c0 + 131072]
        rm = len(mi)
        pe = paths_edges[mi].astype(np.int64)
        kk = plen[mi][:, None]
        slot = np.arange(mp)[None, :]
        live = slot < kk
        pes = np.clip(pe, 0, len(goff) - 2)
        el = (goff[pes + 1] - goff[pes]).astype(np.int64)
        seg = np.where(live, el - np.where(slot > 0, K - 1, 0), 0)
        cum = np.cumsum(seg, axis=1) - seg  # span offset of each segment
        total = seg.sum(axis=1)
        ok_read = (off[mi] >= 0) & (off[mi] <= total)
        cols = np.arange(lmax, dtype=np.int64)
        t_g = off[mi][:, None] + cols[None, :]
        ridx = rs.offsets[mi][:, None] + cols[None, :]
        rinb = cols[None, :] < rlen[mi][:, None]
        read_b = rs.codes[np.minimum(ridx, len(rs.codes) - 1)]
        qual_b = rs.quals[np.minimum(ridx, len(rs.codes) - 1)]
        graph_b = np.full((rm, lmax), -1, np.int16)
        for j in range(mp):
            lo = cum[:, j][:, None]
            m = (
                live[:, j][:, None]
                & (t_g >= lo)
                & (t_g < lo + seg[:, j][:, None])
                & rinb
                & ok_read[:, None]
            )
            if not m.any():
                continue
            src = (
                goff[pes[:, j]][:, None]
                + (K - 1 if j > 0 else 0)
                + (t_g - lo)
            )
            graph_b = np.where(
                m, gv[np.clip(src, 0, len(gv) - 1)].astype(np.int16), graph_b
            )
        mm = (read_b != graph_b) & (qual_b >= Q_HI) & (graph_b >= 0) & rinb
        bad[mi] = mm.sum(axis=1) > max_mm
    return bad


def unique_next_edges(bg) -> np.ndarray:
    """-> (E,) unique continuation edge after each edge, -1 if ambiguous."""
    outdeg = np.bincount(bg.from_v, minlength=bg.n_vertices)
    uniq_out = np.full(bg.n_vertices, -1, np.int64)
    uniq_out[bg.from_v] = np.arange(bg.n_edges)
    uniq_out[outdeg != 1] = -1
    return uniq_out[bg.to_v]


def extend_paths(
    bg, rs, paths_edges, path_len, offset, max_mm_frac: float = 0.1
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Extend placements through unambiguous continuations when the read
    runs past its current path span.  Returns (paths_edges, path_len,
    n_extended); arrays are modified copies.  Candidate reads (span shorter
    than the read AND an unambiguous next edge) are selected vectorized;
    only those walk the per-read loop."""
    paths_edges = np.asarray(paths_edges).copy()
    path_len = np.asarray(path_len).copy()
    offset = np.asarray(offset)
    n = rs.n_reads
    mp = paths_edges.shape[1]
    if n == 0:
        return paths_edges, path_len, 0
    nxt_edge = unique_next_edges(bg)
    elens = bg.edges.lengths()
    rlen = np.diff(rs.offsets).astype(np.int64)[:n]

    pl = path_len[:n]
    slot_ok = np.arange(mp)[None, :] < pl[:, None]
    safe = np.clip(paths_edges[:n], 0, bg.n_edges - 1)
    span = (
        np.where(slot_ok, elens[safe], 0).sum(axis=1)
        - np.maximum(pl - 1, 0) * (K - 1)
        - np.clip(offset[:n], 0, None)
    )
    last = safe[np.arange(n), np.maximum(pl - 1, 0)]
    cand = np.nonzero(
        (pl >= 1) & (pl < mp) & (span < rlen) & (nxt_edge[last] >= 0)
    )[0]

    n_ext = 0
    for r in cand:
        plr = int(path_len[r])
        read = rs.read(r)
        sp = spell_read_span(bg, paths_edges[r, :plr], int(offset[r]), len(read))
        if sp is None or len(sp) >= len(read):
            continue
        covered = len(sp)
        cur = int(paths_edges[r, plr - 1])
        extended = False
        while covered < len(read) and plr < mp:
            nxt = int(nxt_edge[cur])
            if nxt < 0:
                break
            seg = bg.edges.row(nxt)[K - 1 :]
            take = min(len(seg), len(read) - covered)
            mism = (read[covered : covered + take] != seg[:take]).sum()
            if mism > max(1, int(max_mm_frac * take)):
                break
            paths_edges[r, plr] = nxt
            plr += 1
            covered += take
            cur = nxt
            extended = True
        if extended:
            path_len[r] = plr
            n_ext += 1
    return paths_edges, path_len, n_ext
