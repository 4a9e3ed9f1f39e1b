"""Unvoid: barcode-restricted local assembly across line-end gaps.

Analogue of 10X/BuildLocal.{h,cc} (GetBarcodes / BuildLocal1/2 / Unvoid,
called from CP's gap-capture and patch stages, CP.cc:790,1017-1023).  The
reference walks back GRAB=10000 kmers from a line end collecting barcodes
on unique base edges (BuildLocal.cc:83-95), pulls EVERY read of those
barcodes (placed or not — that is the point: reads inside the gap never
placed anywhere), builds a local assembly from them, and walks it from
the left flank to the right flank; closures are grafted back by Surgery.

Here the local assembly is the shared mini-DBG machinery (asm/patch):
majority-extension walk between flank anchors, with a long walk budget —
barcode-gathered reads cover the gap interior, so multi-read-length gaps
close.  Successful walks upgrade the {-2} gap edge to a {-3} sequence
edge exactly like Stackaroo; unlike Stackaroo the read set comes from
barcode membership, not placements.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..core.kmer_codec import K
from .patch import PATCH_K

GRAB = 10_000  # kmers of line-end context to harvest barcodes from
MAX_BARCODES = 1000  # promiscuous-edge and total-set gate
MIN_KMERS_PASSES = (1, 10)  # escalate the per-edge kmer gate if oversubscribed
MAX_READS = 8000  # local-assembly read budget (ref: 1M; our sims are smaller)
MAX_LOCAL_WALK = 20_000  # walk budget in bases (multi-read-length gaps)


def compute_mult(D) -> np.ndarray:
    """Multiplicity of each base edge across D's epaths (ComputeMult)."""
    n_base = D.bg.n_edges
    mult = np.zeros(n_base, np.int64)
    gm = D.gap_mask()
    for d in range(D.n_edges):
        if gm[d]:
            continue
        np.add.at(mult, np.asarray(D.epaths.row(d), np.int64), 1)
    return mult


def get_barcodes(
    D,
    d_end: int,
    ebcx,
    mult: np.ndarray,
    min_kmers: int,
    grab: int = GRAB,
    max_barcodes: int = MAX_BARCODES,
) -> np.ndarray:
    """Barcodes on unique, well-behaved base edges within `grab` kmers
    walking backward from the end of D-edge `d_end` along its chain
    (GetBarcodes, BuildLocal.h:15-75; bubbles and gap edges are skipped
    over like the reference's 2-in/1-out walk)."""
    kmers = D.bg.edges.lengths() - (K - 1)
    inn: Dict[int, List[int]] = {}
    for e in range(D.n_edges):
        inn.setdefault(int(D.from_v[e]), []).append(e)
    into: Dict[int, List[int]] = {}
    for e in range(D.n_edges):
        into.setdefault(int(D.to_v[e]), []).append(e)

    out: List[int] = []
    total = 0
    sc = d_end
    seen = set()
    while True:
        if sc in seen:
            break
        seen.add(sc)
        row = D.epaths.row(sc)
        if len(row) and int(row[0]) < 0:
            break
        for e in np.asarray(row, np.int64):
            e = int(e)
            if mult[e] != 1 or kmers[e] < min_kmers:
                continue
            bcs = ebcx.row(e)
            if len(bcs) > max_barcodes:
                continue
            out.extend(int(b) for b in bcs)
        total += int(kmers[np.asarray(row, np.int64)].sum())
        if total >= grab:
            break
        w = int(D.from_v[sc])
        ins = into.get(w, [])
        outs = inn.get(w, [])
        if len(ins) == 1 and len(outs) == 1 and D.is_gap(ins[0]):
            # skip over a gap edge (BuildLocal.h:48-52)
            x = int(D.from_v[ins[0]])
            if len(inn.get(x, [])) == 1 and len(into.get(x, [])) == 1:
                sc = into[x][0]
                continue
            break
        if len(ins) == 1 and len(outs) == 1:
            sc = ins[0]
            continue
        if len(ins) == 2 and len(outs) == 1:
            # bubble: harvest both arms, continue from before it
            d1, d2 = ins
            if D.from_v[d1] != D.from_v[d2]:
                break
            v = int(D.from_v[d1])
            if len(inn.get(v, [])) != 2 or len(into.get(v, [])) != 1:
                break
            for d in (d1, d2):
                rowd = D.epaths.row(d)
                if len(rowd) and int(rowd[0]) < 0:
                    continue
                for e in np.asarray(rowd, np.int64):
                    e = int(e)
                    if mult[e] != 1 or kmers[e] < min_kmers:
                        continue
                    bcs = ebcx.row(e)
                    if len(bcs) > max_barcodes:
                        continue
                    out.extend(int(b) for b in bcs)
                total += int(kmers[np.asarray(rowd, np.int64)].sum())
            if total >= grab:
                break
            sc = into[v][0]
            continue
        break
    return np.unique(np.asarray(out, np.int64)) if out else np.zeros(0, np.int64)


def barcode_reads(rs, barcodes: np.ndarray, max_reads: int = MAX_READS) -> np.ndarray:
    """All read ids of the given barcodes via the bci CSR index
    (BuildLocal.cc:99-123; barcode 0 = unbarcoded block is never grabbed)."""
    bci = np.asarray(rs.bci, np.int64)
    ids: List[np.ndarray] = []
    total = 0
    for b in barcodes:
        b = int(b)
        if b <= 0 or b + 1 >= len(bci):
            continue
        lo, hi = bci[b], bci[b + 1]
        if hi <= lo:
            continue
        ids.append(np.arange(lo, hi, dtype=np.int64))
        total += int(hi - lo)
        if total >= max_reads:
            break
    if not ids:
        return np.zeros(0, np.int64)
    return np.concatenate(ids)[:max_reads]


def _flanks(D) -> Dict[int, tuple]:
    """Canonical {-2} gap edge -> (eL, eR): unique non-gap in/out flanks."""
    from . import gap as agap

    into: Dict[int, List[int]] = {}
    outof: Dict[int, List[int]] = {}
    for e in range(D.n_edges):
        into.setdefault(int(D.to_v[e]), []).append(e)
        outof.setdefault(int(D.from_v[e]), []).append(e)
    out = {}
    for d in range(D.n_edges):
        if int(D.dinv[d]) <= d or not agap.is_bc_gap(D.epaths.row(d)):
            continue
        lefts = [
            e for e in into.get(int(D.from_v[d]), [])
            if e != d and not D.is_gap(e)
        ]
        rights = [
            e for e in outof.get(int(D.to_v[d]), [])
            if e != d and not D.is_gap(e)
        ]
        if len(lefts) == 1 and len(rights) == 1:
            out[d] = (lefts[0], rights[0])
    return out


def unvoid(
    D,
    rs,
    ebcx,
    k: int = PATCH_K,
    max_reads: int = MAX_READS,
):
    """Close remaining {-2} gaps by barcode-restricted local assembly
    (Unvoid, BuildLocal.cc:1055-1233).  Returns (D', n_closed)."""
    from ..core import dna
    from ..core.ragged import Ragged
    from . import gap as agap
    from .patch import _mini_dbg_walk
    from .supergraph import SuperGraph

    if not getattr(rs, "barcoded", False):
        return D, 0
    flanks = _flanks(D)
    if not flanks:
        return D, 0
    mult = compute_mult(D)

    replacements: Dict[int, np.ndarray] = {}
    n_closed = 0
    for d, (eL, eR) in flanks.items():
        # barcode harvest from both sides (use_rights), with gate escalation
        bcs = np.zeros(0, np.int64)
        for min_kmers in MIN_KMERS_PASSES:
            bL = get_barcodes(D, eL, ebcx, mult, min_kmers)
            bR = get_barcodes(
                D, int(D.dinv[eR]), ebcx, mult, min_kmers
            )  # right side walks its rc strand backward
            bcs = np.union1d(bL, bR)
            if len(bcs) <= MAX_BARCODES:
                break
        if len(bcs) == 0 or len(bcs) > MAX_BARCODES:
            continue
        rids = barcode_reads(rs, bcs, max_reads)
        if len(rids) < 2:
            continue
        seq_l, seq_r = D.edge_seq(eL), D.edge_seq(eR)
        if len(seq_l) < K or len(seq_r) < K:
            continue
        seqs = [rs.read(int(r)) for r in rids]
        fill = _mini_dbg_walk(
            seqs, seq_l[-400:], seq_r[:400], k, max_walk=MAX_LOCAL_WALK
        )
        if fill is None or len(fill) < k:
            continue
        gseq = seq_l[-(K - 1) :] + fill + seq_r[k : K - 1]
        row = agap.seq_to_gap(dna.seq_to_codes(gseq), 0, 0)
        replacements[d] = row
        replacements[int(D.dinv[d])] = agap.rc_gap(row)
        n_closed += 1

    if not replacements:
        return D, 0
    rows = [replacements.get(d, D.epaths.row(d)) for d in range(D.n_edges)]
    D2 = SuperGraph(
        epaths=Ragged.from_rows(rows, dtype=np.int64),
        dinv=D.dinv.copy(),
        from_v=D.from_v.copy(),
        to_v=D.to_v.copy(),
        n_vertices=D.n_vertices,
        bg=D.bg,
    )
    return D2, n_closed
