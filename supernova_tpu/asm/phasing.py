"""Megabubble phasing: assign bubble arms to haplotypes using barcoded
molecules.

Analogue of Flipper (10X/Flipper.cc:3-29): per line, find bubbles, infer
barcode molecules, local search maximizing the phasing score
score(x) = sum over molecules |#agree - #disagree|, moves = flip bubble;
ambiguous bubbles are dropped and phase blocks break where no molecule
bridges adjacent bubbles.  The bubble x molecule support matrix is the
BandedMatrix analogue (Flipper.cc:36-75) — dense matrix ops, TPU-friendly
at scale; numpy here at current line sizes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np


@dataclass
class Bubble:
    element_idx: int  # position within the line's element list
    arms: List[np.ndarray]  # two D-edge paths (arm order = cell path order)


@dataclass
class LinePhasing:
    bubbles: List[Bubble]
    x: np.ndarray  # (B,) +1 / -1 arm orientation, 0 = unphased/dropped
    blocks: List[Tuple[int, int]]  # phase blocks: [start, end) bubble ranges
    score: float


def _arm_counts(
    arm: np.ndarray, edge_bc_counts: Dict[int, Dict[int, int]]
) -> Dict[int, int]:
    """Summed barcode read counts over an arm's constituent D-edges."""
    out: Dict[int, int] = {}
    for d in arm:
        for bc, n in edge_bc_counts.get(int(d), {}).items():
            out[bc] = out.get(bc, 0) + n
    return out


def _support_matrix(bubbles: List[Bubble], edge_bc_counts: Dict[int, Dict[int, int]]):
    """s[b, m] = reads(arm0) - reads(arm1) for molecule (barcode) m."""
    per_arm = [
        (_arm_counts(bub.arms[0], edge_bc_counts), _arm_counts(bub.arms[1], edge_bc_counts))
        for bub in bubbles
    ]
    all_bcs = sorted({bc for a0, a1 in per_arm for bc in {**a0, **a1}})
    bc_idx = {bc: i for i, bc in enumerate(all_bcs)}
    s = np.zeros((len(bubbles), len(all_bcs)), dtype=np.int32)
    for bi, (a0, a1) in enumerate(per_arm):
        for bc, n in a0.items():
            s[bi, bc_idx[bc]] += n
        for bc, n in a1.items():
            s[bi, bc_idx[bc]] -= n
    return s, all_bcs


def _score(x: np.ndarray, sgn: np.ndarray) -> float:
    # per-molecule |sum over bubbles of agreement|
    return float(np.abs((x[:, None] * sgn).sum(axis=0)).sum())


def phase_line(
    line, edge_bc_counts: Dict[int, Dict[int, int]], max_iters: int = 20, dinv=None
) -> LinePhasing:
    """Phase one line.  edge_bc_counts: D-edge -> {barcode: read count}.
    Cells whose two arms are rc twins are inversion artifacts, not het sites
    (ZapInversionBubbles, 10X/Super.h), and are excluded."""
    bubbles = [
        Bubble(i, [el.paths[0].copy(), el.paths[1].copy()])
        for i, el in enumerate(line.elements)
        if len(el) == 2
        and (
            dinv is None
            or not np.array_equal(
                np.asarray(dinv)[el.paths[0][::-1]], el.paths[1]
            )
        )
    ]
    if not bubbles:
        return LinePhasing([], np.zeros(0, np.int8), [], 0.0)

    s, bcs = _support_matrix(bubbles, edge_bc_counts)
    sgn = np.sign(s).astype(np.int8)
    # molecules informative on >= 2 bubbles drive phasing
    informative = (sgn != 0).sum(axis=0) >= 2
    sgn_i = sgn[:, informative]

    nb = len(bubbles)
    x = np.ones(nb, dtype=np.int8)
    if sgn_i.shape[1]:
        for _ in range(max_iters):
            improved = False
            col = (x[:, None] * sgn_i).sum(axis=0)  # per-molecule agreement
            for b in range(nb):
                # effect of flipping bubble b
                new_col = col - 2 * x[b] * sgn_i[b]
                if np.abs(new_col).sum() > np.abs(col).sum():
                    x[b] = -x[b]
                    col = new_col
                    improved = True
            if not improved:
                break

    # drop ambiguous bubbles: no informative molecule touches them
    touched = (sgn_i != 0).any(axis=1) if sgn_i.shape[1] else np.zeros(nb, bool)
    x_out = np.where(touched, x, 0).astype(np.int8)

    # phase blocks: break where no molecule covers both bubble b and b+1
    blocks: List[Tuple[int, int]] = []
    if nb:
        start = 0
        for b in range(nb - 1):
            bridged = bool(((sgn_i[b] != 0) & (sgn_i[b + 1] != 0)).any()) if sgn_i.shape[1] else False
            if not bridged:
                blocks.append((start, b + 1))
                start = b + 1
        blocks.append((start, nb))

    return LinePhasing(bubbles, x_out, blocks, _score(x, sgn) if nb else 0.0)


def build_edge_bc_counts(D, dpaths, dlen, read_bc) -> Dict[int, Dict[int, int]]:
    """D-edge -> {barcode: supporting read count}, from the reads' D
    placements (dpaths).  Vectorized: unique (read, D-edge) pairs counted
    per (D-edge, barcode)."""
    r, mp = dpaths.shape
    mapped = np.where(
        np.arange(mp)[None, :] < np.asarray(dlen)[:r, None], dpaths, -1
    )
    read_ids = np.broadcast_to(np.arange(r)[:, None], (r, mp))
    bc = np.asarray(read_bc)[:r]
    keep = (mapped >= 0) & (bc[:, None] > 0)
    dd = mapped[keep]
    rr = read_ids[keep]
    # one support unit per distinct (read, D-edge)
    pair_key = rr.astype(np.int64) * (D.n_edges + 1) + dd
    uniq = np.unique(pair_key)
    ur = uniq // (D.n_edges + 1)
    ud = uniq % (D.n_edges + 1)
    ubc = bc[ur]
    db_key = ud * np.int64(2**32) + ubc
    keys, counts = np.unique(db_key, return_counts=True)
    out: Dict[int, Dict[int, int]] = {}
    for k, c in zip(keys, counts):
        d = int(k // 2**32)
        b = int(k % 2**32)
        out.setdefault(d, {})[b] = int(c)
    return out


def build_edge_molecule_counts(
    D, lines, dpaths, dlen, read_bc, gap: int = 50_000
) -> Dict[int, Dict[tuple, int]]:
    """D-edge -> {molecule: count} with molecules as (bc, line, k) — the
    barcode's reads on a line are clustered into molecules by position gaps
    (Flipper phases MOLECULES, not barcodes; a barcode with two molecules on
    one long line must not fake bridging evidence)."""
    from .molecules import element_offsets

    r, mp = dpaths.shape
    dlen = np.asarray(dlen)[:r]
    bc = np.asarray(read_bc)[:r]

    # per D-edge: line + element start coordinate
    nd = D.n_edges
    line_of = np.full(nd, -1, np.int64)
    pos_of = np.zeros(nd, np.int64)
    for li, ln in enumerate(lines.lines):
        offs = element_offsets(D, ln)
        for j, el in enumerate(ln.elements):
            for d in el.edge_ids():
                line_of[int(d)] = li
                pos_of[int(d)] = offs[j]

    d0 = np.where(dlen > 0, dpaths[:, 0], -1).astype(np.int64)
    ok = (d0 >= 0) & (bc > 0)
    safe = np.clip(d0, 0, nd - 1)
    li = np.where(ok, line_of[safe], -1)
    pos = np.where(ok, pos_of[safe], 0)
    keep = ok & (li >= 0)
    rid = np.nonzero(keep)[0]
    kb, kl, kp = bc[keep], li[keep], pos[keep]
    order = np.lexsort((kp, kl, kb))
    kb, kl, kp, rid = kb[order], kl[order], kp[order], rid[order]
    if len(kb) == 0:
        return {}
    new_grp = np.concatenate(
        [[True], (kb[1:] != kb[:-1]) | (kl[1:] != kl[:-1])]
    )
    far = np.concatenate([[False], (kp[1:] - kp[:-1]) > gap])
    new_mol = new_grp | far
    mol_idx = np.cumsum(new_mol) - 1  # global molecule serial

    # read -> global molecule serial (vectorized join through read ids)
    mol_of = np.full(r, -1, np.int64)
    mol_of[rid] = mol_idx
    mol_bc = np.zeros(int(mol_idx[-1]) + 1, np.int64)
    mol_li = np.zeros(int(mol_idx[-1]) + 1, np.int64)
    mol_bc[mol_idx] = kb
    mol_li[mol_idx] = kl

    rows, cols = np.nonzero(
        (np.arange(mp)[None, :] < dlen[:, None]) & (dpaths >= 0)
    )
    d_all = dpaths[rows, cols].astype(np.int64)
    m_all = mol_of[rows]
    sel = m_all >= 0
    # one support unit per (read, D-edge), counted per (D-edge, molecule)
    rk = rows[sel].astype(np.int64) * np.int64(nd + 1) + d_all[sel]
    _, first = np.unique(rk, return_index=True)
    d_u = d_all[sel][first]
    m_u = m_all[sel][first]
    key2 = d_u * np.int64(mol_bc.shape[0] + 1) + m_u
    uk, uc = np.unique(key2, return_counts=True)
    out: Dict[int, Dict[tuple, int]] = {}
    for k, c in zip(uk.tolist(), uc.tolist()):
        d = k // (mol_bc.shape[0] + 1)
        m = k % (mol_bc.shape[0] + 1)
        out.setdefault(int(d), {})[
            (int(mol_bc[m]), int(mol_li[m]), int(m))
        ] = int(c)
    return out


def phase_block_lengths(D, line, ph: LinePhasing) -> List[int]:
    """Approximate phase-block lengths in bases (distance between the first
    and last bubble of each block along the line)."""
    if not ph.bubbles:
        return []
    elens = {}

    def elen(d):
        if d not in elens:
            elens[d] = D.edge_len(int(d))
        return elens[d]

    # prefix positions of elements along the line (longest path per element)
    from ..core.kmer_codec import K

    pos = [0]
    for el in line.elements:
        pos.append(
            pos[-1]
            + max(
                sum(elen(d) for d in p) - (len(p) - 1) * (K - 1)
                for p in el.paths
            )
        )
    out = []
    for a, b in ph.blocks:
        lo = ph.bubbles[a].element_idx
        hi = ph.bubbles[b - 1].element_idx
        out.append(max(pos[hi + 1] - pos[lo], 1))
    return out
