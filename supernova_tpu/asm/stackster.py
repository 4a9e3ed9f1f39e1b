"""Read-stack consensus for gap closure — the Stackster / ReadStack /
CloseGap2 analogue.

Reference behavior (SURVEY.md §2.1 "Gap patching"): per dead-end edge pair,
gather the supporting reads, align them into a common coordinate frame (a
"read stack"), and call a quality-weighted per-column consensus across the
gap (10X/Stackster.cc, paths/long/ReadStack.cc, CloseGap2 in
10X/Closomatic.cc).

TPU-native shape: a stack is a dense (reads x columns) matrix of base codes
plus a parallel capped-qual matrix; the consensus is a one-hot
qual-weighted vote per column — pure batched matrix ops (vectorized numpy
here; the same expression lifts to a (gaps x reads x columns) jnp batch on
device when gap counts reach production scale).  Read placement anchors on
exact shared k-mers with the flank sequence (host-side; read sets per gap
are bounded).

Closure strategy: grow a consensus extension rightward from e1's end and
leftward from e2's start, then join the two extensions on an exact overlap
(>= JOIN_OVERLAP) — the two-sided walk of CloseGap2.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core import dna
from ..core.kmer_codec import K

ANCHOR_K = 21  # seed k for placing reads on the flank
QCAP = 30  # per-base qual cap in the vote (ReadStack caps quals)
MIN_WIN_Q = 60  # winner must lead the runner-up by ~2 confident bases
JOIN_OVERLAP = 30  # exact overlap to join the two extensions
FLANK_W = 200  # flank window the stack is anchored on
MAX_EXT = 600  # max consensus extension per side
# ReadStack.cc:422-427 — a runner-up with this much qual weight and >= 2
# confident readers means real divergence (het arm / repeat copy), not noise
MAX_QCOMP = 100
MIN_ALT_Q30 = 2
# branching bound: <= 2 forks -> <= 4 candidate extensions per side
# (Consensuses1-style multi-candidate closure, ReadStack.cc:846)
MAX_FORKS = 2
# HighQualDiff founder filter (ReadStack.cc:489): a stacked read with >= 2
# confident disagreements against the flank is a misplaced repeat-copy read
FOUNDER_MAX_DIFFS = 2


def _kmer_index(seq: str, k: int = ANCHOR_K) -> dict:
    idx: dict = {}
    for i in range(len(seq) - k + 1):
        idx.setdefault(seq[i : i + k], i)
    return idx


def _place_read(codes: np.ndarray, idx: dict, k: int = ANCHOR_K) -> Optional[int]:
    """Offset of the read in flank coordinates via the first shared kmer
    (exact; error kmers simply don't match)."""
    s = dna.codes_to_seq(codes)
    for i in range(0, max(1, len(s) - k + 1), 4):
        p = idx.get(s[i : i + k])
        if p is not None:
            return p - i
    return None


def build_stack(
    reads: List[np.ndarray],
    quals: List[np.ndarray],
    flank: str,
    width: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack reads (both orientations tried) onto `flank + gap` coords:
    column 0 = flank[0]; returns (R, width) base codes (-1 empty) and
    capped quals (0 where empty)."""
    idx = _kmer_index(flank)
    rows_b, rows_q = [], []
    for codes, q in zip(reads, quals):
        for cod, qq in ((codes, q), (dna.revcomp(codes), q[::-1])):
            off = _place_read(cod, idx)
            if off is None:
                continue
            b = np.full(width, -1, np.int8)
            w = np.zeros(width, np.int16)
            lo = max(0, off)
            hi = min(width, off + len(cod))
            if hi > lo:
                b[lo:hi] = cod[lo - off : hi - off]
                w[lo:hi] = np.minimum(qq[lo - off : hi - off], QCAP)
                rows_b.append(b)
                rows_q.append(w)
            break
    if not rows_b:
        return np.zeros((0, width), np.int8), np.zeros((0, width), np.int16)
    return np.stack(rows_b), np.stack(rows_q)


def _vote_weights(quals: np.ndarray) -> np.ndarray:
    """ReadStack's qual weighting (ReadStack.cc:411-418): Q0 counts 0.1,
    Q1/Q2 count 0.2, else the (capped) qual."""
    w = quals.astype(np.float64)
    w = np.where(quals <= 2, np.minimum(w, 0.2), w)
    w = np.where(quals == 0, 0.1, w)
    return w


def consensus(bases: np.ndarray, quals: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Qual-weighted column vote: returns (consensus codes, trusted mask).
    A column is trusted when the winner leads the runner-up by at least
    MIN_WIN_Q (the lopsided-support margin rule), AND the runner-up is not
    itself strong evidence of real divergence — weight > MAX_QCOMP with
    >= 2 confident readers kills the column (ReadStack.cc:422-427)."""
    if bases.shape[0] == 0:
        w = bases.shape[1]
        return np.full(w, -1, np.int8), np.zeros(w, bool)
    onehot = (bases[:, :, None] == np.arange(4)[None, None, :])
    wt = (onehot * _vote_weights(quals)[:, :, None]).sum(axis=0)  # (W, 4)
    q30 = (onehot & (quals[:, :, None] >= QCAP)).sum(axis=0)  # (W, 4)
    order = np.argsort(wt, axis=1)
    win = order[:, -1]
    second = order[:, -2]
    win_w = np.take_along_axis(wt, order[:, -1:], axis=1)[:, 0]
    second_w = np.take_along_axis(wt, order[:, -2:-1], axis=1)[:, 0]
    sec_q30 = np.take_along_axis(q30, second[:, None], axis=1)[:, 0]
    divergent = (second_w > MAX_QCOMP) & (sec_q30 >= MIN_ALT_Q30)
    trusted = (win_w - second_w >= MIN_WIN_Q) & ~divergent
    return win.astype(np.int8), trusted


def filter_founder_diff(
    bases: np.ndarray, quals: np.ndarray, flank: str
) -> np.ndarray:
    """HighQualDiff vs the flank founder (ReadStack.cc:489-496): rows with
    >= FOUNDER_MAX_DIFFS confident disagreements against the known flank
    sequence are misplaced (another repeat copy / haplotype) — returns the
    keep mask."""
    if bases.shape[0] == 0:
        return np.zeros(0, bool)
    nf = min(len(flank), bases.shape[1])
    f = dna.seq_to_codes(flank[:nf])
    cover = bases[:, :nf] >= 0
    diff = cover & (bases[:, :nf] != f[None, :]) & (quals[:, :nf] >= QCAP)
    return diff.sum(axis=1) < FOUNDER_MAX_DIFFS


def _extend(reads, quals, flank: str) -> str:
    """Single best consensus extension (first candidate of _extend_multi)."""
    cands = _extend_multi(reads, quals, flank)
    return cands[0] if cands else ""


def _extend_multi(reads, quals, flank: str) -> List[str]:
    """Branch-aware consensus extensions beyond the flank.

    Per column, the qual-weighted vote runs over the rows consistent with
    the branch so far.  A trusted column extends; a column where BOTH top
    bases have >= MIN_ALT_Q30 confident readers is real divergence (het
    arm in the gap, or two repeat copies stacked together) — the extension
    FORKS, and each branch keeps only the rows that agree with it (plus
    rows not covering the column), which un-poisons every later column for
    that branch.  <= MAX_FORKS forks; candidates ordered
    strongest-branch-first (the Consensuses1 / Stackster multi-closure
    analogue, ReadStack.cc:846, 10X/Stackster.cc)."""
    width = len(flank) + MAX_EXT
    b, q = build_stack(reads, quals, flank, width)
    if b.shape[0] == 0:
        return []
    keep = filter_founder_diff(b, q, flank)
    # guard: with flat qual profiles every covering read can carry
    # "confident" errors — only apply the founder filter when a usable
    # stack survives it
    if keep.sum() >= 4:
        b, q = b[keep], q[keep]
    w = _vote_weights(q)
    done: List[Tuple[float, str]] = []
    # (priority, ext-so-far, row mask, column, forks used)
    live = [(0.0, "", np.ones(b.shape[0], bool), len(flank), 0)]
    while live:
        prio, ext, mask, j, forks = live.pop()
        forked = False
        while j < width:
            rows = mask & (b[:, j] >= 0)
            if not rows.any():
                break
            bb = b[rows, j]
            wt = np.bincount(bb, weights=w[rows, j], minlength=4)
            q30 = np.bincount(bb[q[rows, j] >= QCAP], minlength=4)
            order = np.argsort(wt)
            win, second = int(order[-1]), int(order[-2])
            divergent = wt[second] > MAX_QCOMP and q30[second] >= MIN_ALT_Q30
            if wt[win] - wt[second] >= MIN_WIN_Q and not divergent:
                ext += "ACGT"[win]
                j += 1
                continue
            if (
                forks < MAX_FORKS
                and q30[win] >= MIN_ALT_Q30
                and q30[second] >= MIN_ALT_Q30
            ):
                for base in (second, win):
                    bmask = mask & ((b[:, j] < 0) | (b[:, j] == base))
                    live.append(
                        (prio + wt[base], ext + "ACGT"[base], bmask, j + 1,
                         forks + 1)
                    )
                forked = True
            break
        if not forked:
            done.append((prio, ext))
    # strongest-branch-first, dedup, drop empties
    done.sort(key=lambda t: -t[0])
    seen = set()
    out = []
    for _, e in done:
        if e and e not in seen:
            seen.add(e)
            out.append(e)
    return out


def _join_exact(s1: str, s2: str, n_left: int, n_right: int) -> Optional[str]:
    """Longest exact suffix(s1)==prefix(s2) join -> fill, or None."""
    max_o = min(len(s1), len(s2))
    for o in range(max_o, JOIN_OVERLAP - 1, -1):
        if s1[-o:] == s2[:o]:
            joined = s1 + s2[o:]
            if len(joined) < n_left + n_right:
                return None  # negative gap: flanks overlap, not a fill
            return joined[n_left : len(joined) - n_right]
    return None


def close_gap_stack(bg, rs, gp) -> Optional[str]:
    """Two-sided stack consensus closure for one GapPair: extend right from
    e1's end and left from e2's start (each side may produce multiple
    branch candidates at divergent columns), join candidate pairs on an
    exact overlap, strongest-branch pair first.  Returns the FILL between
    e1's end and e2's start (may be empty), or None."""
    reads = [rs.read(r) for r in gp.read_ids]
    quals = [rs.qual(r) for r in gp.read_ids]
    left = bg.edge_seq(gp.e1)[-FLANK_W:]
    right = bg.edge_seq(gp.e2)[:FLANK_W]
    exts_r = _extend_multi(reads, quals, left) or [""]
    # right side: work in rc coords so "extension" is rightward again
    rc = lambda s: dna.codes_to_seq(dna.revcomp(dna.seq_to_codes(s)))
    exts_l = [
        rc(e)
        for e in _extend_multi(
            [dna.revcomp(r) for r in reads], [q[::-1] for q in quals],
            rc(right),
        )
    ] or [""]
    for er in exts_r:
        for el in exts_l:
            fill = _join_exact(left + er, el + right, len(left), len(right))
            if fill is not None:
                return fill
    return None
