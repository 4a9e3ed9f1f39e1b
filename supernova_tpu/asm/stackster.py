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


def consensus(bases: np.ndarray, quals: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Qual-weighted column vote: returns (consensus codes, trusted mask).
    A column is trusted when the winner leads the runner-up by at least
    MIN_WIN_Q (the lopsided-support margin rule the reference applies
    throughout)."""
    if bases.shape[0] == 0:
        w = bases.shape[1]
        return np.full(w, -1, np.int8), np.zeros(w, bool)
    onehot = (bases[:, :, None] == np.arange(4)[None, None, :])
    wt = (onehot * quals[:, :, None]).sum(axis=0)  # (W, 4)
    order = np.argsort(wt, axis=1)
    win = order[:, -1]
    win_w = np.take_along_axis(wt, order[:, -1:], axis=1)[:, 0]
    second_w = np.take_along_axis(wt, order[:, -2:-1], axis=1)[:, 0]
    trusted = win_w - second_w >= MIN_WIN_Q
    return win.astype(np.int8), trusted


def _extend(reads, quals, flank: str) -> str:
    """Consensus extension beyond the flank: trusted columns starting at
    len(flank), stopping at the first untrusted one."""
    width = len(flank) + MAX_EXT
    b, q = build_stack(reads, quals, flank, width)
    cons, ok = consensus(b, q)
    ext = []
    for j in range(len(flank), width):
        if not ok[j]:
            break
        ext.append("ACGT"[cons[j]])
    return "".join(ext)


def close_gap_stack(bg, rs, gp) -> Optional[str]:
    """Two-sided stack consensus closure for one GapPair: extend right from
    e1's end and left from e2's start, join on an exact overlap.  Returns
    the FILL between e1's end and e2's start (may be empty), or None."""
    reads = [rs.read(r) for r in gp.read_ids]
    quals = [rs.qual(r) for r in gp.read_ids]
    left = bg.edge_seq(gp.e1)[-FLANK_W:]
    right = bg.edge_seq(gp.e2)[:FLANK_W]
    ext_r = _extend(reads, quals, left)
    # right side: work in rc coords so "extension" is rightward again
    rc = lambda s: dna.codes_to_seq(dna.revcomp(dna.seq_to_codes(s)))
    ext_l = rc(_extend([dna.revcomp(r) for r in reads], [q[::-1] for q in quals], rc(right)))

    s1 = left + ext_r  # ends somewhere in/after the gap
    s2 = ext_l + right  # starts somewhere in/before the gap
    # exact-overlap join: longest suffix of s1 == prefix of s2
    max_o = min(len(s1), len(s2))
    for o in range(max_o, JOIN_OVERLAP - 1, -1):
        if s1[-o:] == s2[:o]:
            joined = s1 + s2[o:]
            if len(joined) < len(left) + len(right):
                return None  # negative gap: flanks overlap, not a fill
            return joined[len(left) : len(joined) - len(right)]
    return None
