"""Stackaroo: read-based post patching of scaffold gaps.

Analogue of 10X/Stackaroo.cc (read-stack patching over the smart
placements, CP.cc:1286-1288): after scaffolding, each {-2} barcode-only
gap between joined lines is attacked with the reads placed near the two
flanking line ends (plus their mates); a small-k DBG walk from the left
flank's tail to the right flank's head (the Stackster-style consensus,
shared with asm/patch) converts the gap into sequence when the reads
bridge it.  Successful fills replace the N run in every FASTA flavor.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .patch import PATCH_K, _mini_dbg_walk

FLANK_BASES = 400  # anchor context taken from each line end
MAX_GAP_READS = 400


def reads_by_line(lines, dpaths: np.ndarray, dlen: np.ndarray) -> Dict[int, List[int]]:
    """line id -> read ids placed on it (first placed D-edge), vectorized."""
    r, mp = dpaths.shape
    dlen = np.asarray(dlen)[:r]
    loe = np.asarray(lines.line_of_edge)
    valid = (np.arange(mp)[None, :] < dlen[:, None]) & (dpaths >= 0)
    first = np.argmax(valid, axis=1)
    has = valid[np.arange(r), first]
    d0 = dpaths[np.arange(r), first]
    li = np.where(has, loe[np.clip(d0, 0, len(loe) - 1)], -1)
    out: Dict[int, List[int]] = {}
    keep = li >= 0
    order = np.argsort(li[keep], kind="stable")
    rids = np.nonzero(keep)[0][order]
    lis = li[keep][order]
    if len(lis):
        starts = np.concatenate([[0], np.nonzero(lis[1:] != lis[:-1])[0] + 1, [len(lis)]])
        for a, b in zip(starts[:-1], starts[1:]):
            out[int(lis[a])] = rids[a:b].tolist()
    return out


def stackaroo(
    D,
    lines,
    scaffolds,
    rs,
    dpaths: np.ndarray,
    dlen: np.ndarray,
    line_seqs: Dict[int, str],
    k: int = PATCH_K,
) -> int:
    """Fill scaffold gaps in place (sets sc.fills[i]); -> gaps filled."""
    rbl = reads_by_line(lines, dpaths, dlen)
    linv = lines.linv
    n_filled = 0
    for sc in scaffolds:
        if getattr(sc, "fills", None) is None:
            sc.fills = [None] * len(sc.gaps)
        for i in range(len(sc.line_ids) - 1):
            la, lb = sc.line_ids[i], sc.line_ids[i + 1]
            seq_a = line_seqs.get(la)
            seq_b = line_seqs.get(lb)
            if not seq_a or not seq_b or len(seq_a) < k or len(seq_b) < k:
                continue
            rids: List[int] = []
            for li in (la, int(linv[la]), lb, int(linv[lb])):
                rids.extend(rbl.get(li, ()))
            # include mates (the fragment may dangle into the gap)
            with_mates = set()
            for r in rids:
                with_mates.add(r)
                with_mates.add(r ^ 1)
            rids = sorted(with_mates)[:MAX_GAP_READS]
            if len(rids) < 2:
                continue
            seqs = [rs.read(r) for r in rids]
            left = seq_a[-FLANK_BASES:]
            right = seq_b[:FLANK_BASES]
            fill = _mini_dbg_walk(seqs, left, right, k)
            if fill is None:
                continue
            sc.fills[i] = fill
            n_filled += 1
    return n_filled
