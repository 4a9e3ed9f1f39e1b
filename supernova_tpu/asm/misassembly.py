"""Misassembly detection: barcode-coverage dips along lines.

Analogue of KillMisassembledCells (10X/Super.h:25-31, CP.cc:942-1106):
a true join is supported by molecules spanning it, so the number of
barcodes covering both sides of every line junction should not dip to
(near) zero.  Junctions whose spanning-barcode support falls below
`min_span` relative to their flanks are misassembly candidates and the
line is broken there.
"""
from __future__ import annotations

from typing import List, Set

import numpy as np

MIN_SPAN_BC = 2


def element_barcodes(D, line, sup_bcs: List[np.ndarray]) -> List[Set[int]]:
    """Barcode set per line element (union over parallel arms)."""
    out = []
    for el in line.elements:
        s: Set[int] = set()
        for d in el.edge_ids():
            s |= set(sup_bcs[int(d)].tolist())
        out.append(s)
    return out


def find_weak_junctions(
    D, line, sup_bcs: List[np.ndarray], min_span: int = MIN_SPAN_BC
) -> List[int]:
    """-> element indices j where the junction between element j-1 and j has
    fewer than min_span spanning barcodes (while both flanks have some)."""
    ebcs = element_barcodes(D, line, sup_bcs)
    weak = []
    for j in range(1, len(ebcs)):
        left, right = ebcs[j - 1], ebcs[j]
        if not left or not right:
            continue
        span = len(left & right)
        if span < min_span:
            weak.append(j)
    return weak


def break_lines(lines, D, sup_bcs: List[np.ndarray], min_span: int = MIN_SPAN_BC):
    """Split lines at weak junctions.  Returns a new Lines object."""
    from .lines import Line, Lines

    new_lines: List[Line] = []
    for ln in lines.lines:
        weak = set(find_weak_junctions(D, ln, sup_bcs, min_span))
        if not weak:
            new_lines.append(ln)
            continue
        cur: list = []
        for j, el in enumerate(ln.elements):
            if j in weak and cur:
                new_lines.append(Line(cur))
                cur = []
            cur.append(el)
        if cur:
            new_lines.append(Line(cur))

    n_edges = len(lines.line_of_edge)
    line_of_edge = np.full(n_edges, -1, np.int64)
    for i, ln in enumerate(new_lines):
        for el in ln.elements:
            for e in el.edge_ids():
                line_of_edge[int(e)] = i
    linv = np.zeros(len(new_lines), np.int64)
    for i, ln in enumerate(new_lines):
        e0 = int(ln.elements[0].paths[0][0])
        linv[i] = line_of_edge[int(D.dinv[e0])]
    return Lines(new_lines, line_of_edge, linv)
