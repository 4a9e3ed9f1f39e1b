"""Line decomposition of the supergraph.

Analogue of FindLines (paths/long/large/Lines.h:16-47): a line is a maximal
alternating chain [straight, cell, straight, ...] where a cell is a set of
parallel paths (here: parallel D-edges = simple bubbles; deeper cells arrive
with CaptureMessyLoops later).  Lines carry the involution (LineInv) and
length stats (GetLineLengths/LineN50 — 10X/LineLine.h analogues).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..core.kmer_codec import K


@dataclass
class Line:
    """elements[i] = array of parallel D-edge ids (1 = straight, >1 = cell)."""

    elements: List[np.ndarray]

    def edges(self) -> np.ndarray:
        return np.concatenate(self.elements) if self.elements else np.zeros(0, np.int64)

    def n_bubbles(self) -> int:
        return sum(1 for el in self.elements if len(el) > 1)


@dataclass
class Lines:
    lines: List[Line]
    line_of_edge: np.ndarray  # (ED,) line id or -1
    linv: np.ndarray  # (L,) line involution

    @property
    def n_lines(self) -> int:
        return len(self.lines)

    def lengths(self, D) -> np.ndarray:
        """Per-line length in bases (longest arm through each cell)."""
        out = np.zeros(self.n_lines, dtype=np.int64)
        elens = np.array([D.edge_len(d) for d in range(D.n_edges)], dtype=np.int64)
        for i, ln in enumerate(self.lines):
            total = 0
            for j, el in enumerate(ln.elements):
                total += int(elens[el].max())
                if j:
                    total -= K - 1
            out[i] = total
        return out


def find_lines(D) -> Lines:
    """Group parallel D-edges into cells, then chain cells through simple
    vertices into maximal lines.  Self-loop edges are captured into the
    passing line as loop cells (CaptureSimpleLoops analogue, 10X/Capture.cc)
    instead of breaking the chain."""
    ed = D.n_edges
    self_loop = D.from_v == D.to_v
    loops_at: dict = {}
    for e in np.nonzero(self_loop)[0]:
        loops_at.setdefault(int(D.from_v[e]), []).append(int(e))

    chain_edges = np.nonzero(~self_loop)[0]
    # cells: group by (from, to), self-loops excluded
    pair_key = D.from_v.astype(np.int64) * (D.n_vertices + 1) + D.to_v
    order = chain_edges[np.argsort(pair_key[chain_edges], kind="stable")]
    cells: List[np.ndarray] = []
    cell_of_edge = np.full(ed, -1, dtype=np.int64)
    i = 0
    ne = len(order)
    while i < ne:
        j = i
        while j < ne and pair_key[order[j]] == pair_key[order[i]]:
            j += 1
        members = np.sort(order[i:j])
        cells.append(members)
        cell_of_edge[members] = len(cells) - 1
        i = j
    nc = len(cells)
    cfrom = np.array([D.from_v[c[0]] for c in cells], dtype=np.int64)
    cto = np.array([D.to_v[c[0]] for c in cells], dtype=np.int64)

    indeg = np.bincount(cto, minlength=D.n_vertices)
    outdeg = np.bincount(cfrom, minlength=D.n_vertices)
    out_cell = np.full(D.n_vertices, -1, dtype=np.int64)
    in_cell = np.full(D.n_vertices, -1, dtype=np.int64)
    for c in range(nc):
        if outdeg[cfrom[c]] == 1:
            out_cell[cfrom[c]] = c
        if indeg[cto[c]] == 1:
            in_cell[cto[c]] = c

    nxt = np.full(nc, -1, dtype=np.int64)
    prv = np.full(nc, -1, dtype=np.int64)
    for c in range(nc):
        v = cto[c]
        if indeg[v] == 1 and outdeg[v] == 1:
            f = out_cell[v]
            if f >= 0 and f != c:
                nxt[c] = f
                prv[f] = c

    # break cycles deterministically at min cell id
    visited = np.zeros(nc, dtype=bool)
    for c in range(nc):
        if visited[c] or prv[c] != -1:
            continue
        x = c
        while x != -1 and not visited[x]:
            visited[x] = True
            x = nxt[x]
    for c in range(nc):
        if not visited[c]:
            cyc, x = [c], nxt[c]
            visited[c] = True
            while x != c:
                visited[x] = True
                cyc.append(x)
                x = nxt[x]
            m = min(cyc)
            prv[m] = -1
            nxt[cyc[cyc.index(m) - 1]] = -1

    lines: List[Line] = []
    line_of_edge = np.full(ed, -1, dtype=np.int64)
    line_of_cell = np.full(nc, -1, dtype=np.int64)
    for c in range(nc):
        if prv[c] != -1:
            continue
        chain = [c]
        x = nxt[c]
        while x != -1:
            chain.append(x)
            x = nxt[x]
        li = len(lines)
        els = []
        for k, cc in enumerate(chain):
            line_of_cell[cc] = li
            for e in cells[cc]:
                line_of_edge[e] = li
            els.append(cells[cc])
            # capture self-loops at this cell's exit vertex into the line
            v = int(cto[cc])
            for le in loops_at.get(v, ()):
                if line_of_edge[le] == -1:
                    line_of_edge[le] = li
                    els.append(np.array([le], dtype=np.int64))
        lines.append(Line(els))

    # leftover self-loops (at vertices no chain passes) become their own lines
    for v, les in loops_at.items():
        for le in les:
            if line_of_edge[le] == -1:
                li = len(lines)
                line_of_edge[le] = li
                lines.append(Line([np.array([le], dtype=np.int64)]))

    # involution: line containing the dinv of our first edge
    linv = np.zeros(len(lines), dtype=np.int64)
    for i, ln in enumerate(lines):
        e0 = int(ln.elements[0][0])
        linv[i] = line_of_edge[int(D.dinv[e0])]
    return Lines(lines, line_of_edge, linv)


def canonical_lines(lines: Lines) -> np.ndarray:
    """One representative per rc line pair (self-rc lines included)."""
    return np.nonzero(np.arange(lines.n_lines) <= lines.linv)[0]
