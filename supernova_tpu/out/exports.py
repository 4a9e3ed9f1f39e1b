"""Debug exports: the tada `bcmat` analogue.

Reference: `tada bcmat <graph> <bcs> <mm-file>` writes the edge->barcode
incidence as a MatrixMarket coordinate/pattern file
(lib/tada/src/cmd_graph_stats.rs:89-115) for offline clustering /
inspection.  Same format here, from the ebcx checkpoint.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.ragged import Ragged


def write_bcmat(
    ebcx: Ragged, path: str | Path, comment: str = "edge -> bc matrix"
) -> Path:
    path = Path(path)
    n_edges = ebcx.n_rows
    max_bc = int(ebcx.values.max()) if len(ebcx.values) else 0
    with open(path, "w") as w:
        w.write("%%MatrixMarket matrix coordinate pattern general\n")
        w.write(f"% {comment}\n")
        w.write(f"{n_edges} {max_bc + 1} {len(ebcx.values)}\n")
        offs = ebcx.offsets
        for e in range(n_edges):
            for b in ebcx.values[offs[e] : offs[e + 1]]:
                w.write(f"{e + 1} {int(b) + 1}\n")
    return path


def load_bcmat(path: str | Path):
    """-> (n_edges, n_bcs, [(edge, bc)]) 0-based."""
    with open(path) as f:
        header = f.readline()
        assert header.startswith("%%MatrixMarket")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        n_edges, n_bcs, nnz = (int(x) for x in line.split())
        pairs = []
        for line in f:
            a, b = line.split()
            pairs.append((int(a) - 1, int(b) - 1))
    assert len(pairs) == nnz
    return n_edges, n_bcs, pairs
