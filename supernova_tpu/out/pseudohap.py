"""Scaffold/haplotype FASTA flavors: megabubbles, pseudohap, pseudohap2.

Analogue of MakeFasta's ScafLinePrinter walk (10X/tools/MakeFasta.cc:46-57,
175-210; writestuff/ScafLinePrinter.h:301-340):
  * megabubbles — walk each scaffold; megabubble arms become separate
    records, unbranched stretches shared;
  * pseudohap   — one record per scaffold, one arm chosen per bubble
    (phasing choice when phased, stronger arm otherwise);
  * pseudohap2  — two records per scaffold with complementary arm choices
    + a .idx haplotype index (the reference's per-allele `choose`).
Gaps between scaffolded lines are emitted as N runs ({-2} gap edges).
"""
from __future__ import annotations

import gzip
import json
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..core import dna
from ..core.kmer_codec import K


def _open(path, mode):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def _element_seq(D, el, choice: int) -> str:
    """Sequence of one line element; `choice` picks the path for cells.
    Consecutive D-edges on a cell path overlap by K-1."""
    path = el.paths[min(choice, len(el.paths) - 1)]
    seq = D.edge_seq(int(path[0]))
    for d in path[1:]:
        seq += D.edge_seq(int(d))[K - 1 :]
    return seq


def line_sequence(D, line, arm_choice: Dict[int, int]) -> str:
    """Walk a line, overlapping elements by K-1; arm_choice maps element
    index -> arm (default 0)."""
    seq = ""
    for i, el in enumerate(line.elements):
        s = _element_seq(D, el, arm_choice.get(i, 0))
        seq = s if not seq else seq + s[K - 1 :]
    return seq


def _phase_choices(line, phasing, hap: int) -> Dict[int, int]:
    """element idx -> arm for haplotype hap (0/1) from a LinePhasing."""
    out: Dict[int, int] = {}
    for b, bub in enumerate(phasing.bubbles):
        x = int(phasing.x[b])
        if x == 0:
            arm = 0  # unphased: deterministic arm
        else:
            arm = 0 if (x > 0) == (hap == 0) else 1
        out[bub.element_idx] = arm
    return out


def join_parts(parts, sc, k: int | None = None) -> str:
    """Join per-line sequences of a scaffold: Stackaroo fills (sc.fills)
    splice real sequence, otherwise {-2}-style N gaps."""
    from ..asm.patch import PATCH_K

    if k is None:
        k = PATCH_K
    fills = getattr(sc, "fills", None)
    seq = ""
    for i, p in enumerate(parts):
        if i == 0:
            seq = p
            continue
        fill = fills[i - 1] if fills else None
        if fill is not None and len(p) > k:
            seq += fill + p[k:]
        else:
            seq += "N" * sc.gaps[i - 1] + p
    return seq


def _wrap(f, seq: str, width=80):
    for i in range(0, len(seq), width):
        f.write(seq[i : i + width] + "\n")


def write_megabubbles_fasta(D, lines, scaffolds, phasings, path):
    """Each scaffold: unbranched stretches once; both arms of each bubble as
    separate records (the reference's megabubble style)."""
    rid = 0
    with _open(path, "wt") as f:
        for si, sc in enumerate(scaffolds):
            for li in sc.line_ids:
                line = lines.lines[li]
                seg = ""
                seg_id = 0
                for i, el in enumerate(line.elements):
                    if len(el) == 1:
                        s = _element_seq(D, el, 0)
                        seg = s if not seg else seg + s[K - 1 :]
                    else:
                        if seg:
                            f.write(f">scaffold_{si} line_{li} segment_{seg_id}\n")
                            _wrap(f, seg)
                            rid += 1
                            seg_id += 1
                            seg = ""
                        for a in range(min(2, len(el))):
                            s = _element_seq(D, el, a)
                            f.write(
                                f">scaffold_{si} line_{li} bubble_{i} arm_{a}\n"
                            )
                            _wrap(f, s)
                            rid += 1
                if seg:
                    f.write(f">scaffold_{si} line_{li} segment_{seg_id}\n")
                    _wrap(f, seg)
                    rid += 1
    return rid


def write_pseudohap_fasta(D, lines, scaffolds, phasings, path):
    """One record per scaffold; phased arm choice (hap 0)."""
    with _open(path, "wt") as f:
        for si, sc in enumerate(scaffolds):
            parts = []
            for li in sc.line_ids:
                ph = phasings.get(li)
                choice = _phase_choices(lines.lines[li], ph, 0) if ph else {}
                parts.append(line_sequence(D, lines.lines[li], choice))
            seq = join_parts(parts, sc)
            f.write(f">scaffold_{si} len={len(seq)}\n")
            _wrap(f, seq)
    return len(scaffolds)


def write_pseudohap2_fasta(D, lines, scaffolds, phasings, path, idx_path=None):
    """Two records per scaffold with complementary arm choices + .idx."""
    index = []
    with _open(path, "wt") as f:
        rid = 0
        for si, sc in enumerate(scaffolds):
            for hap in (0, 1):
                parts = []
                for li in sc.line_ids:
                    ph = phasings.get(li)
                    choice = _phase_choices(lines.lines[li], ph, hap) if ph else {}
                    parts.append(line_sequence(D, lines.lines[li], choice))
                seq = join_parts(parts, sc)
                f.write(f">scaffold_{si}_hap{hap + 1} len={len(seq)}\n")
                _wrap(f, seq)
                index.append(
                    {"record": rid, "scaffold": si, "haplotype": hap + 1,
                     "partner": rid + 1 if hap == 0 else rid - 1}
                )
                rid += 1
    if idx_path is None:
        idx_path = str(path).replace(".fasta", ".idx").replace(".gz", "")
    Path(idx_path).write_text(json.dumps(index, indent=1) + "\n")
    return rid
