"""10x Chromium FASTQ ingestion: interleaved/paired FASTQs -> ReadSet.

Reference layout (mro/assembler_cs.mro:25-26, tenkit fastq conventions):
R1 carries the 16 bp GEM barcode at its 5' end followed by `trim_length=7`
junk bases; R2 is genomic.  The whitelist is the 4M-with-alts barcode list.
This module is the SETUP_CHUNKS/BUCKET_FASTQS/SORT_FASTQS/
ParseBarcodedFastqs chain for on-disk data (ingest.ingest_pairs does the
correction + barcode sort).
"""
from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from .barcodes import BC_LEN, Whitelist
from .fastq import read_fastq
from .ingest import ingest_pairs
from .reads import ReadSet

TRIM_LENGTH = 7  # mro/assembler_cs.mro:26


def load_whitelist(path: str | Path) -> Whitelist:
    """Text whitelist: one 16bp barcode per line (like 4M-with-alts)."""
    from ..core import dna

    codes = []
    for line in Path(path).read_text().splitlines():
        line = line.strip().split("-")[0]
        if len(line) == BC_LEN:
            codes.append(dna.seq_to_codes(line))
    return Whitelist.from_codes(np.stack(codes))


def _read_fastq_arrays(path: str | Path):
    """Whole-file decode via the native C++ parser (Python fallback inside):
    -> (codes u8, quals u8 phred, offsets i64)."""
    import gzip

    from ..native import decode_fastq_bytes

    p = str(path)
    data = gzip.open(p, "rb").read() if p.endswith(".gz") else open(p, "rb").read()
    return decode_fastq_bytes(data)


def ingest_10x_fastqs(
    r1_paths: Sequence[str | Path],
    r2_paths: Sequence[str | Path],
    wl: Whitelist,
    trim_length: int = TRIM_LENGTH,
    max_pairs: int | None = None,
) -> ReadSet:
    """Paired R1/R2 FASTQ(.gz) files -> barcode-corrected, sorted ReadSet."""
    r1s: List[np.ndarray] = []
    q1s: List[np.ndarray] = []
    r2s: List[np.ndarray] = []
    q2s: List[np.ndarray] = []
    bcs: List[np.ndarray] = []
    bcqs: List[np.ndarray] = []
    skip = BC_LEN + trim_length
    for p1, p2 in zip(r1_paths, r2_paths):
        c1f, q1f, o1 = _read_fastq_arrays(p1)
        c2f, q2f, o2 = _read_fastq_arrays(p2)
        n = min(len(o1), len(o2)) - 1
        for i in range(n):
            a, b = int(o1[i]), int(o1[i + 1])
            c, d = int(o2[i]), int(o2[i + 1])
            if b - a < skip + 1:
                continue
            bcs.append(c1f[a : a + BC_LEN])
            bcqs.append(q1f[a : a + BC_LEN])
            r1s.append(c1f[a + skip : b])
            q1s.append(q1f[a + skip : b])
            r2s.append(c2f[c:d])
            q2s.append(q2f[c:d])
            if max_pairs and len(r1s) >= max_pairs:
                break
        if max_pairs and len(r1s) >= max_pairs:
            break
    if not r1s:
        raise ValueError("no read pairs found in input FASTQs")
    return ingest_pairs(
        r1s, q1s, r2s, q2s, np.stack(bcs), np.stack(bcqs), wl
    )


def write_sim_fastqs(sim, outdir: str | Path, trim_length: int = TRIM_LENGTH):
    """Write a SimReads as 10x-style R1/R2 FASTQs (for CLI round-trips)."""
    from ..core import dna
    from .fastq import write_fastq

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    r1recs, r2recs = [], []
    for i in range(sim.n_pairs()):
        bc = sim.barcode[i]
        junk = np.zeros(trim_length, dtype=np.uint8)
        c1 = np.concatenate([bc, junk, sim.r1[i]])
        q1 = np.concatenate(
            [sim.bc_qual[i], np.full(trim_length, 37, np.uint8), sim.q1[i]]
        )
        r1recs.append((f"read{i}", c1, q1))
        r2recs.append((f"read{i}", sim.r2[i], sim.q2[i]))
    write_fastq(outdir / "sample_R1.fastq.gz", r1recs)
    write_fastq(outdir / "sample_R2.fastq.gz", r2recs)
    return outdir / "sample_R1.fastq.gz", outdir / "sample_R2.fastq.gz"
