"""E2E: Star joins insert {-2} gap edges into D and scaffolds become lines
of the gap-joined supergraph (the reference's CP star/starstar construction,
10X/Star.cc + Gap.h)."""
import gzip

import numpy as np

from supernova_tpu.core import dna
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.pipeline.run import Pipeline
from supernova_tpu.sim import genome as sim


def _mask_window(reads, w0, w1, insert=360):
    """Drop read pairs whose fragment touches [w0, w1) — a sequencing void
    that only barcode evidence can bridge."""
    keep = [
        i
        for i, p in enumerate(reads.truth_pos)
        if p + insert <= w0 or p >= w1
    ]
    out = sim.SimReads()
    for i in keep:
        out.r1.append(reads.r1[i])
        out.q1.append(reads.q1[i])
        out.r2.append(reads.r2[i])
        out.q2.append(reads.q2[i])
        out.barcode.append(reads.barcode[i])
        out.bc_qual.append(reads.bc_qual[i])
        out.truth_pos.append(reads.truth_pos[i])
        out.truth_hap.append(reads.truth_hap[i])
    return out


def test_star_gap_scaffolding(tmp_path, rng):
    # molecules (8 kb) much shorter than the genome (30 kb): barcode
    # positions are local, so ScoreOrder has orientation/order signal
    g = sim.random_genome(rng, 30_000)
    wl = sim.make_whitelist(rng, 256)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl,
        n_barcodes=80, molecules_per_barcode=2, molecule_len=8_000,
        coverage_per_molecule=1.0, error_rate=0.0,
    )
    w0, w1 = 14_500, 15_000
    reads = _mask_window(reads, w0, w1)
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "stargap", auto_downsample=False)
    D, lines, scaffolds, phasings, outputs = pl.run_full(
        rs, flavors=("pseudohap",)
    )

    # Star inserted {-2} gap edges into D
    gmask = D.gap_mask()
    assert gmask.any(), "no gap edges inserted by star passes"
    # gap edges ride lines (scaffolds = lines of the gap-joined D)
    loe = lines.line_of_edge
    assert all(loe[int(d)] >= 0 for d in np.nonzero(gmask)[0])

    # the merged scaffold spans (roughly) both sides of the void
    lens = lines.lengths(D)
    assert int(lens.max()) > 12_000, f"merged line too short: {lens.max()}"

    # pseudohap record: contigs flanking the N run match the genome
    with gzip.open(outputs["pseudohap"], "rt") as f:
        seqs, cur = [], []
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip())
        if cur:
            seqs.append("".join(cur))
    big = max(seqs, key=len)
    assert "N" in big, "expected an N gap in the scaffold record"
    strands = [dna.codes_to_seq(g), dna.codes_to_seq(dna.revcomp(g))]
    contigs = [c for c in big.split("N") if len(c) > 400]
    assert len(contigs) >= 2
    for c in contigs:
        ok = all(
            any(c[i : i + 300] in st for st in strands)
            for i in range(0, max(1, len(c) - 300), 150)
        )
        assert ok, "scaffold contig does not match the genome"
