"""Supergraph/lines/scaffold/phasing invariants + full-pipeline run."""
import numpy as np
import pytest

from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.out import fasta as fout
from supernova_tpu.pipeline.run import Pipeline
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def test_supergraph_compaction_clean_genome(rng):
    g = sim.random_genome(rng, 2500)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    # clean genome: base graph is already 2 edges; D must equal it
    assert D.n_edges == 2
    assert D.edge_seq(0) in (dna.codes_to_seq(g), dna.codes_to_seq(dna.revcomp(g)))
    lines = alines.find_lines(D)
    assert lines.n_lines == 2
    assert lines.linv.tolist() == [1, 0]


def test_supergraph_compacts_het_bubbles(rng):
    # diploid reads: het SNPs create bubbles; D-edges compact around them
    g = sim.random_genome(rng, 4000)
    snp_pos, hb = sim.diploidize(rng, g, het_rate=0.002)
    rs_a = perfect_readset(g)
    rs_b = perfect_readset(hb)
    # merge the two read sets
    reads = [rs_a.read(i) for i in range(rs_a.n_reads)] + [
        rs_b.read(i) for i in range(rs_b.n_reads)
    ]
    quals = [rs_a.qual(i) for i in range(rs_a.n_reads)] + [
        rs_b.qual(i) for i in range(rs_b.n_reads)
    ]
    from supernova_tpu.ingest.reads import build_readset

    rs = build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    lines = alines.find_lines(D)
    # expect at least one line containing bubbles (het sites)
    total_bubbles = sum(ln.n_bubbles() for ln in lines.lines)
    if len(snp_pos) >= 2:
        assert total_bubbles >= 1
    # D compaction reduced edge count vs base graph
    assert D.n_edges <= bg.n_edges


def test_full_pipeline_with_phasing(tmp_path, rng):
    g = sim.random_genome(rng, 6000)
    _, hb = sim.diploidize(rng, g, het_rate=0.003)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl,
        n_barcodes=60, molecules_per_barcode=2, molecule_len=3000,
        coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "full")
    D, lines, scaffolds, phasings, outputs = pl.run_full(rs)

    assert scaffolds, "no scaffolds"
    for flavor in ("raw", "megabubbles", "pseudohap", "pseudohap2"):
        assert outputs[flavor].exists(), flavor
        recs = fout.read_fasta(outputs[flavor])
        assert recs, flavor

    # pseudohap2: exactly 2 records per scaffold + idx file
    ph2 = fout.read_fasta(outputs["pseudohap2"])
    assert len(ph2) == 2 * len(scaffolds)
    import json, pathlib

    idx = json.loads(
        (tmp_path / "full" / "assembly.pseudohap2.idx").read_text()
    )
    assert len(idx) == len(ph2)

    # pseudohap records are genuine haplotype substrings where ungapped
    gs, gr = dna.codes_to_seq(g), dna.codes_to_seq(dna.revcomp(g))
    hs, hr = dna.codes_to_seq(hb), dna.codes_to_seq(dna.revcomp(hb))
    ph1 = fout.read_fasta(outputs["pseudohap"])
    from supernova_tpu.asm.report import contig_lengths_from_seq

    total = 0
    for name, s in ph1:
        for part in s.split("N"):
            if len(part) > 500:
                total += len(part)
    assert total > 0.5 * len(g)

    # report metrics present
    for key in (
        "contig_N50", "scaffold_N50", "assembly_size", "phased_perc",
        "dup_perc", "n_scaffolds",
    ):
        assert pl.stats.get(key) is not None, key
    assert pl.stats.get("contig_N50") > 1000
