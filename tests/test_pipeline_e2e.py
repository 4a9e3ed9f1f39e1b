"""End-to-end: sim genome -> ingest -> count -> graph -> paths -> FASTA,
checking assembly content against the genome (metric-based golden testing,
SURVEY.md §4)."""
import numpy as np
import pytest

from supernova_tpu.core import dna
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.out import fasta as fout
from supernova_tpu.pipeline.run import Pipeline
from supernova_tpu.sim import genome as sim


def test_e2e_raw_assembly(tmp_path, rng):
    g = sim.random_genome(rng, 5000, n_repeat_chunks=1, repeat_len=200)
    _, hb = sim.diploidize(rng, g, het_rate=0.0005)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng,
        (g, hb),
        wl,
        n_barcodes=40,
        molecules_per_barcode=3,
        molecule_len=2500,
        coverage_per_molecule=2.0,
        error_rate=0.002,
        bc_error_rate=0.01,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "asm")
    bg, fasta_path = pl.run(rs)

    # checkpoints written
    for f in ("reads.npz", "kmers.npz", "graph.npz", "paths.npz", "summary.json"):
        assert (tmp_path / "asm" / f).exists()

    recs = fout.read_fasta(fasta_path)
    assert recs, "no contigs"
    total = sum(len(s) for _, s in recs)
    # raw contigs should cover most of the (covered) genome
    assert total > 0.5 * len(g)

    # assembled contigs must be genuine genome substrings (no chimeras):
    gs = dna.codes_to_seq(g)
    gr = dna.codes_to_seq(dna.revcomp(g))
    hs = dna.codes_to_seq(hb)
    hr = dna.codes_to_seq(dna.revcomp(hb))
    matched = 0
    for name, s in recs:
        if len(s) > 300:
            if s in gs or s in gr or s in hs or s in hr:
                matched += 1
    long_contigs = sum(1 for _, s in recs if len(s) > 300)
    assert long_contigs > 0
    # bubbles branch at het sites, so long contigs sit on one haplotype
    assert matched >= 0.7 * long_contigs

    # stats present
    stats = pl.stats
    assert stats.get("nreads") == rs.n_reads
    assert stats.get("edge_N50") > 0
    assert stats.get("placed_perc") > 50


def test_e2e_exit_alert(tmp_path, rng):
    # short reads must trigger the read-length exit alert
    g = sim.random_genome(rng, 800)
    wl = sim.make_whitelist(rng, 16)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl, n_barcodes=4, molecules_per_barcode=1,
        molecule_len=600, read_len=100, coverage_per_molecule=1.0,
        insert_size=220,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "asm2")
    with pytest.raises(RuntimeError, match="exit alerts"):
        pl.run(rs)
