"""efasta brace-ambiguity output (out/efasta.py vs lib/assembly/src/efasta
behavior): each haplotype expansion of the efasta must equal the
corresponding pseudohap mash walk, and the format must round-trip."""
import numpy as np

from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.out import efasta as oef
from supernova_tpu.out.pseudohap import scaffold_records
from supernova_tpu.pipeline.run import Pipeline
from supernova_tpu.sim import genome as sim


def _toy_ctx(tmp_path, rng):
    g = sim.random_genome(rng, 9000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, het_rate=0.003)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=60, molecules_per_barcode=2,
        molecule_len=4500, coverage_per_molecule=2.0, error_rate=0.001,
        bc_error_rate=0.01,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "asm")
    D, lines, scaffolds, phasings, outputs = pl.run_full(
        rs, flavors=("pseudohap", "efasta")
    )
    return pl, D, lines, scaffolds, phasings, outputs


def test_efasta_haplotype_expansion_matches_pseudohap(tmp_path, rng):
    pl, D, lines, scaffolds, phasings, outputs = _toy_ctx(tmp_path, rng)
    checked = 0
    for sc in scaffolds:
        for hap in (0, 1):
            recs = scaffold_records(D, lines, sc, phasings, hap)
            if len(recs) != 1 or recs[0][0] != "main":
                continue  # busted many-arm cells print per-arm records
            if getattr(sc, "fills", None):
                continue  # stackaroo splices are a pseudohap-only rule
            parts = []
            for i, li in enumerate(sc.line_ids):
                if i:
                    parts.append("N" * max(int(sc.gaps[i - 1]), 1))
                segs = oef.line_segments(D, lines.lines[li], phasings.get(li))
                parts.append(oef.flatten(segs, hap))
            assert "".join(parts) == recs[0][1]
            checked += 1
    assert checked > 0


def test_efasta_roundtrip_and_braces(tmp_path, rng):
    pl, D, lines, scaffolds, phasings, outputs = _toy_ctx(tmp_path, rng)
    path = outputs["efasta"]
    recs = oef.read_efasta(path)
    assert recs
    n_blocks = sum(
        1 for _, segs in recs for s in segs if isinstance(s, list)
    )
    assert n_blocks > 0, "het sim produced no brace blocks"
    for _name, segs in recs:
        for s in segs:
            if isinstance(s, str):
                assert set(s) <= set("ACGTN")
            else:
                assert len(s) >= 2
                for alt in s:
                    assert set(alt) <= set("ACGTN")


def test_flatten_clamps_allele():
    segs = ["AC", ["G", "T"], "AA"]
    assert oef.flatten(segs, 0) == "ACGAA"
    assert oef.flatten(segs, 1) == "ACTAA"
    assert oef.flatten(segs, 5) == "ACTAA"
