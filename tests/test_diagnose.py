"""Misassembly diagnosis (asm/diagnose.py)."""
import gzip

import numpy as np

from supernova_tpu.asm import diagnose
from supernova_tpu.asm.evaluate import _ref_index
from supernova_tpu.core import dna
from supernova_tpu.sim import genome as sim


def test_breakpoint_found_on_chimeric_contig(rng):
    g = sim.random_genome(rng, 60_000)
    refs = [g, dna.revcomp(g).astype(np.uint8)]
    idx = _ref_index(refs)
    chimera = np.concatenate([g[10_000:11_000], g[50_000:51_000]])
    breaks = diagnose.find_breakpoints(chimera, idx)
    assert len(breaks) == 1
    b = breaks[0]
    assert abs(b.pos - 1000) < 120  # near the junction
    assert b.separation > 35_000  # the ~40 kb locus jump
    # a clean contig has no breakpoints
    assert diagnose.find_breakpoints(g[20_000:22_000], idx) == []


def test_provenance_patch_closure(rng, tmp_path):
    g = sim.random_genome(rng, 60_000)
    chimera = np.concatenate([g[10_000:11_000], g[50_000:51_000]])
    junction = dna.codes_to_seq(chimera[800:1200])
    # fake outdir: only closures.npz, containing the junction
    np.savez_compressed(
        tmp_path / "closures.npz",
        values=chimera,
        offsets=np.array([0, len(chimera)], np.int64),
    )
    assert diagnose.classify_provenance(junction, tmp_path) == "patch-closure"
    other = dna.codes_to_seq(g[30_000:30_400])
    assert (
        diagnose.classify_provenance(other, tmp_path) == "supergraph-level"
    )


def test_diagnose_assembly_end_to_end(rng, tmp_path):
    g = sim.random_genome(rng, 60_000)
    _, hb = sim.diploidize(rng, g)
    chimera = np.concatenate([g[10_000:11_000], g[50_000:51_000]])
    fa = tmp_path / "asm.fasta.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">c0 good\n" + dna.codes_to_seq(g[20_000:23_000]) + "\n")
        f.write(">c1 bad\n" + dna.codes_to_seq(chimera) + "\n")
    np.save(tmp_path / "ha.npy", g)
    np.save(tmp_path / "hb.npy", hb)
    diags = diagnose.diagnose_assembly(
        fa, [tmp_path / "ha.npy", tmp_path / "hb.npy"], None
    )
    assert len(diags) == 1 and diags[0].name.startswith("c1")
    assert diagnose.summarize(diags) == {"unknown": 1}
