"""astats-analogue evaluation on known-truth assemblies."""
import numpy as np
import pytest

from supernova_tpu.asm.evaluate import evaluate_assembly
from supernova_tpu.core import dna
from supernova_tpu.sim import genome as sim


def test_perfect_contig(rng):
    g = sim.random_genome(rng, 5000)
    contigs = [g[100:2100].copy(), dna.revcomp(g[2500:4000]).copy()]
    res = evaluate_assembly(contigs, [g])
    assert res["n_contigs"] == 2
    assert res["anchored_frac"] == 1.0
    assert res["mean_identity"] == 1.0
    assert res["misassemblies"] == 0
    assert res["perfect_stretch_N50"] >= 1500


def test_snp_contig(rng):
    g = sim.random_genome(rng, 4000)
    c = g[500:2500].copy()
    c[1000] = (c[1000] + 1) % 4  # one error
    res = evaluate_assembly([c], [g])
    assert res["misassemblies"] == 0
    assert 0.999 < res["mean_identity"] < 1.0
    # one error splits the 2000bp contig into ~two 1000bp perfect stretches
    assert 800 <= res["perfect_stretch_N50"] <= 1100


def test_chimeric_contig_flagged(rng):
    g = sim.random_genome(rng, 6000)
    chimera = np.concatenate([g[500:1500], g[4000:5000]])
    res = evaluate_assembly([chimera], [g])
    assert res["misassemblies"] == 1


def test_unanchored(rng):
    g = sim.random_genome(rng, 3000)
    alien = rng.integers(0, 4, 1500).astype(np.uint8)
    res = evaluate_assembly([alien], [g])
    assert res["anchored_frac"] < 0.1


def test_repeat_copy_contig_not_flagged(rng):
    """A contig lying inside a two-copy repeat anchors at both copies
    through the strided reference index; with the primary diagonal
    matching end-to-end it must NOT be flagged (it is correct sequence).
    Regression: this false-positive inflated misassembly counts 22 -> 0
    on the 1Mb validation."""
    g = sim.random_genome(rng, 20_000)
    g[12_000:12_400] = g[3_000:3_400]  # exact 400bp repeat pair
    contig = g[3_000:3_400].copy()
    res = evaluate_assembly([contig], [g])
    assert res["misassemblies"] == 0
    # flank-spanning chimera across the two copies IS still flagged
    chimera = np.concatenate([g[2_500:3_200], g[12_200:12_900]])
    res2 = evaluate_assembly([chimera], [g])
    assert res2["misassemblies"] == 1
