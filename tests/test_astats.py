"""astats parity: placement views, dis/ori/ord misassembly decomposition,
gap measurement (10X/astats/Misassembly.cc:11-160, MeasureGaps.cc)."""
import numpy as np

from supernova_tpu.asm import astats
from supernova_tpu.core import dna
from supernova_tpu.sim import genome as sim

RNG = np.random.default_rng(11)
G = sim.random_genome(RNG, 12_000)
N = np.full(1, 4, np.uint8)


def _eval(scaffolds, haps=(G,), **kw):
    kw.setdefault("too_far", 2000)
    return astats.evaluate_scaffolds(
        [np.asarray(s, np.uint8) for s in scaffolds], list(haps), **kw)


def test_perfect_scaffold_zero_errors():
    out = _eval([G[1000:5000]])
    assert out["dis_err_perc"] == 0.0
    assert out["ori_err_perc"] == 0.0
    assert out["ord_err_perc"] == 0.0
    assert out["misassembly_rate_perc"] == 0.0


def test_rc_scaffold_zero_errors():
    # a wholly reverse-complemented scaffold is a valid orientation
    out = _eval([dna.revcomp(G[1000:5000])])
    assert out["misassembly_rate_perc"] == 0.0


def test_diploid_fold_zero_errors():
    _, hb = sim.diploidize(np.random.default_rng(5), G, 0.005)
    # a contig from haplotype B, evaluated against the folded pair
    out = _eval([hb[2000:6000]], haps=(G, hb))
    assert out["dis_err_perc"] == 0.0
    assert out["misassembly_rate_perc"] == 0.0


def test_inversion_flagged_as_ori_error():
    left = G[1000:4000]
    invseg = dna.revcomp(G[4000:5500])
    right = G[5500:8000]
    out = _eval([np.concatenate([left, invseg, right])])
    assert out["ori_err_perc"] > 10.0
    assert out["dis_err_perc"] == 0.0


def test_translocation_flagged_as_dis_error():
    # join two regions separated by more than too_far
    sc = np.concatenate([G[0:2500], G[9000:11500]])
    out = _eval([sc], too_far=2000)
    assert out["dis_err_perc"] > 30.0


def test_order_swap_flagged_as_ord_error():
    # shuffle two interior blocks: home/ori fine, order wrong
    sc = np.concatenate([G[0:3000], G[6000:9000], G[3000:6000],
                         G[9000:12000]])
    out = _eval([sc], too_far=20000)
    assert out["dis_err_perc"] == 0.0
    assert out["ori_err_perc"] == 0.0
    assert out["ord_err_perc"] > 15.0


def test_gap_measurement():
    # 700 bp true gap recorded as 500 Ns: deviation -200
    sc = np.concatenate([G[1000:3000], np.full(500, 4, np.uint8),
                         G[3700:5700]])
    out = _eval([sc])
    assert out["n_gaps_measured"] == 1
    assert abs(out["gap_dev_mean"] + 200) < 1e-9
    assert out["gap_frac_within_1kb"] == 1.0


def test_gap_skips_strand_mismatch():
    sc = np.concatenate([G[1000:3000], np.full(500, 4, np.uint8),
                         dna.revcomp(G[3700:5700])])
    out = _eval([sc])
    assert out["n_gaps_measured"] == 0


def test_unanchored_middle_contig_collapses():
    rng = np.random.default_rng(99)
    junk = rng.integers(0, 4, size=200).astype(np.uint8)
    sc = np.concatenate([G[1000:3000], N.repeat(100), junk,
                         N.repeat(100), G[3400:5400]])
    out = _eval([sc])
    assert out["n_gaps_measured"] == 1
    # anchor-to-anchor: recorded = 400 (100+200+100), true = 400
    assert abs(out["gap_dev_mean"]) < 1e-9
