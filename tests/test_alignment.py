"""Affine aligner vs brute-force DP; het estimate sanity."""
import numpy as np
import pytest

from supernova_tpu.ops import alignment as al


def test_affine_matches_bruteforce(rng):
    pairs = []
    for _ in range(12):
        la = int(rng.integers(5, 40))
        a = rng.integers(0, 4, la).astype(np.int32)
        # b = a with random edits
        b = a.copy().tolist()
        for _ in range(int(rng.integers(0, 4))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, max(1, len(b))))
            if op == 0 and b:
                b[pos] = (b[pos] + 1) % 4
            elif op == 1:
                b.insert(pos, int(rng.integers(0, 4)))
            elif op == 2 and len(b) > 1:
                del b[pos]
        pairs.append((a, np.asarray(b, np.int32)))
    got = al.align_pairs_np(pairs)
    for (a, b), g in zip(pairs, got):
        expect = al.brute_affine_np(a, b)
        assert int(g) == expect, (a.tolist(), b.tolist())


def test_affine_identical_and_single_snp(rng):
    a = rng.integers(0, 4, 100).astype(np.int32)
    b = a.copy()
    b[50] = (b[50] + 1) % 4
    got = al.align_pairs_np([(a, a), (a, b)])
    assert int(got[0]) == 0
    assert int(got[1]) == al.MIS


def test_hetdist_estimate(rng):
    # build a diploid assembly with known het rate and check the estimate
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.asm.het import estimate_hetdist
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.ingest.reads import build_readset
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.sim import genome as sim
    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 6000)
    snp_pos, hb = sim.diploidize(rng, g, het_rate=0.004)
    rs_a = perfect_readset(g)
    rs_b = perfect_readset(hb)
    reads = [rs_a.read(i) for i in range(rs_a.n_reads)] + [
        rs_b.read(i) for i in range(rs_b.n_reads)
    ]
    quals = [rs_a.qual(i) for i in range(rs_a.n_reads)] + [
        rs_b.qual(i) for i in range(rs_b.n_reads)
    ]
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    hd = estimate_hetdist(D, lines)
    if hd is not None and len(snp_pos) > 3:
        true_hd = len(g) / len(snp_pos)
        assert 0.2 * true_hd < hd < 5 * true_hd
