"""First-class gap edges in D (10X/Gap.h analogue): encodings, involution,
walker splice semantics, and lines over a gap-joined supergraph."""
import numpy as np
import pytest

from supernova_tpu.asm import gap as agap
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.out import pseudohap as oph

from tests.test_dbg import perfect_readset


def codes(s: str) -> np.ndarray:
    return dna.seq_to_codes(s)


def test_seq_gap_roundtrip(rng):
    for n in (1, 15, 16, 17, 48, 100):
        c = rng.integers(0, 4, n).astype(np.uint8)
        row = agap.seq_to_gap(c, ltrim=3, rtrim=7)
        lt, rt, c2 = agap.gap_to_seq(row)
        assert (lt, rt) == (3, 7)
        assert np.array_equal(c2, c)
        assert agap.is_seq_gap(row) and agap.is_gap(row)
        assert agap.gap_repr_len(row) == n


def test_gap_predicates_and_repr():
    assert agap.is_pair_gap(agap.pair_gap())
    assert agap.gap_repr_len(agap.pair_gap()) == agap.PAIR_GAP_REPR
    assert agap.is_bc_gap(agap.bc_gap())
    assert agap.gap_repr_len(agap.bc_gap()) == agap.BC_GAP_REPR
    assert agap.gap_repr_len(agap.bc_gap(420)) == 420


def test_rc_gap_involution(rng):
    c = rng.integers(0, 4, 33).astype(np.uint8)
    row = agap.seq_to_gap(c, ltrim=2, rtrim=5)
    r = agap.rc_gap(row)
    lt, rt, rc_codes = agap.gap_to_seq(r)
    assert (lt, rt) == (5, 2)  # trims swap (ValidateGapEdges rule)
    assert np.array_equal(rc_codes, dna.revcomp(c))
    assert np.array_equal(agap.rc_gap(r), row)  # involution
    assert np.array_equal(agap.rc_gap(agap.bc_gap(50)), agap.bc_gap(50))
    assert np.array_equal(agap.rc_gap(agap.pair_gap()), agap.pair_gap())


def test_cell_roundtrip_and_findpath():
    # cell: two vertices, two parallel edges + a continuation
    edges = [
        (0, 1, np.array([7, 8], np.int64)),
        (0, 1, np.array([9], np.int64)),
        (1, 2, np.array([11], np.int64)),
    ]
    row = agap.cell_encode(0, 2, 3, edges)
    assert agap.is_cell_gap(row)
    left, right, nv, dec = agap.cell_decode(row)
    assert (left, right, nv) == (0, 2, 3)
    assert len(dec) == 3 and np.array_equal(dec[0][2], [7, 8])
    walked = agap.cell_find_path(row)
    assert walked is not None
    # a walk 0->2 exists and ends with the continuation edge
    assert np.array_equal(walked[-1], [11])


def test_walker_seq_gap_splice():
    w = agap.GapAwareWalker(5)
    w.add_seq("AAAAACCCCC")
    w.add_gap(agap.seq_to_gap(codes("ACCCGGGGG"), ltrim=2, rtrim=3))
    w.add_seq("TTTGGGGGTTTTT")
    # chop 2 -> AAAAACCC; gap overlaps 4 (ACCC) -> +GGGGG;
    # next trims 3 (TTT) then overlaps 4 (GGGG) -> +GTTTTT
    assert w.sequence() == "AAAAACCC" + "GGGGG" + "GTTTTT"


def test_walker_n_gap_breaks_overlap():
    w = agap.GapAwareWalker(5)
    w.add_seq("AAAAACCCCC")
    w.add_gap(agap.bc_gap(7))
    w.add_seq("GGGGGTTTTT")
    assert w.sequence() == "AAAAACCCCC" + "N" * 7 + "GGGGGTTTTT"


def _two_component_D(rng):
    g1 = dna.seq_to_codes("".join(rng.choice(list("ACGT"), 400)))
    g2 = dna.seq_to_codes("".join(rng.choice(list("ACGT"), 300)))
    from supernova_tpu.ingest.reads import build_readset

    rs1, rs2 = perfect_readset(g1), perfect_readset(g2)
    reads = [rs1.read(i) for i in range(rs1.n_reads)] + [
        rs2.read(i) for i in range(rs2.n_reads)
    ]
    quals = [rs1.qual(i) for i in range(rs1.n_reads)] + [
        rs2.qual(i) for i in range(rs2.n_reads)
    ]
    rs = build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    return g1, g2, D


def test_gap_joined_lines_and_sequence(rng):
    g1, g2, D = _two_component_D(rng)
    assert D.n_edges == 4  # two components, fwd+rc each
    lines0 = alines.find_lines(D)
    assert lines0.n_lines == 4

    # pick the fwd representative of each component
    def line_of_seq(seq):
        s = dna.codes_to_seq(seq)
        for li, ln in enumerate(lines0.lines):
            d = int(ln.elements[0].paths[0][0])
            if D.edge_seq(d) == s:
                return li, d
        raise AssertionError("line not found")

    la, da = line_of_seq(g1)
    lb, db = line_of_seq(g2)
    v, w = int(D.to_v[da]), int(D.from_v[db])
    vr, wr = int(D.to_v[D.dinv[db]]), int(D.from_v[D.dinv[da]])
    D2 = asg.append_gap_edges(D, [(v, w, agap.bc_gap(55), vr, wr)])
    D2.validate()
    assert D2.n_edges == 6
    assert D2.is_gap(4) and D2.is_gap(5)
    assert not D2.is_gap(0)
    assert D2.gap_mask().tolist() == [False] * 4 + [True, True]
    assert D2.edge_len(4) == 55
    assert D2.edge_seq(4) == "N" * 55

    # lines over the gap-joined D merge the two components
    lines2 = alines.find_lines(D2)
    assert lines2.n_lines == 2
    li = [i for i in range(2) if lines2.linv[i] != i or True][0]
    merged = None
    for i, ln in enumerate(lines2.lines):
        seq = oph.line_sequence(D2, ln, {})
        if seq == dna.codes_to_seq(g1) + "N" * 55 + dna.codes_to_seq(g2):
            merged = i
    assert merged is not None, "gap-joined line does not spell g1 + Ns + g2"
    # gap-aware length accounting: no K-1 subtraction around the N gap
    lens = lines2.lengths(D2)
    assert int(lens[merged]) == len(g1) + 55 + len(g2)


def test_seq_gap_edge_in_line(rng):
    g1, g2, D = _two_component_D(rng)
    lines0 = alines.find_lines(D)

    def edge_of_seq(seq):
        s = dna.codes_to_seq(seq)
        for d in range(D.n_edges):
            if D.edge_seq(d) == s:
                return d
        raise AssertionError

    da, db = edge_of_seq(g1), edge_of_seq(g2)
    # sequence gap: overlaps K-1 with both neighbors, no trims:
    # last K-1 of g1 + 20 random bases + first K-1 of g2
    mid = rng.integers(0, 4, 20).astype(np.uint8)
    fill = np.concatenate([g1[-(K - 1) :], mid, g2[: K - 1]])
    row = agap.seq_to_gap(fill, 0, 0)
    v, w = int(D.to_v[da]), int(D.from_v[db])
    vr, wr = int(D.to_v[D.dinv[db]]), int(D.from_v[D.dinv[da]])
    D2 = asg.append_gap_edges(D, [(v, w, row, vr, wr)])
    D2.validate()
    lines2 = alines.find_lines(D2)
    assert lines2.n_lines == 2
    want = dna.codes_to_seq(np.concatenate([g1, mid, g2]))
    got = {oph.line_sequence(D2, ln, {}) for ln in lines2.lines}
    assert want in got or dna.codes_to_seq(
        dna.revcomp(np.concatenate([g1, mid, g2]))
    ) in got
