"""Interior barcode-discontinuity breaking (asm/fixint.py): the in-edge
repeat-join class that junction-based killers cannot see (all 13 dis-class
breaks of the 30 Mb rung were sequence-continuous inside one D-edge)."""
import numpy as np

from supernova_tpu.asm import fixint as afix
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna as cdna
from supernova_tpu.core.ragged import Ragged
from supernova_tpu.dbg.graph import BaseGraph

K = 48


def _two_part_D(rng, half=60_000):
    """D with ONE canonical edge spelling two glued base edges (a false
    join at the base-edge boundary), plus the rc partner."""
    e0 = rng.integers(0, 4, half).astype(np.uint8)
    e1 = np.concatenate([e0[-(K - 1):], rng.integers(0, 4, half).astype(np.uint8)])
    edges = Ragged.from_rows(
        [e0, e1, cdna.revcomp(e1), cdna.revcomp(e0)], dtype=np.uint8
    )
    bg = BaseGraph(
        edges=edges,
        inv=np.array([3, 2, 1, 0], np.int32),
        from_v=np.array([0, 1, 3, 4], np.int32),
        to_v=np.array([1, 2, 4, 5], np.int32),
        n_vertices=6,
        is_circle=np.zeros(4, bool),
    )
    D = asg.SuperGraph(
        epaths=Ragged.from_rows(
            [np.array([0, 1], np.int64), np.array([2, 3], np.int64)],
            dtype=np.int64,
        ),
        dinv=np.array([1, 0], np.int64),
        from_v=np.array([0, 2], np.int32),
        to_v=np.array([1, 3], np.int32),
        n_vertices=4,
        bg=bg,
    )
    return D


def _positions(rng, L, boundary, disjoint):
    """Molecule-process positions over [0, L); when disjoint, barcodes on
    the two sides of `boundary` never mix (the false-join signature)."""
    lp: dict = {}
    m = 0
    for lo, hi, bc0 in (
        ((0, boundary, 0) if disjoint else (0, L, 0)),
        ((boundary, L, 10_000) if disjoint else (0, L, 20_000)),
    ):
        span = hi - lo
        for _ in range(span // 1_500):
            m += 1
            # molecules may START before the side's range and get clipped,
            # so coverage is flat up to the boundary on both sides (a real
            # false join sits mid-genome on both loci)
            s = lo - 20_000 + int(rng.integers(0, max(span + 20_000 - 2_000, 1)))
            ln = int(rng.exponential(30_000)) + 2_000
            n = max(int(ln * 0.006), 2)
            ps = s + rng.integers(0, max(ln, 1), n)
            ps = ps[(ps >= lo) & (ps < hi)]
            if len(ps) >= 2:
                lp.setdefault(bc0 + m, []).extend(int(x) for x in ps)
    return lp


def _line_positions_for(D, lp):
    lines = alines.find_lines(D)
    # put the positions on the line carrying canonical edge 0
    li0 = next(
        li for li, ln in enumerate(lines.lines)
        if 0 in [int(x) for x in ln.edges()]
    )
    return lines, {li0: lp}


def test_disjoint_halves_split_at_boundary(rng):
    D = _two_part_D(rng)
    lines = alines.find_lines(D)
    llens = lines.lengths(D)
    L = int(llens.max())
    boundary = 60_000 - (K - 1) // 2  # ~ the glued base-edge boundary
    lp = _positions(rng, L, boundary, disjoint=True)
    lines, line_positions = _line_positions_for(D, lp)
    splits, gap_dels, detaches, info = afix.find_interior_breaks(
        D, lines, line_positions, lines.lengths(D), window=4_000,
        stride=1_000,
    )
    assert len(splits) == 1 and not gap_dels and not detaches, info
    d, j = splits[0]
    assert j == 1  # the only interior boundary
    D2 = afix.split_edges(D, splits)
    D2.validate(deep=True)
    lines2 = alines.find_lines(D2)
    assert lines2.n_lines == 2 * lines.n_lines  # each side its own line
    # sequence is preserved: the two halves spell the original edge
    s_orig = D.edge_seq(0)
    parts = sorted((D2.edge_seq(e) for e in range(D2.n_edges)), key=len)
    joined = [p for p in parts if p in s_orig]
    assert any(s_orig.startswith(p) for p in joined)
    assert any(s_orig.endswith(p) for p in joined)


def test_continuous_molecules_no_split(rng):
    D = _two_part_D(rng)
    lines = alines.find_lines(D)
    llens = lines.lengths(D)
    L = int(llens.max())
    lp = _positions(rng, L, 0, disjoint=False)
    lines, line_positions = _line_positions_for(D, lp)
    splits, gap_dels, detaches, info = afix.find_interior_breaks(
        D, lines, line_positions, lines.lengths(D), window=4_000,
        stride=1_000,
    )
    assert splits == [] and gap_dels == [] and detaches == [], info


def test_detach_edges_involution_consistent(rng):
    D = _two_part_D(rng)
    D2 = afix.detach_edges(D, [(0, True)])
    D2.validate(deep=True)
    # edge 0's head and its rc partner's tail moved to fresh vertices
    assert int(D2.to_v[0]) != int(D.to_v[0])
    assert int(D2.from_v[1]) != int(D.from_v[1])
    assert int(D2.to_v[0]) != int(D2.from_v[1])  # genuinely disconnected
    lines2 = alines.find_lines(D2)
    assert lines2.n_lines >= alines.find_lines(D).n_lines


def test_weak_pair_gap_judged_and_deleted(rng):
    """Pass 1: a {-1} pair-gap junction with NO spanning barcodes must be
    returned in gap_dels (the weak-{-2} breaker generalized to all gap
    codes); a well-bridged one must survive."""
    from supernova_tpu.asm import gap as agap
    from supernova_tpu.asm import supergraph as asg

    half = 60_000
    e0 = rng.integers(0, 4, half).astype(np.uint8)
    e1 = rng.integers(0, 4, half).astype(np.uint8)
    edges = Ragged.from_rows(
        [e0, e1, cdna.revcomp(e1), cdna.revcomp(e0)], dtype=np.uint8
    )
    bg = BaseGraph(
        edges=edges,
        inv=np.array([3, 2, 1, 0], np.int32),
        from_v=np.array([0, 1, 3, 4], np.int32),
        to_v=np.array([1, 2, 4, 5], np.int32),
        n_vertices=6,
        is_circle=np.zeros(4, bool),
    )
    D = asg.SuperGraph(
        epaths=Ragged.from_rows(
            [
                np.array([0], np.int64), agap.pair_gap(),
                np.array([1], np.int64),
                np.array([2], np.int64), agap.pair_gap(),
                np.array([3], np.int64),
            ],
            dtype=np.int64,
        ),
        dinv=np.array([5, 4, 3, 2, 1, 0], np.int64),
        from_v=np.array([0, 1, 2, 4, 5, 6], np.int32),
        to_v=np.array([1, 2, 3, 5, 6, 7], np.int32),
        n_vertices=8,
        bg=bg,
    )
    lines = alines.find_lines(D)
    L = int(lines.lengths(D).max())
    boundary = half  # the gap sits between the two sequence edges
    for disjoint, expect_del in ((True, True), (False, False)):
        lp = _positions(rng, L, boundary if disjoint else 0, disjoint)
        lines2, line_positions = _line_positions_for(D, lp)
        splits, gap_dels, detaches, info = afix.find_interior_breaks(
            D, lines2, line_positions, lines2.lengths(D), window=4_000,
            stride=1_000,
        )
        if expect_del:
            assert gap_dels, info
        else:
            assert not gap_dels, info


def test_combined_gap_del_and_split_one_graph(rng):
    """Pass-1 gap deletions and pass-2 splits firing on the SAME graph must
    compose: the pipeline applies splits/detaches FIRST (edge-ID preserving)
    and deletions LAST (del_edges renumbers) — ADVICE r4 #1."""
    from supernova_tpu.asm import gap as agap
    from supernova_tpu.asm.inversion import delete_edges

    half = 60_000
    e0 = rng.integers(0, 4, half).astype(np.uint8)
    e1 = np.concatenate(
        [e0[-(K - 1):], rng.integers(0, 4, half).astype(np.uint8)]
    )
    e2 = rng.integers(0, 4, half).astype(np.uint8)
    edges = Ragged.from_rows(
        [e0, e1, e2, cdna.revcomp(e2), cdna.revcomp(e1), cdna.revcomp(e0)],
        dtype=np.uint8,
    )
    bg = BaseGraph(
        edges=edges,
        inv=np.array([5, 4, 3, 2, 1, 0], np.int32),
        from_v=np.array([0, 1, 3, 5, 7, 8], np.int32),
        to_v=np.array([1, 2, 4, 6, 8, 9], np.int32),
        n_vertices=10,
        is_circle=np.zeros(6, bool),
    )
    D = asg.SuperGraph(
        epaths=Ragged.from_rows(
            [
                np.array([0, 1], np.int64),  # glued two-part edge (split me)
                agap.pair_gap(),             # weak {-1} (delete me)
                np.array([2], np.int64),
                np.array([3], np.int64),
                agap.pair_gap(),
                np.array([4, 5], np.int64),
            ],
            dtype=np.int64,
        ),
        dinv=np.array([5, 4, 3, 2, 1, 0], np.int64),
        from_v=np.array([0, 1, 2, 4, 5, 6], np.int32),
        to_v=np.array([1, 2, 3, 5, 6, 7], np.int32),
        n_vertices=8,
        bg=bg,
    )
    lines = alines.find_lines(D)
    llens = lines.lengths(D)
    L = int(llens.max())
    # three barcode-disjoint segments: the glue boundary inside D-edge 0
    # and the gap junction both look unspanned
    glue_b = half - (K - 1) // 2
    seq_end = 2 * half - (K - 1)  # end of D-edge 0 in line coords
    lp: dict = {}
    m = 0
    segs = [(0, glue_b, 0), (glue_b, seq_end, 10_000), (seq_end, L, 20_000)]
    for lo, hi, bc0 in segs:
        span = hi - lo
        for _ in range(span // 1_200):
            m += 1
            s = lo - 20_000 + int(rng.integers(0, max(span + 20_000 - 2_000, 1)))
            ln = int(rng.exponential(30_000)) + 2_000
            n = max(int(ln * 0.008), 2)
            ps = s + rng.integers(0, max(ln, 1), n)
            ps = ps[(ps >= lo) & (ps < hi)]
            if len(ps) >= 2:
                lp.setdefault(bc0 + m, []).extend(int(x) for x in ps)
    li0 = next(
        li for li, ln in enumerate(lines.lines)
        if 0 in [int(x) for x in ln.edges()]
    )
    splits, gap_dels, detaches, info = afix.find_interior_breaks(
        D, lines, {li0: lp}, llens, window=4_000, stride=1_000
    )
    assert splits and gap_dels, info
    # pipeline order: splits -> detaches -> deletions (run.py ph_mis)
    D2 = afix.split_edges(D, splits)
    D2.validate(deep=True)
    if detaches:
        D2 = afix.detach_edges(D2, detaches)
        D2.validate(deep=True)
    dels_g = sorted({g for d in gap_dels for g in (d, int(D2.dinv[d]))})
    # the gap-del ids must still point at gap edges after the splits
    gm2 = D2.gap_mask()
    assert all(bool(gm2[g]) for g in dels_g)
    D3 = delete_edges(D2, dels_g)
    D3.validate(deep=True)
    # both surgeries took: gap pair gone (-2), split appended d2+rd2 (+2)
    assert D3.n_edges == 6
    assert not D3.gap_mask().any()
    # all original sequence still spelled by some edge
    s_orig = D.edge_seq(0)
    seqs3 = [D3.edge_seq(e) for e in range(D3.n_edges)]
    assert any(s_orig.startswith(p) for p in seqs3 if p)
    assert any(s_orig.endswith(p) for p in seqs3 if p)
