"""PlaceReads-on-D and misassembly junction detection."""
import numpy as np
import pytest

from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import place as aplace
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.align import pather
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset


def test_place_reads_on_supergraph(rng):
    g = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=200)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    dpaths, dlen = aplace.place_reads(D, edges, plen)
    assert (dlen > 0).mean() > 0.9
    # D-paths must reference valid consecutive D-edges
    b2s = aplace.base_to_super_map(D)
    for i in range(0, rs.n_reads, 37):
        for k in range(dlen[i]):
            assert 0 <= dpaths[i, k] < D.n_edges
    counts = aplace.dpath_counts(D, dpaths, dlen)
    assert counts.sum() == dlen.sum()


def test_weak_junction_detection(rng):
    # two unrelated genome segments soldered: the joint has no spanning bcs
    from supernova_tpu.asm.misassembly import find_weak_junctions
    from supernova_tpu.asm.lines import Line

    class FakeD:
        pass

    line = Line([np.array([0]), np.array([1]), np.array([2])])
    sup_bcs = [
        np.array([1, 2, 3, 4]),
        np.array([3, 4, 5, 6]),
        np.array([20, 21, 22]),  # no overlap with previous element
    ]
    weak = find_weak_junctions(FakeD(), line, sup_bcs, min_span=2)
    assert weak == [2]


def test_break_lines(rng):
    from supernova_tpu.asm.misassembly import break_lines
    from supernova_tpu.asm.lines import Line, Lines

    class FakeD:
        dinv = np.array([1, 0, 3, 2, 5, 4])

    lines = Lines(
        [Line([np.array([0]), np.array([2]), np.array([4])]),
         Line([np.array([5]), np.array([3]), np.array([1])])],
        np.array([0, 1, 0, 1, 0, 1]),
        np.array([1, 0]),
    )
    sup_bcs = [np.array([1, 2]), np.array([1, 2]), np.array([1, 2]),
               np.array([1, 2]), np.array([9, 10]), np.array([9, 10])]
    # junction between element 1 (edge 2: bcs 1,2) and element 2 (edge 4:
    # bcs 9,10) has no spanning barcodes -> line 0 breaks; mirrored line 1
    # breaks at the mirrored junction
    new = break_lines(lines, FakeD(), sup_bcs, min_span=1)
    assert new.n_lines == 4
    assert np.array_equal(new.linv[new.linv], np.arange(4))


def test_break_lines_one_strand_detection_splits_both(rng):
    """A positional detection that fires on ONE strand must split BOTH
    strands at the mirrored junction (regression: one-strand splits fed
    splay_line_ends, which then splayed one strand's vertices only and
    permanently broke D's vertex involution)."""
    from types import SimpleNamespace

    from supernova_tpu.asm.lines import Cell, Line, Lines
    from supernova_tpu.asm.misassembly import break_lines

    lens = {0: 30_000, 1: 30_000, 2: 30_000, 3: 30_000}
    D = SimpleNamespace(
        dinv=np.array([2, 3, 0, 1]),
        edge_len=lambda d: lens[d],
        is_gap=lambda d: False,
    )
    fwd = Line([Cell([np.array([0], np.int64)]), Cell([np.array([1], np.int64)])])
    rev = Line([Cell([np.array([3], np.int64)]), Cell([np.array([2], np.int64)])])
    lines = Lines([fwd, rev], np.array([0, 1, 1, 0]), np.array([1, 0]))
    # same barcodes on every edge so the set rule never fires
    sup_bcs = [np.array([1, 2, 3])] * 4
    # positional evidence ONLY for line 0: left/right windows disjoint
    lp = {}
    for bc in range(1, 6):
        lp[(bc, 0)] = [30_000 - 10_000, 30_000 - 5_000]
    for bc in range(6, 11):
        lp[(bc, 0)] = [30_000 + 5_000, 30_000 + 10_000]
    new = break_lines(lines, D, sup_bcs, min_span=2, line_positions=lp)
    assert new.n_lines == 4, "both strands must split"
    assert np.array_equal(new.linv[new.linv], np.arange(new.n_lines))
    # each new line's rc image must be its exact mirror
    for i in range(new.n_lines):
        j = int(new.linv[i])
        A, B = new.lines[i].elements, new.lines[j].elements
        assert len(A) == len(B)


def test_positional_weak_junction():
    """Flank-window rule: junction with no spanning barcodes flagged."""
    from types import SimpleNamespace

    from supernova_tpu.asm.lines import Cell, Line
    from supernova_tpu.asm.misassembly import find_weak_junctions_positional

    D = SimpleNamespace(edge_len=lambda d: 30_000)
    line = Line([Cell([np.array([0])]), Cell([np.array([1])])])
    # junction at 30_000; barcodes 1..5 left window only, 6..10 right only
    lp = {}
    for bc in range(1, 6):
        lp[bc] = [30_000 - 10_000, 30_000 - 5_000]
    for bc in range(6, 11):
        lp[bc] = [30_000 + 5_000, 30_000 + 10_000]
    assert find_weak_junctions_positional(D, line, lp) == [1]

    # spanning barcodes present -> junction supported
    lp[20] = [30_000 - 6_000, 30_000 + 6_000]
    lp[21] = [30_000 - 9_000, 30_000 + 3_000]
    assert find_weak_junctions_positional(D, line, lp) == []


# ---------------------------------------------------------------- kill cells


def _fake_kill_setup(bridge: bool):
    """A 50.1kb line: straight(25k) [gap cell] straight(25k); barcode
    positions populate both flank windows, with or without bridges."""
    from types import SimpleNamespace

    from supernova_tpu.asm.lines import Cell, Line, Lines

    lens = {0: 25_000, 1: 100, 2: 25_000}
    gaps = {0: False, 1: True, 2: False}
    D = SimpleNamespace(
        edge_len=lambda d: lens[d],
        is_gap=lambda d: gaps[d],
    )
    ln = Line(
        [
            Cell([np.array([0], np.int64)]),
            Cell([np.array([1], np.int64)]),
            Cell([np.array([2], np.int64)]),
        ]
    )
    lines = Lines(
        lines=[ln],
        line_of_edge=np.array([0, 0, 0]),
        linv=np.array([0]),
    )
    mid = 25_050
    lp = {}
    for b in range(20):
        left_pos = mid - 15_000 + 400 * b
        right_pos = mid + 5_000 + 400 * b
        if bridge:
            lp[b] = [left_pos, right_pos]
        else:
            lp[b] = [left_pos]
            lp[100 + b] = [right_pos]
    return D, lines, {0: lp}, np.array([50_100])


def test_kill_misassembled_cells_unbridged():
    from supernova_tpu.asm import misassembly as amis

    D, lines, lpos, llens = _fake_kill_setup(bridge=False)
    dels = amis.kill_misassembled_cells(D, lines, lpos, llens=llens)
    assert dels == [1]  # the gap cell's edge is killed


def test_kill_misassembled_cells_bridged():
    from supernova_tpu.asm import misassembly as amis

    D, lines, lpos, llens = _fake_kill_setup(bridge=True)
    dels = amis.kill_misassembled_cells(D, lines, lpos, llens=llens)
    assert dels == []


def test_kill_misassembled_cells_requires_distance():
    from supernova_tpu.asm import misassembly as amis

    D, lines, lpos, llens = _fake_kill_setup(bridge=False)
    # junction too close to the line end under the long-range tier
    dels = amis.kill_misassembled_cells(
        D, lines, lpos, llens=llens, bc_require=30_000, bc_flank=40_000,
        bc_ignore=20_000,
    )
    assert dels == []


def test_kill_misassembled_cells_mol_len_scales_ignore():
    from supernova_tpu.asm import misassembly as amis

    D, lines, lpos, llens = _fake_kill_setup(bridge=False)
    # a tiny measured molecule length shrinks the dead zone, not the verdict
    dels = amis.kill_misassembled_cells(
        D, lines, lpos, llens=llens, lw_mol_len=4_000,
    )
    assert dels == [1]


# ------------------------------------------------------- barcode territories


def test_barcode_territories():
    from types import SimpleNamespace

    from supernova_tpu.asm.lines import Cell, Line, Lines
    from supernova_tpu.asm.place import barcode_territories

    # two lines of 3 straight elements each (edges 0-2 and 3-5); rc ids 6-11
    def _line(edges):
        return Line([Cell([np.array([e], np.int64)]) for e in edges])

    lines = Lines(
        lines=[_line([0, 1, 2]), _line([3, 4, 5]), _line([8, 7, 6]),
               _line([11, 10, 9])],
        line_of_edge=np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]),
        linv=np.array([2, 3, 0, 1]),
    )
    dinv = np.array([8, 7, 6, 11, 10, 9, 2, 1, 0, 5, 4, 3])
    D = SimpleNamespace(
        n_edges=12,
        dinv=dinv,
        edge_len=lambda d: 10_000,
        is_gap=lambda d: False,
    )
    # barcode 1: three placements on line 0; barcode 2: only two (below
    # MIN_BC_GROUP); reads place one edge each
    dpaths = np.full((6, 2), -1, np.int32)
    dlen = np.zeros(6, np.int32)
    bc = np.zeros(6, np.int32)
    for rid, (b, d) in enumerate([(1, 0), (1, 1), (1, 2), (2, 3), (2, 4),
                                  (0, 5)]):
        dpaths[rid, 0] = d
        dlen[rid] = 1
        bc[rid] = b
    terr = barcode_territories(D, lines, dpaths, dlen, bc)
    assert 1 in terr and 2 not in terr
    assert terr[1] == {0, 1, 2, 8, 7, 6}  # line-0 edges + their rc images


def test_place_reads_with_lines_smoke(rng):
    """place_reads(lines=...) runs end-to-end on a real assembly."""
    from supernova_tpu.align import pather
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.asm import place as aplace
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.sim import genome as sim
    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 3000)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    bc = np.ones(rs.n_reads, np.int32)
    d1, l1 = aplace.place_reads(D, edges, plen, read_bc=bc, lines=lines)
    d0, l0 = aplace.place_reads(D, edges, plen, read_bc=bc)
    assert np.array_equal(l0, l1)  # unambiguous data: same placements
    assert np.array_equal(d0, d1)


def test_kill_misassembled_cells_alt(rng):
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.asm import misassembly as amis
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.core import dna
    from supernova_tpu.core.ragged import Ragged
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.ingest.reads import build_readset
    from supernova_tpu.kmer import count as kcount
    from tests.test_capture import _rand
    from tests.test_dbg import perfect_readset

    # diploid bubble A (M | M') B -> line [A][cell][B]
    A, M, B = _rand(rng, 300), _rand(rng, 80), _rand(rng, 300)
    M2 = M[:40] + ("A" if M[40] != "A" else "C") + M[41:]
    g1 = dna.seq_to_codes(A + M + B)
    g2 = dna.seq_to_codes(A + M2 + B)
    rs1, rs2 = perfect_readset(g1), perfect_readset(g2)
    reads = [rs1.read(i) for i in range(rs1.n_reads)] + [
        rs2.read(i) for i in range(rs2.n_reads)
    ]
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs = build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    target = next(
        ln for ln in lines.lines
        if len(ln.elements) == 3 and len(ln.elements[1].paths) == 2
    )

    # disjoint flank barcode sets -> the bubble cell is killed
    disjoint = Ragged.from_rows(
        [np.arange(e * 100, e * 100 + 12, dtype=np.int64) for e in range(bg.n_edges)],
        dtype=np.int64,
    )
    dels = amis.kill_misassembled_cells_alt(D, lines, disjoint)
    cell_edges = {int(e) for e in target.elements[1].edge_ids()}
    assert cell_edges <= set(dels)

    # identical flank barcode sets -> kept
    shared = Ragged.from_rows(
        [np.arange(12, dtype=np.int64)] * bg.n_edges, dtype=np.int64
    )
    assert amis.kill_misassembled_cells_alt(D, lines, shared) == []
