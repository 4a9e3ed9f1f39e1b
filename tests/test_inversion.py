"""Inversion-artifact handling: ZapInversionBubbles / KillInversionArtifacts
/ delete_edges recompaction."""
from types import SimpleNamespace

import numpy as np

from supernova_tpu.asm import inversion as ainv
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def _merged_readset(genomes):
    reads, quals = [], []
    for g in genomes:
        rs = perfect_readset(g)
        reads += [rs.read(i) for i in range(rs.n_reads)]
        quals += [rs.qual(i) for i in range(rs.n_reads)]
    return build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )


def test_zap_inversion_bubbles(rng):
    # A + x_i + rc(A): the cell between edge e (= A) and dinv(e) (= rc A)
    # is an inversion artifact; both haplotype arms x1/x2 land in that cell
    A = sim.random_genome(rng, 700)
    x1 = sim.random_genome(rng, 220)
    x2 = sim.random_genome(rng, 220)
    g1 = np.concatenate([A, x1, dna.revcomp(A)])
    g2 = np.concatenate([A, x2, dna.revcomp(A)])
    rs = _merged_readset([g1, g2])
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    lines = alines.find_lines(D)
    dels = ainv.zap_inversion_bubbles(D, lines)
    assert dels, "inversion bubble not detected"
    # deletions are involution-closed
    for d in dels:
        assert int(D.dinv[d]) in dels
    D2 = ainv.delete_edges(D, dels)
    D2.validate()
    assert D2.n_edges < D.n_edges
    # the A flank survives: some remaining edge spells a long run of A
    probe = dna.codes_to_seq(A[100:400])
    probe_rc = dna.codes_to_seq(dna.revcomp(A[100:400]))
    assert any(
        probe in D2.edge_seq(d) or probe_rc in D2.edge_seq(d)
        for d in range(D2.n_edges)
    )


def _fake_D(from_v, to_v, dinv, n_vertices):
    return SimpleNamespace(
        from_v=np.asarray(from_v, np.int64),
        to_v=np.asarray(to_v, np.int64),
        dinv=np.asarray(dinv, np.int64),
        n_vertices=n_vertices,
        n_edges=len(dinv),
    )


def test_kill_inversion_artifacts_fork():
    # 0 --h--> 1 --f--> 2 (well supported), 1 --z--> 3 --e--> 4 with
    # e = dinv(f): the canonical-inversion shape.  z has 1 barcode of
    # support, f has 6 -> z (and dinv z) deleted.
    #            h  f  z  e  h' z'
    from_v = [0, 1, 1, 3, 5, 7]
    to_v = [1, 2, 3, 4, 6, 8]
    dinv = [4, 3, 5, 1, 0, 2]
    D = _fake_D(from_v, to_v, dinv, 9)

    mp = 4
    rows = []
    bcs = []
    for b in range(6):  # six barcodes traverse h -> f
        rows.append([0, 1, -1, -1])
        bcs.append(10 + b)
    rows.append([0, 2, -1, -1])  # one barcode takes the artifact branch
    bcs.append(30)
    dpaths = np.asarray(rows, np.int64)
    dlen = np.full(len(rows), 2, np.int64)
    dels = ainv.kill_inversion_artifacts(D, dpaths, dlen, np.asarray(bcs))
    assert dels == [2, 5]

    # strong support on z -> nothing deleted
    rows2 = rows + [[0, 2, -1, -1]] * 5
    bcs2 = bcs + [31, 32, 33, 34, 35]
    dels2 = ainv.kill_inversion_artifacts(
        D,
        np.asarray(rows2, np.int64),
        np.full(len(rows2), 2, np.int64),
        np.asarray(bcs2),
    )
    assert dels2 == []


def test_delete_edges_recompacts(rng):
    # deleting a bubble arm leaves a simple chain that recompacts to 1 edge
    g = sim.random_genome(rng, 3000)
    snp, hb = sim.diploidize(rng, g, het_rate=0.003)
    if not len(snp):
        return
    rs = _merged_readset([g, hb])
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    # find a bubble cell and delete one arm
    target = None
    for ln in lines.lines:
        for el in ln.elements:
            if len(el) == 2 and el.paths[0].size == 1:
                target = int(el.paths[0][0])
                break
        if target is not None:
            break
    if target is None:
        return
    D2 = ainv.delete_edges(D, [target])
    D2.validate()
    assert D2.n_edges <= D.n_edges - 2


def test_inv_fix_flips_inverted_interior():
    """InvFix (InvFix.cc:84-158): a segment between two {-2} gaps whose
    barcode windows say 'inverted' gets swapped with its rc by re-homing
    the four flanking edges."""
    from types import SimpleNamespace

    from supernova_tpu.asm.inversion import inv_fix
    from supernova_tpu.asm.lines import Cell, Line, Lines
    from supernova_tpu.core.ragged import Ragged

    # fwd: 0 -A(0)-> 1 -g1(1)-> 2 -B(2)-> 3 -g2(3)-> 4 -C(4)-> 5
    # rc : 6 -C'(5)-> 7 -g2'(6)-> 8 -B'(7)-> 9 -g1'(8)-> 10 -A'(9)-> 11
    rows = [[0], [-2, 100], [1], [-2, 100], [2],
            [3], [-2, 100], [4], [-2, 100], [5]]
    values = np.concatenate([np.asarray(r, np.int64) for r in rows])
    offsets = np.concatenate([[0], np.cumsum([len(r) for r in rows])])
    lens = {0: 20_000, 1: 100, 2: 12_000, 3: 100, 4: 20_000,
            5: 20_000, 6: 100, 7: 12_000, 8: 100, 9: 20_000}
    D = SimpleNamespace(
        epaths=Ragged(values, offsets),
        from_v=np.array([0, 1, 2, 3, 4, 6, 7, 8, 9, 10], np.int64),
        to_v=np.array([1, 2, 3, 4, 5, 7, 8, 9, 10, 11], np.int64),
        dinv=np.array([9, 8, 7, 6, 5, 4, 3, 2, 1, 0], np.int64),
        n_vertices=12,
        edge_len=lambda d: lens[d],
    )
    mk = lambda es: Line([Cell([np.array([e], np.int64)]) for e in es])
    lines = Lines(
        [mk([0, 1, 2, 3, 4]), mk([5, 6, 7, 8, 9])],
        np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], np.int64),
        np.array([1, 0], np.int64),
    )
    from supernova_tpu.asm.molecules import element_offsets

    offs = element_offsets(D, lines.lines[0])
    start, stop = offs[1], offs[3]  # the two gap elements
    lp = {}
    # inverted signal: barcodes entering before gap1 reappear before gap2
    for bc in range(1, 6):
        lp[(bc, 0)] = [start - 5_000, stop - 3_000]
    for bc in range(11, 16):
        lp[(bc, 0)] = [start + 3_000, stop + 5_000]
    n = inv_fix(D, lines, lp)
    assert n == 1
    # interior B swapped with its rc B': A now feeds the rc interior
    assert D.to_v[0] == 7 and D.to_v[5] == 1
    assert D.from_v[4] == 10 and D.from_v[9] == 4
    # rewired graph is still involution-consistent vertex-wise
    # (fwd chain: 0-A->7-g2'->8-B'->9-g1'->10-C->5)


def test_inv_fix_leaves_straight_interior_alone():
    from types import SimpleNamespace

    from supernova_tpu.asm.inversion import inv_fix
    from supernova_tpu.asm.lines import Cell, Line, Lines
    from supernova_tpu.core.ragged import Ragged

    rows = [[0], [-2, 100], [1], [-2, 100], [2],
            [3], [-2, 100], [4], [-2, 100], [5]]
    values = np.concatenate([np.asarray(r, np.int64) for r in rows])
    offsets = np.concatenate([[0], np.cumsum([len(r) for r in rows])])
    lens = {d: (100 if d in (1, 3, 6, 8) else 15_000) for d in range(10)}
    D = SimpleNamespace(
        epaths=Ragged(values, offsets),
        from_v=np.array([0, 1, 2, 3, 4, 6, 7, 8, 9, 10], np.int64),
        to_v=np.array([1, 2, 3, 4, 5, 7, 8, 9, 10, 11], np.int64),
        dinv=np.array([9, 8, 7, 6, 5, 4, 3, 2, 1, 0], np.int64),
        n_vertices=12,
        edge_len=lambda d: lens[d],
    )
    mk = lambda es: Line([Cell([np.array([e], np.int64)]) for e in es])
    lines = Lines(
        [mk([0, 1, 2, 3, 4]), mk([5, 6, 7, 8, 9])],
        np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1], np.int64),
        np.array([1, 0], np.int64),
    )
    from supernova_tpu.asm.molecules import element_offsets

    offs = element_offsets(D, lines.lines[0])
    start, stop = offs[1], offs[3]
    lp = {}
    # straight signal: barcodes span each gap locally (left1 meets right1)
    for bc in range(1, 6):
        lp[(bc, 0)] = [start - 5_000, start + 3_000]
    for bc in range(11, 16):
        lp[(bc, 0)] = [stop - 3_000, stop + 5_000]
    before = (D.to_v.copy(), D.from_v.copy())
    assert inv_fix(D, lines, lp) == 0
    assert np.array_equal(D.to_v, before[0])
    assert np.array_equal(D.from_v, before[1])
