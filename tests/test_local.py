"""Unvoid: barcode-restricted local assembly across line-end gaps
(10X/BuildLocal.cc analogue)."""
import numpy as np

from supernova_tpu.asm import gap as agap
from supernova_tpu.asm import local as alocal
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.core.ragged import Ragged
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount

from tests.test_capture import _rand


def _tiles(codes: np.ndarray, step: int, read_len: int = 150):
    out = []
    starts = list(range(0, len(codes) - read_len + 1, step))
    if starts and starts[-1] != len(codes) - read_len:
        starts.append(len(codes) - read_len)
    for s in starts:
        r = codes[s : s + read_len]
        out.append(r.copy())
        out.append(dna.revcomp(r).copy())
    return out


def _gap_scenario(rng):
    """bg covers the A and B flanks only (the gap interior M never reaches
    min_freq), but the barcode's molecule reads tile straight across M —
    exactly what Unvoid exploits (reads that never placed anywhere)."""
    A, M, B = _rand(rng, 600), _rand(rng, 300), _rand(rng, 600)
    G = dna.seq_to_codes(A + M + B)
    gA, gB = dna.seq_to_codes(A), dna.seq_to_codes(B)
    # two identical dense tilings under two barcodes (the counter's MIN_BC=2
    # filter needs >=2 distinct barcodes per kmer) + barcode-1 molecule
    # reads tiling straight across the gap
    dense = _tiles(gA, 47) + _tiles(gB, 47)
    # step 40 ~ realistic molecule read density: the pair-content check
    # (asm/fillcheck.py) demands reads genuinely crossing each junction
    sparse = _tiles(G, 40)
    reads = dense + dense + sparse
    bc = np.concatenate(
        [
            np.ones(len(dense) // 2, np.int32),
            np.full(len(dense) // 2, 2, np.int32),
            np.ones(len(sparse) // 2, np.int32),
        ]
    )
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs = build_readset(reads, quals, bc, n_barcodes=2, barcoded=True)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=3), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    assert D.n_edges == 4  # A island, B island + rc images

    def edge_with(seq):
        for d in range(D.n_edges):
            if seq in D.edge_seq(d):
                return d
        raise AssertionError("edge not found")

    dA = edge_with(A[100:400])
    dB = edge_with(B[100:400])
    v, w = int(D.to_v[dA]), int(D.from_v[dB])
    vr, wr = int(D.to_v[D.dinv[dB]]), int(D.from_v[D.dinv[dA]])
    D = asg.append_gap_edges(D, [(v, w, agap.bc_gap(300), vr, wr)])
    D.validate()
    ebcx = Ragged.from_rows(
        [np.array([1, 2], np.int64)] * bg.n_edges, dtype=np.int64
    )
    return D, rs, ebcx, (A, M, B), (dA, dB)


def test_unvoid_closes_bc_gap(rng):
    D, rs, ebcx, (A, M, B), (dA, dB) = _gap_scenario(rng)
    gap_d = next(
        d for d in range(D.n_edges) if agap.is_bc_gap(D.epaths.row(d))
    )
    D2, n = alocal.unvoid(D, rs, ebcx)
    assert n == 1
    D2.validate()
    row = D2.epaths.row(gap_d)
    assert agap.is_seq_gap(row)
    # splicing flank + gap + flank reconstructs the genome across M
    w = agap.GapAwareWalker(48)
    w.add_seq(D2.edge_seq(dA))
    w.add_gap(row)
    w.add_seq(D2.edge_seq(dB))
    assert A[-100:] + M + B[:100] in w.sequence()


def test_get_barcodes_walks_line(rng):
    D, rs, ebcx, _, (dA, dB) = _gap_scenario(rng)
    mult = alocal.compute_mult(D)
    bcs = alocal.get_barcodes(D, dA, ebcx, mult, min_kmers=1)
    assert set(bcs.tolist()) == {1, 2}
    rids = alocal.barcode_reads(rs, bcs)
    assert len(rids) == rs.n_reads  # every read carries barcode 1 or 2


def _het_gap_scenario(rng):
    """Like _gap_scenario, but the gap interior M carries a het SNP: the
    barcode molecule reads come in two variants.  Unvoid should graft the
    local sub-DAG (a bubble of {-3} arms), not pick one arm."""
    A, M, B = _rand(rng, 600), _rand(rng, 300), _rand(rng, 600)
    M2 = M[:150] + ("A" if M[150] != "A" else "C") + M[151:]
    G1 = dna.seq_to_codes(A + M + B)
    G2 = dna.seq_to_codes(A + M2 + B)
    gA, gB = dna.seq_to_codes(A), dna.seq_to_codes(B)
    dense = _tiles(gA, 47) + _tiles(gB, 47)
    sparse = _tiles(G1, 100) + _tiles(G2, 100)
    reads = dense + dense + sparse
    bc = np.concatenate(
        [
            np.ones(len(dense) // 2, np.int32),
            np.full(len(dense) // 2, 2, np.int32),
            np.ones(len(sparse) // 2, np.int32),
        ]
    )
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs = build_readset(reads, quals, bc, n_barcodes=2, barcoded=True)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=3), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)

    def edge_with(seq):
        for d in range(D.n_edges):
            if seq in D.edge_seq(d):
                return d
        raise AssertionError("edge not found")

    dA = edge_with(A[100:400])
    dB = edge_with(B[100:400])
    v, w = int(D.to_v[dA]), int(D.from_v[dB])
    vr, wr = int(D.to_v[D.dinv[dB]]), int(D.from_v[D.dinv[dA]])
    D = asg.append_gap_edges(D, [(v, w, agap.bc_gap(300), vr, wr)])
    D.validate()
    ebcx = Ragged.from_rows(
        [np.array([1, 2], np.int64)] * bg.n_edges, dtype=np.int64
    )
    return D, rs, ebcx, (A, M, M2, B)


def _splice_paths(D, da, db):
    """All simple D-paths to_v[da] -> from_v[db], spliced with the flanks
    via the gap-aware walker."""
    outs = {}
    for d in range(D.n_edges):
        outs.setdefault(int(D.from_v[d]), []).append(d)
    seqs = []

    def walk(vv, acc):
        if vv == int(D.from_v[db]):
            w = agap.GapAwareWalker(48)
            w.add_seq(D.edge_seq(da))
            for d in acc:
                w.add_gap(D.epaths.row(d))
            w.add_seq(D.edge_seq(db))
            seqs.append(w.sequence())
            return
        for d in outs.get(vv, ()):
            if d in acc or not D.is_gap(d):
                continue
            walk(int(D.to_v[d]), acc + [d])

    walk(int(D.to_v[da]), [])
    return seqs


def test_unvoid_grafts_het_bubble(rng):
    D, rs, ebcx, (A, M, M2, B) = _het_gap_scenario(rng)
    D2, n = alocal.unvoid(D, rs, ebcx)
    assert n == 1
    D2.validate()
    # the {-2} gap is gone, replaced by a grafted sub-DAG of {-3} edges
    assert not any(
        agap.is_bc_gap(D2.epaths.row(d)) for d in range(D2.n_edges)
    )
    seq_gaps = [
        d for d in range(D2.n_edges) if agap.is_seq_gap(D2.epaths.row(d))
    ]
    assert len(seq_gaps) >= 6  # stem + two arms (+ rc images)

    def edge_with(seq):
        for d in range(D2.n_edges):
            if D2.is_gap(d):
                continue
            if seq in D2.edge_seq(d):
                return d
        raise AssertionError("edge not found")

    da, db = edge_with(A[100:400]), edge_with(B[100:400])
    haps = _splice_paths(D2, da, db)
    assert len(haps) == 2
    want1, want2 = A[-100:] + M + B[:100], A[-100:] + M2 + B[:100]
    assert any(want1 in h for h in haps)
    assert any(want2 in h for h in haps)


def test_closure_graph_linear(rng):
    """A clean interior yields a single L->R closure edge."""
    A, M, B = _rand(rng, 300), _rand(rng, 200), _rand(rng, 300)
    G = dna.seq_to_codes(A + M + B)
    seqs = _tiles(G, 40)
    cl = alocal.closure_graph(seqs, A, B)
    assert cl is not None and len(cl) == 1
    x, y, s = cl[0]
    assert (x, y) == ("L", "R")
    assert s.startswith(A[-47:]) and s.endswith(B[:47])
    assert M in s


def test_unvoid_unbarcoded_noop(rng):
    D, rs, ebcx, _, _ = _gap_scenario(rng)
    rs.barcoded = False
    D2, n = alocal.unvoid(D, rs, ebcx)
    assert n == 0 and D2 is D


def _mk_closure(seq, k=48):
    """A single-edge closure whose kmer content is seq's kmers."""
    return [("L", "R", seq)]


def test_choose_closure_containment(rng):
    """ChooseClosure picks the line whose content appears in BOTH local
    assemblies (the true immediate continuation, BuildLocal.cc:1263-1308)."""
    X = _rand(rng, 500)  # line 7's front
    Y = _rand(rng, 500)  # line 9's front
    # assembly toward 9 passes through line 7's sequence first; assembly
    # toward 7 never sees line 9's content
    cands = [(7, _mk_closure(X)), (9, _mk_closure(X + Y[:40]))]
    fronts = {7: X, 9: Y}
    win = alocal.choose_closure(cands, fronts)
    assert win is not None and win[0] == 7
    # ambiguous: both assemblies contain both fronts -> no winner
    cands2 = [(7, _mk_closure(X + Y)), (9, _mk_closure(Y + X))]
    assert alocal.choose_closure(cands2, fronts) is None
    # solo candidate passes through
    assert alocal.choose_closure([(3, _mk_closure(X))], {3: X})[0] == 3
    # >2 candidates: no arbitration
    assert (
        alocal.choose_closure(
            [(1, _mk_closure(X)), (2, _mk_closure(X)), (3, _mk_closure(X))],
            {1: X, 2: X, 3: X},
        )
        is None
    )


def test_unvoid_voids_joins_dead_ends(rng):
    """Two line islands with no gap edge between them: unvoid_voids joins
    them with real sequence from the barcode-local assembly (the CP.cc:660
    'build' call site)."""
    A, M, B = _rand(rng, 1500), _rand(rng, 300), _rand(rng, 1500)
    G = dna.seq_to_codes(A + M + B)
    gA, gB = dna.seq_to_codes(A), dna.seq_to_codes(B)
    dense = _tiles(gA, 47) + _tiles(gB, 47)
    sparse = _tiles(G, 100)
    reads = dense + dense + sparse
    bc = np.concatenate(
        [
            np.ones(len(dense) // 2, np.int32),
            np.full(len(dense) // 2, 2, np.int32),
            np.ones(len(sparse) // 2, np.int32),
        ]
    )
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs = build_readset(reads, quals, bc, n_barcodes=2, barcoded=True)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=3), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    assert D.n_edges == 4  # A, B islands + rc — and NO gap edge (a void)
    from supernova_tpu.asm import lines as alines

    lines = alines.find_lines(D)
    line_bcs = [np.array([1, 2], np.int64)] * lines.n_lines
    llens = np.full(lines.n_lines, 1500)
    ebcx = Ragged.from_rows(
        [np.array([1, 2], np.int64)] * bg.n_edges, dtype=np.int64
    )
    D2, n = alocal.unvoid_voids(D, rs, ebcx, lines, line_bcs, llens)
    assert n == 1
    D2.validate()

    def edge_with(seq):
        for d in range(D2.n_edges):
            if not D2.is_gap(d) and seq in D2.edge_seq(d):
                return d
        raise AssertionError("edge not found")

    da, db = edge_with(A[100:400]), edge_with(B[100:400])
    haps = _splice_paths(D2, da, db)
    assert len(haps) == 1
    assert A[-100:] + M + B[:100] in haps[0]
