"""Loop capture into {-4} cells + reinsertion (10X/Capture.cc, Gap.cc)."""
import numpy as np

from supernova_tpu.asm import capture as acap
from supernova_tpu.asm import gap as agap
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount

from tests.test_dbg import perfect_readset


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _other(base: str) -> str:
    return "A" if base != "A" else "C"


def _flanked_repeat(rng, n_copies: int, tail: int = 0):
    """A + R*n (+ R[:tail]) + B with junction bases pinned so the DBG merge/
    branch vertices sit exactly at the repeat-phase boundaries (no chance
    base matches shifting them)."""
    A, R, B = _rand(rng, 220), _rand(rng, 61), _rand(rng, 220)
    A = A[:-1] + _other(R[60])  # entry merge exactly at R[0:47]
    B = _other(R[tail % len(R)]) + B[1:]  # exit branch exactly at phase `tail`
    return A, R, B, A + R * n_copies + R[:tail] + B


def _assemble(seq: str):
    g = dna.seq_to_codes(seq)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    return D


def _self_loops(D):
    return [
        d
        for d in range(D.n_edges)
        if D.from_v[d] == D.to_v[d] and not D.is_gap(d)
    ]


def _cells(D):
    return [
        d for d in range(D.n_edges) if agap.is_cell_gap(D.epaths.row(d))
    ]


def _payload_multiset(D):
    return sorted(
        tuple(int(x) for x in D.epaths.row(d))
        for d in range(D.n_edges)
        if not D.is_gap(d)
    )


def test_capture_simple_loop_roundtrip(rng):
    # exit at the same repeat phase as entry (continuation R[:47] after the
    # last copy) -> entry vertex == exit vertex -> a true self-loop edge
    A, R, B, seq = _flanked_repeat(rng, 3, tail=47)
    D = _assemble(seq)
    assert len(_self_loops(D)) == 2  # loop + its rc
    before = _payload_multiset(D)

    D2, n = acap.capture_loops(D)
    assert n == 1
    D2.validate()
    assert not _self_loops(D2)
    cells = _cells(D2)
    assert len(cells) == 2  # cell + rc cell
    # cells spell the loop: FindPath covers the single loop edge
    paths = agap.cell_find_path(D2.epaths.row(cells[0]))
    assert paths is not None and len(paths) >= 1

    # lines over the captured graph include the cell edge as an element
    from supernova_tpu.asm import lines as alines

    lines = alines.find_lines(D2)
    assert lines.n_lines >= 1

    D3, n_back = acap.reinsert_loops(D2)
    assert n_back == 1
    D3.validate()
    assert not _cells(D3)
    assert _payload_multiset(D3) == before


def test_capture_multi_loops(rng):
    # multi-loop vertices (n>=2 parallel self-loops) arise in D after
    # surgery, not in a raw K=48 DBG (a 47bp anchor repeats no 48-mer);
    # synthesize one by duplicating the self-loop of a captured repeat
    A, R, B, seq = _flanked_repeat(rng, 3, tail=47)
    D0 = _assemble(seq)
    g0 = acap.GraphEditor(D0)
    loops = [
        d
        for d in range(g0.n_edges)
        if g0.from_v[d] == g0.to_v[d] and not g0.is_gap(d)
    ]
    assert len(loops) == 2  # loop + rc loop
    a, b = loops
    assert g0.dinv[a] == b
    e1 = g0.add_edge(g0.from_v[a], g0.to_v[a], g0.rows[a].copy())
    e2 = g0.add_edge(g0.from_v[b], g0.to_v[b], g0.rows[b].copy())
    g0.dinv[e1] = e2
    g0.dinv[e2] = e1
    D = g0.build()
    D.validate()
    assert len(_self_loops(D)) == 4
    before = _payload_multiset(D)

    D2, n = acap.capture_loops(D)
    assert n == 1
    D2.validate()
    assert not _self_loops(D2)
    cells = _cells(D2)
    assert len(cells) == 2
    # the cell holds both loop paths
    _, _, _, cedges = agap.cell_decode(D2.epaths.row(cells[0]))
    assert len(cedges) == 2

    D3, n_back = acap.reinsert_loops(D2)
    assert n_back == 1
    D3.validate()
    assert _payload_multiset(D3) == before


def test_capture_canonical_loop(rng):
    # a plain tandem repeat enters and exits the repeat cycle at different
    # phases -> the cycle splits into two edges d1: v->w, d2: w->v (the
    # canonical-loop shape, Capture.cc:748-766)
    A, R, B, seq = _flanked_repeat(rng, 3, tail=20)
    D = _assemble(seq)
    before = _payload_multiset(D)
    g = acap.GraphEditor(D)
    n_can = acap.capture_canonical_loops(g)
    assert n_can == 1
    from supernova_tpu.asm.inversion import delete_edges

    D2 = delete_edges(g.build(), g.dels, force=True)
    D2.validate()
    cells = _cells(D2)
    assert len(cells) == 2
    _, _, nv, cedges = agap.cell_decode(D2.epaths.row(cells[0]))
    assert nv == 2 and len(cedges) == 2
    # cell walk exists (alternating d1/d2)
    assert agap.cell_find_path(D2.epaths.row(cells[0])) is not None

    D3, n_back = acap.reinsert_loops(D2)
    assert n_back == 1
    D3.validate()
    assert _payload_multiset(D3) == before


def test_captured_cell_spells_in_fasta(rng):
    A, R, B, seq = _flanked_repeat(rng, 3, tail=47)
    D = _assemble(seq)
    D2, n = acap.capture_loops(D)
    assert n == 1
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.out import pseudohap as oph

    lines = alines.find_lines(D2)
    best = max(
        (oph.line_sequence(D2, ln, {}) for ln in lines.lines), key=len
    )
    s = (
        best
        if A[60:100] in best
        else dna.codes_to_seq(dna.revcomp(dna.seq_to_codes(best)))
    )
    # anchors survive around the captured loop (loop spelled 1-2 times)
    assert A[60:160] in s and B[60:160] in s
    assert R in s


def test_capture_messy_loops(rng):
    # a repeat tangle between two LONG lines: the mess (the two cycle
    # edges) collapses into one cell edge spanning line end -> line start
    A, R, B, seq = _flanked_repeat(rng, 3, tail=20)
    A2, B2 = _rand(rng, 12_000), _rand(rng, 12_000)
    D = _assemble(A2 + A + seq[len(A) : len(seq) - len(B)] + B + B2)
    before = _payload_multiset(D)
    from supernova_tpu.asm import lines as alines

    lines = alines.find_lines(D)
    D2, n = acap.capture_messy_loops(D, lines)
    assert n == 1
    D2.validate()
    cells = _cells(D2)
    assert len(cells) == 2
    # the cell holds the two cycle edges
    _, _, nv, cedges = agap.cell_decode(D2.epaths.row(cells[0]))
    assert len(cedges) == 2
    # walkable and reversible
    assert agap.cell_find_path(D2.epaths.row(cells[0])) is not None
    D3, n_back = acap.reinsert_loops(D2)
    assert n_back == 1
    D3.validate()
    assert _payload_multiset(D3) == before


def test_canonicalize_cells(rng):
    # triallelic bubble: A (M | M' | M'') B -> a 3-path cell, canonicalized
    # into three parallel v->w edges (CP.cc:1819-1860)
    A, M, B = _rand(rng, 300), _rand(rng, 80), _rand(rng, 300)
    others = [b for b in "ACGT" if b != M[40]]
    M2 = M[:40] + others[0] + M[41:]
    M3 = M[:40] + others[1] + M[41:]
    g1 = dna.seq_to_codes(A + M + B)
    g2 = dna.seq_to_codes(A + M2 + B)
    g3 = dna.seq_to_codes(A + M3 + B)
    from supernova_tpu.ingest.reads import build_readset

    rss = [perfect_readset(g) for g in (g1, g2, g3)]
    reads = [r.read(i) for r in rss for i in range(r.n_reads)]
    quals = [np.full(len(x), 37, np.uint8) for x in reads]
    rs = build_readset(
        reads, quals, np.zeros(len(reads) // 2, np.int32), n_barcodes=0,
        barcoded=False,
    )
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    from supernova_tpu.asm import lines as alines

    lines = alines.find_lines(D)
    target = [ln for ln in lines.lines if ln.n_bubbles and
              max(len(c.paths) for c in ln.elements) == 3]
    assert target  # the triallelic cell exists
    before = _payload_multiset(D)

    D2, n = acap.canonicalize_cells(D, lines)
    assert n == 1
    D2.validate()
    # same payloads, arms now direct parallel edges between two vertices
    assert _payload_multiset(D2) == before
    lines2 = alines.find_lines(D2)
    t2 = [ln for ln in lines2.lines if ln.n_bubbles and
          max(len(c.paths) for c in ln.elements) == 3]
    assert t2
    cell = next(c for c in t2[0].elements if len(c.paths) == 3)
    assert all(len(p) == 1 for p in cell.paths)
