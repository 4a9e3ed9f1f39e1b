"""Read-stack consensus gap closure (Stackster/CloseGap2 analogue)."""
import numpy as np

from supernova_tpu.asm import patch as apatch
from supernova_tpu.asm import stackster as astk
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim


def test_consensus_vote_rules():
    # 3 reads agree (code 2, q30), 1 disagrees (code 1, q30)
    b = np.array([[2], [2], [2], [1]], np.int8)
    q = np.full((4, 1), 30, np.int16)
    cons, ok = astk.consensus(b, q)
    assert cons[0] == 2 and ok[0]
    # 2 vs 2 split: runner-up too strong -> untrusted
    b2 = np.array([[2], [2], [1], [1]], np.int8)
    cons2, ok2 = astk.consensus(b2, q)
    assert not ok2[0]
    # single read: weight below MIN_WIN_Q -> untrusted
    b3 = np.array([[2]], np.int8)
    q3 = np.full((1, 1), 30, np.int16)
    _, ok3 = astk.consensus(b3, q3)
    assert not ok3[0]


def test_stack_closes_gap_with_errorful_reads(rng):
    """Reads covering the hole each carry errors; the qual-weighted vote
    recovers the exact fill where an exact-kmer walk would fragment."""
    g = sim.random_genome(rng, 3000)
    hole_lo, hole_hi = 1400, 1480
    read_len, insert = 150, 500

    reads, quals = [], []
    q37 = lambda n=read_len: np.full(n, 37, np.uint8)

    def overlaps_hole(a, b):
        return not (b <= hole_lo or a >= hole_hi)

    for s in range(0, len(g) - insert, 17):
        spans = ((s, s + read_len), (s + insert - read_len, s + insert))
        if any(overlaps_hole(*sp) for sp in spans):
            continue
        reads.append(g[spans[0][0] : spans[0][1]].copy())
        quals.append(q37())
        reads.append(dna.revcomp(g[spans[1][0] : spans[1][1]]).copy())
        quals.append(q37())
    # four covering reads, each with 4 private errors inside the hole
    for i in range(4):
        r = g[hole_lo - 70 : hole_hi + 70].copy()
        errs = 70 + ((np.arange(4) * 19 + i * 5) % (hole_hi - hole_lo))
        r[errs] = (r[errs] + 1 + i) % 4
        reads.append(r)
        quals.append(q37(len(r)))
    if len(reads) % 2:
        reads.append(dna.revcomp(g[2000:2150]).copy())
        quals.append(q37())

    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    assert bg.n_edges >= 4

    from supernova_tpu.align import pather

    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    pairs = apatch.find_edge_pairs(bg, edges, plen, dup=None, min_support=2)
    assert pairs

    gs = dna.codes_to_seq(g)
    gr = dna.codes_to_seq(dna.revcomp(g))
    closed = 0
    for gp in pairs:
        fill = astk.close_gap_stack(bg, rs, gp)
        if fill is None:
            continue
        left = bg.edge_seq(gp.e1)[-60:]
        right = bg.edge_seq(gp.e2)[:60]
        s2 = left + fill + right
        assert s2 in gs or s2 in gr, "stack consensus produced a wrong fill"
        closed += 1
    assert closed >= 1
