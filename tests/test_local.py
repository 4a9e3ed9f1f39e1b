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
    sparse = _tiles(G, 125)
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


def test_unvoid_unbarcoded_noop(rng):
    D, rs, ebcx, _, _ = _gap_scenario(rng)
    rs.barcoded = False
    D2, n = alocal.unvoid(D, rs, ebcx)
    assert n == 0 and D2 is D
