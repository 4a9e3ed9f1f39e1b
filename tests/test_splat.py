"""Splat: closure patch-in over pair gaps + {-2}->{-1} conversion
(10X/Splat.cc, CP.cc:1233-1257)."""
import numpy as np

from supernova_tpu.asm import gap as agap
from supernova_tpu.asm import splat as aspl
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount

from tests.test_capture import _rand
from tests.test_dbg import perfect_readset


def _gapped_assembly(rng):
    """bg holds the full walk A-M-B (via a SNP bubble M/M'), but D keeps
    only the A and B flank edges with a gap edge between them — the exact
    shape Splat repairs (DF patched the base graph; D lost the join)."""
    A, M, B = _rand(rng, 300), _rand(rng, 80), _rand(rng, 300)
    M2 = M[:40] + ("A" if M[40] != "A" else "C") + M[41:]
    g1 = dna.seq_to_codes(A + M + B)
    g2 = dna.seq_to_codes(A + M2 + B)
    rs1, rs2 = perfect_readset(g1), perfect_readset(g2)
    from supernova_tpu.ingest.reads import build_readset

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
    assert bg.n_edges == 8  # A, M, M2, B + rc images

    # identify base edges by spelled content
    def find_edge(seq_part):
        for e in range(bg.n_edges):
            if seq_part in dna.codes_to_seq(bg.edges.row(e)):
                return e
        raise AssertionError("edge not found")

    eA = find_edge(A[50:250])
    eM = find_edge(M[30:50])  # spans the SNP at 40 -> picks the M arm
    eB = find_edge(B[50:250])

    # D over the flanks only (both bubble arms dropped = coverage break)
    keep = np.ones(bg.n_edges, bool)
    eM2 = find_edge(M2[30:50])
    for e in (eM, eM2):
        keep[e] = keep[bg.inv[e]] = False
    D = asg.build_supergraph(bg, keep)
    assert D.n_edges == 4

    dA = next(d for d in range(D.n_edges) if eA in D.epaths.row(d))
    dB = next(d for d in range(D.n_edges) if eB in D.epaths.row(d))
    v, w = int(D.to_v[dA]), int(D.from_v[dB])
    vr, wr = int(D.to_v[D.dinv[dB]]), int(D.from_v[D.dinv[dA]])
    return bg, D, (eA, eM, eB), (dA, dB), (v, w, vr, wr), (A, M, B)


def test_splat_patches_pair_gap(rng):
    bg, D, (eA, eM, eB), (dA, dB), (v, w, vr, wr), (A, M, B) = _gapped_assembly(rng)
    D = asg.append_gap_edges(D, [(v, w, agap.pair_gap(), vr, wr)])
    D.validate()

    cpaths = [np.array([eA, eM, eB], np.int64)]
    D2, n = aspl.splat(D, cpaths)
    assert n == 1
    D2.validate()
    assert not D2.gap_mask().any()
    # one edge now spells the full A-M-B walk
    seqs = [D2.edge_seq(d) for d in range(D2.n_edges)]
    assert any((A + M + B) == s for s in seqs)


def test_splat_ignores_unbridged_gap(rng):
    bg, D, (eA, eM, eB), _, (v, w, vr, wr), _ = _gapped_assembly(rng)
    D = asg.append_gap_edges(D, [(v, w, agap.pair_gap(), vr, wr)])
    D2, n = aspl.splat(D, [np.array([eA], np.int64)])  # no bridge to eB
    assert n == 0 and D2 is D


def test_convert_bc_gap_with_pair_link(rng):
    bg, D, _, (dA, dB), (v, w, vr, wr), _ = _gapped_assembly(rng)
    D = asg.append_gap_edges(D, [(v, w, agap.bc_gap(500), vr, wr)])
    D.validate()
    gap_d = next(
        d for d in range(D.n_edges) if agap.is_bc_gap(D.epaths.row(d))
    )

    # read 0 on the incoming flank, its mate (read 1) on rc of the outgoing
    dpaths = np.full((4, 4), -1, np.int32)
    dlen = np.zeros(4, np.int32)
    dpaths[0, 0] = dA
    dlen[0] = 1
    dpaths[1, 0] = int(D.dinv[dB])
    dlen[1] = 1
    D2, n = aspl.convert_bc_gaps(D, dpaths, dlen)
    assert n == 2
    assert agap.is_pair_gap(D2.epaths.row(gap_d))
    D2.validate()

    # unlinked mate -> no conversion
    dpaths[1, 0] = dA
    _, n0 = aspl.convert_bc_gaps(D, dpaths, dlen)
    assert n0 == 0
