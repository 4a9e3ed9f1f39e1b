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
