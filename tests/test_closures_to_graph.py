"""ClosuresToGraph: closure-glued supergraph vs compaction supergraph."""
import numpy as np
import pytest

from supernova_tpu.asm import closures as aclos
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.align import pather
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset


def test_closures_to_graph_clean(rng):
    g = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=220)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    cl = aclos.make_closures(bg, edges, plen, None)
    D = asg.closures_to_graph(bg, cl)
    D.validate()
    assert D.n_edges >= 2
    # D spells genuine genome sequence
    gs, gr = dna.codes_to_seq(g), dna.codes_to_seq(dna.revcomp(g))
    for d in range(D.n_edges):
        s = D.edge_seq(d)
        assert s in gs or s in gr, d
    # total span comparable to the compaction supergraph
    Dc = asg.build_supergraph(bg)
    span = sum(D.edge_len(d) for d in range(D.n_edges))
    span_c = sum(Dc.edge_len(d) for d in range(Dc.n_edges))
    assert span >= 0.8 * span_c
