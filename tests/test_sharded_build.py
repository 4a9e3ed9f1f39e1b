"""Multi-device graph build == single-device build (bit-exact links/graph)."""
import numpy as np
import pytest

import jax

from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.parallel.mesh import make_mesh
from supernova_tpu.parallel.sharded_build import sharded_build_graph
from supernova_tpu.parallel.sharded_count import sharded_count, split_readset
from supernova_tpu.sim import genome as sim


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_build_matches_single(rng):
    g = sim.random_genome(rng, 4000, n_repeat_chunks=2, repeat_len=200)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=16, molecules_per_barcode=2,
        molecule_len=2000, coverage_per_molecule=1.5, error_rate=0.002,
    )
    rs = ingest_sim(reads, wl)

    # single-device reference graph
    table1 = dbuild.trim_table(kcount.count_readset(rs), pad_multiple=256)
    bg1 = dgraph.from_device(dbuild.build_graph(table1), table1)

    n_dev = 8
    mesh = make_mesh(n_dev)
    codes, pr, glp, bcp, nbl, rl, url = split_readset(
        rs, n_dev, base_bucket=4096, read_bucket=128
    )
    tables, overflow = sharded_count(
        mesh, codes, pr, glp, bcp, n_dev=n_dev, capacity=4 * nbl,
        uniform_rl=url,
    )
    assert int(np.asarray(overflow).sum()) == 0
    bg2 = sharded_build_graph(mesh, tables, n_dev)
    bg2.validate()

    assert bg1.n_edges == bg2.n_edges
    assert bg1.checksum() == bg2.checksum()
    # edge sets identical as sequence multisets
    s1 = sorted(bg1.edge_seq(e) for e in range(bg1.n_edges))
    s2 = sorted(bg2.edge_seq(e) for e in range(bg2.n_edges))
    assert s1 == s2
