"""Multi-device (8 virtual CPU chips) sharded counting == single-device
counting, and the graft entry dryrun."""
import numpy as np
import pytest

import jax

from supernova_tpu.dbg import build as dbuild
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.parallel.mesh import make_mesh
from supernova_tpu.parallel.sharded_count import (
    merge_shard_tables,
    sharded_count,
    split_readset,
)
from supernova_tpu.sim import genome as sim


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_count_matches_single(rng):
    g = sim.random_genome(rng, 4000, n_repeat_chunks=2, repeat_len=200)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=16, molecules_per_barcode=2,
        molecule_len=2000, coverage_per_molecule=1.5, error_rate=0.002,
    )
    rs = ingest_sim(reads, wl)

    # single-device table BEFORE adjacency recompute (the sharded step's
    # contract is the raw filtered table)
    inp = kcount.prepare_reads(rs)
    single = dbuild.trim_table(
        kcount.count_kmers(
            inp["codes_ext"], inp["pos_read"], inp["glen_pos"], inp["bc_pos"]
        ),
        pad_multiple=256,
    )

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
    merged = merge_shard_tables(tables)

    n1, n2 = int(single.n_valid), int(merged.n_valid)
    assert n1 == n2
    from supernova_tpu.core.kmer_codec import soa_to_np

    assert np.array_equal(soa_to_np(single.words)[:n1], soa_to_np(merged.words)[:n2])
    assert np.array_equal(np.asarray(single.count)[:n1], np.asarray(merged.count)[:n2])
    assert np.array_equal(np.asarray(single.nbc)[:n1], np.asarray(merged.nbc)[:n2])
    # observed (pre-recompute) context masks also match
    assert np.array_equal(
        np.asarray(single.left_mask)[:n1], np.asarray(merged.left_mask)[:n2]
    )
    assert np.array_equal(
        np.asarray(single.right_mask)[:n1], np.asarray(merged.right_mask)[:n2]
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("hc", [(4, 2), (2, 4)])
def test_hier_sharded_count_matches_single(rng, hc):
    """DCN-aware hierarchical shuffle on a ("host","chip") mesh == flat."""
    from supernova_tpu.parallel.mesh import make_mesh2
    from supernova_tpu.parallel.sharded_count import sharded_count_hier

    n_hosts, cph = hc
    g = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=150)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=16, molecules_per_barcode=2,
        molecule_len=1500, coverage_per_molecule=1.5, error_rate=0.002,
    )
    rs = ingest_sim(reads, wl)
    inp = kcount.prepare_reads(rs)
    single = dbuild.trim_table(
        kcount.count_kmers(
            inp["codes_ext"], inp["pos_read"], inp["glen_pos"], inp["bc_pos"]
        ),
        pad_multiple=256,
    )

    n_dev = n_hosts * cph
    mesh = make_mesh2(n_hosts, cph)
    codes, pr, glp, bcp, nbl, rl, url = split_readset(
        rs, n_dev, base_bucket=4096, read_bucket=128
    )
    tables, overflow = sharded_count_hier(
        mesh, codes, pr, glp, bcp, n_hosts=n_hosts, chips_per_host=cph,
        capacity=4 * nbl, uniform_rl=url,
    )
    assert int(np.asarray(overflow).sum()) == 0
    merged = merge_shard_tables(tables)

    n1, n2 = int(single.n_valid), int(merged.n_valid)
    assert n1 == n2
    from supernova_tpu.core.kmer_codec import soa_to_np

    assert np.array_equal(
        soa_to_np(single.words)[:n1], soa_to_np(merged.words)[:n2]
    )
    assert np.array_equal(
        np.asarray(single.count)[:n1], np.asarray(merged.count)[:n2]
    )
    assert np.array_equal(
        np.asarray(single.nbc)[:n1], np.asarray(merged.nbc)[:n2]
    )


def test_graft_entry_single_chip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out[2]) > 0


@pytest.mark.slow  # 350 s; the driver runs the same dryrun every round
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
