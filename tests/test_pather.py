"""Read pathing invariants: paths spell the read back from the graph."""
import numpy as np
import pytest

from supernova_tpu.align import index as pindex
from supernova_tpu.align import pather
from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def build_all(rng, glen=3000, repeats=2):
    g = sim.random_genome(rng, glen, n_repeat_chunks=repeats, repeat_len=250)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    return g, rs, bg


def spell_path(bg, edges, offset, length):
    """Walk the path edges, overlapping K-1, and cut out the read span."""
    seq = bg.edge_seq(edges[0])
    for e in edges[1:]:
        seq += bg.edge_seq(e)[K - 1 :]
    assert offset >= 0
    return seq[offset : offset + length]


def test_paths_spell_reads(rng):
    g, rs, bg = build_all(rng)
    rp = pather.path_readset(bg, rs)
    edges_arr = np.asarray(rp.edges)
    plen = np.asarray(rp.path_len)
    offset = np.asarray(rp.offset)
    overflow = np.asarray(rp.overflow)
    n_pathed = 0
    for i in range(rs.n_reads):
        if plen[i] == 0 or overflow[i]:
            continue
        path = edges_arr[i, : plen[i]].tolist()
        got = spell_path(bg, path, int(offset[i]), len(rs.read(i)))
        assert got == dna.codes_to_seq(rs.read(i)), f"read {i} path {path}"
        n_pathed += 1
    # perfect reads over a well-covered genome: nearly all reads path
    assert n_pathed >= 0.95 * rs.n_reads


def test_paths_with_errors(rng):
    g = sim.random_genome(rng, 3000)
    wl = sim.make_whitelist(rng, 32)
    _, hb = sim.diploidize(rng, g, 0.001)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=10, molecules_per_barcode=2,
        molecule_len=1500, coverage_per_molecule=1.5, error_rate=0.005,
    )
    rs = ingest_sim(reads, wl)
    table = dbuild.trim_table(kcount.count_readset(rs), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    # most reads still get a non-empty path despite errors
    assert (plen > 0).mean() > 0.8


def test_paths_index_and_ebcx(rng):
    g, rs, bg = build_all(rng)
    rp = pather.path_readset(bg, rs)
    edges_arr = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    idx = pindex.paths_index(edges_arr, plen, bg.n_edges)
    # inverted index round trip
    for e in range(bg.n_edges):
        for r in idx.row(e):
            assert e in edges_arr[r, : plen[r]].tolist()
    counts = pindex.edge_read_counts(edges_arr, plen, bg.n_edges)
    assert counts.sum() == plen.sum()
    ebcx = pindex.edge_barcodes(edges_arr, plen, rs.bc, bg.n_edges)
    assert ebcx.values.min(initial=1) >= 1


def test_blocked_packed_pather_matches_full(rng):
    """The compact-transfer blocked pather (path_reads_packed) must equal
    the single-program pather elementwise on a uniform-length readset."""
    from supernova_tpu.align import pather
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.ingest.reads import build_readset_flat
    from supernova_tpu.kmer import count as kcount

    rl, n_reads = 150, 3000
    g = rng.integers(0, 4, 20000)
    starts = rng.integers(0, len(g) - rl, n_reads)
    codes = g[np.add.outer(starts, np.arange(rl))].reshape(-1).astype(np.uint8)
    offsets = np.arange(n_reads + 1, dtype=np.int64) * rl
    quals = np.full(n_reads * rl, 37, np.uint8)
    bc = np.sort(rng.integers(0, 30, n_reads // 2)).astype(np.int32)
    rs = build_readset_flat(
        codes, offsets, quals, bc, n_barcodes=30, barcoded=True
    )
    table = dbuild.trim_table(
        kcount.count_readset(rs, min_freq=2), pad_multiple=256
    )
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp_full = pather.path_readset(bg, rs)
    rp_blk = pather._path_readset_blocked(
        bg, rs, pather.MAX_PATH, max_positions=120_000
    )
    assert float((np.asarray(rp_blk.path_len) > 0).mean()) > 0.99
    for f in ("edges", "path_len", "offset", "first_skip", "overflow"):
        assert np.array_equal(
            np.asarray(getattr(rp_full, f))[:n_reads],
            np.asarray(getattr(rp_blk, f))[:n_reads],
        ), f


def test_fused_matches_general(rng):
    """The fused gather-free pather must equal the general sort/scatter
    path elementwise on uniform-length reads (errors, barcodes, repeats —
    exercises miss-gap rejoin, junction checks, and padding rows)."""
    from functools import partial

    import jax.numpy as jnp

    g = sim.random_genome(rng, 4000, n_repeat_chunks=3, repeat_len=250)
    wl = sim.make_whitelist(rng, 32)
    _, hb = sim.diploidize(rng, g, 0.002)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=12, molecules_per_barcode=2,
        molecule_len=1800, coverage_per_molecule=2.0, error_rate=0.01,
    )
    rs = ingest_sim(reads, wl)
    table = dbuild.trim_table(kcount.count_readset(rs), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    inp = kcount.prepare_reads(rs)
    assert inp["uniform_rl"] is not None
    da = bg.device_arrays()
    fused = pather.path_reads_fused_impl(
        da["words"], da["node_edge"], da["node_pos"], da["from_v"],
        da["to_v"], da["edge_kmers"], inp["codes_ext"], inp["rlen_pos"],
        inp["pos_read"].shape[0], inp["read_offsets"].shape[0] - 1,
        pather.MAX_PATH, inp["uniform_rl"],
    )
    resolve = partial(
        pather._resolve_local, da["words"], da["node_edge"], da["node_pos"]
    )
    general = pather.path_reads_impl(
        resolve, da["from_v"], da["to_v"], da["edge_kmers"],
        inp["codes_ext"], inp["read_offsets"], inp["pos_read"],
        inp["rlen_pos"], uniform_rl=inp["uniform_rl"],
    )
    assert float((np.asarray(fused.path_len)[: rs.n_reads] > 0).mean()) > 0.8
    for f in ("edges", "path_len", "offset", "first_skip", "overflow"):
        assert np.array_equal(
            np.asarray(getattr(fused, f)), np.asarray(getattr(general, f))
        ), f


def test_sliced_table_join_matches_single(rng):
    """The sliced-table fused join (used when the dictionary alone
    approaches the join-sort budget, e.g. 100 Mb tables) must equal the
    single-table join elementwise."""
    g = sim.random_genome(rng, 5000, n_repeat_chunks=2, repeat_len=250)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    inp = kcount.prepare_reads(rs)
    da = bg.device_arrays()
    args = (
        da["words"], da["node_edge"], da["node_pos"], da["from_v"],
        da["to_v"], da["edge_kmers"], inp["codes_ext"], inp["rlen_pos"],
        inp["pos_read"].shape[0], inp["read_offsets"].shape[0] - 1,
        pather.MAX_PATH, inp["uniform_rl"],
    )
    one = pather.path_reads_fused_impl(*args, n_slices=1)
    for s in (2, 3):
        sliced = pather.path_reads_fused_impl(*args, n_slices=s)
        for f in ("edges", "path_len", "offset", "first_skip", "overflow"):
            assert np.array_equal(
                np.asarray(getattr(one, f)), np.asarray(getattr(sliced, f))
            ), (s, f)


def test_gather_propagate_matches_scan(rng):
    """The two dictionary-value propagation variants (assoc-scan payload
    carry vs cummax+node-gather) must agree elementwise."""
    g = sim.random_genome(rng, 4000, n_repeat_chunks=2, repeat_len=200)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    inp = kcount.prepare_reads(rs)
    da = bg.device_arrays()
    args = (
        da["words"], da["node_edge"], da["node_pos"], da["from_v"],
        da["to_v"], da["edge_kmers"], inp["codes_ext"], inp["rlen_pos"],
        inp["pos_read"].shape[0], inp["read_offsets"].shape[0] - 1,
        pather.MAX_PATH, inp["uniform_rl"],
    )
    old = pather.SCAN_PROPAGATE_MAX_ROWS
    try:
        pather.SCAN_PROPAGATE_MAX_ROWS = 10**9
        scan = pather.path_reads_fused_impl(*args, n_slices=1)
        scan2 = pather.path_reads_fused_impl(*args, n_slices=2)
        pather.SCAN_PROPAGATE_MAX_ROWS = 0
        gath = pather.path_reads_fused_impl(*args, n_slices=1)
        gath2 = pather.path_reads_fused_impl(*args, n_slices=2)
    finally:
        pather.SCAN_PROPAGATE_MAX_ROWS = old
    for a, b in ((scan, gath), (scan, scan2), (scan, gath2)):
        for f in ("edges", "path_len", "offset", "first_skip", "overflow"):
            assert np.array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            ), f
