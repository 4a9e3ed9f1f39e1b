"""Closure paths + molecule inference + resume re-entry."""
import numpy as np
import pytest

from supernova_tpu.asm import closures as aclos
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import molecules as amol
from supernova_tpu.asm import place as aplace
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.align import pather
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset


def test_make_closures(rng):
    g = sim.random_genome(rng, 2500, n_repeat_chunks=1, repeat_len=200)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    cl = aclos.make_closures(bg, edges, plen, None)
    assert cl, "no closures"
    # closed under the involution
    clset = set(cl)
    for c in cl:
        rc = tuple(int(bg.inv[e]) for e in reversed(c))
        assert rc in clset
    # closure paths are walkable: consecutive edges share a vertex
    for c in cl[:50]:
        for a, b in zip(c, c[1:]):
            assert bg.to_v[a] == bg.from_v[b], (a, b)


def test_molecules_and_gap_estimate(rng):
    g = sim.random_genome(rng, 8000)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=4000, coverage_per_molecule=2.0,
    )
    rs = ingest_sim(reads, wl)
    table = dbuild.trim_table(kcount.count_readset(rs), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    dpaths, dlen = aplace.place_reads(D, edges, plen)
    positions = amol.read_line_positions(D, lines, dpaths, dlen, rs.bc)
    mols = amol.infer_molecules(positions)
    assert mols, "no molecules inferred"
    lw = amol.lw_mean_length(mols)
    # simulated molecules are 4kb; inferred spans should be same order
    assert 300 < lw < 12_000, lw


def test_pipeline_resume(tmp_path, rng):
    from supernova_tpu.pipeline.run import Pipeline

    g = sim.random_genome(rng, 4000)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=25, molecules_per_barcode=2,
        molecule_len=2000, coverage_per_molecule=2.0,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "a")
    out1 = p1.run_full(rs, flavors=("pseudohap",))
    # resume from checkpoints: must produce identical assembly stats
    sck = (tmp_path / "a" / "supergraph.npz")
    mtime = sck.stat().st_mtime
    p2 = Pipeline(tmp_path / "a", resume=True)
    out2 = p2.run_full(rs, flavors=("pseudohap",))
    assert p1.stats.get("contig_N50") == p2.stats.get("contig_N50")
    assert p1.stats.get("assembly_size") == p2.stats.get("assembly_size")
    # START=supergraph semantics: the checkpoint was re-entered, not rebuilt
    assert sck.stat().st_mtime == mtime


def test_pipeline_resume_skips_patch_recompute(tmp_path, rng):
    """START=patch semantics: resume must re-enter from graph.patched.npz
    without re-running pair discovery / closure consensus."""
    from supernova_tpu.pipeline.run import Pipeline

    g = sim.random_genome(rng, 6000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, 0.002)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=1.2,  # thin -> gaps -> patches
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "a")
    p1.run_full(rs, flavors=("raw",))
    patched = (tmp_path / "a" / "graph.patched.npz")
    if not patched.exists():
        return  # no gaps closed on this seed; nothing to re-enter from
    mtime = patched.stat().st_mtime
    p2 = Pipeline(tmp_path / "a", resume=True)
    p2.run_full(rs, flavors=("raw",))
    assert patched.stat().st_mtime == mtime, "patch stage recomputed"
    assert p2.stats.get("assembly_checksum") == p1.stats.get("assembly_checksum")


def test_resume_mid_scaffold_restores_closures(tmp_path, rng):
    """Crash-between-supergraph-and-fase scenario: resume must restore the
    saved closures (Splat input) and reproduce the fresh run's stats."""
    import shutil

    from supernova_tpu.pipeline.run import Pipeline

    g = sim.random_genome(rng, 6000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, 0.001)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=2.0,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "a")
    p1.run_full(rs, flavors=("raw",))
    # simulate a crash after the supergraph stage: drop every scaffold-phase
    # artifact but keep supergraph.npz/dpaths.npz/cpaths.npz
    for name in ("star", "starstar", "patch", "fase"):
        shutil.rmtree(tmp_path / "a" / name, ignore_errors=True)
    p2 = Pipeline(tmp_path / "a", resume=True)
    p2.run_full(rs, flavors=("raw",))
    assert getattr(p2, "_closures", None) is not None
    for k in ("assembly_checksum", "contig_N50", "assembly_size"):
        assert p1.stats.get(k) == p2.stats.get(k), k
