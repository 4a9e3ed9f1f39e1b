"""End-to-end: sim genome -> ingest -> count -> graph -> paths -> FASTA,
checking assembly content against the genome (metric-based golden testing,
SURVEY.md §4)."""
import numpy as np
import pytest

from supernova_tpu.core import dna
from supernova_tpu.ingest.ingest import ingest_sim
from supernova_tpu.out import fasta as fout
from supernova_tpu.pipeline.run import Pipeline
from supernova_tpu.sim import genome as sim


def test_e2e_raw_assembly(tmp_path, rng):
    g = sim.random_genome(rng, 5000, n_repeat_chunks=1, repeat_len=200)
    _, hb = sim.diploidize(rng, g, het_rate=0.0005)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng,
        (g, hb),
        wl,
        n_barcodes=40,
        molecules_per_barcode=3,
        molecule_len=2500,
        coverage_per_molecule=2.0,
        error_rate=0.002,
        bc_error_rate=0.01,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "asm")
    bg, fasta_path = pl.run(rs)

    # checkpoints written
    for f in ("reads.npz", "kmers.npz", "graph.npz", "paths.npz", "summary.json"):
        assert (tmp_path / "asm" / f).exists()

    recs = fout.read_fasta(fasta_path)
    assert recs, "no contigs"
    total = sum(len(s) for _, s in recs)
    # raw contigs should cover most of the (covered) genome
    assert total > 0.5 * len(g)

    # assembled contigs must be genuine genome substrings (no chimeras):
    gs = dna.codes_to_seq(g)
    gr = dna.codes_to_seq(dna.revcomp(g))
    hs = dna.codes_to_seq(hb)
    hr = dna.codes_to_seq(dna.revcomp(hb))
    matched = 0
    for name, s in recs:
        if len(s) > 300:
            if s in gs or s in gr or s in hs or s in hr:
                matched += 1
    long_contigs = sum(1 for _, s in recs if len(s) > 300)
    assert long_contigs > 0
    # bubbles branch at het sites, so long contigs sit on one haplotype
    assert matched >= 0.7 * long_contigs

    # stats present
    stats = pl.stats
    assert stats.get("nreads") == rs.n_reads
    assert stats.get("edge_N50") > 0
    assert stats.get("placed_perc") > 50


def test_e2e_exit_alert(tmp_path, rng):
    # short reads must trigger the read-length exit alert
    g = sim.random_genome(rng, 800)
    wl = sim.make_whitelist(rng, 16)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl, n_barcodes=4, molecules_per_barcode=1,
        molecule_len=600, read_len=100, coverage_per_molecule=1.0,
        insert_size=220,
    )
    rs = ingest_sim(reads, wl)
    pl = Pipeline(tmp_path / "asm2")
    with pytest.raises(RuntimeError, match="exit alerts"):
        pl.run(rs)


@pytest.mark.slow
def test_e2e_multi_device_matches_single(tmp_path, rng):
    """Pipeline(multi_device=True) shards count+build over the 8-device
    CPU mesh and must produce the identical graph and contigs."""
    g = sim.random_genome(rng, 6000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, het_rate=0.001)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=50, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "single", multi_device=False)
    p1.run_full(rs, flavors=("raw",))
    p2 = Pipeline(tmp_path / "multi", multi_device=True)
    p2.run_full(rs, flavors=("raw",))
    import json

    s1 = json.load(open(tmp_path / "single" / "all_stats.json"))
    s2 = json.load(open(tmp_path / "multi" / "all_stats.json"))
    get = lambda s, k: (s[k] if isinstance(s, dict) else
                        {r["name"]: r["value"] for r in s}[k])
    for k in ("assembly_checksum", "n_edges", "contig_N50", "assembly_size"):
        assert get(s1, k) == get(s2, k), k
    assert get(s2, "n_shards") >= 2
    r1 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "single" / "assembly.raw.fasta.gz"))
    r2 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "multi" / "assembly.raw.fasta.gz"))
    assert r1 == r2


def test_scaffold_phase_reentry(tmp_path, rng):
    """--resume restores the newest scaffold-phase snapshot (the CP START=
    re-entry breadth): after a full run, a resumed pipeline must restore
    from the terminal 'fase' snapshot and re-run NO earlier star-gap
    phases, producing the same scaffolds."""
    from tests.test_star_gap_pipeline import _mask_window

    # the star-gap fixture: short molecules on a long genome + a
    # sequencing void only barcode evidence can bridge
    g = sim.random_genome(rng, 30_000)
    wl = sim.make_whitelist(rng, 256)
    reads = sim.simulate_linked_reads(
        rng, (g, g), wl, n_barcodes=80, molecules_per_barcode=2,
        molecule_len=8_000, coverage_per_molecule=1.0, error_rate=0.0,
    )
    reads = _mask_window(reads, 14_500, 15_000)
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "asm", auto_downsample=False)
    D1, lines1, scaffolds1, _, _ = p1.run_full(rs)
    # every phase directory snapshotted
    for name in Pipeline.SUP_PHASES:
        assert (tmp_path / "asm" / name / "a.sup.npz").exists(), name

    p2 = Pipeline(tmp_path / "asm", resume=True, auto_downsample=False)
    # poison the early phases: resume-from-fase must not call them
    p2._star_multipass = None
    p2._barcode_join_passes = None
    p2._fix_misassemblies = None
    D2, lines2, scaffolds2, _, _ = p2.run_full(rs)
    assert len(scaffolds2) == len(scaffolds1)
    assert D2.n_edges == D1.n_edges


@pytest.mark.slow
def test_e2e_2d_topology_matches_single(tmp_path, rng):
    """Pipeline(multi_device=(4,2)) — the 2-D host/chip topology with the
    hierarchical count exchange — produces the identical assembly."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    g = sim.random_genome(rng, 5000, n_repeat_chunks=1, repeat_len=120)
    _, hb = sim.diploidize(rng, g, het_rate=0.001)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=40, molecules_per_barcode=2,
        molecule_len=2500, coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "single", multi_device=False)
    p1.run_full(rs, flavors=("raw",))
    p2 = Pipeline(tmp_path / "topo", multi_device=(4, 2))
    p2.run_full(rs, flavors=("raw",))
    import json

    s1 = json.load(open(tmp_path / "single" / "all_stats.json"))
    s2 = json.load(open(tmp_path / "topo" / "all_stats.json"))
    get = lambda s, k: (s[k] if isinstance(s, dict) else
                        {r["name"]: r["value"] for r in s}[k])
    for k in ("assembly_checksum", "n_edges", "contig_N50", "assembly_size"):
        assert get(s1, k) == get(s2, k), k


@pytest.mark.slow
def test_e2e_value_sharded_dict_path_matches(tmp_path, rng, monkeypatch):
    """PATH_VS_DICT_ROWS forced to 0: mesh pathing must hash-shard the
    kmer dictionary (no device holds the full table) and still produce the
    identical assembly + identical per-read paths (the pod-scale HBM story
    wired into the real pipeline; reference analogue: the MSP shard
    contract, lib/tada/src/cmd_msp.rs:44-50)."""
    import json

    from supernova_tpu.pipeline import run as prun

    g = sim.random_genome(rng, 6000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, het_rate=0.001)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=50, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "single", multi_device=False)
    p1.run_full(rs, flavors=("raw",))
    monkeypatch.setattr(prun, "PATH_VS_DICT_ROWS", 0)
    p2 = Pipeline(tmp_path / "vs", multi_device=True)
    p2.run_full(rs, flavors=("raw",))

    s1 = json.load(open(tmp_path / "single" / "all_stats.json"))
    s2 = json.load(open(tmp_path / "vs" / "all_stats.json"))
    get = lambda s, k: (s[k] if isinstance(s, dict) else
                        {r["name"]: r["value"] for r in s}[k])
    assert get(s2, "path_dict_sharded") == 1
    for k in ("assembly_checksum", "n_edges", "contig_N50", "assembly_size"):
        assert get(s1, k) == get(s2, k), k
    # per-read paths bit-identical (zipped checkpoint contents)
    z1 = np.load(tmp_path / "single" / "paths.npz")
    z2 = np.load(tmp_path / "vs" / "paths.npz")
    assert sorted(z1.files) == sorted(z2.files)
    for f in z1.files:
        assert np.array_equal(z1[f], z2[f]), f
    r1 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "single" / "assembly.raw.fasta.gz"))
    r2 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "vs" / "assembly.raw.fasta.gz"))
    assert r1 == r2


def test_e2e_lazy_readset_matches(tmp_path, rng, monkeypatch):
    """LAZY_READS_MIN_BASES forced to 0: the whole pipeline runs off the
    disk-memmap ReadSet (reads.lazy/) and must produce the identical
    assembly (RSS-bounding VirtualMasterVec analogue in the real path)."""
    import json

    from supernova_tpu.pipeline import run as prun

    g = sim.random_genome(rng, 6000, n_repeat_chunks=1, repeat_len=150)
    _, hb = sim.diploidize(rng, g, het_rate=0.001)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=50, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    p1 = Pipeline(tmp_path / "ram")
    p1.run_full(rs, flavors=("raw",))
    monkeypatch.setattr(prun, "LAZY_READS_MIN_BASES", 0)
    rs2 = ingest_sim(reads, wl)
    p2 = Pipeline(tmp_path / "lazy")
    p2.run_full(rs2, flavors=("raw",))
    assert (tmp_path / "lazy" / "reads.lazy" / "codes.npy").exists()

    s1 = json.load(open(tmp_path / "ram" / "all_stats.json"))
    s2 = json.load(open(tmp_path / "lazy" / "all_stats.json"))
    get = lambda s, k: (s[k] if isinstance(s, dict) else
                        {r["name"]: r["value"] for r in s}[k])
    assert get(s2, "reads_lazy") == 1
    for k in ("assembly_checksum", "n_edges", "contig_N50", "assembly_size"):
        assert get(s1, k) == get(s2, k), k
    r1 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "ram" / "assembly.raw.fasta.gz"))
    r2 = sorted(seq for _, seq in fout.read_fasta(
        tmp_path / "lazy" / "assembly.raw.fasta.gz"))
    assert r1 == r2


@pytest.mark.slow
def test_e2e_mesh_1mb_identity(tmp_path, rng):
    """Repeat-bearing genome through the FULL pipeline single-device vs
    8-virtual-device mesh: raw AND pseudohap FASTA must be identical
    (VERDICT r3 #8 — the prior mesh e2e was a 6 kb toy, raw only).
    PARANOID deep-validate is disabled here: this is an identity test, not
    an invariant test, and per-edge Python validation at this D scale
    dominates the wall.  Formerly skipped for a 77 GB RSS pathology at
    300 kb: the distributed links phase inherited the count stage's
    occurrence-scale shard capacity (fixed by
    sharded_build.trim_shard_tables — a full 300 kb mesh run now peaks at
    ~6 GB; see ARCHITECTURE.md round 5)."""
    from supernova_tpu.asm import supergraph as _sg

    old_paranoid = _sg.PARANOID
    _sg.PARANOID = False
    try:
        g = sim.random_genome(rng, 300_000, n_repeat_chunks=8,
                              repeat_len=400)
        _, hb = sim.diploidize(rng, g, het_rate=0.001)
        wl = sim.make_whitelist(rng, 1024)
        reads = sim.simulate_linked_reads(
            rng, (g, hb), wl, n_barcodes=120, molecules_per_barcode=10,
            molecule_len=60_000, coverage_per_molecule=0.2,
            error_rate=0.002, bc_error_rate=0.01, chromium_model=True,
        )
        rs = ingest_sim(reads, wl)
        outs = {}
        for tag, md in (("single", False), ("mesh", True)):
            p = Pipeline(tmp_path / tag, multi_device=md)
            p.run_full(rs, flavors=("raw", "pseudohap"))
            outs[tag] = {
                fl: sorted(
                    seq for _, seq in fout.read_fasta(
                        tmp_path / tag / f"assembly.{fl}.fasta.gz"
                    )
                )
                for fl in ("raw", "pseudohap")
            }
        assert outs["single"]["raw"] == outs["mesh"]["raw"]
        assert outs["single"]["pseudohap"] == outs["mesh"]["pseudohap"]
    finally:
        _sg.PARANOID = old_paranoid
