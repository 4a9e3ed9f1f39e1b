"""Debug exports: graph-stats TSV + scaf-graph barcode-overlap graph
(cmd_graph_stats.rs:29-51, scaf_graph.rs:16-97 analogues)."""
import math

import numpy as np

from supernova_tpu.core.ragged import Ragged
from supernova_tpu.out import exports


def _ebcx(rows):
    return Ragged.from_rows([np.array(r, np.int64) for r in rows])


def _brute(lens, rows, max_links=5, min_ctg=0, min_bcs=0, max_bcs=1 << 30,
           D=1.5e6, max_dist=2.0):
    """Reference semantics (scaf_graph.rs:26-80), sets (deduped)."""
    cand = [e for e in range(len(rows))
            if lens[e] > min_ctg and min_bcs < len(rows[e]) < max_bcs]
    raw = []
    for x in range(len(cand)):
        for y in range(x + 1, len(cand)):
            s1, s2 = set(rows[cand[x]]), set(rows[cand[y]])
            inter = len(s1 & s2)
            if not inter:
                continue
            union = len(s1 | s2)
            exp = len(s1) / D * len(s2)
            d = -math.log(max(1.0, inter - exp) * union / len(s1) / len(s2))
            if d < max_dist:
                raw.append((cand[x], cand[y], d))
    out = []
    for src in sorted({r[0] for r in raw}):
        sinks = sorted([r for r in raw if r[0] == src], key=lambda r: r[2])
        out += sinks[:max_links]
    return out


def test_scaf_graph_matches_bruteforce():
    rng = np.random.default_rng(0)
    rows = [sorted(rng.choice(40, size=rng.integers(3, 15), replace=False))
            for _ in range(25)]
    lens = rng.integers(100, 2000, size=25)
    got = exports.build_bc_scaffold_graph(
        lens, _ebcx(rows), max_links=3, min_ctg=300, min_bcs=3, max_bcs=14,
        total_diversity=50.0, max_dist=5.0)
    want = _brute(lens, rows, max_links=3, min_ctg=300, min_bcs=3,
                  max_bcs=14, D=50.0, max_dist=5.0)
    assert len(got) == len(want)
    for (gi, gj, gd), (wi, wj, wd) in zip(
            sorted(got), sorted(want)):
        assert (gi, gj) == (wi, wj)
        assert abs(gd - wd) < 1e-9


def test_scaf_graph_multiset_rows_deduped():
    # duplicate barcodes within a row must not inflate intersections
    rows = [[1, 1, 2, 3], [1, 2, 2, 4], [7, 8, 9]]
    lens = [1000, 1000, 1000]
    got = exports.build_bc_scaffold_graph(
        lens, _ebcx(rows), total_diversity=100.0, max_dist=10.0)
    want = _brute(lens, [list(set(r)) for r in rows], D=100.0, max_dist=10.0)
    assert sorted((i, j) for i, j, _ in got) == [(0, 1)]
    assert abs(got[0][2] - want[0][2]) < 1e-9


def test_scaf_graph_max_links_cap():
    # source 0 overlaps 6 others; keep only the 2 closest
    rows = [list(range(10))] + [list(range(k + 1)) for k in range(1, 7)]
    lens = [1000] * 7
    got = exports.build_bc_scaffold_graph(
        np.array(lens), _ebcx(rows), max_links=2, total_diversity=1e6,
        max_dist=100.0)
    from_zero = [g for g in got if g[0] == 0]
    assert len(from_zero) == 2
    dists = exports.estimate_distance(
        [len(r) for r in rows[1:]], [10] * 6,
        [10] * 6, [len(r) for r in rows[1:]], 1e6)
    best = np.argsort(dists)[:2] + 1
    assert {g[1] for g in from_zero} == set(best.tolist())


def test_graph_stats_tsv(tmp_path):
    from supernova_tpu.dbg.graph import BaseGraph
    from supernova_tpu.core import dna

    # two edges A->B->A' sharing vertices; hand-built tiny graph container
    s1 = dna.seq_to_codes("A" * 60)
    s2 = dna.seq_to_codes("A" * 47 + "C" * 20)
    bg = BaseGraph(
        edges=Ragged.from_rows([s1, dna.revcomp(s1), s2, dna.revcomp(s2)]),
        inv=np.array([1, 0, 3, 2], np.int32),
        from_v=np.array([0, 2, 1, 3], np.int32),
        to_v=np.array([1, 3, 2, 0], np.int32),
        n_vertices=4,
        is_circle=np.zeros(4, bool),
    )
    ebcx = _ebcx([[1, 2], [1, 2], [3], [3]])
    p = exports.write_graph_stats(bg, ebcx, tmp_path / "stats.tsv")
    lines = open(p).read().splitlines()
    assert lines[0].split("\t") == [
        "id", "len", "num_bcs", "exts_left", "exts_right", "sequence"]
    assert len(lines) == 5
    r0 = lines[1].split("\t")
    assert r0[0] == "0" and r0[1] == "60" and r0[2] == "2"
    assert r0[5] == "A" * 60


def test_cli_exports(tmp_path):
    """End-to-end: simulate -> run -> graph-stats + scaf-graph + bcmat."""
    from supernova_tpu import cli
    from supernova_tpu.sim import genome as sim
    from supernova_tpu.ingest.ingest import ingest_sim
    from supernova_tpu.pipeline.run import Pipeline

    rng = np.random.default_rng(3)
    g = sim.random_genome(rng, 4000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=40, molecules_per_barcode=2,
        molecule_len=2000, coverage_per_molecule=2.0,
        error_rate=0.0, bc_error_rate=0.0)
    rs = ingest_sim(reads, wl)
    out = tmp_path / "run"
    Pipeline(str(out)).run_full(rs)
    assert cli.main(["graph-stats", "--dir", str(out),
                     "--out", str(tmp_path / "es.tsv")]) == 0
    assert len(open(tmp_path / "es.tsv").read().splitlines()) > 1
    assert cli.main(["scaf-graph", "--dir", str(out),
                     "--out", str(tmp_path / "sg.csv"),
                     "--min-ctg", "100", "--min-bcs", "1"]) == 0


def test_cli_graph_fasta(tmp_path):
    from supernova_tpu import cli
    from supernova_tpu.dbg.graph import BaseGraph
    from supernova_tpu.ingest.ingest import ingest_sim
    from supernova_tpu.out.fasta import read_fasta
    from supernova_tpu.pipeline.run import Pipeline
    from supernova_tpu.sim import genome as sim

    rng = np.random.default_rng(5)
    g = sim.random_genome(rng, 3000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wl = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=1500, coverage_per_molecule=2.0)
    rs = ingest_sim(reads, wl)
    out = tmp_path / "run"
    Pipeline(str(out)).run_full(rs, flavors=("raw",))
    fa = tmp_path / "edges.fasta.gz"
    assert cli.main(["graph-fasta", "--dir", str(out), "--out", str(fa)]) == 0
    bg = BaseGraph.load(out / "graph.npz")
    recs = list(read_fasta(fa))
    canon = sum(1 for e in range(bg.n_edges) if e <= int(bg.inv[e]))
    assert len(recs) == canon
    for name, seq in recs:
        e = int(name.split("_")[1].split()[0])
        assert seq == bg.edge_seq(e)
