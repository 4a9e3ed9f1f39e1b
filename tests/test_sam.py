"""SAM placement export (out/sam.py — _ALIGNER/BAM QA analogue)."""
import gzip

import numpy as np

from supernova_tpu.align import pather
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.out.sam import write_sam
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def test_sam_records_parse_and_place(tmp_path, rng):
    g = sim.random_genome(rng, 3000)
    rs = perfect_readset(g, step=17)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)
    plen = np.asarray(rp.path_len)
    off = np.asarray(rp.offset)
    out = tmp_path / "placements.sam.gz"
    n = write_sam(out, bg, rs, edges, plen, off)
    assert n == rs.n_reads
    elen = bg.edges.lengths()
    with gzip.open(out, "rt") as f:
        lines = f.read().splitlines()
    hdr = [l for l in lines if l.startswith("@")]
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert len([h for h in hdr if h.startswith("@SQ")]) == bg.n_edges
    assert len(recs) == rs.n_reads
    for i, r in enumerate(recs):
        flag = int(r[1])
        assert (flag & 1) and ((flag & 64) if i % 2 == 0 else (flag & 128))
        if plen[i] > 0:
            assert r[2] == f"edge_{edges[i, 0]}"
            pos = int(r[3])
            assert 1 <= pos <= int(elen[edges[i, 0]])
            # CIGAR spans the read exactly
            import re

            total = sum(
                int(x) for x, op in re.findall(r"(\d+)([MS])", r[5])
            )
            assert total == len(rs.read(i))
            # matched bases equal the edge sequence at that position
            m = re.match(r"(?:(\d+)S)?(\d+)M", r[5])
            lead = int(m.group(1) or 0)
            span = int(m.group(2))
            eseq = bg.edge_seq(int(edges[i, 0]))
            assert r[9][lead : lead + span] == eseq[pos - 1 : pos - 1 + span]
        else:
            assert flag & 4 and r[2] == "*"


def test_sam_roundtrip_from_run_dir(tmp_path, rng):
    from supernova_tpu.ingest.ingest import ingest_sim
    from supernova_tpu.out.sam import export_sam_from_run
    from supernova_tpu.pipeline.run import Pipeline

    g = sim.random_genome(rng, 8000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wl = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wl, n_barcodes=60, molecules_per_barcode=2,
        molecule_len=4000, coverage_per_molecule=2.0, error_rate=0.001,
    )
    rs = ingest_sim(reads, wl)
    out = tmp_path / "asm"
    Pipeline(out).run_full(rs, flavors=("raw",))
    n = export_sam_from_run(out, tmp_path / "qa.sam.gz")
    assert n == rs.n_reads
