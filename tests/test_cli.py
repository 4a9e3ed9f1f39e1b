"""CLI round trip: simulate -> run on the generated FASTQs -> summary."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from supernova_tpu import cli
from supernova_tpu.pipeline.preflight import preflight


def test_cli_simulate_and_run(tmp_path):
    simdir = tmp_path / "sim"
    rc = cli.main(
        [
            "simulate", "--out", str(simdir), "--genome-size", "6000",
            "--barcodes", "40", "--whitelist-size", "128", "--repeats", "1",
        ]
    )
    assert rc == 0
    r1 = simdir / "sample_R1.fastq.gz"
    r2 = simdir / "sample_R2.fastq.gz"
    wl = simdir / "whitelist.txt"
    assert r1.exists() and r2.exists() and wl.exists()

    outdir = tmp_path / "asm"
    rc = cli.main(
        [
            "run", "--r1", str(r1), "--r2", str(r2), "--whitelist", str(wl),
            "--out", str(outdir), "--flavors", "raw,pseudohap",
        ]
    )
    assert rc == 0
    summary = json.loads((outdir / "summary.json").read_text())
    assert summary["nreads"] > 0
    assert summary["contig_N50"] > 500
    assert (outdir / "assembly.pseudohap.fasta.gz").exists()

    # assembled pseudohap contigs come from the simulated haplotypes.
    # A pseudohap is a haplotype MOSAIC (arm choice is arbitrary where
    # phasing gives no evidence, and across phase blocks — the reference's
    # pseudohap contract), so validate locally: every 300bp window of
    # every contig must be an exact substring of one of the four strands.
    # Real chimeras/misjoins fail this; legitimate haplotype switches in
    # identical inter-SNP sequence do not.
    from supernova_tpu.core import dna
    from supernova_tpu.out import fasta as fout

    g = np.load(simdir / "truth_hap_a.npy")
    hb = np.load(simdir / "truth_hap_b.npy")
    refs = [
        dna.codes_to_seq(x) for x in (g, dna.revcomp(g), hb, dna.revcomp(hb))
    ]
    win = 300
    for _, s in fout.read_fasta(outdir / "assembly.pseudohap.fasta.gz"):
        for part in s.split("N"):
            if len(part) > 500:
                starts = list(range(0, len(part) - win + 1, win // 2))
                starts.append(len(part) - win)
                for st in starts:
                    w = part[st : st + win]
                    assert any(w in r for r in refs), (st, w)


def test_preflight_failures(tmp_path):
    res = preflight([], [], 0)
    assert not res.ok and res.errors
    res = preflight([str(tmp_path / "missing.fastq")], [str(tmp_path / "m2.fastq")], 10)
    assert not res.ok


def test_subsample_and_fasth_roundtrip(tmp_path, rng):
    import numpy as np

    from supernova_tpu.ingest import fastq as fq
    from supernova_tpu.ingest.ingest import subsample_pairs
    from supernova_tpu.ingest.reads import build_readset

    reads = [np.array([0, 1, 2, 3] * 10, np.uint8) for _ in range(40)]
    quals = [np.full(40, 37, np.uint8) for _ in range(40)]
    rs = build_readset(reads, quals, np.arange(1, 21, dtype=np.int32),
                       n_barcodes=30)
    sub = subsample_pairs(rs, 0.5, seed=1)
    assert 0 < sub.n_pairs < rs.n_pairs
    sub.validate()

    recs = [
        dict(
            r1=reads[0], q1=quals[0], r2=reads[1], q2=quals[1],
            bc=np.array([0, 1, 2, 3] * 4, np.uint8),
            bcq=np.full(16, 30, np.uint8),
            si=np.zeros(0, np.uint8), siq=np.zeros(0, np.uint8),
        )
    ]
    p = tmp_path / "x.fasth.gz"
    fq.write_fasth(p, recs)
    back = list(fq.read_fasth(p))
    assert len(back) == 1
    assert np.array_equal(back[0]["r1"], recs[0]["r1"])
    assert np.array_equal(back[0]["bcq"], recs[0]["bcq"])


def test_gfa_export(tmp_path, rng):
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.out import gfa as ogfa
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.sim import genome as sim
    import gzip

    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 3000)
    _, hb = sim.diploidize(rng, g, het_rate=0.003)
    rs_a = perfect_readset(g)
    rs_b = perfect_readset(hb)
    from supernova_tpu.ingest.reads import build_readset

    reads = [rs_a.read(i) for i in range(rs_a.n_reads)] + [
        rs_b.read(i) for i in range(rs_b.n_reads)
    ]
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    n = ogfa.write_gfa(bg, tmp_path / "g.gfa.gz")
    assert n * 2 == bg.n_edges or n * 2 == bg.n_edges + 1  # one seg per rc pair
    lines_txt = gzip.open(tmp_path / "g.gfa.gz", "rt").read().splitlines()
    segs = {l.split("\t")[1] for l in lines_txt if l.startswith("S")}
    assert len(segs) == n
    for l in lines_txt:
        if l.startswith("L"):
            parts = l.split("\t")
            assert parts[1] in segs and parts[3] in segs
            assert parts[5] == "47M"
    D = asg.build_supergraph(bg)
    n2 = ogfa.write_gfa_super(D, tmp_path / "d.gfa")
    txt = (tmp_path / "d.gfa").read_text()
    assert n2 >= 1 and "PT:Z:" in txt


def test_pqvec_roundtrip(rng):
    from supernova_tpu.core import pqvec

    # 10x-style 4-valued quals round-trip exactly
    q = rng.choice([2, 12, 23, 37], size=1000).astype(np.uint8)
    book = pqvec.build_codebook(q)
    assert np.array_equal(pqvec.unpack(pqvec.pack(q, book), len(q), book), q)
    assert pqvec.roundtrip_exact_fraction(q, book) == 1.0
    # off-codebook values round to nearest entry
    q2 = np.array([2, 11, 24, 40], np.uint8)
    back = pqvec.unpack(pqvec.pack(q2, book), len(q2), book)
    assert np.array_equal(back, [2, 12, 23, 37])


def test_readset_pqvec_save_load(tmp_path, rng):
    from supernova_tpu.ingest.reads import ReadSet, build_readset

    reads = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(8)]
    quals = [rng.choice([2, 12, 23, 37], size=100).astype(np.uint8) for _ in range(8)]
    rs = build_readset(reads, quals, np.zeros(4, np.int32), n_barcodes=0,
                       barcoded=False)
    rs.save(tmp_path / "rs.npz")
    back = ReadSet.load(tmp_path / "rs.npz")
    assert np.array_equal(back.quals, rs.quals)
    assert np.array_equal(back.codes, rs.codes)


def test_bcmat_export(tmp_path):
    import numpy as np

    from supernova_tpu.cli import main
    from supernova_tpu.core.ragged import Ragged
    from supernova_tpu.out.exports import load_bcmat, write_bcmat

    ebcx = Ragged.from_rows(
        [np.array([0, 2], np.int64), np.array([1], np.int64),
         np.zeros(0, np.int64)],
        dtype=np.int64,
    )
    np.savez_compressed(
        tmp_path / "ebcx.npz", values=ebcx.values, offsets=ebcx.offsets,
        counts=np.zeros(3, np.int64),
    )
    out = tmp_path / "mat.mm"
    rc = main(["bcmat", "--dir", str(tmp_path), "--out", str(out)])
    assert rc == 0
    n_edges, n_bcs, pairs = load_bcmat(out)
    assert n_edges == 3 and n_bcs == 3
    assert sorted(pairs) == [(0, 0), (0, 2), (1, 1)]


def test_tarmri_and_readcount(tmp_path):
    """tarmri bundle + FastFastbCount analogue on a run directory."""
    import tarfile
    import numpy as np
    from supernova_tpu import cli

    d = tmp_path / "run"
    d.mkdir()
    (d / "summary.json").write_text("{}")
    (d / "big.npz").write_bytes(b"x" * 100)  # payload: excluded
    np.savez(d / "reads.npz", offsets=np.array([0, 150, 300]),
             codes=np.zeros(300, np.uint8))
    assert cli.main(["tarmri", "--dir", str(d)]) == 0
    names = tarfile.open(d / "run.mri.tgz").getnames()
    assert "summary.json" in names and "_sitecheck" in names
    assert "big.npz" not in names and "reads.npz" not in names
    assert cli.main(["readcount", "--reads", str(d / "reads.npz")]) == 0


def test_cli_export_import_ref_roundtrip(tmp_path):
    """export-ref writes reference-format fastb/qualp/bci; import-ref reads
    them back into a bit-identical ReadSet, runnable via run --reads."""
    simdir = tmp_path / "sim"
    assert cli.main([
        "simulate", "--out", str(simdir), "--genome-size", "6000",
        "--barcodes", "30", "--whitelist-size", "128", "--repeats", "1",
    ]) == 0
    out1 = tmp_path / "asm1"
    assert cli.main([
        "run", "--r1", str(simdir / "sample_R1.fastq.gz"),
        "--r2", str(simdir / "sample_R2.fastq.gz"),
        "--whitelist", str(simdir / "whitelist.txt"),
        "--out", str(out1), "--flavors", "raw",
    ]) == 0
    head = tmp_path / "ref" / "frag_reads_orig"
    assert cli.main([
        "export-ref", "--dir", str(out1), "--out-head", str(head), "--graph",
    ]) == 0
    for suf in (".fastb", ".qualp", ".bci", ".asm_graph.bv"):
        assert Path(str(head) + suf).exists()

    imp = tmp_path / "imp"
    assert cli.main([
        "import-ref", "--fastb", str(head) + ".fastb",
        "--qualp", str(head) + ".qualp", "--bci", str(head) + ".bci",
        "--out", str(imp),
    ]) == 0
    from supernova_tpu.ingest.reads import ReadSet

    a = ReadSet.load(out1 / "reads.npz")
    b = ReadSet.load(imp / "reads.npz")
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.quals, b.quals)
    assert np.array_equal(a.bc, b.bc)
    assert np.array_equal(a.bci, b.bci)
    assert a.barcoded == b.barcoded

    # the imported reads assemble to the same graph checksum
    out2 = tmp_path / "asm2"
    assert cli.main([
        "run", "--reads", str(imp / "reads.npz"),
        "--out", str(out2), "--flavors", "raw",
    ]) == 0
    s1 = json.loads((out1 / "summary.json").read_text())
    s2 = json.loads((out2 / "summary.json").read_text())
    assert s1["assembly_checksum"] == s2["assembly_checksum"]


def test_identify_gelbead_lot_parity():
    """Behavior parity with trim_reads/__init__.py:124-154: confident only
    when the best lot holds >= 95% of >= 1000 matched counts."""
    from supernova_tpu.out.readqa import CHROMIUM_LOT_MAP, identify_gelbead_lot

    a = CHROMIUM_LOT_MAP["Chromium Lot 3"][0]
    b = CHROMIUM_LOT_MAP["Chromium Lot 5"][0]
    # confident: one lot dominates with enough counts
    hist = {a + "CGATTGACG": 2000, b + "CGATTGACG": 10}
    lot, conf, counts = identify_gelbead_lot(hist, CHROMIUM_LOT_MAP)
    assert lot == "Chromium Lot 3" and conf == "confident"
    assert counts["Chromium Lot 3"] == 2000
    # insufficient data
    lot, conf, _ = identify_gelbead_lot({a + "X": 10}, CHROMIUM_LOT_MAP)
    assert lot is None and conf == "insufficient data"
    # ambiguous: split counts
    lot, conf, _ = identify_gelbead_lot(
        {a + "X": 900, b + "X": 700}, CHROMIUM_LOT_MAP
    )
    assert lot is None and conf == "ambiguous"


def test_cli_readqa(tmp_path):
    """readqa over a finished run dir: duplicate_summary/lot_info/readqa
    jsons with sane contents (the _ALIGNER QA closure; out/readqa.py)."""
    simdir = tmp_path / "sim"
    assert cli.main([
        "simulate", "--out", str(simdir), "--genome-size", "6000",
        "--barcodes", "40", "--whitelist-size", "128", "--repeats", "1",
    ]) == 0
    outdir = tmp_path / "asm"
    assert cli.main([
        "run", "--r1", str(simdir / "sample_R1.fastq.gz"),
        "--r2", str(simdir / "sample_R2.fastq.gz"),
        "--whitelist", str(simdir / "whitelist.txt"),
        "--out", str(outdir), "--flavors", "raw",
    ]) == 0
    assert cli.main([
        "readqa", "--dir", str(outdir),
        "--whitelist", str(simdir / "whitelist.txt"),
    ]) == 0
    dup = json.loads((outdir / "duplicate_summary.json").read_text())
    assert "full_use_bcs" in dup and "full_ignore_bcs" in dup
    assert dup["full_use_bcs"]["placed_pairs"] > 0
    # bc-split groups can only be finer: never fewer dups when ignoring bcs
    assert dup["full_use_bcs"]["dups"] <= dup["full_ignore_bcs"]["dups"]
    qa = json.loads((outdir / "readqa.json").read_text())
    assert qa["placed_frac"] > 0.9
    assert qa["reads"] > 0 and qa["valid_bc_frac"] > 0.5
    lot = json.loads((outdir / "lot_info.json").read_text())
    assert "gelbead_lot" in lot  # sim whitelist carries no lot oligos
