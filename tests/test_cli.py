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

    # assembled pseudohap contigs come from the simulated haplotypes
    from supernova_tpu.core import dna
    from supernova_tpu.out import fasta as fout

    g = np.load(simdir / "truth_hap_a.npy")
    hb = np.load(simdir / "truth_hap_b.npy")
    refs = [
        dna.codes_to_seq(x) for x in (g, dna.revcomp(g), hb, dna.revcomp(hb))
    ]
    for _, s in fout.read_fasta(outdir / "assembly.pseudohap.fasta.gz"):
        for part in s.split("N"):
            if len(part) > 500:
                assert any(part in r for r in refs)


def test_preflight_failures(tmp_path):
    res = preflight([], [], 0)
    assert not res.ok and res.errors
    res = preflight([str(tmp_path / "missing.fastq")], [str(tmp_path / "m2.fastq")], 10)
    assert not res.ok
