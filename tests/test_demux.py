"""Sample-index demultiplexing (BCL_PROCESSOR demultiplex analogue)."""
import gzip
import json

import numpy as np
import pytest

from supernova_tpu.ingest import demux


def _write_fastq(path, recs):
    with gzip.open(path, "wt") as f:
        for i, (seq, qual) in enumerate(recs):
            f.write(f"@r{i}\n{seq}\n+\n{qual}\n")


@pytest.fixture
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    sis = ["ACGTACGT", "TTTTCCCC"]
    si_recs, r1_recs, r2_recs = [], [], []
    for i in range(400):
        si = sis[i % 2] if i % 50 else "GGGGGGGG"  # rare noise index
        si_recs.append((si, "I" * len(si)))
        r1_recs.append(("ACGT" * 10, "J" * 40))
        r2_recs.append(("TGCA" * 10, "J" * 40))
    _write_fastq(tmp_path / "I1.fastq.gz", si_recs)
    _write_fastq(tmp_path / "R1.fastq.gz", r1_recs)
    _write_fastq(tmp_path / "R2.fastq.gz", r2_recs)
    return tmp_path, sis


def test_pick_common_indexes(dataset):
    tmp, sis = dataset
    good, noise = demux.pick_common_indexes([str(tmp / "I1.fastq.gz")])
    assert set(good) == set(sis)
    assert "GGGGGGGG" in noise


def test_demultiplex_routing(dataset):
    tmp, sis = dataset
    out = tmp / "demux"
    summary = demux.demultiplex(
        str(tmp / "I1.fastq.gz"),
        {"R1": str(tmp / "R1.fastq.gz"), "R2": str(tmp / "R2.fastq.gz")},
        out,
    )
    # 400 read sets: 8 noise (every 50th), rest split between two indexes
    assert summary["X"] == 8
    assert summary[sis[0]] + summary[sis[1]] == 392
    # routed files exist with the reference naming and the right counts
    f = out / f"read-R1_si-{sis[0]}_lane-001-chunk-001.fastq.gz"
    n = sum(1 for _ in gzip.open(f, "rt")) // 4
    assert n == summary[sis[0]]
    assert (out / "demultiplex_summary.json").exists()
    js = json.load(open(out / "demultiplex_summary.json"))
    assert js == summary


def test_demux_cli(dataset):
    from supernova_tpu import cli

    tmp, sis = dataset
    rc = cli.main([
        "demux", "--si", str(tmp / "I1.fastq.gz"),
        "--reads", f"R1={tmp/'R1.fastq.gz'}", f"R2={tmp/'R2.fastq.gz'}",
        "--out", str(tmp / "o2"), "--indexes", ",".join(sis),
    ])
    assert rc == 0


def test_mkfastq_gate(tmp_path):
    from supernova_tpu import cli

    (tmp_path / "RunInfo.xml").write_text("<RunInfo/>")
    assert cli.main(["mkfastq", "--run", str(tmp_path)]) == 1
    assert cli.main(["mkfastq", "--run", str(tmp_path / "nope")]) == 1
