"""FASTQ directory discovery (tenkit find_input_fastqs analogue)."""
import gzip
import shutil

import numpy as np
import pytest

from supernova_tpu.ingest.discovery import (
    BCL2FASTQ,
    BCL_PROCESSOR,
    detect_mode,
    discover_input_fastqs,
)
from supernova_tpu.ingest.tenx import ingest_10x_fastqs, write_sim_fastqs
from supernova_tpu.ingest.barcodes import Whitelist
from supernova_tpu.sim import genome as sim


def _sim(rng, tmp_path):
    g = sim.random_genome(rng, 12000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wlc = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wlc, n_barcodes=30, molecules_per_barcode=2,
        molecule_len=3000, coverage_per_molecule=1.0)
    r1, r2 = write_sim_fastqs(reads, tmp_path / "raw")
    return r1, r2, Whitelist.from_codes(wlc)


def test_bcl2fastq_layout(tmp_path, rng):
    r1, r2, wl = _sim(rng, tmp_path)
    d = tmp_path / "fq" / "proj"
    d.mkdir(parents=True)
    shutil.copy(r1, d / "mysample_S1_L001_R1_001.fastq.gz")
    shutil.copy(r2, d / "mysample_S1_L001_R2_001.fastq.gz")
    mode, samples = detect_mode(tmp_path / "fq")
    assert mode == BCL2FASTQ and samples == ["mysample"]
    got = discover_input_fastqs(tmp_path / "fq")
    assert len(got["r1"]) == 1 and len(got["r2"]) == 1
    assert not got["interleaved"]
    rs = ingest_10x_fastqs(got["r1"], got["r2"], wl)
    assert rs.n_reads > 0


def test_bcl2fastq_ambiguous_needs_sample(tmp_path, rng):
    r1, r2, wl = _sim(rng, tmp_path)
    d = tmp_path / "fq"
    d.mkdir()
    for s in ("a", "b"):
        shutil.copy(r1, d / f"{s}_S1_L001_R1_001.fastq.gz")
        shutil.copy(r2, d / f"{s}_S1_L001_R2_001.fastq.gz")
    with pytest.raises(ValueError, match="multiple samples"):
        discover_input_fastqs(d)
    got = discover_input_fastqs(d, sample="a")
    assert len(got["r1"]) == 1


def test_bcl_processor_interleaved(tmp_path, rng):
    r1, r2, wl = _sim(rng, tmp_path)
    # interleave the two files into one RA file
    d = tmp_path / "fq"
    d.mkdir()
    with gzip.open(r1, "rt") as f1, gzip.open(r2, "rt") as f2, gzip.open(
        d / "read-RA_si-ACGTACGT_lane-001-chunk-000.fastq.gz", "wt"
    ) as out:
        while True:
            rec1 = [f1.readline() for _ in range(4)]
            rec2 = [f2.readline() for _ in range(4)]
            if not rec1[0]:
                break
            out.writelines(rec1)
            out.writelines(rec2)
    mode, _ = detect_mode(d)
    assert mode == BCL_PROCESSOR
    got = discover_input_fastqs(d)
    assert got["interleaved"] and len(got["r1"]) == 1
    rs = ingest_10x_fastqs(
        got["r1"], got["r2"], wl, interleaved=True
    )
    # identical to the paired-file ingest of the same records
    ref = ingest_10x_fastqs([r1], [r2], wl)
    assert rs.n_reads == ref.n_reads
    assert np.array_equal(rs.codes, ref.codes)
    assert np.array_equal(rs.bc, ref.bc)


def test_si_n_filter(tmp_path, rng):
    r1, r2, wl = _sim(rng, tmp_path)
    d = tmp_path / "fq"
    d.mkdir()
    shutil.copy(r1, d / "read-RA_si-ACGTACGT_lane-001-chunk-000.fastq.gz")
    shutil.copy(r1, d / "read-RA_si-ANNNNNNN_lane-001-chunk-000.fastq.gz")
    from supernova_tpu.ingest.discovery import find_bcl_processor

    got = find_bcl_processor(d, sample_index="ACGTACGT")
    assert len(got) == 1 and "si-ACGTACGT" in got[0]
