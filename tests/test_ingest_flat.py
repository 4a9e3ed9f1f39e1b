"""Vectorized FASTQ ingest == the list-based reference path, byte for byte."""
import numpy as np

from supernova_tpu.ingest.ingest import ingest_pairs
from supernova_tpu.ingest.tenx import (
    BC_LEN,
    TRIM_LENGTH,
    _read_fastq_arrays,
    ingest_10x_fastqs,
    write_sim_fastqs,
)
from supernova_tpu.ingest.barcodes import Whitelist
from supernova_tpu.sim import genome as sim


def _ingest_lists(r1p, r2p, wl, trim_length=TRIM_LENGTH, max_pairs=None):
    """The original per-record loop (kept as the test oracle)."""
    r1s, q1s, r2s, q2s, bcs, bcqs = [], [], [], [], [], []
    skip = BC_LEN + trim_length
    for p1, p2 in zip(r1p, r2p):
        c1f, q1f, o1 = _read_fastq_arrays(p1)
        c2f, q2f, o2 = _read_fastq_arrays(p2)
        n = min(len(o1), len(o2)) - 1
        for i in range(n):
            a, b = int(o1[i]), int(o1[i + 1])
            c, d = int(o2[i]), int(o2[i + 1])
            if b - a < skip + 1:
                continue
            bcs.append(c1f[a : a + BC_LEN])
            bcqs.append(q1f[a : a + BC_LEN])
            r1s.append(c1f[a + skip : b])
            q1s.append(q1f[a + skip : b])
            r2s.append(c2f[c:d])
            q2s.append(q2f[c:d])
            if max_pairs and len(r1s) >= max_pairs:
                break
        if max_pairs and len(r1s) >= max_pairs:
            break
    return ingest_pairs(r1s, q1s, r2s, q2s, np.stack(bcs), np.stack(bcqs), wl)


def _rs_equal(a, b):
    assert a.n_reads == b.n_reads
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.quals, b.quals)
    assert np.array_equal(a.bc, b.bc)
    assert np.array_equal(a.bci, b.bci)


def test_flat_ingest_matches_list_path(tmp_path, rng):
    g = sim.random_genome(rng, 20000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wlc = sim.make_whitelist(rng, 256)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wlc, n_barcodes=50, molecules_per_barcode=2,
        molecule_len=4000, coverage_per_molecule=1.0, error_rate=0.003,
        bc_error_rate=0.05,
    )
    r1, r2 = write_sim_fastqs(reads, tmp_path)
    wl = Whitelist.from_codes(wlc)
    _rs_equal(
        ingest_10x_fastqs([r1], [r2], wl),
        _ingest_lists([r1], [r2], wl),
    )
    _rs_equal(
        ingest_10x_fastqs([r1], [r2], wl, max_pairs=37),
        _ingest_lists([r1], [r2], wl, max_pairs=37),
    )


def test_flat_ingest_nonuniform_lengths(tmp_path, rng):
    """Variable-length records exercise the general (gather) path; the
    uniform fast path must bail out to it on any length deviation."""
    from supernova_tpu.ingest.fastq import write_fastq

    g = sim.random_genome(rng, 20000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wlc = sim.make_whitelist(rng, 64)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wlc, n_barcodes=20, molecules_per_barcode=2,
        molecule_len=4000, coverage_per_molecule=1.0, error_rate=0.003,
        bc_error_rate=0.05,
    )
    r1, r2 = write_sim_fastqs(reads, tmp_path)
    # rewrite with ragged tails: truncate every 3rd record by 1-7 bases
    from supernova_tpu.ingest.tenx import _read_fastq_arrays as rfa
    import gzip

    def raggedize(path, out):
        c, q, o = rfa(path)
        recs = []
        for i in range(len(o) - 1):
            a, b = int(o[i]), int(o[i + 1])
            cut = (i % 3 == 0) * (1 + (i % 7))
            recs.append((f"r{i}", c[a : b - cut], q[a : b - cut]))
        write_fastq(out, recs)
        return out

    r1v = raggedize(r1, tmp_path / "ragged_R1.fastq")
    r2v = raggedize(r2, tmp_path / "ragged_R2.fastq")
    wl = Whitelist.from_codes(wlc)
    _rs_equal(
        ingest_10x_fastqs([r1v], [r2v], wl),
        _ingest_lists([r1v], [r2v], wl),
    )


def test_lazy_readset_roundtrip(tmp_path, rng):
    """save_lazy/load_lazy (VirtualMasterVec analogue): memmap-backed
    ReadSet is bytewise identical and satisfies the same invariants."""
    from supernova_tpu.ingest.reads import ReadSet, build_readset

    reads = [rng.integers(0, 4, 100).astype(np.uint8) for _ in range(8)]
    quals = [np.full(100, 37, np.uint8) for _ in range(8)]
    rs = build_readset(reads, quals, np.array([2, 1, 2, 1]), n_barcodes=3)
    d = rs.save_lazy(tmp_path / "lz")
    rs2 = ReadSet.load_lazy(d)
    assert rs2.is_lazy and not rs.is_lazy
    assert np.array_equal(np.asarray(rs2.codes), rs.codes)
    assert np.array_equal(np.asarray(rs2.quals), rs.quals)
    assert np.array_equal(rs2.offsets, rs.offsets)
    assert np.array_equal(rs2.bc, rs.bc)
    assert np.array_equal(rs2.bci, rs.bci)
    # random access + slicing semantics preserved
    assert np.array_equal(rs2.read(3), rs.read(3))
    assert np.array_equal(rs2.qual(5), rs.qual(5))


def test_chunked_streaming_ingest_matches_whole_file(tmp_path, rng):
    """The record-chunked streaming decode (big mate files) must produce
    the identical ReadSet to the whole-file path — odd chunk sizes force
    multi-chunk blocks plus a short tail."""
    from supernova_tpu.ingest import tenx

    g = sim.random_genome(rng, 20000)
    _, hb = sim.diploidize(rng, g, 0.002)
    wlc = sim.make_whitelist(rng, 128)
    reads = sim.simulate_linked_reads(
        rng, (g, hb), wlc, n_barcodes=40, molecules_per_barcode=2,
        molecule_len=4000, coverage_per_molecule=1.0, error_rate=0.003,
        bc_error_rate=0.05,
    )
    r1, r2 = write_sim_fastqs(reads, tmp_path)
    wl = Whitelist.from_codes(wlc)
    whole = ingest_10x_fastqs([r1], [r2], wl)
    old = (tenx._CHUNKED_GZ_BYTES, tenx._RECORDS_PER_CHUNK)
    try:
        tenx._CHUNKED_GZ_BYTES = 0
        tenx._RECORDS_PER_CHUNK = 7
        chunked = ingest_10x_fastqs([r1], [r2], wl)
        tenx._RECORDS_PER_CHUNK = 1000000  # single chunk covers everything
        onechunk = ingest_10x_fastqs([r1], [r2], wl)
    finally:
        tenx._CHUNKED_GZ_BYTES, tenx._RECORDS_PER_CHUNK = old
    _rs_equal(whole, chunked)
    _rs_equal(whole, onechunk)
    # max_pairs interacts with chunk boundaries
    try:
        tenx._CHUNKED_GZ_BYTES = 0
        tenx._RECORDS_PER_CHUNK = 7
        capped = ingest_10x_fastqs([r1], [r2], wl, max_pairs=23)
    finally:
        tenx._CHUNKED_GZ_BYTES, tenx._RECORDS_PER_CHUNK = old
    _rs_equal(capped, ingest_10x_fastqs([r1], [r2], wl, max_pairs=23))
