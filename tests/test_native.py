"""Native C++ FASTQ decoder vs the Python parser."""
import gzip

import numpy as np
import pytest

from supernova_tpu.core import dna
from supernova_tpu.ingest.fastq import write_fastq
from supernova_tpu.native import decode_fastq_bytes, load_native


def make_fastq_bytes(rng, n=50):
    recs = []
    for i in range(n):
        l = int(rng.integers(30, 200))
        codes = rng.integers(0, 4, l).astype(np.uint8)
        quals = rng.integers(2, 41, l).astype(np.uint8)
        recs.append((f"r{i}", codes, quals))
    lines = []
    for name, codes, quals in recs:
        lines.append(f"@{name}")
        lines.append(dna.codes_to_seq(codes))
        lines.append("+")
        lines.append((quals + 33).tobytes().decode())
    return ("\n".join(lines) + "\n").encode(), recs


def test_native_decoder_matches(rng):
    data, recs = make_fastq_bytes(rng)
    codes, quals, offsets = decode_fastq_bytes(data)
    assert len(offsets) == len(recs) + 1
    for i, (_, c, q) in enumerate(recs):
        a, b = offsets[i], offsets[i + 1]
        assert np.array_equal(codes[a:b], c), i
        assert np.array_equal(quals[a:b], q), i


def test_native_library_builds():
    # the toolchain is baked into this image; the fast path must be native
    assert load_native() is not None


def test_malformed_fastq_rejected():
    if load_native() is None:
        pytest.skip("no native lib")
    with pytest.raises(ValueError):
        decode_fastq_bytes(b"not a fastq\nACGT\n")
