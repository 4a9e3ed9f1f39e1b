"""Feudal / BINWRITE interop round trips."""
import numpy as np

from supernova_tpu.core.ragged import Ragged
from supernova_tpu.ingest import feudal


def _random_ragged(rng, n_rows=37, max_len=200):
    lens = rng.integers(0, max_len, n_rows)
    values = rng.integers(0, 4, int(lens.sum())).astype(np.uint8)
    return Ragged(values, np.concatenate([[0], np.cumsum(lens)]))


def test_pack_unpack_roundtrip(rng):
    for n in (0, 1, 3, 4, 5, 127, 1000):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(
            feudal.unpack_codes(feudal.pack_codes(codes), n), codes
        )


def test_binwrite_vec_roundtrip(tmp_path, rng):
    bci = np.sort(rng.integers(0, 10_000, 100)).astype(np.int64)
    p = tmp_path / "a.bci"
    feudal.write_bci(p, bci)
    assert np.array_equal(feudal.read_bci(p), bci)
    # magic check
    (tmp_path / "bad").write_bytes(b"NOTMAGIC" + b"\0" * 8)
    try:
        feudal.read_binwrite_vec(tmp_path / "bad")
        assert False
    except ValueError:
        pass


def test_bvecs_roundtrip(tmp_path, rng):
    rows = _random_ragged(rng)
    p = tmp_path / "asm_graph.bv"
    feudal.write_bvecs(p, rows)
    back = feudal.read_bvecs(p)
    assert back.n_rows == rows.n_rows
    assert np.array_equal(back.values, rows.values)
    assert np.array_equal(back.offsets, rows.offsets)


def test_fastb_roundtrip(tmp_path, rng):
    rows = _random_ragged(rng, n_rows=64, max_len=300)
    p = tmp_path / "reads.fastb"
    feudal.write_fastb(p, rows)
    back = feudal.read_fastb(p)
    assert back.n_rows == rows.n_rows
    assert np.array_equal(back.values, rows.values)
    assert np.array_equal(back.offsets, rows.offsets)


def test_fastb_control_block_is_valid_shape(tmp_path, rng):
    """The written header satisfies the reference's isValid() arithmetic
    (FeudalControlBlock.cc:63-117): single file, integral offsets, matching
    element count, integral fixed bytes per element."""
    rows = _random_ragged(rng, n_rows=10)
    p = tmp_path / "x.fastb"
    feudal.write_fastb(p, rows)
    data = p.read_bytes()
    import struct

    n, flags, szf, szx, sza, var_off, fixed_off = struct.unpack(
        "<IBBBBQQ", data[:24]
    )
    assert flags & 3 == 1
    assert (fixed_off - var_off) % 8 == 0
    assert (fixed_off - var_off) // 8 - 1 == n == 10
    fixed_bytes = len(data) - fixed_off
    assert fixed_bytes % n == 0 and fixed_bytes // n == szf == 4
    # offsets are absolute and monotone, first = 24, last = var_off
    offs = np.frombuffer(data, np.uint64, n + 1, var_off)
    assert offs[0] == 24 and offs[-1] == var_off
    assert (np.diff(offs.astype(np.int64)) >= 0).all()


def test_pqvec_roundtrip(rng):
    for n in (0, 1, 7, 255, 256, 1000):
        q = rng.integers(0, 64, n).astype(np.uint8)
        assert np.array_equal(feudal.pqvec_decode(feudal.pqvec_encode(q)), q)
    # constant quals use the 0-bit block form
    q = np.full(300, 37, np.uint8)
    buf = feudal.pqvec_encode(q)
    assert len(buf) < 10  # 2 blocks x 3 bytes + terminator
    assert np.array_equal(feudal.pqvec_decode(buf), q)
    # typical Illumina 4-value quals
    q = rng.choice(np.array([2, 12, 23, 37], np.uint8), 450)
    assert np.array_equal(feudal.pqvec_decode(feudal.pqvec_encode(q)), q)


def test_qualp_roundtrip(tmp_path, rng):
    lens = rng.integers(0, 160, 40)
    values = rng.integers(0, 42, int(lens.sum())).astype(np.uint8)
    rows = Ragged(values, np.concatenate([[0], np.cumsum(lens)]))
    p = tmp_path / "reads.qualp"
    feudal.write_qualp(p, rows)
    back = feudal.read_qualp(p)
    assert np.array_equal(back.values, rows.values)
    assert np.array_equal(back.offsets, rows.offsets)
