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


def test_fastb_reads_independently_constructed_file(tmp_path):
    """Interop lock: a .fastb hand-assembled byte-by-byte from the
    documented reference layout — FeudalControlBlock.h:156-163 (24-byte
    header: u32 mN, u8 flags/sizeofFixed/sizeofX/sizeofA, u64 mVarOffset,
    u64 mFixedOffset), BaseVec.h:150 ('each byte has left-most base in the
    lowest two bits'), n+1 absolute u64 offsets, then u32 per-element
    lengths — must decode via read_fastb, and write_fastb must regenerate
    the identical bytes.  This is the cross-check that our feudal interop
    matches the reference's on-disk format, not merely itself."""
    import struct

    seqs = [
        [0, 1, 2, 3, 3, 2, 1],          # ACGTTGC (7 bases -> 2 bytes)
        [],                              # empty basevector
        [2, 2, 0, 1, 3],                 # GGACT (5 bases -> 2 bytes)
        [1],                             # C (1 base -> 1 byte)
    ]

    def pack(seq):
        out = bytearray((len(seq) + 3) // 4)
        for j, code in enumerate(seq):
            out[j // 4] |= code << ((j % 4) * 2)
        return bytes(out)

    var_chunks = [pack(s) for s in seqs]
    var_data = b"".join(var_chunks)
    n = len(seqs)
    header_len = 24
    var_off = header_len + len(var_data)
    fixed_off = var_off + (n + 1) * 8
    offs = [header_len]
    for c in var_chunks:
        offs.append(offs[-1] + len(c))
    header = struct.pack("<IBBBBQQ", n, 1, 4, 0, 1, var_off, fixed_off)
    blob = (
        header
        + var_data
        + b"".join(struct.pack("<Q", o) for o in offs)
        + b"".join(struct.pack("<I", len(s)) for s in seqs)
    )
    p = tmp_path / "hand.fastb"
    p.write_bytes(blob)

    back = feudal.read_fastb(p)
    assert back.n_rows == n
    for i, s in enumerate(seqs):
        assert back.row(i).tolist() == s
    # writer must regenerate the spec bytes exactly
    p2 = tmp_path / "rewrite.fastb"
    feudal.write_fastb(p2, back)
    assert p2.read_bytes() == blob


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
