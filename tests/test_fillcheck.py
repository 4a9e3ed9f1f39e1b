"""Fill-content verification by read pairs (asm/fillcheck.py): the
wrong-copy fill class is linking-invisible (barcode-continuous,
position-correct) — only pair CONTENT through the fill betrays it."""
import numpy as np

from supernova_tpu.asm import fillcheck as afc
from supernova_tpu.core import dna


class _FakeRS:
    def __init__(self, reads):
        self._reads = reads

    def read(self, i):
        return self._reads[i]


def _mk_reads(rng, region, n_pairs, frag=350, rl=150, err=0.002):
    """FR pairs tiling `region` (the sim's convention: R1 fwd, R2 rc)."""
    reads = []
    for _ in range(n_pairs):
        fs = int(rng.integers(0, len(region) - frag))
        fragment = region[fs : fs + frag]
        r1 = fragment[:rl].copy()
        r2 = dna.revcomp(fragment[-rl:]).copy()
        for r in (r1, r2):
            ne = rng.random(rl) < err
            r[ne] = (r[ne] + rng.integers(1, 4, ne.sum())) % 4
        reads.extend([r1, r2])
    return reads


def test_correct_fill_accepted(rng):
    g = rng.integers(0, 4, 4800).astype(np.uint8)
    left, novel, right = g[:2000], g[2000:2800], g[2800:]
    reads = _mk_reads(rng, g, 160)
    ok, info = afc.verify_fill(
        left[-400:], novel, right[:400], _FakeRS(reads), range(len(reads))
    )
    assert ok, info
    assert info["left_cross"] >= 1 and info["right_cross"] >= 1
    assert info["contra"] <= 1


def test_wrong_copy_fill_rejected(rng):
    g = rng.integers(0, 4, 4800).astype(np.uint8)
    left, right = g[:2000], g[2800:]
    wrong = rng.integers(0, 4, 800).astype(np.uint8)  # other repeat copy
    reads = _mk_reads(rng, g, 160)  # reads spell the TRUE locus
    ok, info = afc.verify_fill(
        left[-400:], wrong, right[:400], _FakeRS(reads), range(len(reads))
    )
    assert not ok, info
    # flank-anchored mates that should land in the fill cannot place
    assert info["contra"] >= 2


def test_unsupported_fill_rejected(rng):
    """Reads that never touch the junction leave it unverified -> reject
    (the contested gap stays open as a calibrated {-2})."""
    g = rng.integers(0, 4, 4800).astype(np.uint8)
    left, novel, right = g[:2000], g[2000:2800], g[2800:]
    far = rng.integers(0, 4, 3000).astype(np.uint8)
    reads = _mk_reads(rng, far, 120)  # unrelated reads
    ok, info = afc.verify_fill(
        left[-400:], novel, right[:400], _FakeRS(reads), range(len(reads))
    )
    assert not ok, info


def test_long_fill_interior_pairs(rng):
    """Fills longer than the fragment length verify through chained
    interior pairs plus one crossing pair per junction."""
    g = rng.integers(0, 4, 8000).astype(np.uint8)
    left, novel, right = g[:2000], g[2000:6000], g[6000:]
    reads = _mk_reads(rng, g, 400)
    ok, info = afc.verify_fill(
        left[-400:], novel, right[:400], _FakeRS(reads), range(len(reads))
    )
    assert ok, info
    assert info["interior"] >= 1


def test_fill_owned_frac_discriminates(rng):
    """The ownership gate: a fill spelling the interior of a LONG placed
    line scores near 1 (wrong-copy signature); content of short unplaced
    fragments or genuinely novel sequence scores near 0."""
    from supernova_tpu.ingest.reads import build_readset_flat
    from supernova_tpu.kmer import count as kcount

    rl, n_reads = 150, 3000
    g = rng.integers(0, 4, 5000).astype(np.uint8)
    starts = rng.integers(0, len(g) - rl, n_reads)
    codes = g[np.add.outer(starts, np.arange(rl))].reshape(-1)
    offsets = np.arange(n_reads + 1, dtype=np.int64) * rl
    quals = np.full(codes.shape, 37, np.uint8)
    bc = np.sort(rng.integers(1, 50, n_reads // 2)).astype(np.int32)
    rs = build_readset_flat(codes, offsets, quals, bc, n_barcodes=50)
    t = kcount.count_readset(rs)
    n = int(t.n_valid)
    wa = np.asarray(t.words.a)[:n]
    wb = np.asarray(t.words.b)[:n]
    wc = np.asarray(t.words.c)[:n]
    own_long = (wa, wb, wc, np.ones(n, bool))   # every kmer owner is long
    own_short = (wa, wb, wc, np.zeros(n, bool))  # owners are short lines
    assembled = g[1000:1600]          # spelled by the dictionary
    novel = rng.integers(0, 4, 600).astype(np.uint8)  # never sequenced
    assert afc.fill_owned_frac(assembled, own_long) > 0.9
    assert afc.fill_owned_frac(assembled, own_short) < 0.1
    assert afc.fill_owned_frac(novel, own_long) < 0.1
    # rc form is canonical too
    assert afc.fill_owned_frac(dna.revcomp(assembled), own_long) > 0.9
    # verify_fill consumes it as a hard gate
    ok, info = afc.verify_fill(
        g[:400], assembled, g[600:1000], None, [], ownership=own_long
    )
    assert not ok and info.get("reason", "").startswith("fill duplicates")


def test_wrong_diverged_copy_rejected_by_consensus(rng):
    """The 10 Mb r5 residual class: a fill spelling the WRONG copy of a
    ~93%-identical diverged repeat pair passes every junction statistic
    (identity runs outspan the reads) — the per-position read consensus
    over the fill is what catches it."""
    g = rng.integers(0, 4, 4800).astype(np.uint8)
    left, true_fill, right = g[:2000], g[2000:2400].copy(), g[2400:]
    wrong = true_fill.copy()
    div = rng.choice(400, 28, replace=False)  # ~7% diverged positions
    wrong[div] = (wrong[div] + rng.integers(1, 4, 28)) % 4
    reads = _mk_reads(rng, g, 200)  # TRUE-locus reads
    rsx = _FakeRS(reads)
    mism_w, info_w = afc.fill_read_consensus(
        left[-1000:], wrong, right[:1000], rsx, range(len(reads))
    )
    mism_t, info_t = afc.fill_read_consensus(
        left[-1000:], true_fill, right[:1000], rsx, range(len(reads))
    )
    assert mism_t is not None and mism_t <= 0.01, info_t
    assert mism_w is not None and mism_w > 0.03, info_w
    ok_w, vinfo = afc.verify_fill(
        left[-1000:], wrong, right[:1000], rsx, range(len(reads)),
        ownership=(np.zeros(0, np.uint32),) * 3 + (np.zeros(0, bool),),
    )
    assert not ok_w and vinfo.get("reason", "").startswith("local read")
    ok_t, _ = afc.verify_fill(
        left[-1000:], true_fill, right[:1000], rsx, range(len(reads)),
        ownership=(np.zeros(0, np.uint32),) * 3 + (np.zeros(0, bool),),
    )
    assert ok_t
