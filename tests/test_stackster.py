"""Read-stack consensus gap closure (Stackster/CloseGap2 analogue)."""
import numpy as np

from supernova_tpu.asm import patch as apatch
from supernova_tpu.asm import stackster as astk
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim


def test_consensus_vote_rules():
    # 3 reads agree (code 2, q30), 1 disagrees (code 1, q30)
    b = np.array([[2], [2], [2], [1]], np.int8)
    q = np.full((4, 1), 30, np.int16)
    cons, ok = astk.consensus(b, q)
    assert cons[0] == 2 and ok[0]
    # 2 vs 2 split: runner-up too strong -> untrusted
    b2 = np.array([[2], [2], [1], [1]], np.int8)
    cons2, ok2 = astk.consensus(b2, q)
    assert not ok2[0]
    # single read: weight below MIN_WIN_Q -> untrusted
    b3 = np.array([[2]], np.int8)
    q3 = np.full((1, 1), 30, np.int16)
    _, ok3 = astk.consensus(b3, q3)
    assert not ok3[0]


def test_consensus_divergence_untrust():
    """ReadStack.cc:422-427: a runner-up above MAX_QCOMP weight with >= 2
    confident readers means real divergence -> column untrusted even when
    the winner's margin clears MIN_WIN_Q."""
    # 8 reads say 2, 4 reads say 1 (all q30): margin 120 >= 60 but the
    # runner-up carries 120 > 100 with 4 confident readers
    b = np.array([[2]] * 8 + [[1]] * 4, np.int8)
    q = np.full((12, 1), 30, np.int16)
    _, ok = astk.consensus(b, q)
    assert not ok[0]
    # same winner margin, runner-up weak (below MAX_QCOMP): trusted
    b2 = np.array([[2]] * 8 + [[1]] * 2, np.int8)
    q2 = np.full((10, 1), 30, np.int16)
    _, ok2 = astk.consensus(b2, q2)
    assert ok2[0]


def test_founder_filter_drops_misplaced_reads():
    """Rows with >= FOUNDER_MAX_DIFFS confident disagreements vs the flank
    are misplaced repeat-copy reads (HighQualDiff, ReadStack.cc:489)."""
    flank = "ACGTACGTACGTACGTACGT"
    f = dna.seq_to_codes(flank)
    good = np.full((1, 30), -1, np.int8)
    good[0, : len(f)] = f
    bad = good.copy()
    bad[0, 3] = (f[3] + 1) % 4
    bad[0, 11] = (f[11] + 1) % 4
    b = np.concatenate([good, bad])
    q = np.where(b >= 0, 30, 0).astype(np.int16)
    keep = astk.filter_founder_diff(b, q, flank)
    assert keep.tolist() == [True, False]


def test_branching_closes_het_gap(rng):
    """A gap whose interior carries a het SNP: half the covering molecules
    say one base, half the other.  The single-consensus walk stalls at the
    divergent column; the branch-aware extension must still close (either
    arm is a correct fill for its haplotype)."""
    g = sim.random_genome(rng, 2400)
    hole_lo, hole_hi = 1100, 1180
    snp_pos = 1140
    read_len = 150
    g2 = g.copy()
    g2[snp_pos] = (g[snp_pos] + 2) % 4

    reads, quals = [], []
    q37 = lambda n=read_len: np.full(n, 37, np.uint8)
    # flank-only coverage from both haplotypes
    for s in range(0, len(g) - read_len, 23):
        if s + read_len <= hole_lo or s >= hole_hi:
            reads.append(g[s : s + read_len].copy())
            quals.append(q37())
    # 6 covering reads per haplotype, reaching ~40 bp into the right flank
    # so both directions of the stack can anchor
    for hap in (g, g2):
        for i in range(6):
            lo = hole_lo - 30 - i * 3
            r = hap[lo : lo + read_len].copy()
            reads.append(r)
            quals.append(q37())
    if len(reads) % 2:
        reads.append(dna.revcomp(g[500:650]).copy())
        quals.append(q37())
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)

    left = dna.codes_to_seq(g[hole_lo - 200 : hole_lo])
    right = dna.codes_to_seq(g[hole_hi : hole_hi + 200])

    class FakeGP:
        e1, e2 = 0, 1
        read_ids = list(range(rs.n_reads))

    class FakeBG:
        def edge_seq(self, e):
            return left if e == 0 else right

    fill = astk.close_gap_stack(FakeBG(), rs, FakeGP())
    assert fill is not None
    want_a = dna.codes_to_seq(g[hole_lo:hole_hi])
    want_b = dna.codes_to_seq(g2[hole_lo:hole_hi])
    assert fill in (want_a, want_b)


def test_closes_at_realistic_error_rate(rng):
    """1.5% random base errors on every covering read (the reference's
    real-data regime, vs the 0.2% sims round 1 validated at): the stack
    vote must still recover the exact fill."""
    g = sim.random_genome(rng, 2000)
    hole_lo, hole_hi = 900, 1000
    read_len = 170
    reads, quals = [], []
    q37 = lambda n: np.full(n, 37, np.uint8)
    for i in range(14):  # covering reads spanning the hole + both flanks
        lo = hole_lo - 45 - i * 2
        r = g[lo : lo + read_len].copy()
        errs = rng.random(read_len) < 0.015
        r[errs] = (r[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
        reads.append(r)
        quals.append(q37(read_len))
    left = dna.codes_to_seq(g[hole_lo - 200 : hole_lo])
    right = dna.codes_to_seq(g[hole_hi : hole_hi + 200])

    class FakeGP:
        e1, e2 = 0, 1
        read_ids = list(range(len(reads) // 2 * 2))

    class FakeBG:
        def edge_seq(self, e):
            return left if e == 0 else right

    rs = build_readset(
        reads[: len(reads) // 2 * 2], quals[: len(reads) // 2 * 2],
        np.zeros(len(reads) // 2, np.int32), n_barcodes=0, barcoded=False,
    )
    fill = astk.close_gap_stack(FakeBG(), rs, FakeGP())
    assert fill == dna.codes_to_seq(g[hole_lo:hole_hi])


def test_stack_closes_gap_with_errorful_reads(rng):
    """Reads covering the hole each carry errors; the qual-weighted vote
    recovers the exact fill where an exact-kmer walk would fragment."""
    g = sim.random_genome(rng, 3000)
    hole_lo, hole_hi = 1400, 1480
    read_len, insert = 150, 500

    reads, quals = [], []
    q37 = lambda n=read_len: np.full(n, 37, np.uint8)

    def overlaps_hole(a, b):
        return not (b <= hole_lo or a >= hole_hi)

    for s in range(0, len(g) - insert, 17):
        spans = ((s, s + read_len), (s + insert - read_len, s + insert))
        if any(overlaps_hole(*sp) for sp in spans):
            continue
        reads.append(g[spans[0][0] : spans[0][1]].copy())
        quals.append(q37())
        reads.append(dna.revcomp(g[spans[1][0] : spans[1][1]]).copy())
        quals.append(q37())
    # four covering reads, each with 4 private errors inside the hole
    for i in range(4):
        r = g[hole_lo - 70 : hole_hi + 70].copy()
        errs = 70 + ((np.arange(4) * 19 + i * 5) % (hole_hi - hole_lo))
        r[errs] = (r[errs] + 1 + i) % 4
        reads.append(r)
        quals.append(q37(len(r)))
    if len(reads) % 2:
        reads.append(dna.revcomp(g[2000:2150]).copy())
        quals.append(q37())

    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    assert bg.n_edges >= 4

    from supernova_tpu.align import pather

    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    pairs = apatch.find_edge_pairs(bg, edges, plen, dup=None, min_support=2)
    assert pairs

    gs = dna.codes_to_seq(g)
    gr = dna.codes_to_seq(dna.revcomp(g))
    closed = 0
    for gp in pairs:
        fill = astk.close_gap_stack(bg, rs, gp)
        if fill is None:
            continue
        left = bg.edge_seq(gp.e1)[-60:]
        right = bg.edge_seq(gp.e2)[:60]
        s2 = left + fill + right
        assert s2 in gs or s2 in gr, "stack consensus produced a wrong fill"
        closed += 1
    assert closed >= 1


def _stack_from_rows(rows, qrows):
    b = np.stack([np.asarray(r, np.int8) for r in rows])
    q = np.stack([np.asarray(r, np.int16) for r in qrows])
    return b, q


def test_clean_columns_flags_ambiguous_dissent():
    """CleanColumns (ReadStack.cc:498-515): in a column with two bases each
    carrying >= 3 Q20 readers, Q20 dissenters vs the founder are suspect;
    unambiguous columns flag nothing."""
    flank = "AAAAAAAA"
    fb, fq = astk._founder_rows(flank, 8)
    # col 2: founder base A(0) has 3 readers, alt C(1) has 3 readers
    rows = [[0] * 8] * 3 + [[0, 0, 1, 0, 0, 0, 0, 0]] * 3
    b, q = _stack_from_rows(rows, [[30] * 8] * 6)
    sus = astk.clean_columns(b, q, fb, fq)
    assert sus.tolist() == [False] * 3 + [True] * 3
    # alt support below min_count (2 readers): no ambiguity, no suspects
    b2, q2 = _stack_from_rows(rows[:5], [[30] * 8] * 5)
    assert not astk.clean_columns(b2, q2, fb, fq).any()


def test_pair_weak_flags_q30_dissenter():
    """PairWeak1 (ReadStack.cc:727-748): a column where full pairs agree
    overwhelmingly makes a Q30 dissenter suspect — but only when the
    paired winner clears (>=100, >10x runner-up)."""
    # rows 0-3 = two full pairs agreeing (A), row 4 unpaired dissenter (C)
    rows = [[0] * 6] * 4 + [[1] + [0] * 5]
    b, q = _stack_from_rows(rows, [[30] * 6] * 5)
    pids = np.array([0, 0, 1, 1, 2])
    sus = astk.pair_weak(b, q, pids)
    assert sus.tolist() == [False] * 4 + [True]
    # winner sum below 100 (one pair only): no flag
    sus2 = astk.pair_weak(b[:3], q[:3], np.array([0, 0, 1]))
    assert not sus2.any()


def test_motif_diff_deletes_repeat_copy_block():
    """MotifDiff (ReadStack.cc:800-845): a 10-wide stripe where >= 10 rows
    share the founder's motif and >= 10 rows share a high-qual-divergent
    motif deletes the divergent block; a small divergent group survives."""
    flank = "ACGTACGTAC"  # one exact stripe
    fb, fq = astk._founder_rows(flank, 10)
    f = dna.seq_to_codes(flank)
    alt = f.copy()
    alt[4] = (alt[4] + 1) % 4
    rows = [f] * 9 + [alt] * 10 + [alt] * 0
    b, q = _stack_from_rows(rows, [[30] * 10] * 19)
    dele = astk.motif_diff(b, q, fb, fq)
    assert dele.tolist() == [False] * 9 + [True] * 10
    # divergent group of 9 (< MIN_MULT): kept
    b2, q2 = _stack_from_rows([f] * 9 + [alt] * 9, [[30] * 10] * 18)
    assert not astk.motif_diff(b2, q2, fb, fq).any()


def test_raise1_raises_supported_middle_base():
    """Raise1 (ReadStack.cc:645-712): a low-qual middle base in a fully
    defined 11-window with >= 3 identical Q30-middle supporters is raised
    to Q30 — unless >= 3 rows carry a Q30 alternate middle base."""
    w = astk.RAISE_WINDOW
    base_row = list(range(4)) * 3  # 12 cols, any content
    base_row = base_row[:w]
    rows = [base_row] * 4
    quals = [[37] * w] * 3 + [[37] * (w // 2) + [10] + [37] * (w // 2)]
    b, q = _stack_from_rows(rows, quals)
    q2 = astk.raise1(b, q)
    assert q2[3, w // 2] == astk.RAISE_CRITICAL_Q
    # viable alternate: 3 rows agree except a Q30-different middle
    altrow = list(base_row)
    altrow[w // 2] = (altrow[w // 2] + 1) % 4
    rows3 = [base_row] * 3 + [altrow] * 3 + [base_row]
    quals3 = [[37] * w] * 6 + [[37] * (w // 2) + [10] + [37] * (w // 2)]
    b3, q3 = _stack_from_rows(rows3, quals3)
    q4 = astk.raise1(b3, q3)
    assert q4[6, w // 2] == 10  # blocked by the alternate hypothesis
    # supporters with a zero-qual window base don't count
    quals5 = [[37] * (w - 1) + [0]] * 3 + [[37] * (w // 2) + [10] + [37] * (w // 2)]
    b5, q5 = _stack_from_rows(rows, quals5)
    q6 = astk.raise1(b5, q5)
    assert q6[3, w // 2] == 10


def test_closure_survives_repeat_copy_contamination(rng):
    """A gap whose supporting read set is contaminated by reads from a
    diverged repeat copy (10 reads sharing a consistent off-by-SNP motif
    in the flank): the stack-editing passes must drop the block and the
    closure must recover the TRUE fill rather than stalling or following
    the repeat copy."""
    g = sim.random_genome(rng, 2400)
    hole_lo, hole_hi = 1100, 1180
    read_len = 150
    # repeat copy: same flank but with 2 SNPs in the flank window and a
    # DIFFERENT interior
    copy = g.copy()
    copy[hole_lo - 40] = (copy[hole_lo - 40] + 1) % 4
    copy[hole_lo - 15] = (copy[hole_lo - 15] + 2) % 4
    copy[hole_lo:hole_hi] = (copy[hole_lo:hole_hi] + 1) % 4

    reads, quals = [], []
    q37 = lambda n=read_len: np.full(n, 37, np.uint8)
    for i in range(12):  # true covering reads (reach ~40bp into right flank)
        lo = hole_lo - 30 - i * 3
        reads.append(g[lo : lo + read_len].copy())
        quals.append(q37())
    for i in range(10):  # repeat-copy contamination
        lo = hole_lo - 30 - i * 3
        reads.append(copy[lo : lo + read_len].copy())
        quals.append(q37())
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    left = dna.codes_to_seq(g[hole_lo - 200 : hole_lo])
    right = dna.codes_to_seq(g[hole_hi : hole_hi + 200])

    class FakeGP:
        e1, e2 = 0, 1
        read_ids = list(range(rs.n_reads))

    class FakeBG:
        def edge_seq(self, e):
            return left if e == 0 else right

    fill = astk.close_gap_stack(FakeBG(), rs, FakeGP())
    assert fill is not None
    assert fill == dna.codes_to_seq(g[hole_lo:hole_hi])


def test_flag_noise_requires_glue():
    """FlagNoise (ReadStack.cc:1730-1762): a row needs a mismatch-free
    stretch of capped length >= 20 against the founder; homopolymer columns
    contribute at most 10."""
    rng = np.random.default_rng(5)
    f = rng.integers(0, 4, 60).astype(np.int8)
    f[10:40] = 2  # 30-base homopolymer island
    fb = f.copy()
    good = f.copy()                      # agrees everywhere: plenty of glue
    choppy = f.copy()
    choppy[::6] = (choppy[::6] + 1) % 4  # a mismatch every 6 columns
    homopol = np.full(60, -1, np.int8)
    homopol[10:40] = 2                   # only the homopolymer: capped at 10
    b = np.stack([good, choppy, homopol])
    q = np.full(b.shape, 30, np.int16)
    dele = astk.flag_noise(b, fb)
    assert dele.tolist() == [False, True, True]


def test_identify_shifters_drops_indel_reads():
    """IdentifyShifters (ReadStack.cc:1764-1788): after a founder
    homopolymer run >= 15, a row that matches far better when shifted one
    column is an indel artifact."""
    f = np.concatenate([
        np.full(16, 1, np.int8),             # CCC... x16 homopolymer
        np.asarray([0, 2, 3] * 10, np.int8),  # AGT AGT ...
    ])
    w = len(f)
    aligned = f.copy()
    shifted = np.empty(w, np.int8)
    shifted[:17] = 1  # one EXTRA C in the homopolymer...
    shifted[17:] = f[16 : w - 1]  # ...so all later content shifts right by 1
    b = np.stack([aligned, shifted])
    dele = astk.identify_shifters(b, f)
    assert dele.tolist() == [False, True]
    # no founder homopolymer -> no flags
    f2 = np.resize(np.asarray([0, 1, 2, 3], np.int8), w)
    assert not astk.identify_shifters(b, f2).any()


def test_defenestrate_drops_divergent_group():
    """Defenestrate (ReadStack.cc:1790-1838): a multiplicity->=2 stripe
    group differing >= 3 from the founder group goes out the window;
    low-complexity groups are ignored."""
    a = [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]          # complexity 10
    alt = [3, 1, 2, 0, 0, 1, 2, 3, 3, 1]        # 4 diffs vs a
    low = [0, 0, 0, 0, 0, 0, 0, 0, 0, 1]        # complexity 2
    rows = [a, a, alt, alt, low, low]
    b, _ = _stack_from_rows(rows, [[30] * 10] * 6)
    dele = astk.defenestrate(b)
    assert dele.tolist() == [False, False, True, True, False, False]


def test_correct_all_fixes_founder_and_trims():
    """CorrectAll (ReadStack.cc:1055-1117): a lopsided column overwrites
    the founder base at qual 0; the first unverified column sets trim_to."""
    w = 8
    founder = np.zeros(w, np.int8)
    founder[3] = 2  # founder error
    rows = [founder] + [[0] * w] * 4
    b, q = _stack_from_rows(rows, [[30] * w] * 5)
    cb, cq, trim = astk.correct_all(b, q)
    assert cb[3] == 0 and cq[3] == 0
    assert (cb[np.arange(w) != 3] == 0).all()
    assert trim == w
    # a column where support collapses starts the trim
    b2 = b.copy()
    b2[1:, 6:] = -1
    q2 = q.copy()
    q2[1:, 6:] = 0
    _, _, trim2 = astk.correct_all(b2, q2)
    assert trim2 == 6
