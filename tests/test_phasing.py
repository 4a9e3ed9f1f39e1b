"""Flipper phasing search: move set (rectify/pivot/fix-columns), ugly-bubble
dropping, and weak-pivot phase blocks (10X/Flipper.cc:20-29,389-652)."""
import numpy as np
import pytest

from supernova_tpu.asm import phasing as ph
from supernova_tpu.asm.lines import Cell, Line


def make_line(n_bubbles):
    """A line of n bubbles, arm edges 2i / 2i+1, separated by straights."""
    els = []
    e = 0
    straight = 10_000
    for i in range(n_bubbles):
        els.append(Cell(paths=[np.array([straight + i])]))
        els.append(Cell(paths=[np.array([2 * i]), np.array([2 * i + 1])]))
    els.append(Cell(paths=[np.array([straight + n_bubbles])]))
    return Line(elements=els)


def counts_from_matrix(sgn):
    """edge_bc_counts dict from a bubble x molecule sign matrix: molecule m
    supports arm0 of bubble b when sgn[b, m] == +1, arm1 when -1."""
    out = {}
    nb, nm = sgn.shape
    for b in range(nb):
        for m in range(nm):
            v = int(sgn[b, m])
            if v == 0:
                continue
            arm_edge = 2 * b if v > 0 else 2 * b + 1
            out.setdefault(arm_edge, {})[m + 1] = 3  # bc ids start at 1
    return out


def sim_molecules(rng, truth, n_mol, span, flip_frac=0.0):
    """Molecules covering `span` consecutive bubbles, reporting truth (or its
    flip for a flip_frac fraction of entries)."""
    nb = len(truth)
    sgn = np.zeros((nb, n_mol), dtype=np.int8)
    for m in range(n_mol):
        start = rng.integers(0, max(nb - span, 0) + 1)
        hap = rng.integers(0, 2) * 2 - 1  # which haplotype the molecule is
        for b in range(start, min(start + span, nb)):
            v = truth[b] * hap
            if rng.random() < flip_frac:
                v = -v
            sgn[b, m] = v
    return sgn


def agreement(x, truth):
    """Phasing is defined up to a global flip per block; compare both."""
    x = np.asarray(x, int)
    keep = x != 0
    if not keep.any():
        return 0.0
    same = (x[keep] == truth[keep]).mean()
    return max(same, 1.0 - same)


def test_recovers_random_truth(rng):
    nb = 40
    truth = rng.integers(0, 2, nb) * 2 - 1
    sgn = sim_molecules(rng, truth, n_mol=200, span=6, flip_frac=0.02)
    line = make_line(nb)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    assert (res.x != 0).mean() > 0.9
    assert agreement(res.x, truth) == 1.0
    # plenty of coverage: one dominant block (ends may split off — boundary
    # coverage is thin there and the pivot is genuinely uncertain)
    assert max(b[1] - b[0] for b in res.blocks) >= 0.9 * nb


def test_pivot_move_fixes_prefix_flip(rng):
    """A half-and-half truth needs the pivot move: molecules straddle the
    midpoint, so greedy single flips get stuck at the all-+ start."""
    nb = 30
    truth = np.array([1] * 15 + [-1] * 15)
    sgn = sim_molecules(rng, truth, n_mol=150, span=8, flip_frac=0.0)
    line = make_line(nb)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    assert agreement(res.x, truth) == 1.0


def test_weak_pivot_breaks_uncovered_boundary(rng):
    """No molecule bridges bubbles 9|10 -> pivot advantage 0 > MAX_PIVOT_OK
    -> the phasing must break there."""
    nb = 20
    truth = np.ones(nb, dtype=int)
    sgn_l = sim_molecules(rng, truth[:10], n_mol=80, span=4)
    sgn_r = sim_molecules(rng, truth[10:], n_mol=80, span=4)
    sgn = np.zeros((nb, 160), dtype=np.int8)
    sgn[:10, :80] = sgn_l
    sgn[10:, 80:] = sgn_r
    line = make_line(nb)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    starts = [b[0] for b in res.blocks]
    assert 10 in starts


def test_ugly_bubble_dropped(rng):
    """A bubble whose molecules split ~50/50 is ambiguous (good/bad < 4) and
    must come out unphased (x == 0)."""
    nb = 12
    truth = np.ones(nb, dtype=int)
    sgn = sim_molecules(rng, truth, n_mol=120, span=5, flip_frac=0.0)
    bad_b = 6
    flip = rng.random(sgn.shape[1]) < 0.5
    sgn[bad_b, flip & (sgn[bad_b] != 0)] *= -1
    line = make_line(nb)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    assert res.x[bad_b] == 0
    good = np.delete(np.arange(nb), bad_b)
    assert agreement(res.x[good], truth[good]) == 1.0


def test_rectify_beats_columnwise_greedy():
    """Hand-built case where single-column flips are each score-neutral but
    rectifying a molecule (flipping its whole minority set) improves: two
    strong molecules agree on {0,1} vs {2,3}; a third weak molecule ties the
    columns individually."""
    # molecules: 2x (+,+,-,-), 1x (-,-,+,+), each replicated 4x so bubbles
    # clear the MIN_GOOD_BAD_RATIO support bar
    base = np.array(
        [
            [1, 1, -1],
            [1, 1, -1],
            [-1, -1, 1],
            [-1, -1, 1],
        ],
        dtype=np.int8,
    )
    sgn = np.repeat(base, 4, axis=1)
    line = make_line(4)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    # optimum: all 12 molecules fully in phase, score = 12 * 4
    assert res.score == 48.0
    x = np.asarray(res.x, int)
    assert abs(x.sum()) == 0 or set(np.abs(x)) == {1}
    assert x[0] == x[1] and x[2] == x[3] and x[0] == -x[2]


def test_no_molecules():
    line = make_line(5)
    res = ph.phase_line(line, {})
    assert (np.asarray(res.x) == 0).all()
    assert res.score == 0.0


def test_empty_line():
    line = Line(elements=[Cell(paths=[np.array([7])])])
    res = ph.phase_line(line, {})
    assert len(res.bubbles) == 0


def test_chimeric_molecule_collision_split(rng):
    """Same-GEM molecule collisions (two true molecules from opposite
    haplotypes merged by positional clustering — dominant at small sim
    scale, hot-barcode noise at full scale): without splitting, every
    bubble such a column touches looks ugly (good:bad ~ 1:1) and gets
    dropped; _split_chimeric must recover near-full phasing."""
    nb = 12
    truth = rng.integers(0, 2, nb) * 2 - 1
    clean = sim_molecules(rng, truth, 30, span=6)
    # 20 chimeric columns: each merges a hap+ and a hap- molecule over the
    # SAME bubble range, voting both ways bubble-by-bubble
    chim = np.zeros((nb, 20), dtype=np.int8)
    for m in range(20):
        start = rng.integers(0, nb - 6 + 1)
        for b in range(start, start + 6):
            chim[b, m] = truth[b] * (1 if rng.random() < 0.5 else -1)
    sgn = np.concatenate([clean, chim], axis=1)
    line = make_line(nb)
    res = ph.phase_line(line, counts_from_matrix(sgn))
    x = np.asarray(res.x, int)
    assert (x != 0).mean() >= 0.9, x  # bubbles stay phased
    assert agreement(x, truth) >= 0.95


def test_split_chimeric_columns():
    A = np.array([[1, 1], [1, -1], [1, 1], [-1, -1], [0, 1]], np.int32)
    out = ph._split_chimeric(A)
    # column 1 (two +, two -) splits; column 0 has only one minority vote
    assert out.shape == (5, 3)
    assert (out[:, 1] >= 0).all() and (out[:, 2] <= 0).all()
    assert np.array_equal(out[:, 1] + out[:, 2], A[:, 1])
