"""Star scaffolding: order scoring + advantage-gated joins."""
import numpy as np

from supernova_tpu.asm import star as astar


def _setup():
    # lines 0,1,2 with rc twins 3,4,5; truth: 0 then 1; 2 unrelated
    llens = np.array([10_000] * 6)
    linv = np.array([3, 4, 5, 0, 1, 2])
    lbp = {i: [] for i in range(6)}
    for bc in range(1, 31):
        # junction barcodes: cluster at 0's end and 1's start
        for j in range(5):
            lbp[0].append((bc, 9000 + 200 * j))
            lbp[1].append((bc, 200 * j))
    for bc in range(100, 110):
        # far-apart barcodes shared with line 2 (mid-line, not junction)
        for j in range(5):
            lbp[0].append((bc, 4000 + 200 * j))
            lbp[2].append((bc, 4000 + 200 * j))
    # rc twins carry the mirrored positions (as in real placements)
    for i in range(3):
        lbp[int(linv[i])] = [
            (bc, int(llens[i]) - p) for bc, p in lbp[i]
        ]
    return llens, linv, lbp


def test_score_order_prefers_true_order():
    llens, linv, lbp = _setup()
    good = astar.score_order([0, 1], lbp, llens)
    bad = astar.score_order([1, 0], lbp, llens)
    assert good < bad
    assert bad - good > astar.MIN_ADVANTAGE


def test_star_joins_picks_true_neighbor():
    llens, linv, lbp = _setup()
    lhood = {0: [(30, 1), (10, 2)]}
    rdead = {i: True for i in range(6)}
    joins = astar.star_joins(range(6), llens, linv, lbp, lhood, rdead)
    assert [(a, b) for a, b, _ in joins] == [(0, 1)]

    scaffolds = astar.build_scaffolds(6, linv, joins, llens)
    chains = sorted(tuple(sc.line_ids) for sc in scaffolds if len(sc.line_ids) > 1)
    assert chains == [(0, 1)] or chains == [(4, 3)]


def test_bridge_veto_refuses_repeat_mediated_join():
    """Two long lines sharing a repeat copy at INTERIOR positions (the 10 Mb
    rung's dis-class chimera signature: LineProx fires, order scoring can
    clear MIN_ADVANTAGE, but no barcode sits near the join point on both
    sides) must not be joined; a true junction-supported join must be."""
    llens = np.array([100_000] * 4)
    linv = np.array([2, 3, 0, 1])
    lbp = {i: [] for i in range(4)}
    # repeat-leak barcodes: line 0 carries them near its right end (the
    # repeat copy sits at 95 kb), line 1 carries them at an interior copy
    # (60 kb in) — their consecutive ordering 0-then-1 looks consistent to
    # ScoreOrder, but nothing bridges the join point on line 1's side.
    for bc in range(1, 41):
        for j in range(5):
            lbp[0].append((bc, 95_000 + 200 * j))
            lbp[1].append((bc, 60_000 + 200 * j))
    for i in range(2):
        lbp[int(linv[i])] = [(bc, int(llens[i]) - p) for bc, p in lbp[i]]
    assert astar.bridge_support(0, 1, lbp, llens) == 0
    lhood = {0: [(40, 1)]}
    rdead = {i: True for i in range(4)}
    joins = astar.star_joins(range(4), llens, linv, lbp, lhood, rdead)
    assert joins == []
    # move line 1's copy of the shared barcodes to its left start: now the
    # evidence is junction-shaped and the join goes through
    lbp2 = {i: [] for i in range(4)}
    for bc in range(1, 41):
        for j in range(5):
            lbp2[0].append((bc, 95_000 + 200 * j))
            lbp2[1].append((bc, 200 * j))
    for i in range(2):
        lbp2[int(linv[i])] = [(bc, int(llens[i]) - p) for bc, p in lbp2[i]]
    assert astar.bridge_support(0, 1, lbp2, llens) == 40
    joins2 = astar.star_joins(range(4), llens, linv, lbp2, lhood, rdead)
    assert [(a, b) for a, b, _ in joins2] == [(0, 1)]


def test_bridge_veto_is_the_blocking_gate():
    """ADVICE r3 (medium): the veto test must not be vacuous — construct a
    false join that CLEARS MIN_ADVANTAGE with zero join-point bridge
    support.  min_bridge=0 admits it (the advantage gate alone cannot block
    it); default params refuse it; widening bridge_view past the evidence
    admits it again (the view knob plumbs through)."""
    llens = np.array([100_000] * 4)
    linv = np.array([2, 3, 0, 1])
    lbp = {i: [] for i in range(4)}
    # shared barcodes: spread along line 0's right third (tight mean gap),
    # cluster on line 1 at 25 kb — OUTSIDE the 20 kb bridge window but
    # order-informative, the repeat-leak signature at Mb separations
    for bc in range(1, 41):
        for j in range(20):
            lbp[0].append((bc, 60_000 + 1_800 * j))
        for j in range(5):
            lbp[1].append((bc, 25_000 + 200 * j))
    # private barcodes balancing line 1's coverage (the MAX_CN_DIFF gate
    # must not be what rejects the join)
    for bc in range(200, 240):
        for j in range(20):
            lbp[1].append((bc, 1_000 + 4_800 * j))
    for i in range(2):
        lbp[int(linv[i])] = [(bc, int(llens[i]) - p) for bc, p in lbp[i]]
    assert astar.bridge_support(0, 1, lbp, llens) == 0
    lhood = {0: [(40, 1)]}
    rdead = {i: True for i in range(4)}
    # without the veto the join IS made: advantage/CN/order gates all pass
    joins_no_veto = astar.star_joins(
        range(4), llens, linv, lbp, lhood, rdead, min_bridge=0
    )
    assert [(a, b) for a, b, _ in joins_no_veto] == [(0, 1)]
    # with the default veto it is refused — the veto is the blocking gate
    assert astar.star_joins(range(4), llens, linv, lbp, lhood, rdead) == []
    # widening the view to cover the 25 kb cluster re-admits it
    joins_wide = astar.star_joins(
        range(4), llens, linv, lbp, lhood, rdead, bridge_view=30_000
    )
    assert [(a, b) for a, b, _ in joins_wide] == [(0, 1)]


def test_build_scaffolds_involution_consistent():
    llens = np.array([6000] * 4)
    linv = np.array([2, 3, 0, 1])
    joins = [(0, 1, 100.0)]
    scs = astar.build_scaffolds(4, linv, joins, llens)
    multi = [sc for sc in scs if len(sc.line_ids) > 1]
    assert len(multi) == 1  # the rc-mirror chain is not emitted twice


def test_score_order_matches_reference_loop(rng):
    """Vectorized ScoreOrder == the original per-record loop."""
    from supernova_tpu.asm.star import MIN_ADD, lbp_arrays, score_order

    def oracle(order, lbp, llens):
        recs = []
        pos = 0
        for i, li in enumerate(order):
            for bc, p in lbp.get(li, ()):
                recs.append((bc, i, pos + p))
            pos += int(llens[li])
        recs.sort()
        ad, k, n = 0.0, 0, len(recs)
        while k < n:
            l = k + 1
            while l < n and recs[l][0] == recs[k][0]:
                l += 1
            cnt = l - k - 1
            if cnt > 0:
                span = recs[l - 1][2] - recs[k][2]
                mean_gap = span / cnt if span > 0 else 1.0
                if mean_gap > 0:
                    for z in range(k + 1, l):
                        if recs[z][1] > recs[z - 1][1]:
                            plus = (recs[z][2] - recs[z - 1][2]) / mean_gap
                            if plus >= MIN_ADD:
                                ad += plus
            k = l
        return ad

    for trial in range(20):
        nl = int(rng.integers(2, 5))
        llens = rng.integers(500, 5000, nl)
        lbp = {}
        for li in range(nl):
            k = int(rng.integers(0, 30))
            lbp[li] = [
                (int(rng.integers(1, 12)), int(rng.integers(0, llens[li])))
                for _ in range(k)
            ]
        order = list(rng.permutation(nl))
        got = score_order(order, lbp, llens)
        got2 = score_order(order, lbp_arrays(lbp), llens)
        want = oracle(order, lbp, llens)
        assert abs(got - want) < 1e-9 and abs(got2 - want) < 1e-9
