"""BarcodeJoin link search + surgery (10X/CleanThe.cc:205-606 analogue)."""
import numpy as np

from supernova_tpu.asm import barcode_join as abj
from supernova_tpu.asm import lines as alines
from supernova_tpu.asm.supergraph import SuperGraph
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.core.ragged import Ragged


class _BG:
    def __init__(self, kmers):
        self._k = np.asarray(kmers, np.int64)
        self.n_edges = len(self._k)
        bg = self

        class _E:
            @staticmethod
            def lengths():
                return bg._k + (K - 1)

        self.edges = _E()


def _D(rows, from_v, to_v, nv, bg=None, dinv=None):
    n = len(rows)
    return SuperGraph(
        epaths=Ragged.from_rows([np.asarray(r, np.int64) for r in rows]),
        dinv=np.asarray(dinv if dinv is not None else range(n), np.int64),
        from_v=np.asarray(from_v, np.int64),
        to_v=np.asarray(to_v, np.int64),
        n_vertices=nv,
        bg=bg,
    )


LLEN = 12_000


def _two_line_fixture():
    """Two long lines (e0, e1) with rc partners (e3, e2), all dead ends."""
    bg = _BG([LLEN - K + 1] * 4)
    D = _D(
        [[0], [1], [2], [3]],
        [0, 2, 4, 6],
        [1, 3, 5, 7],
        8,
        bg=bg,
        dinv=[3, 2, 1, 0],
    )
    lines = alines.find_lines(D)
    return D, lines


def _junction_lbp(lines, D, n_bc=40):
    """Barcode positions spanning L1-end -> L2-start (and the rc mirror),
    strong enough to clear MIN_ADVANTAGE."""
    llens = lines.lengths(D)
    l_of_e = lines.line_of_edge
    L1, L2 = int(l_of_e[0]), int(l_of_e[1])
    RL1, RL2 = int(lines.linv[L1]), int(lines.linv[L2])
    lbp = {li: [] for li in range(lines.n_lines)}
    for b in range(n_bc):
        p1s = [11_000 + 40 * b + 100 * j for j in range(4)]  # right end of L1
        p2s = [100 + 40 * b + 100 * j for j in range(4)]  # left start of L2
        for p in p1s:
            lbp[L1].append((b, p))
            lbp[RL1].append((b, int(llens[L1]) - p))
        for p in p2s:
            lbp[L2].append((b, p))
            lbp[RL2].append((b, int(llens[L2]) - p))
    return lbp, (L1, L2, RL1, RL2)


def _full_lhood(lines, n_shared=40):
    return {
        li: [
            (n_shared, lj)
            for lj in range(lines.n_lines)
            if lj != li
        ]
        for li in range(lines.n_lines)
    }


def test_links_found_and_symmetric():
    D, lines = _two_line_fixture()
    llens = lines.lengths(D)
    lbp, (L1, L2, RL1, RL2) = _junction_lbp(lines, D)
    lhood = _full_lhood(lines)
    cov = np.ones(lines.n_lines)
    links = abj.barcode_join_links(lines, D, llens, lbp, lhood, cov)
    assert (L1, L2) in links
    assert (RL2, RL1) in links  # the rc mirror must be independently found


def test_cn_gate_blocks_link():
    D, lines = _two_line_fixture()
    llens = lines.lengths(D)
    lbp, (L1, L2, RL1, RL2) = _junction_lbp(lines, D)
    lhood = _full_lhood(lines)
    cov = np.ones(lines.n_lines)
    cov[L2] = 2.0  # CN mismatch >> MAX_CN_DIFF
    links = abj.barcode_join_links(lines, D, llens, lbp, lhood, cov)
    assert (L1, L2) not in links


def test_type1_join_adds_gap_edges():
    D, lines = _two_line_fixture()
    lbp, (L1, L2, RL1, RL2) = _junction_lbp(lines, D)
    D2, n = abj.apply_barcode_joins(D, lines, [(L1, L2), (RL2, RL1)])
    assert n == 1
    gmask = D2.gap_mask()
    assert gmask.sum() == 2  # {-2} edge + rc partner
    gaps = np.nonzero(gmask)[0]
    g = int(gaps[0])
    # joins right end of e0 to left end of e1 (or the rc image)
    ends = {(int(D2.from_v[d]), int(D2.to_v[d])) for d in gaps}
    assert (1, 2) in ends  # to_v[e0] -> from_v[e1]
    assert (5, 6) in ends  # to_v[e2] -> from_v[e3] (rc mirror)
    assert int(D2.dinv[g]) in gaps.tolist()
    # lines of the joined graph merge L1 and L2
    lines2 = alines.find_lines(D2)
    loe = lines2.line_of_edge
    assert loe[0] == loe[1] == loe[g]


def test_type2_shared_vertex_detach():
    # e0 -> v -> e1 with clutter edge e4 also leaving v: not a dead end,
    # no intermediates, shared vertex => detach onto a fresh vertex
    bg = _BG([LLEN - K + 1] * 4 + [100])
    D = _D(
        [[0], [1], [2], [3], [4]],
        [0, 1, 4, 6, 1],
        [1, 2, 5, 7, 3],
        8,
        bg=bg,
        dinv=[3, 2, 1, 0, 4],
    )
    lines = alines.find_lines(D)
    loe = lines.line_of_edge
    L1, L2 = int(loe[0]), int(loe[1])
    RL1, RL2 = int(lines.linv[L1]), int(lines.linv[L2])
    assert len({L1, L2, RL1, RL2}) == 4
    D2, n = abj.apply_barcode_joins(D, lines, [(L1, L2), (RL2, RL1)])
    assert n == 1
    assert D2.n_edges == D.n_edges  # no new edges, just rewiring
    assert int(D2.to_v[0]) == int(D2.from_v[1])  # joined at a fresh vertex
    assert int(D2.to_v[0]) >= 8
    assert int(D2.from_v[4]) != int(D2.from_v[1])  # clutter left behind
    # rc pair joined at the sibling fresh vertex
    assert int(D2.to_v[2]) == int(D2.from_v[3])
    assert int(D2.to_v[2]) != int(D2.to_v[0])
    lines2 = alines.find_lines(D2)
    assert lines2.line_of_edge[0] == lines2.line_of_edge[1]


def test_type2_intermediate_duplication():
    # L1(e0) -> mid(e1, short) -> L2(e2), with clutter entering mid's left
    # vertex (e6) and leaving its right vertex (e8): mid is its own line
    # serving other contexts, so the join must duplicate it
    km = [LLEN - K + 1, 500, LLEN - K + 1] * 2 + [100, 100, 100, 100]
    bg = _BG(km)
    # edges: 0:L1[0->1] 1:mid[1->2] 2:L2[2->3] 3:rcL2[4->5] 4:rcmid[5->6]
    # 5:rcL1[6->7] 6:cl_in[11->1] 7:rc_cl_in[6->13] 8:cl_out[2->12]
    # 9:rc_cl_out[14->5]
    D = _D(
        [[0], [1], [2], [3], [4], [5], [6], [7], [8], [9]],
        [0, 1, 2, 4, 5, 6, 11, 6, 2, 14],
        [1, 2, 3, 5, 6, 7, 1, 13, 12, 5],
        15,
        bg=bg,
        dinv=[5, 4, 3, 2, 1, 0, 7, 6, 9, 8],
    )
    lines = alines.find_lines(D)
    loe = lines.line_of_edge
    assert loe[0] != loe[1] != loe[2]  # mid is its own line
    L1, L2 = int(loe[0]), int(loe[2])
    RL1, RL2 = int(lines.linv[L1]), int(lines.linv[L2])
    assert len({L1, L2, RL1, RL2}) == 4
    E0 = D.n_edges
    D2, n = abj.apply_barcode_joins(D, lines, [(L1, L2), (RL2, RL1)])
    assert n == 1
    assert D2.n_edges > E0  # mid was duplicated
    # e0 now feeds a copy of mid, which feeds e2
    v1 = int(D2.to_v[0])
    assert v1 >= 10
    copies = [
        d for d in range(E0, D2.n_edges) if int(D2.from_v[d]) == v1
    ]
    assert copies, "no duplicated mid edge leaving e0's new vertex"
    assert any(int(D2.to_v[d]) == int(D2.from_v[2]) for d in copies)
    # involution still valid
    assert np.array_equal(D2.dinv[D2.dinv], np.arange(D2.n_edges))
    # original mid edge still in place for the clutter context
    assert int(D2.from_v[1]) == 1 and int(D2.to_v[1]) == 2
    lines2 = alines.find_lines(D2)
    assert lines2.line_of_edge[0] == lines2.line_of_edge[2]
