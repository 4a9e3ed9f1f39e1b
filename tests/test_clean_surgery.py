"""KillLowUnique / KillLowUniqueFrac / SnipFlipSquares surgery (CleanThe/Super)."""
import numpy as np

from supernova_tpu.asm import clean as aclean
from supernova_tpu.asm.lines import Cell, Line, Lines
from supernova_tpu.asm.supergraph import SuperGraph
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.core.ragged import Ragged


class _BG:
    """Minimal base graph: only edge lengths + count."""

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


def _repeat_graph():
    # comp A: e0=[0,1] (1000 unique kmers via base 0); comp B: e1=[1]
    # (repeat-only); comp C: e2=[1,2] (30 unique kmers via base 2).
    bg = _BG([1000, 50, 30])
    return _D([[0, 1], [1], [1, 2]], [0, 5, 10], [1, 6, 11], 12, bg=bg)


def test_component_of_edges():
    D = _repeat_graph()
    comp = aclean.component_of_edges(D)
    assert comp[0] != comp[1] != comp[2] and comp[0] != comp[2]


def test_kill_low_unique():
    D = _repeat_graph()
    # base 1 is used by all three D-edges -> not unique anywhere.
    dels = aclean.kill_low_unique(D)  # MIN_UNIQ = 75
    assert dels == [1, 2]  # comp B has 0 unique kmers, comp C only 30


def test_kill_low_unique_frac():
    D = _repeat_graph()
    dels = aclean.kill_low_unique_frac(D)  # MIN_UNIQ_FRAC = 0.1
    assert dels == [1]  # comp C is 30/80 = 37% unique -> kept


def test_snip_flip_squares():
    # l3 --g--> v --{d1 (solo, weak), d2 (strong)}-->, with linv[l3]
    # entering w = to(d1): the inversion square.  d1 has no read support
    # for the g->d1 adjacency while g->d2 has 5 reads -> snip d1 (+rc).
    #        g   d1  d2  h   rc twins 4..7
    rows = [[0], [1], [2], [3], [4], [5], [6], [7]]
    from_v = [100, 1, 1, 60, 200, 202, 204, 206]
    to_v = [1, 2, 50, 2, 201, 203, 205, 207]
    dinv = [4, 5, 6, 7, 0, 1, 2, 3]
    D = _D(rows, from_v, to_v, 208, dinv=dinv)

    mk = lambda e: Line([Cell([np.array([e], np.int64)])])
    lines = Lines(
        lines=[mk(e) for e in range(8)],
        line_of_edge=np.arange(8),
        linv=np.array([3, 5, 6, 0, 7, 1, 2, 4], np.int64),
    )
    dpaths = np.asarray([[0, 2, -1]] * 5, np.int64)
    dlen = np.full(5, 2, np.int64)
    dels = aclean.snip_flip_squares(D, lines, dpaths, dlen)
    assert dels == [1, 5]

    # with strong g->d1 support the square is left alone
    dpaths2 = np.asarray([[0, 1, -1]] * 6 + [[0, 2, -1]] * 6, np.int64)
    dlen2 = np.full(12, 2, np.int64)
    assert aclean.snip_flip_squares(D, lines, dpaths2, dlen2) == []


def test_splay_line_ends():
    """A long line whose end vertex also anchors a side edge gets its end
    vertex splayed: every incident edge ends at its own fresh vertex."""
    # line edge e0 (long), rc twin e1; side edge e2 (short) + rc e3 share
    # e0's right vertex (1); topology: e0: 0->1, e2: 1->2, rc mirror:
    # e1: 3->4, e3: 5->3
    bg = _BG([6000, 6000, 100, 100])
    D = _D(
        [[0], [1], [2], [3]],
        [0, 3, 1, 5],
        [1, 4, 2, 3],
        6,
        bg=bg,
        dinv=[1, 0, 3, 2],
    )
    lines = Lines(
        [Line([Cell([np.array([0])])]), Line([Cell([np.array([1])])]),
         Line([Cell([np.array([2])])]), Line([Cell([np.array([3])])])],
        np.array([0, 1, 2, 3]),
        np.array([1, 0, 3, 2]),
    )
    llens = lines.lengths(D)
    assert llens[0] >= 5000
    n = aclean.splay_line_ends(D, lines, llens, 5000)
    assert n >= 2  # vertex 1 (e0 end + e2 start) and its mirror vertex 3
    # all four edges now meet no other edge at a shared vertex
    heads = np.concatenate([D.from_v, D.to_v])
    vals, counts = np.unique(heads, return_counts=True)
    assert counts.max() == 1
    # splay only MOVES endpoints; edge set and involution unchanged
    assert D.n_edges == 4
    assert np.array_equal(D.dinv, [1, 0, 3, 2])


def test_splay_skips_short_lines():
    bg = _BG([100, 100, 100, 100])
    D = _D(
        [[0], [1], [2], [3]],
        [0, 3, 1, 5],
        [1, 4, 2, 3],
        6,
        bg=bg,
        dinv=[1, 0, 3, 2],
    )
    lines = Lines(
        [Line([Cell([np.array([0])])]), Line([Cell([np.array([1])])]),
         Line([Cell([np.array([2])])]), Line([Cell([np.array([3])])])],
        np.array([0, 1, 2, 3]),
        np.array([1, 0, 3, 2]),
    )
    n = aclean.splay_line_ends(D, lines, lines.lengths(D), 5000)
    assert n == 0
