"""PullApart / Decycle on hand-built supergraphs."""
import numpy as np

from supernova_tpu.asm import pullapart as apull
from supernova_tpu.asm.supergraph import SuperGraph
from supernova_tpu.core.ragged import Ragged


def _D(rows, dinv, from_v, to_v, nv):
    return SuperGraph(
        epaths=Ragged.from_rows([np.asarray(r, np.int64) for r in rows]),
        dinv=np.asarray(dinv, np.int64),
        from_v=np.asarray(from_v, np.int64),
        to_v=np.asarray(to_v, np.int64),
        n_vertices=nv,
        bg=None,
    )


def test_pull_apart_type1():
    # {d1,d2} -> v -> e -> w -> {f1,f2}, with the rc side mirrored:
    # {rf1,rf2} -> w' -> re -> v' -> {rd1,rd2}
    #         d1  d2  e   f1  f2  rd1 rd2 re  rf1 rf2
    rows = [[10], [11], [12], [13], [14], [20], [21], [22], [23], [24]]
    from_v = [2, 3, 0, 1, 1, 10, 10, 11, 14, 15]
    to_v = [0, 0, 1, 4, 5, 12, 13, 10, 11, 11]
    dinv = [5, 6, 7, 8, 9, 0, 1, 2, 3, 4]
    D = _D(rows, dinv, from_v, to_v, 16)

    mp = 4
    paths = []
    for _ in range(6):
        paths.append([0, 2, 3, -1])  # d1 e f1
        paths.append([-1] * mp)
    for _ in range(6):
        paths.append([1, 2, 4, -1])  # d2 e f2
        paths.append([-1] * mp)
    dpaths = np.asarray(paths, np.int64)
    dlen = np.asarray([3, 0] * 12, np.int64)

    D2, n = apull.pull_apart(D, dpaths, dlen)
    assert n == 1
    # d1-e-f1 and d2-e'-f2 compact into separate chains
    chains = sorted(
        tuple(D2.epaths.row(d).tolist()) for d in range(D2.n_edges)
    )
    assert (10, 12, 13) in chains
    assert (11, 12, 14) in chains
    assert np.array_equal(D2.dinv[D2.dinv], np.arange(D2.n_edges))


def test_pull_apart_rejects_crossing_support():
    rows = [[10], [11], [12], [13], [14], [20], [21], [22], [23], [24]]
    from_v = [2, 3, 0, 1, 1, 20, 22, 24, 26, 28]
    to_v = [0, 0, 1, 4, 5, 21, 23, 25, 27, 29]
    dinv = [5, 6, 7, 8, 9, 0, 1, 2, 3, 4]
    D = _D(rows, dinv, from_v, to_v, 30)
    mp = 4
    paths = []
    for _ in range(6):
        paths.append([0, 2, 3, -1])
        paths.append([1, 2, 3, -1])  # crossing d2->f1 evidence
    dpaths = np.asarray(paths, np.int64)
    dlen = np.full(len(paths), 3, np.int64)
    _, n = apull.pull_apart(D, dpaths, dlen)
    assert n == 0


def test_decycle_removes_unsupported_back_edge():
    #  a -> v -> d -> w -> b  with unsupported back edge c: w -> v
    #     a    d    c    b    ra   rd   rc   rb
    rows = [[1], [2], [3], [4], [11], [12], [13], [14]]
    from_v = [5, 0, 1, 1, 20, 22, 24, 26]
    to_v = [0, 1, 0, 6, 21, 23, 25, 27]
    dinv = [4, 5, 6, 7, 0, 1, 2, 3]
    D = _D(rows, dinv, from_v, to_v, 28)
    dpaths = np.asarray([[0, 1, 3, -1], [-1, -1, -1, -1]] * 5, np.int64)
    dlen = np.asarray([3, 0] * 5, np.int64)
    dels = apull.decycle(D, dpaths, dlen)
    assert 2 in dels and 6 in dels


def test_compound_hangs():
    """A short hanging subtree beside a long continuation is deleted."""
    from types import SimpleNamespace

    from supernova_tpu.asm.clean import compound_hangs
    from supernova_tpu.core.kmer_codec import K

    # v0 --a--> v1 --{long b, short hang c -> d}--> ...
    # ids:       a  b  c  d   ra rb rc rd
    rows = [[0], [1], [2], [3], [10], [11], [12], [13]]
    from supernova_tpu.asm.supergraph import SuperGraph
    from supernova_tpu.core.ragged import Ragged
    import numpy as np

    class BG:
        class E:
            @staticmethod
            def lengths():
                #                 a      b     c    d    and rc twins
                return np.array([2000, 9000, 120, 100, 2000, 9000, 120, 100]) + (K - 1)

        edges = E()

    D = SuperGraph(
        epaths=Ragged.from_rows([np.array([i]) for i in range(8)]),
        dinv=np.array([4, 5, 6, 7, 0, 1, 2, 3]),
        from_v=np.array([0, 1, 1, 2, 20, 21, 22, 23]),
        to_v=np.array([1, 10, 2, 3, 30, 31, 32, 33]),
        n_vertices=40,
        bg=BG(),
    )
    dels = compound_hangs(D)
    assert 2 in dels and 6 in dels  # the short branch + its rc twin
    assert 1 not in dels and 0 not in dels
