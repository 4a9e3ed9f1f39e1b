"""Lines of lines (FindLineLines / GetLineLineLengths, 10X/LineLine.cc)."""
from types import SimpleNamespace

import numpy as np

from supernova_tpu.asm.lines import (
    Cell,
    Line,
    Lines,
    find_line_lines,
    line_line_lengths,
)


def _line(edge):
    return Line([Cell([np.array([edge], np.int64)])])


def test_line_line_megabubble():
    # D edges (fwd 0..3, rc 4..7): 0: 0->1, then parallel 1,2: 1->2,
    # then 3: 2->3; rc component on vertices 4..7
    from_v = np.array([0, 1, 1, 2, 4, 5, 5, 6])
    to_v = np.array([1, 2, 2, 3, 5, 6, 6, 7])
    D = SimpleNamespace(from_v=from_v, to_v=to_v)
    # every edge is its own line (vertices 1, 2 branch)
    lines = Lines(
        lines=[_line(e) for e in range(8)],
        line_of_edge=np.arange(8),
        linv=np.array([7, 5, 6, 4, 3, 1, 2, 0]),
    )
    ll = find_line_lines(D, lines)
    assert ll.n_lines == 2  # one scaffold-level line + its rc
    assert np.array_equal(ll.linv, np.array([1, 0]))
    fwd = ll.lines[0]
    # [L0] [L1|L2 megabubble] [L3]
    assert len(fwd.elements) == 3
    assert len(fwd.elements[1].paths) == 2
    member_lines = sorted(int(p[0]) for p in fwd.elements[1].paths)
    assert member_lines in ([1, 2], [5, 6])

    llens = np.array([10, 5, 7, 20, 20, 5, 7, 10])
    lens2 = line_line_lengths(llens, ll)
    assert lens2.tolist() == [37, 37]  # 10 + median(5,7) + 20


def test_line_line_real_assembly(rng):
    from supernova_tpu.asm import lines as alines
    from supernova_tpu.asm import supergraph as asg
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.sim import genome as sim
    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 3000)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    lines = alines.find_lines(D)
    ll = find_line_lines(D, lines)
    assert 1 <= ll.n_lines <= lines.n_lines
    # involution is consistent
    assert np.array_equal(ll.linv[ll.linv], np.arange(ll.n_lines))
    lens2 = line_line_lengths(lines.lengths(D), ll)
    assert (lens2 > 0).all()
