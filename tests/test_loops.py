"""Simple-loop capture: tandem repeats collapse to self-loop edges that the
line walks through instead of breaking at."""
import numpy as np
import pytest

from supernova_tpu.asm import lines as alines
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset


def test_tandem_repeat_loop_capture(rng):
    left = sim.random_genome(rng, 1200)
    unit = sim.random_genome(rng, 120)
    right = sim.random_genome(rng, 1200)
    g = np.concatenate([left, np.tile(unit, 4), right])
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    has_loop = bool((D.from_v == D.to_v).any())
    lines = alines.find_lines(D)
    # every edge belongs to some line
    assert (lines.line_of_edge >= 0).all()
    if has_loop:
        # the loop rides inside a line rather than isolating it
        loop_edges = np.nonzero(D.from_v == D.to_v)[0]
        for le in loop_edges:
            li = lines.line_of_edge[le]
            assert len(lines.lines[li].elements) >= 1
    # involution still valid
    assert np.array_equal(lines.linv[lines.linv], np.arange(lines.n_lines))
