"""Seed-chain validation in the pather (algorithmTwo junction checks).

Reference: HBVPather::algorithmTwo validates captured gaps (same-edge seed
pairs across a miss gap, jitter <= 3) and graph adjacency between seeds,
dropping chimeric seeds (BuildReadQGraph48.cc:1185-1438).
"""
import numpy as np

from supernova_tpu.align import pather
from supernova_tpu.sim import genome as sim
from tests.test_bads_extend import build_graph_and_paths


def _find_read(rs, read):
    for r in range(rs.n_reads):
        if np.array_equal(rs.read(r), read):
            return r
    return None


def test_error_read_rejoins_across_miss(rng):
    """An isolated mid-read error only kills the kmers covering it; the
    same-edge runs on either side re-join into one slot (captured gap)."""
    g = sim.random_genome(rng, 2000)
    read = g[400:550].copy()
    read[75] = (read[75] + 1) % 4
    q = np.full(150, 37, np.uint8)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [read, g[900:1050].copy()], [q, q.copy()]
    )
    r = _find_read(rs, read)
    assert r is not None
    assert plen[r] == 1  # one slot, not two


def test_chimeric_read_is_split(rng):
    """A chimera joining two distant genome windows must NOT keep both
    pieces in one path: the junction fails validation and only the longer
    valid segment survives."""
    g = sim.random_genome(rng, 4000)
    chimera = np.concatenate([g[200:260], g[2600:2690]])  # 60 + 90 bases
    q = np.full(150, 37, np.uint8)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [chimera, g[1200:1350].copy()], [q, q.copy()]
    )
    r = _find_read(rs, chimera)
    assert r is not None
    if plen[r] > 0:
        # single-unipath genome: both halves map to the same edge but at
        # incompatible offsets -> at most one piece survives, and its
        # offset must spell the surviving (longer) piece correctly
        assert plen[r] == 1
        e = int(edges[r, 0])
        seq = bg.edges.row(e)
        o = int(off[r])
        fs = int(np.asarray(pather.path_readset(bg, rs).first_skip)[r])
        # the kept seed's implied alignment places read[fs:] at seq[o+fs:]
        span = seq[o + fs : o + fs + 40]
        assert np.array_equal(span, chimera[fs : fs + 40])


def test_large_deletion_read_keeps_longer_arm(rng):
    """A read with an internal 60bp deletion relative to the graph: the
    two arms land on the same edge at offsets differing by 60 (>JITTER),
    so they may not merge into one slot — the longer arm wins."""
    g = sim.random_genome(rng, 3000)
    read = np.concatenate([g[500:550], g[610:710]])  # 50 + 100 bases
    q = np.full(150, 37, np.uint8)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [read, g[1500:1650].copy()], [q, q.copy()]
    )
    r = _find_read(rs, read)
    assert r is not None
    assert plen[r] <= 1
    if plen[r] == 1:
        # the survivor is the longer (second) arm: its alignment offset
        # matches genome position 610 - 50 (read coords)
        rp = pather.path_readset(bg, rs)
        fs = int(np.asarray(rp.first_skip)[r])
        assert fs >= 50 - 3  # first arm's seeds were dropped
