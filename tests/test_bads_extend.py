"""MarkBads + path extension behavior."""
import numpy as np
import pytest

from supernova_tpu.asm import bads as abads
from supernova_tpu.align import pather
from supernova_tpu.core import dna
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.ingest.reads import build_readset
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset


def build_graph_and_paths(rng, g, extra_reads=(), extra_quals=()):
    rs0 = perfect_readset(g)
    reads = [rs0.read(i) for i in range(rs0.n_reads)] + list(extra_reads)
    quals = [rs0.qual(i) for i in range(rs0.n_reads)] + list(extra_quals)
    if len(reads) % 2:
        reads.append(reads[-1].copy())
        quals.append(quals[-1].copy())
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    off = np.asarray(rp.offset)[: rs.n_reads]
    return rs, bg, edges, plen, off


def test_mark_bads(rng):
    g = sim.random_genome(rng, 2000)
    # a read with 8 high-qual mismatches in its unmatched tail region
    bad_read = g[300:450].copy()
    bad_read[100:140:5] = (bad_read[100:140:5] + 1) % 4
    bq = np.full(150, 37, np.uint8)
    filler = g[800:950].copy()  # clean mate so the bad read isn't duplicated
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [bad_read, filler], [bq, np.full(150, 37, np.uint8)]
    )
    bad = abads.mark_bads(bg, rs, edges, plen, off)
    # locate our read (readset is sorted, but unbarcoded keeps order)
    target = None
    for r in range(rs.n_reads):
        if np.array_equal(rs.read(r), bad_read):
            target = r
            break
    assert target is not None
    if plen[target] > 0:
        assert bad[target]
    # clean reads aren't flagged
    assert bad.sum() <= 2


def test_extend_paths_through_unique_walk(rng):
    g = sim.random_genome(rng, 2000)
    # a read whose tail quals are low: trimmed kmers shorten its path span
    read = g[500:650].copy()
    q = np.full(150, 37, np.uint8)
    q[100:] = 2  # tail never contributes kmers
    rs, bg, edges, plen, off = build_graph_and_paths(rng, g, [read], [q])
    # with a single-unipath graph there is nothing to extend INTO (path
    # already on the only edge) — craft a case on a repeat genome instead
    g2 = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=250)
    rs2, bg2, e2, p2, o2 = build_graph_and_paths(rng, g2)
    new_e, new_p, new_o, n_ext = abads.extend_paths(bg2, rs2, e2, p2, o2)
    # extension never corrupts: spans still spell the reads
    for r in range(0, rs2.n_reads, 17):
        if new_p[r] == 0:
            continue
        span = abads.spell_read_span(
            bg2, new_e[r, : new_p[r]], int(new_o[r]), len(rs2.read(r))
        )
        if span is not None and len(span) >= len(rs2.read(r)):
            assert np.array_equal(span[: len(rs2.read(r))], rs2.read(r))


def _find_read(rs, read):
    for r in range(rs.n_reads):
        if np.array_equal(rs.read(r), read):
            return r
    return None


def test_extend_forward_through_fork_by_qual(rng):
    """A read whose tail kmers are qual-trimmed extends through a het
    bubble: the arm matching the read wins the qual-weighted fork score."""
    g = sim.random_genome(rng, 4000)
    g2 = g.copy()
    g2[2000] = (g2[2000] + 1) % 4  # SNP -> bubble in the union graph
    # read spans the SNP; low-qual tail beyond position 90 contributes no
    # kmers, so the seeded path stops short of the bubble
    read = g[1940:2090].copy()
    q = np.full(150, 37, np.uint8)
    q[90:] = 2
    rs0 = perfect_readset(g)
    rs1 = perfect_readset(g2)
    reads = [rs0.read(i) for i in range(rs0.n_reads)]
    reads += [rs1.read(i) for i in range(rs1.n_reads)]
    quals = [np.full(len(r), 37, np.uint8) for r in reads]
    reads.append(read)
    quals.append(q)
    if len(reads) % 2:
        reads.append(reads[0].copy())
        quals.append(quals[0].copy())
    rs = build_readset(reads, quals, np.zeros(len(reads) // 2, np.int32),
                       n_barcodes=0, barcoded=False)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2),
                              pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    off = np.asarray(rp.offset)[: rs.n_reads]
    r = _find_read(rs, read)
    assert r is not None and plen[r] >= 1
    new_e, new_p, new_o, n_ext = abads.extend_paths(bg, rs, edges, plen, off)
    span = abads.spell_read_span(
        bg, new_e[r, : new_p[r]], int(new_o[r]), len(read)
    )
    assert span is not None
    # extension reached past the low-qual boundary and chose the g arm
    assert len(span) > 90
    assert np.array_equal(span[:140], read[:140])


def test_extend_backward(rng):
    """A read whose HEAD kmers are qual-killed gets a negative-offset fix:
    backward extension prepends edges and shifts the offset."""
    g = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=250)
    rs0, bg0, e0, p0, o0 = build_graph_and_paths(rng, g)
    # need a multi-edge graph for backward walks to exist
    if bg0.n_edges < 2:
        return
    neg = np.nonzero((p0 >= 1) & (o0 < 0))[0]
    new_e, new_p, new_o, _ = abads.extend_paths(rs=rs0, bg=bg0,
                                                paths_edges=e0, path_len=p0,
                                                offset=o0)
    # every placement that was left-hanging either got fixed or stayed put;
    # all updated placements still spell their read
    for r in neg[:50]:
        assert new_o[r] >= o0[r]
        if new_o[r] >= 0 and new_p[r] > 0:
            span = abads.spell_read_span(
                bg0, new_e[r, : new_p[r]], int(new_o[r]), len(rs0.read(r))
            )
            assert span is not None
            m = min(len(span), len(rs0.read(r)))
            assert np.array_equal(span[:m], rs0.read(r)[:m])


def test_mark_bads_multi_edge_matches_spelling_loop(rng):
    """Vectorized multi-edge mark_bads == the per-read spelling oracle."""
    from supernova_tpu.align import pather
    from supernova_tpu.asm.bads import (
        MAX_Q30_MISMATCHES,
        Q_HI,
        mark_bads,
        spell_read_span,
    )
    from supernova_tpu.dbg import build as dbuild
    from supernova_tpu.dbg import graph as dgraph
    from supernova_tpu.kmer import count as kcount
    from supernova_tpu.sim import genome as sim
    from tests.test_dbg import perfect_readset

    g = sim.random_genome(rng, 5000, n_repeat_chunks=2, repeat_len=160)
    rs = perfect_readset(g, step=11)
    # inject disagreements: corrupt some read bases at high quality
    for i in rng.integers(0, rs.n_reads, 60):
        o = int(rs.offsets[i])
        ln = int(rs.offsets[i + 1] - o)
        for p in rng.integers(0, ln, int(rng.integers(1, 9))):
            rs.codes[o + int(p)] = (rs.codes[o + int(p)] + 1) % 4
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    off = np.asarray(rp.offset)[: rs.n_reads]
    got = mark_bads(bg, rs, edges, plen, off)
    assert (plen > 1).sum() > 10, "need multi-edge placements to test"
    for r in range(rs.n_reads):
        if plen[r] <= 1:
            continue
        read, qual = rs.read(r), rs.qual(r)
        span = spell_read_span(bg, edges[r, : plen[r]], int(off[r]), len(read))
        want = False
        if span is not None and len(span):
            m = min(len(span), len(read))
            want = int(((read[:m] != span[:m]) & (qual[:m] >= Q_HI)).sum()) > MAX_Q30_MISMATCHES
        assert bool(got[r]) == want, r
