"""Qual-tolerant seed rescue (align/rescue.py).

Reference: algorithmTwo's qual-aware seeding places reads whose every
48-mer window covers an error (BuildReadQGraph48.cc:1185-1438); the exact
pather leaves them at path_len == 0 and the rescue pass recovers them by
substituting the lowest-quality bases.
"""
import numpy as np

from supernova_tpu.align import pather, rescue
from supernova_tpu.core.kmer_codec import K
from supernova_tpu.sim import genome as sim
from tests.test_bads_extend import build_graph_and_paths
from tests.test_pather_validate import _find_read


def _three_error_read(g, start=400):
    """A 150bp read with 3 errors spaced so NO 48-window is clean: errors
    at 30/75/120 kill windows [0,30], [28,75], [73,120] — union covers all
    103 window starts."""
    read = g[start : start + 150].copy()
    q = np.full(150, 37, np.uint8)
    for p in (30, 75, 120):
        read[p] = (read[p] + 1) % 4
        q[p] = 5  # the errors are the low-qual bases
    return read, q


def test_rescue_places_three_error_read(rng):
    g = sim.random_genome(rng, 3000)
    read, q = _three_error_read(g)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [read, g[900:1050].copy()], [q, np.full(150, 37, np.uint8)]
    )
    r = _find_read(rs, read)
    assert r is not None
    assert plen[r] == 0  # exact pather cannot seed it
    edges, plen, off, n = rescue.rescue_unplaced(bg, rs, edges, plen, off)
    assert n >= 1
    assert plen[r] > 0
    # the placement must spell the true genome span: correcting the middle
    # error frees windows [31,72], all inside one genome unipath
    e = int(edges[r, 0])
    seq = bg.edges.row(e)
    o = int(off[r])
    # the read's mid section (away from the two uncorrected errors) must
    # match the edge at the implied offset
    span = seq[o + 40 : o + 70]
    assert np.array_equal(span, g[440:470])


def test_rescue_rejects_junk_read(rng):
    """A random read unrelated to the genome must NOT be force-placed."""
    g = sim.random_genome(rng, 3000)
    junk = sim.random_genome(np.random.default_rng(999), 150)
    q = np.full(150, 10, np.uint8)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [junk, g[900:1050].copy()], [q, np.full(150, 37, np.uint8)]
    )
    r = _find_read(rs, junk)
    assert r is not None
    assert plen[r] == 0
    edges, plen, off, n = rescue.rescue_unplaced(bg, rs, edges, plen, off)
    assert plen[r] == 0


def test_rescue_agrees_with_repathing_corrected_read(rng):
    """Rescued placement == what the exact pather produces on the corrected
    read (the two implementations share chain-validation semantics)."""
    g = sim.random_genome(rng, 3000, n_repeat_chunks=2, repeat_len=250)
    read, q = _three_error_read(g, start=500)
    rs, bg, edges, plen, off = build_graph_and_paths(
        rng, g, [read, g[900:1050].copy()], [q, np.full(150, 37, np.uint8)]
    )
    r = _find_read(rs, read)
    if plen[r] != 0:  # repeat layout may have made a window clean
        return
    edges, plen, off, n = rescue.rescue_unplaced(bg, rs, edges, plen, off)
    if plen[r] == 0:
        return
    # re-path the fully corrected read through the main pather
    fixed = g[500:650].copy()
    from supernova_tpu.ingest.reads import build_readset

    rs2 = build_readset(
        [fixed, fixed.copy()],
        [np.full(150, 37, np.uint8)] * 2,
        np.zeros(1, np.int32),
        n_barcodes=0,
        barcoded=False,
    )
    rp2 = pather.path_readset(bg, rs2)
    # the corrected-read path covers the rescued one: same offset and the
    # rescue path is a prefix chain of the full path
    p2 = np.asarray(rp2.edges)[0]
    l2 = int(np.asarray(rp2.path_len)[0])
    got = edges[r, : plen[r]].tolist()
    assert got == p2[: plen[r]].tolist() or got == p2[l2 - plen[r]: l2].tolist() or set(got) <= set(p2[:l2].tolist())


def test_lookup_words_np_matches_table(rng):
    """Host lookup: every table row is found at its own index; perturbed
    rows that are absent report found=False."""
    words = rng.integers(0, 2**32, size=(500, 3), dtype=np.uint64).astype(
        np.uint32
    )
    # lexicographic sort (c fastest)
    order = np.lexsort((words[:, 2], words[:, 1], words[:, 0]))
    table = np.unique(words[order], axis=0)
    row, found = rescue.lookup_words_np(
        table, table[:, 0], table[:, 1], table[:, 2]
    )
    assert found.all()
    assert np.array_equal(row, np.arange(len(table)))
    q = table.copy()
    q[:, 2] ^= 1  # flip a bit in the last word
    in_table = (
        (q[:, None, :] == table[None, :, :]).all(-1).any(1)
    )
    row2, found2 = rescue.lookup_words_np(
        table, q[:, 0], q[:, 1], q[:, 2]
    )
    assert np.array_equal(found2, in_table)


def test_canonical_windows_match_codec(rng):
    """numpy window packing == kmer_codec's reference packing."""
    from supernova_tpu.core import kmer_codec as kc

    read = rng.integers(0, 4, size=80, dtype=np.uint8)
    ca, cb, cc, flip = rescue._canonical_windows(read[None, :])
    for j in range(80 - K + 1):
        fwd = kc.words_from_codes_np(read[j : j + K])
        rcc = (3 - read[j : j + K])[::-1]
        rcw = kc.words_from_codes_np(rcc)
        want = min(tuple(fwd), tuple(rcw))
        assert (ca[0, j], cb[0, j], cc[0, j]) == want
        assert bool(flip[0, j]) == (tuple(rcw) < tuple(fwd))
