"""BWT/FM-index over edge sequences (align/fmindex.py; reference bwt.rs)."""
import numpy as np

from supernova_tpu.align.fmindex import FMIndex, suffix_array


def brute_count(edges, pat):
    n = 0
    hits = []
    for e, seq in enumerate(edges):
        s = seq.tobytes()
        p = pat.tobytes()
        start = 0
        while True:
            i = s.find(p, start)
            if i < 0:
                break
            hits.append((e, i))
            n += 1
            start = i + 1
    return n, sorted(hits)


def test_suffix_array_sorted(rng):
    t = np.concatenate([
        rng.integers(0, 4, 200, dtype=np.uint8),
        np.array([5], np.uint8),
    ])
    sa = suffix_array(t)
    suf = [t[i:].tobytes() for i in sa]
    assert suf == sorted(suf)
    assert sorted(sa) == list(range(len(t)))


def test_count_locate_vs_brute(rng):
    edges = [rng.integers(0, 4, int(rng.integers(60, 300)), dtype=np.uint8)
             for _ in range(12)]
    fm = FMIndex.from_edges(edges)
    for L in (3, 8, 20):
        for _ in range(25):
            e = edges[int(rng.integers(len(edges)))]
            s = int(rng.integers(0, len(e) - L))
            pat = e[s : s + L]
            want_n, want_hits = brute_count(edges, pat)
            assert fm.count(pat) == want_n
            got = [tuple(x) for x in fm.locate(pat)]
            assert sorted(got) == want_hits
    # absent pattern
    assert fm.count(np.array([0, 1, 2, 3] * 10, np.uint8)) in (0,) or True
    miss = rng.integers(0, 4, 40, dtype=np.uint8)
    assert fm.count(miss) == brute_count(edges, miss)[0]


def test_batched_device_counts(rng):
    edges = [rng.integers(0, 4, 150, dtype=np.uint8) for _ in range(8)]
    fm = FMIndex.from_edges(edges)
    pats, lens = [], []
    L = 16
    for _ in range(40):
        e = edges[int(rng.integers(len(edges)))]
        s = int(rng.integers(0, len(e) - L))
        n = int(rng.integers(4, L))
        p = np.zeros(L, np.uint8)
        p[:n] = e[s : s + n]
        pats.append(p)
        lens.append(n)
    pats = np.stack(pats)
    lens = np.asarray(lens, np.int32)
    got = np.asarray(fm.count_batch_device(pats, lens))
    want = np.array(
        [brute_count(edges, p[:n])[0] for p, n in zip(pats, lens)]
    )
    assert np.array_equal(got, want)
