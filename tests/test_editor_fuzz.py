"""Fuzz the supergraph surgery family: random op sequences on random
repeat-rich genomes must keep SuperGraph.validate() true and the
involution/adjacency invariants intact."""
import numpy as np
import pytest

from supernova_tpu.asm import capture as acap
from supernova_tpu.asm import gap as agap
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.asm.inversion import delete_edges
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount

from tests.test_dbg import perfect_readset


def _random_repeaty_genome(rng, n_chunks=6, chunk=300, n_repeats=3):
    """Chunks pasted with repeats (the sim_tests.rs pattern)."""
    chunks = [rng.integers(0, 4, chunk).astype(np.uint8) for _ in range(n_chunks)]
    rep = rng.integers(0, 4, 90).astype(np.uint8)
    parts = []
    for i, c in enumerate(chunks):
        parts.append(c)
        if i < n_repeats:
            parts.append(rep)
    return np.concatenate(parts)


def _build_D(rng):
    g = _random_repeaty_genome(rng)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    D = asg.build_supergraph(bg)
    D.validate()
    return D


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_surgery_sequences(seed):
    rng = np.random.default_rng(seed)
    D = _build_D(rng)
    for step in range(8):
        op = rng.integers(0, 4)
        if op == 0:
            D, _ = acap.capture_loops(D)
        elif op == 1:
            D, _ = acap.reinsert_loops(D)
        elif op == 2 and D.n_edges > 4:
            # delete a random involution pair (never a cell's partner split)
            d = int(rng.integers(0, D.n_edges))
            D = delete_edges(D, [d])
        elif op == 3 and D.n_edges >= 2:
            # append a {-2} gap edge between two random real-edge endpoints
            nong = [x for x in range(D.n_edges) if not D.is_gap(x)]
            if len(nong) >= 2:
                a, b = rng.choice(nong, 2, replace=False)
                v, w = int(D.to_v[a]), int(D.from_v[b])
                vr = int(D.to_v[D.dinv[b]])
                wr = int(D.from_v[D.dinv[a]])
                D = asg.append_gap_edges(
                    D, [(v, w, agap.bc_gap(100), vr, wr)]
                )
        D.validate()
        assert np.array_equal(D.dinv[D.dinv], np.arange(D.n_edges))
        if D.n_edges == 0:
            break


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_capture_reinsert_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    D = _build_D(rng)

    def payloads(D):
        return sorted(
            tuple(int(x) for x in D.epaths.row(d))
            for d in range(D.n_edges)
            if not D.is_gap(d)
        )

    before = payloads(D)
    D1, n = acap.capture_loops(D)
    D1.validate()
    D2, m = acap.reinsert_loops(D1)
    D2.validate()
    if n and m == n:
        assert payloads(D2) == before


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_splat_random_closures(seed):
    """Random {-1} pair gaps + random closure paths: splat must keep the
    supergraph valid and the involution intact (TODO: Splat.cc editors)."""
    from supernova_tpu.asm import splat as asplat

    rng = np.random.default_rng(500 + seed)
    D = _build_D(rng)
    # sprinkle pair gaps between random real-edge endpoints
    nong = [x for x in range(D.n_edges) if not D.is_gap(x)]
    for _ in range(3):
        if len(nong) < 2:
            break
        a, b = rng.choice(nong, 2, replace=False)
        v, w = int(D.to_v[a]), int(D.from_v[b])
        vr = int(D.to_v[D.dinv[b]])
        wr = int(D.from_v[D.dinv[a]])
        D = asg.append_gap_edges(D, [(v, w, agap.pair_gap(), vr, wr)])
    D.validate()
    # random closure paths: mixtures of real base-edge walks and junk
    binv = np.asarray(D.bg.inv, np.int64)
    cpaths = []
    for _ in range(12):
        if rng.random() < 0.5 and D.n_edges:
            d = int(rng.choice(nong))
            row = np.asarray(D.epaths.row(d), np.int64)
            if len(row) == 0:
                continue
            lo = int(rng.integers(0, len(row)))
            hi = int(rng.integers(lo + 1, len(row) + 1))
            cp = row[lo:hi]
        else:
            cp = rng.integers(0, D.bg.n_edges, size=rng.integers(1, 5))
        cpaths.append(np.asarray(cp, np.int64))
        cpaths.append(binv[np.asarray(cp, np.int64)][::-1].copy())  # rc image
    D2, n = asplat.splat(D, cpaths)
    D2.validate()
    assert np.array_equal(D2.dinv[D2.dinv], np.arange(D2.n_edges))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_patch_insertion(seed):
    """Random closures appended to the base graph: insert_patches must
    produce a valid graph containing every original (canonical) kmer."""
    from supernova_tpu.asm import patch as apatch
    from supernova_tpu.core.kmer_codec import K

    rng = np.random.default_rng(900 + seed)
    g = _random_repeaty_genome(rng)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    closures = []
    for _ in range(int(rng.integers(1, 4))):
        # random splice of two genome windows (a plausible chimeric closure)
        a = int(rng.integers(0, len(g) - 2 * K))
        b = int(rng.integers(0, len(g) - 2 * K))
        closures.append(np.concatenate([g[a:a + K + 10], g[b:b + K + 10]]))
    bg2 = apatch.insert_patches(bg, closures)
    bg2.validate()
    # every edge kmer of the old graph survives (counted at min_freq=1)
    def kmer_set(bgx):
        s = set()
        for e in range(bgx.n_edges):
            seq = bgx.edge_seq(e)
            for i in range(len(seq) - K + 1):
                km = seq[i:i + K]
                rc = dna.codes_to_seq(dna.revcomp(dna.seq_to_codes(km)))
                s.add(min(km, rc))
        return s
    assert kmer_set(bg) <= kmer_set(bg2)
