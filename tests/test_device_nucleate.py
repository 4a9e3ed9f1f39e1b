"""Device NucleateGraph glue (parallel/device_nucleate.py) vs the host
cores: identical supergraphs on random closure sets."""
import numpy as np
import pytest

from supernova_tpu.asm import nucleate as anuc

from tests.test_nucleate_property import _graph, _random_walks


def _d_tuple(D):
    rows = tuple(tuple(int(e) for e in D.epaths.row(d)) for d in range(D.n_edges))
    return (
        rows,
        tuple(int(x) for x in D.dinv),
        tuple(int(x) for x in D.from_v),
        tuple(int(x) for x in D.to_v),
    )


@pytest.mark.parametrize("seed", [1, 4, 9])
def test_device_glue_matches_host(seed):
    rng = np.random.default_rng(seed)
    g, bg = _graph(rng, 4000, repeats=2, rep_len=150)
    closures = _random_walks(rng, bg, 50)
    D_host = anuc.nucleate_graph(bg, closures, min_over_bases=100,
                                 device_glue=False)
    D_dev = anuc.nucleate_graph(bg, closures, min_over_bases=100,
                                device_glue=True)
    assert _d_tuple(D_host) == _d_tuple(D_dev)


def test_device_glue_matches_host_adaptive(rng):
    g, bg = _graph(rng, 6000, repeats=3, rep_len=150)
    closures = _random_walks(rng, bg, 80, max_len=12)
    D_host = anuc.nucleate_graph(bg, closures, min_over_bases=None,
                                 device_glue=False)
    D_dev = anuc.nucleate_graph(bg, closures, min_over_bases=None,
                                device_glue=True)
    assert _d_tuple(D_host) == _d_tuple(D_dev)


def test_short_edge_candidate_glue_matches_host(rng):
    """Regression: the device seed window broadcast run-end TOTALS with a
    reverse cummin (_bcast_back), which is only sound for monotone values —
    the pad run's 0 leaked backward and EMPTIED the window, so the device
    cores never formed overlap candidates and glued only via long-edge
    matches.  Masked when every shared edge is >= the gate; this scenario
    shares only SHORT edges (each below the gate, summing above it), so the
    candidate path is the only way to merge — exactly the class that made
    the 300 kb mesh pipeline diverge from single-device."""
    from supernova_tpu.core import dna as cdna
    from supernova_tpu.core.ragged import Ragged
    from supernova_tpu.dbg.graph import BaseGraph

    K = 48
    # chain e0 -> e1 -> e2 -> e3, each ~120 bases (73 kmers < 153 gate)
    parts = [rng.integers(0, 4, 120).astype(np.uint8) for _ in range(4)]
    seqs = []
    for i, p in enumerate(parts):
        if i:
            p = np.concatenate([seqs[i - 1][-(K - 1):], p])
        seqs.append(p)
    fwd = seqs
    allseqs = fwd + [cdna.revcomp(s) for s in fwd[::-1]]
    ne = len(allseqs)
    inv = np.array([ne - 1 - i for i in range(ne)], np.int32)
    fv = np.array([0, 1, 2, 3, 5, 6, 7, 8], np.int32)
    tv = np.array([1, 2, 3, 4, 6, 7, 8, 9], np.int32)
    bg = BaseGraph(
        edges=Ragged.from_rows(allseqs, dtype=np.uint8),
        inv=inv, from_v=fv, to_v=tv, n_vertices=10,
        is_circle=np.zeros(ne, bool),
    )
    # A and B overlap on (e1, e2): each ~73 kmers, sum ~146+ >= floor;
    # trailing tiny closures poison the old ctotal reverse-cummin
    closures = [
        np.array([0, 1, 2], np.int64),
        np.array([1, 2, 3], np.int64),
        np.array([3], np.int64),
        np.array([0], np.int64),
    ]
    D_host = anuc.nucleate_graph(bg, closures, min_over_bases=100,
                                 device_glue=False)
    D_dev = anuc.nucleate_graph(bg, closures, min_over_bases=100,
                                device_glue=True)
    assert _d_tuple(D_host) == _d_tuple(D_dev)
    # the overlap must actually have merged: fewer D-edges than the
    # no-candidate outcome (each closure its own chain)
    assert D_host.n_edges < 2 * len(anuc.sanitize_closures(bg, closures))
