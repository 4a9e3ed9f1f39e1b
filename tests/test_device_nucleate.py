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
