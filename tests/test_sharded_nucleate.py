"""Mesh-sharded NucleateGraph glue vs the single-device/host partitions."""
import numpy as np
import pytest

from supernova_tpu.asm import nucleate as anuc
from supernova_tpu.asm.nucleate import sanitize_closures

from tests.test_nucleate_property import _graph, _random_walks


def _partition_canonical(labels):
    """Canonical form: map each class to the set of its members."""
    from collections import defaultdict

    d = defaultdict(list)
    for i, l in enumerate(labels):
        d[int(l)].append(i)
    return sorted(tuple(v) for v in d.values())


@pytest.mark.parametrize(
    "seed",
    [2, pytest.param(7, marks=pytest.mark.slow)],  # one fast representative
)
def test_sharded_glue_matches_device(seed):
    import jax

    from supernova_tpu.core.kmer_codec import K
    from supernova_tpu.parallel.device_nucleate import glue_closures_device
    from supernova_tpu.parallel.mesh import make_mesh
    from supernova_tpu.parallel.sharded_nucleate import glue_closures_sharded

    rng = np.random.default_rng(seed)
    g, bg = _graph(rng, 4000, repeats=2, rep_len=150)
    closures = _random_walks(rng, bg, 40)
    cls = sanitize_closures(bg, closures)
    want = glue_closures_device(bg, cls, 100, adaptive=False)
    assert want is not None
    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    got, ovf = glue_closures_sharded(mesh, bg, cls, 100, adaptive=False)
    assert ovf == 0
    assert _partition_canonical(got) == _partition_canonical(want)


@pytest.mark.slow  # ~230 s; seed-2 fixed-cap variant covers the fast tier
def test_sharded_glue_matches_device_adaptive(rng):
    import jax

    from supernova_tpu.parallel.device_nucleate import glue_closures_device
    from supernova_tpu.parallel.mesh import make_mesh
    from supernova_tpu.parallel.sharded_nucleate import glue_closures_sharded

    g, bg = _graph(rng, 6000, repeats=3, rep_len=150)
    closures = _random_walks(rng, bg, 60, max_len=10)
    cls = sanitize_closures(bg, closures)
    from supernova_tpu.asm.nucleate import MIN_OVER_BASES

    want = glue_closures_device(bg, cls, MIN_OVER_BASES, adaptive=True)
    assert want is not None
    mesh = make_mesh(min(8, len(jax.devices())))
    got, ovf = glue_closures_sharded(mesh, bg, cls, MIN_OVER_BASES,
                                     adaptive=True)
    assert ovf == 0
    assert _partition_canonical(got) == _partition_canonical(want)


@pytest.mark.slow  # ~200 s; seed-2 fixed-cap variant covers the fast tier
def test_value_sharded_glue_matches_device(rng):
    """Pod-scale variant: closure values range-sharded, extension via
    distributed gathers — same partition."""
    import jax

    from supernova_tpu.parallel.device_nucleate import glue_closures_device
    from supernova_tpu.parallel.mesh import make_mesh
    from supernova_tpu.parallel.sharded_nucleate import glue_closures_sharded

    g, bg = _graph(rng, 5000, repeats=2, rep_len=150)
    closures = _random_walks(rng, bg, 50)
    cls = sanitize_closures(bg, closures)
    want = glue_closures_device(bg, cls, 100, adaptive=False)
    mesh = make_mesh(min(8, len(jax.devices())))
    got, ovf = glue_closures_sharded(mesh, bg, cls, 100, adaptive=False,
                                     value_shard=True)
    assert ovf == 0
    assert _partition_canonical(got) == _partition_canonical(want)
