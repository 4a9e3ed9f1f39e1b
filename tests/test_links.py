"""Barcode-link triples: numpy engine vs brute force, device vs numpy,
mesh-sharded vs numpy (the AllTinks/qept analogue, SURVEY §5.8)."""
import numpy as np
import pytest

from supernova_tpu.asm.links import (
    incidence_from_sets,
    link_triples_np,
    links_as_dict,
    neighbors_ranked,
)


def _random_incidence(rng, n_items=40, n_bc=120, density=0.12):
    sets = []
    for _ in range(n_items):
        k = rng.binomial(n_bc, density)
        sets.append(np.sort(rng.choice(n_bc, size=k, replace=False)) + 1)
    return sets


def _brute(sets, min_shared=1, max_per_bc=None):
    from collections import defaultdict

    by_bc = defaultdict(list)
    for i, s in enumerate(sets):
        for b in s:
            by_bc[int(b)].append(i)
    cnt = defaultdict(int)
    for b, items in by_bc.items():
        if max_per_bc is not None and len(items) > max_per_bc:
            continue
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                cnt[(items[x], items[y])] += 1
    return {k: v for k, v in cnt.items() if v >= min_shared}


def test_link_triples_np_matches_brute(rng):
    sets = _random_incidence(rng)
    bcv, item = incidence_from_sets(sets)
    for ms in (1, 3):
        i1, i2, s = link_triples_np(bcv, item, min_shared=ms)
        assert links_as_dict(i1, i2, s) == _brute(sets, min_shared=ms)
        assert (i1 < i2).all()


def test_link_triples_np_hot_barcode_cap(rng):
    sets = _random_incidence(rng, n_items=30, density=0.3)
    bcv, item = incidence_from_sets(sets)
    i1, i2, s = link_triples_np(bcv, item, min_shared=1, max_per_bc=5)
    assert links_as_dict(i1, i2, s) == _brute(sets, max_per_bc=5)


def test_link_triples_np_empty():
    i1, i2, s = link_triples_np(np.zeros(0), np.zeros(0))
    assert len(i1) == 0


def test_neighbors_ranked(rng):
    sets = _random_incidence(rng)
    bcv, item = incidence_from_sets(sets)
    i1, i2, s = link_triples_np(bcv, item)
    nb = neighbors_ranked(i1, i2, s, max_view=3)
    d = links_as_dict(i1, i2, s)
    for i, cands in nb.items():
        assert len(cands) <= 3
        shared = [c[0] for c in cands]
        assert shared == sorted(shared, reverse=True)
        c0, j0 = cands[0][1], cands[0][0]
        assert d.get((min(i, c0), max(i, c0))) == j0


def test_device_links_match_numpy(rng):
    from supernova_tpu.parallel.sharded_scaffold import SENT, bc_link_triples

    sets = _random_incidence(rng, n_items=25, n_bc=80)
    bcv, item = incidence_from_sets(sets)
    cap = 12
    ref = link_triples_np(bcv, item, min_shared=2, max_per_bc=cap)
    n = len(bcv)
    pad = -(-n // 128) * 128
    bc = np.full(pad, SENT, np.int32)
    it = np.full(pad, SENT, np.int32)
    bc[:n] = bcv
    it[:n] = item
    o1, o2, tot, nv = bc_link_triples(bc, it, cap=cap, min_shared=2)
    nv = int(nv)
    got = (
        np.asarray(o1)[:nv].astype(np.int64),
        np.asarray(o2)[:nv].astype(np.int64),
        np.asarray(tot)[:nv].astype(np.int64),
    )
    assert links_as_dict(*got) == links_as_dict(*ref)


@pytest.mark.parametrize("use_ragged", [False])
def test_sharded_links_match_numpy(rng, use_ragged):
    import jax

    from supernova_tpu.parallel.mesh import make_mesh
    from supernova_tpu.parallel.sharded_scaffold import (
        sharded_bc_links,
        split_incidence,
    )

    n_dev = min(8, len(jax.devices()))
    mesh = make_mesh(n_dev)
    sets = _random_incidence(rng, n_items=30, n_bc=100)
    bcv, item = incidence_from_sets(sets)
    cap = 12
    ref = link_triples_np(bcv, item, min_shared=2, max_per_bc=cap)
    bc_sh, it_sh = split_incidence(bcv, item, n_dev)
    i1, i2, s = sharded_bc_links(
        mesh, bc_sh, it_sh, cap=cap, out_cap=1024, min_shared=2,
        use_ragged=use_ragged,
    )
    assert links_as_dict(i1, i2, s) == links_as_dict(*ref)
