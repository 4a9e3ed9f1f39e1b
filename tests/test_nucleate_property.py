"""Property tests for NucleateGraph: random closure sets over random
genomes -> structural invariants (sim_tests.rs pattern)."""
import numpy as np
import pytest

from supernova_tpu.asm import nucleate as anuc
from supernova_tpu.core import dna
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim

from tests.test_dbg import perfect_readset


def _graph(rng, size, repeats=0, rep_len=150):
    g = sim.random_genome(rng, size, n_repeat_chunks=repeats, repeat_len=rep_len)
    rs = perfect_readset(g, step=23)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    return g, bg


def _random_walks(rng, bg, n, max_len=8):
    """Random graph walks as synthetic closures."""
    out = []
    outdeg_next = {}
    for e in range(bg.n_edges):
        outdeg_next[e] = [
            int(f) for f in np.nonzero(bg.from_v == bg.to_v[e])[0]
        ]
    for _ in range(n):
        e = int(rng.integers(bg.n_edges))
        walk = [e]
        for _ in range(int(rng.integers(1, max_len))):
            nxts = outdeg_next[walk[-1]]
            if not nxts:
                break
            walk.append(int(rng.choice(nxts)))
        out.append(tuple(walk))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_nucleate_random_walks_invariants(seed):
    rng = np.random.default_rng(seed)
    g, bg = _graph(rng, 4000, repeats=2, rep_len=150)
    closures = _random_walks(rng, bg, 60)
    D = anuc.nucleate_graph(bg, closures, min_over_bases=100)
    D.validate()
    gs = dna.codes_to_seq(g)
    gr = dna.codes_to_seq(dna.revcomp(g))
    for d in range(D.n_edges):
        s = D.edge_seq(d)
        assert s in gs or s in gr, f"edge {d} spells non-genome sequence"
    # every closure base edge is represented somewhere in D
    covered = set()
    for d in range(D.n_edges):
        covered.update(int(e) for e in D.epaths.row(d))
    wanted = {int(e) for c in closures for e in c}
    wanted |= {int(bg.inv[e]) for e in wanted}
    assert wanted <= covered


def test_merge_short_overlaps_stable(rng):
    g, bg = _graph(rng, 3000)
    closures = _random_walks(rng, bg, 40)
    D = anuc.nucleate_graph(bg, closures, min_over_bases=100)
    D1 = anuc.merge_short_overlaps(D)
    D1.validate()
    D2 = anuc.merge_short_overlaps(D1)
    # merging is idempotent once converged
    assert D2.n_edges == D1.n_edges
    s1 = sorted(D1.edge_seq(d) for d in range(D1.n_edges))
    s2 = sorted(D2.edge_seq(d) for d in range(D2.n_edges))
    assert s1 == s2


def test_adaptive_gate_bounds(rng):
    g, bg = _graph(rng, 3000)
    closures = _random_walks(rng, bg, 40)
    # adaptive gate must stay within [floor, reference default]
    D = anuc.nucleate_graph(bg, closures, min_over_bases=None)
    D.validate()


def test_native_matches_python(rng, monkeypatch):
    """The C++ glue core and the python fallback produce identical D."""
    from supernova_tpu import native as snative

    if snative.load_nucleate() is None:
        pytest.skip("native toolchain unavailable")
    g, bg = _graph(rng, 4000, repeats=2, rep_len=150)
    closures = _random_walks(rng, bg, 80)
    D_native = anuc.nucleate_graph(bg, closures, min_over_bases=None)
    monkeypatch.setattr(snative, "load_nucleate", lambda: None)
    D_python = anuc.nucleate_graph(bg, closures, min_over_bases=None)
    assert D_native.n_edges == D_python.n_edges
    s1 = sorted(
        tuple(D_native.epaths.row(d).tolist()) for d in range(D_native.n_edges)
    )
    s2 = sorted(
        tuple(D_python.epaths.row(d).tolist()) for d in range(D_python.n_edges)
    )
    assert s1 == s2
    assert np.array_equal(np.sort(D_native.dinv), np.sort(D_python.dinv))
