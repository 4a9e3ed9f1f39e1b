"""Zipped path storage (ReadPathVecX analogue, align/pathzip.py)."""
import numpy as np

from supernova_tpu.align import pather, pathzip
from supernova_tpu.asm import supergraph as asg
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.sim import genome as sim

from tests.test_capture import _flanked_repeat
from tests.test_dbg import perfect_readset
from supernova_tpu.core import dna


def _pathed(rng, seq=None):
    if seq is None:
        g = sim.random_genome(rng, 3000)
    else:
        g = dna.seq_to_codes(seq)
    rs = perfect_readset(g)
    table = dbuild.trim_table(kcount.count_readset(rs, min_freq=2), pad_multiple=256)
    bg = dgraph.from_device(dbuild.build_graph(table), table)
    rp = pather.path_readset(bg, rs)
    edges = np.asarray(rp.edges)[: rs.n_reads]
    plen = np.asarray(rp.path_len)[: rs.n_reads]
    offset = np.asarray(rp.offset)[: rs.n_reads]
    return bg, edges, plen, offset


def test_zip_roundtrip_linear(rng):
    bg, edges, plen, offset = _pathed(rng)
    first, choices, raw_rows, raw_edges = pathzip.zip_paths(bg, edges, plen)
    assert len(raw_rows) == 0  # pather paths are graph-adjacent
    back = pathzip.unzip_paths(
        bg, first, plen, choices, raw_rows, raw_edges, edges.shape[1]
    )
    mask = np.arange(edges.shape[1])[None, :] < plen[:, None]
    assert np.array_equal(back[mask], edges[mask])


def test_zip_roundtrip_branching(rng):
    # a repeat genome gives multi-edge paths crossing branch vertices
    _, _, _, seq = _flanked_repeat(rng, 3, tail=20)
    bg, edges, plen, offset = _pathed(rng, seq)
    assert (plen > 1).any()  # multi-edge paths exist
    first, choices, raw_rows, raw_edges = pathzip.zip_paths(bg, edges, plen)
    back = pathzip.unzip_paths(
        bg, first, plen, choices, raw_rows, raw_edges, edges.shape[1]
    )
    mask = np.arange(edges.shape[1])[None, :] < plen[:, None]
    assert np.array_equal(back[mask], edges[mask])
    # zipped payload is byte-sized
    assert choices.values.dtype == np.uint8


def test_zip_fallback_non_adjacent(rng):
    bg, edges, plen, offset = _pathed(rng)
    # corrupt one path into a non-adjacent pair -> raw fallback
    r0 = int(np.nonzero(plen >= 1)[0][0])
    edges = edges.copy()
    plen = plen.copy()
    plen[r0] = 2
    edges[r0, 0] = 0
    edges[r0, 1] = int(bg.inv[0])  # generally not an out-neighbor
    if bg.to_v[0] == bg.from_v[int(bg.inv[0])]:
        return  # palindromic corner: adjacency accidentally holds
    first, choices, raw_rows, raw_edges = pathzip.zip_paths(bg, edges, plen)
    assert r0 in raw_rows.tolist()
    back = pathzip.unzip_paths(
        bg, first, plen, choices, raw_rows, raw_edges, edges.shape[1]
    )
    mask = np.arange(edges.shape[1])[None, :] < plen[:, None]
    assert np.array_equal(back[mask], edges[mask])


def test_save_load_zipped(rng, tmp_path):
    bg, edges, plen, offset = _pathed(rng)
    p = tmp_path / "paths.npz"
    pathzip.save_zipped(p, bg, edges, plen, offset, extra={"n_edges": np.int64(bg.n_edges)})
    z = np.load(p)
    assert int(z["n_edges"]) == bg.n_edges
    e2, p2, o2 = pathzip.load_zipped(z, bg)
    mask = np.arange(edges.shape[1])[None, :] < plen[:, None]
    assert np.array_equal(e2[mask], edges[mask])
    assert np.array_equal(p2, plen)
    assert np.array_equal(o2, offset)
