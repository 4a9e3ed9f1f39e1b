"""Mesh-parallel phasing vote accumulation (parallel/sharded_phase.py):
the psum'd (bubble x molecule) matrix must equal the host accumulation."""
import numpy as np

from supernova_tpu.parallel.mesh import make_mesh
from supernova_tpu.parallel.sharded_phase import (
    sharded_vote_matrix,
    split_votes,
)

N_DEV = 8


def test_vote_matrix_matches_host(rng):
    n_edges, n_bub, n_mols, n_votes = 40, 6, 25, 5000
    edge_bubble = np.full(n_edges, -1, np.int32)
    edge_sign = np.zeros(n_edges, np.int32)
    for b in range(n_bub):
        edge_bubble[2 * b] = b
        edge_sign[2 * b] = 1
        edge_bubble[2 * b + 1] = b
        edge_sign[2 * b + 1] = -1
    re = rng.integers(0, n_edges, n_votes).astype(np.int32)
    rb = rng.integers(0, n_mols, n_votes).astype(np.int32)
    want = np.zeros((n_bub, n_mols), np.int32)
    for e, m in zip(re, rb):
        if edge_bubble[e] >= 0:
            want[edge_bubble[e], m] += edge_sign[e]
    mesh = make_mesh(N_DEV)
    re_sh, rb_sh = split_votes(re, rb, N_DEV)
    got = sharded_vote_matrix(
        mesh, edge_bubble, edge_sign, re_sh, rb_sh, n_bub, n_mols
    )
    assert np.array_equal(got, want)


def test_vote_matrix_ignores_pad_and_range(rng):
    edge_bubble = np.array([0, 0, -1], np.int32)
    edge_sign = np.array([1, -1, 0], np.int32)
    re = np.array([0, 1, -1, 2, 0], np.int32)
    rb = np.array([0, 0, 0, 1, 99], np.int32)  # 99 out of range -> dropped
    mesh = make_mesh(N_DEV)
    re_sh, rb_sh = split_votes(re, rb, N_DEV)
    got = sharded_vote_matrix(
        mesh, edge_bubble, edge_sign, re_sh, rb_sh, 1, 4
    )
    assert got.tolist() == [[0, 0, 0, 0]]
