"""Value-sharded dictionary pathing: the kmer->(edge,pos) dict hash-sharded
across the mesh (no device holds the full table — the pod-scale memory
layout), queries routed to owner shards and answered through the inverse
all_to_all.  Results must be bit-identical to the single-device pather."""
import jax.numpy as jnp
import numpy as np

from supernova_tpu.align import pather
from supernova_tpu.core.kmer_codec import K, np_to_soa
from supernova_tpu.dbg import build as dbuild
from supernova_tpu.dbg import graph as dgraph
from supernova_tpu.kmer import count as kcount
from supernova_tpu.parallel.mesh import make_mesh
from supernova_tpu.parallel.sharded_path import (
    shard_dictionary,
    sharded_path_vs,
    split_for_pathing,
)
from supernova_tpu.sim import genome as sim
from tests.test_dbg import perfect_readset

N_DEV = 8


def test_value_sharded_path_matches_single(rng):
    g = sim.random_genome(rng, 4000, n_repeat_chunks=2, repeat_len=150)
    rs = perfect_readset(g)
    table = dbuild.trim_table(
        kcount.count_readset(rs, min_freq=2), pad_multiple=256
    )
    bg = dgraph.from_device(dbuild.build_graph(table), table)

    ref = pather.path_readset(bg, rs)

    mesh = make_mesh(N_DEV)
    words_sh, ne_sh, np_sh, L = shard_dictionary(
        np_to_soa(bg.kmer_words), bg.node_edge, bg.node_pos, N_DEV
    )
    # no shard holds the whole dictionary
    n_real = int((np.asarray(bg.kmer_words)[:, 0] != 0xFFFFFFFF).sum())
    per_shard = [
        int((np.asarray(words_sh.a).reshape(N_DEV, L)[s] != 0xFFFFFFFF).sum())
        for s in range(N_DEV)
    ]
    assert sum(per_shard) == n_real
    assert max(per_shard) < n_real

    codes, off, pr, rlen, nbl, rl, idx_blocks = split_for_pathing(rs, N_DEV)
    rp = sharded_path_vs(
        mesh,
        words_sh,
        jnp.asarray(ne_sh),
        jnp.asarray(np_sh),
        jnp.asarray(bg.from_v.astype(np.int32)),
        jnp.asarray(bg.to_v.astype(np.int32)),
        jnp.asarray((bg.edges.lengths() - (K - 1)).astype(np.int32)),
        jnp.asarray(codes),
        jnp.asarray(off),
        jnp.asarray(pr),
        jnp.asarray(rlen),
        n_dev=N_DEV,
        shard_rows=L,
        capacity=2 * nbl,
    )

    def gather(col):
        a = np.asarray(col)
        a = a.reshape((N_DEV, rl) + a.shape[1:])
        return np.concatenate(
            [a[d][: len(idx_blocks[d])] for d in range(N_DEV)]
        )

    assert np.array_equal(gather(rp.edges), np.asarray(ref.edges)[: rs.n_reads])
    assert np.array_equal(
        gather(rp.path_len), np.asarray(ref.path_len)[: rs.n_reads]
    )
    assert np.array_equal(
        gather(rp.offset), np.asarray(ref.offset)[: rs.n_reads]
    )
    assert np.array_equal(
        gather(rp.first_skip), np.asarray(ref.first_skip)[: rs.n_reads]
    )
