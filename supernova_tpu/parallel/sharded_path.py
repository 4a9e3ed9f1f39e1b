"""Multi-chip read pathing: data-parallel reads, replicated graph dictionary.

The pathing workload (align/pather.py) is embarrassingly parallel over
reads; the kmer->(edge,pos) dictionary is replicated (it is ~100x smaller
than the occurrence stream).  Under shard_map each device paths its read
block; outputs stay sharded by read block.  At pod scale the dictionary
shards by kmer hash with the lookup routed through the same
ragged_all_to_all as counting (round-2 work); single-host meshes replicate.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ..align.pather import MAX_PATH, ReadPaths, path_reads
from ..core.kmer_codec import W3
from .mesh import AXIS


@partial(jax.jit, static_argnames=("mesh", "max_path"))
def sharded_path(
    mesh,
    kmer_words: W3,  # replicated dictionary
    node_edge,
    node_pos,
    from_v,  # replicated graph adjacency (junction validation)
    to_v,
    edge_kmers,
    codes_ext,  # (n_dev * (NBL+pad),) sharded
    read_offsets,  # (n_dev * (RL+1),) sharded (block-local offsets)
    pos_read,  # (n_dev * NBL,) sharded (block-local read ids)
    rlen_pos,  # (n_dev * NBL,) sharded
    max_path: int = MAX_PATH,
) -> ReadPaths:
    fn = partial(path_reads, max_path=max_path)
    return jax.shard_map(
        fn,
        mesh=mesh,
        check_vma=False,  # pallas calls inside the body don't carry vma info
        in_specs=(
            W3(P(), P(), P()),  # dictionary replicated
            P(),
            P(),
            P(),
            P(),
            P(),
            P(AXIS),
            P(AXIS),
            P(AXIS),
            P(AXIS),
        ),
        out_specs=ReadPaths(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
    )(
        kmer_words,
        node_edge,
        node_pos,
        from_v,
        to_v,
        edge_kmers,
        codes_ext,
        read_offsets,
        pos_read,
        rlen_pos,
    )


def split_for_pathing(rs, n_dev: int, base_bucket: int = 16384, read_bucket: int = 1024):
    """Per-device blocks for pathing (same split as counting, plus block
    read lengths and block-local offsets)."""
    from ..core.kmer_codec import K
    from ..kmer.count import _round_up

    pairs = rs.n_pairs
    per = -(-pairs // n_dev)
    blocks = []
    max_nb, max_r = 1, 1
    for dvc in range(n_dev):
        lo, hi = dvc * per * 2, min((dvc + 1) * per * 2, rs.n_reads)
        lo = min(lo, rs.n_reads)
        idx = np.arange(lo, hi)
        lens = np.diff(rs.offsets)[idx] if len(idx) else np.zeros(0, np.int64)
        blocks.append((idx, lens))
        max_nb = max(max_nb, int(lens.sum()))
        max_r = max(max_r, len(idx))
    nbl = _round_up(max_nb, base_bucket)
    rl = _round_up(max_r + 1, read_bucket)

    def pack(idx, lens):
        nb = int(lens.sum())
        codes = np.zeros(nbl + max(K, 128), np.int32)
        pr = np.full(nbl, len(idx), np.int32)
        off = np.full(rl + 1, nb, np.int32)
        rlen = np.zeros(nbl, np.int32)
        if len(idx):
            starts = rs.offsets[idx]
            codes[:nb] = np.concatenate(
                [rs.codes[s : s + l] for s, l in zip(starts, lens)]
            )
            pr[:nb] = np.repeat(np.arange(len(idx), dtype=np.int32), lens)
            off[: len(idx) + 1] = np.concatenate([[0], np.cumsum(lens)])
            rlen[:nb] = np.repeat(lens.astype(np.int32), lens)
        return codes, off, pr, rlen

    packed = [pack(i, l) for i, l in blocks]
    cat = lambda k: np.concatenate([p[k] for p in packed])
    return cat(0), cat(1), cat(2), cat(3), nbl, rl, [b[0] for b in blocks]
