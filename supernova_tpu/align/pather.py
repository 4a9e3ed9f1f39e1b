"""Read-to-graph pathing: every read becomes (offset, [edge ids]) on the
unipath graph — the ReadPath/ReadPathVecX analogue.

Reference behavior (SURVEY.md §2.1 "Read pathing"): HBVPather::algorithmTwo
seeds reads on the kmer dict and extends (BuildReadQGraph48.cc:1185-1438);
paths are stored as offset + edge list (paths/long/ReadPath.h) and
bit-compressed (10X/paths/ReadPathVecX.h).

TPU-native design: one dictionary lookup per read position for ALL reads at
once (vectorized lex binary search), then per-read run compression of the
hit edge sequence with cumsum/scatter — no per-read control flow.  Error
kmers simply miss the dict (they were filtered), and runs on the same edge
re-join across the miss; cross-edge gap repair is the patching stage's job.

Paths are fixed-width (R, MAX_PATH) with -1 padding + overflow flag — the
static-shape stand-in for the reference's ragged ReadPathVec.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmer_codec as kc
from ..core.kmer_codec import K, W3
from ..ops import segments as seg

I32 = jnp.int32
MAX_PATH = 12  # max edges a 150bp read can plausibly traverse; overflow flagged


class ReadPaths(NamedTuple):
    edges: jax.Array  # (R, MAX_PATH) int32 edge ids, -1 pad
    path_len: jax.Array  # (R,) int32
    offset: jax.Array  # (R,) int32 read start in first-edge coordinates
    first_skip: jax.Array  # (R,) int32 read position of first kmer hit
    overflow: jax.Array  # (R,) bool


@partial(jax.jit, static_argnames=("max_path",))
def path_reads(
    kmer_words: W3,  # sorted canonical table (sentinel-padded), SoA
    node_edge,  # (2M,) int32
    node_pos,  # (2M,) int32
    codes_ext,  # (NB+K,) int32
    read_offsets,  # (RP+1,) int32
    pos_read,  # (NB,) int32
    read_len,  # (RP,) int32 true read lengths
    max_path: int = MAX_PATH,
) -> ReadPaths:
    nb = pos_read.shape[0]
    rp = read_len.shape[0]
    p = jnp.arange(nb, dtype=I32)

    words = kc.sliding_words(codes_ext, nb)
    canon, flipped = kc.canonicalize(words)
    row, found = kc.searchsorted_words(kmer_words, canon)

    start = read_offsets[pos_read].astype(I32)
    pir = p - start
    inb = pir + K <= read_len[pos_read]
    hit = found & inb

    node = 2 * row + flipped.astype(I32)
    edge = jnp.where(hit, node_edge[node], -1)
    epos = jnp.where(hit, node_pos[node], 0)
    hit = hit & (edge >= 0)

    # run compression: a hit opens a new path slot unless the previous hit in
    # the same read (carried across misses) was on the same edge.  The carry
    # is a cummax over (read id, position)-keyed hit positions.
    # reads are contiguous in p, so a plain cummax of hit positions suffices;
    # a carry from another read is detected by comparing read ids.
    hp = jnp.where(hit, p, -1)
    carry_pos_raw = jax.lax.cummax(hp)
    carry_pos = jnp.maximum(carry_pos_raw, 0)
    carry_valid = (carry_pos_raw >= 0) & (pos_read[carry_pos] == pos_read)
    carry_edge = jnp.where(carry_valid, edge[carry_pos], -1)
    prev_carry = jnp.concatenate([jnp.full((1,), -1, I32), carry_edge[:-1]])
    prev_cvalid = jnp.concatenate([jnp.zeros((1,), bool), carry_valid[:-1]])
    same_read_prev = jnp.concatenate([jnp.zeros((1,), bool), pos_read[1:] == pos_read[:-1]])

    new_slot = hit & ~(same_read_prev & prev_cvalid & (prev_carry == edge))

    mk = new_slot.astype(I32)
    c_incl = jnp.cumsum(mk)
    c_excl = c_incl - mk
    first_pos = read_offsets[pos_read].astype(I32)  # each read's first position
    base = c_excl[jnp.minimum(first_pos, nb - 1)]
    slot = jnp.where(new_slot, c_excl - base, -1)

    paths = jnp.full((rp, max_path), -1, I32)
    ok = new_slot & (slot >= 0) & (slot < max_path)
    flat_idx = pos_read * max_path + jnp.where(ok, slot, 0)
    paths = paths.reshape(-1).at[jnp.where(ok, flat_idx, rp * max_path)].set(
        edge, mode="drop"
    ).reshape(rp, max_path)

    n_slots = seg.seg_max(jnp.where(new_slot, c_excl - base + 1, 0), pos_read, rp)
    path_len = jnp.maximum(n_slots, 0)
    overflow = path_len > max_path
    path_len = jnp.minimum(path_len, max_path)

    # first hit -> offset
    first_hit_p = seg.seg_min(jnp.where(hit, p, nb), pos_read, rp)
    has_hit = first_hit_p < nb
    fh = jnp.minimum(first_hit_p, nb - 1)
    first_skip = jnp.where(has_hit, fh - read_offsets[:rp].astype(I32), 0)
    offset = jnp.where(has_hit, epos[fh] - first_skip, 0)
    path_len = path_len * has_hit.astype(I32)

    return ReadPaths(paths, path_len, offset, first_skip, overflow)


# --------------------------------------------------------------- host layer

def path_readset(bg, rs, max_path: int = MAX_PATH) -> ReadPaths:
    """BaseGraph + ReadSet -> ReadPaths (host entry)."""
    from ..kmer.count import prepare_reads

    inp = prepare_reads(rs)
    rp = inp["read_offsets"].shape[0] - 1
    read_len = np.zeros(rp, dtype=np.int32)
    read_len[: rs.n_reads] = rs.lengths()
    return path_reads(
        kc.np_to_soa(bg.kmer_words),
        jnp.asarray(bg.node_edge),
        jnp.asarray(bg.node_pos),
        inp["codes_ext"],
        inp["read_offsets"],
        inp["pos_read"],
        jnp.asarray(read_len),
        max_path=max_path,
    )
