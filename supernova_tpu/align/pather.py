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
    read_offsets,  # (RP+1,) int32 (read-boundary lookups only; RP-scale)
    pos_read,  # (NB,) int32
    rlen_pos,  # (NB,) int32 read length of the row's read (host-broadcast)
    max_path: int = MAX_PATH,
) -> ReadPaths:
    nb = pos_read.shape[0]
    rp = read_offsets.shape[0] - 1
    p = jnp.arange(nb, dtype=I32)

    words = kc.sliding_words(codes_ext, nb)
    canon, flipped = kc.canonicalize(words)
    row, found = kc.lookup_words_merge(kmer_words, canon)

    read_first0 = jnp.concatenate(
        [jnp.ones((1,), bool), pos_read[1:] != pos_read[:-1]]
    )
    start = jax.lax.cummax(jnp.where(read_first0, p, 0))
    pir = p - start
    inb = pir + K <= rlen_pos
    hit = found & inb

    node = 2 * row + flipped.astype(I32)
    edge = jnp.where(hit, node_edge[node], -1)
    epos = jnp.where(hit, node_pos[node], 0)
    hit = hit & (edge >= 0)

    # run compression: a hit opens a new path slot unless the previous hit
    # in the same read (across any miss gap) was on the same edge.  Compact
    # the hit rows with one stable 1-key sort (order preserved), compare
    # neighbors, and scatter the flags back — avoids 48M-row gathers.
    nh, pe, pr, pp = jax.lax.sort(
        ((~hit).astype(jnp.uint32), edge, pos_read, p), num_keys=1,
        is_stable=True,
    )
    n_hits = jnp.sum(hit.astype(I32))
    live = jnp.arange(nb) < n_hits
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (pe[1:] == pe[:-1]) & (pr[1:] == pr[:-1]),
        ]
    )
    new_for_hit = live & ~prev_same
    new_slot = (
        jnp.zeros((nb + 1,), bool)
        .at[jnp.where(live, pp, nb)]
        .set(new_for_hit, mode="drop")[:nb]
    )

    # slot index of each marker within its read: cumsum minus the cumsum at
    # the read's first position, broadcast forward with a cummax (reads are
    # contiguous, cumsums are non-decreasing — no gathers needed)
    mk = new_slot.astype(I32)
    cs = jnp.cumsum(mk)
    cs_excl = cs - mk
    read_first = jnp.concatenate(
        [jnp.ones((1,), bool), pos_read[1:] != pos_read[:-1]]
    )
    base = jax.lax.cummax(jnp.where(read_first, cs_excl, 0))
    slot = cs_excl - base  # valid at marker rows

    # place markers into the fixed-width path matrix with ONE scatter
    ok = new_slot & (slot < max_path)
    flat_idx = jnp.where(ok, pos_read * max_path + slot, rp * max_path)
    paths = (
        jnp.full((rp * max_path + 1,), -1, I32)
        .at[flat_idx]
        .set(edge, mode="drop")[: rp * max_path]
        .reshape(rp, max_path)
    )

    # per-read totals from the cumsum at read boundaries (RP-scale gathers)
    cs_ext = jnp.concatenate([jnp.zeros((1,), I32), cs])
    s_r = read_offsets[:-1].astype(I32)[:rp]
    e_r = read_offsets[1:].astype(I32)[:rp]
    n_slots = cs_ext[e_r] - cs_ext[s_r]
    overflow = n_slots > max_path
    path_len = jnp.minimum(n_slots, max_path)

    # first hit -> offset (RP-scale binary search is cheap)
    hs = jnp.cumsum(hit.astype(I32))
    hs_ext = jnp.concatenate([jnp.zeros((1,), I32), hs])
    has_hit = hs_ext[e_r] > hs_ext[s_r]
    fh = jnp.minimum(
        jnp.searchsorted(hs, hs_ext[s_r] + 1, side="left").astype(I32), nb - 1
    )
    first_skip = jnp.where(has_hit, fh - s_r, 0)
    offset = jnp.where(has_hit, epos[fh] - first_skip, 0)
    path_len = path_len * has_hit.astype(I32)

    return ReadPaths(paths, path_len, offset, first_skip, overflow)


# --------------------------------------------------------------- host layer

def path_readset(bg, rs, max_path: int = MAX_PATH) -> ReadPaths:
    """BaseGraph + ReadSet -> ReadPaths (host entry)."""
    from ..kmer.count import prepare_reads

    inp = prepare_reads(rs)
    return path_reads(
        kc.np_to_soa(bg.kmer_words),
        jnp.asarray(bg.node_edge),
        jnp.asarray(bg.node_pos),
        inp["codes_ext"],
        inp["read_offsets"],
        inp["pos_read"],
        inp["rlen_pos"],
        max_path=max_path,
    )
