"""Pallas TPU kernel: streaming stable compaction of a masked row stream.

Replaces the keep-compaction sort in kmer.count.reduce_occurrences (an
unstable 4-key sort over ALL occurrence rows, ~45% of the count program
after the tail cut) with one bandwidth-bound pass plus a cheap stitch:

  phase 1 (Pallas, one grid step per 32k-row block):
    in-VMEM stable compaction of the block's kept rows via a log-shift
    network: displacement d[i] = i - rank[i] is non-decreasing with
    0/1 steps, so moving every element down by d decomposed into powers
    of two (select-from-above at each round) is exact — verified
    exhaustively against np reference for all 2^16 masks at n=16.
    Each block's compacted columns are written back at the block's own
    (static) offset together with its kept count.

  phase 2 (XLA): exclusive-scan the per-block counts and stitch the
    kept prefixes to their running offsets with a fori_loop of
    dynamic_update_slice (unaligned dynamic writes are fine in XLA;
    a Mosaic DMA at a running offset is not — the destination tile
    index must be provably divisible by the 1024-element tiling, which
    an arbitrary append cursor never is).  Rows beyond the final total
    are unspecified and must be masked by the caller
    (ops/segments.compact_sorted_words does).

The compaction is STABLE (kept rows keep their stream order), so unlike
the 4-key-sort fallback it does not require kept rows to have distinct
words.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 256  # 32k rows / block

U32 = jnp.uint32
I32 = jnp.int32


def _scan(x, axis: int, op, identity):
    """Inclusive Hillis-Steele scan along an axis via circular rolls
    (same helper as ops/pallas/run_reduce.py — Mosaic has no cumsum)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=axis)
        x = op(x, jnp.where(idx >= s, shifted, identity))
        s *= 2
    return x


def _scan_add(x):
    """Inclusive row-major cumulative sum over (R, L) int32."""
    cs_row = _scan(x, 1, jnp.add, 0)
    row_tot = jnp.broadcast_to(cs_row[:, x.shape[1] - 1 :], x.shape)
    prefix = _scan(row_tot, 0, jnp.add, 0) - row_tot
    return cs_row + prefix


def _flat_shift_fwd(x, s: int):
    """y[i] = x[i + s] in flat row-major order over (R, L); wraps beyond
    the block (callers mask)."""
    r, l = x.shape
    q, rem = divmod(s, l)
    a = pltpu.roll(x, (r - q) % r, axis=0)  # a[R] = x[R + q]
    if rem == 0:
        return a
    b = pltpu.roll(x, (r - q - 1) % r, axis=0)  # b[R] = x[R + q + 1]
    al = pltpu.roll(a, l - rem, axis=1)  # al[R, j] = a[R, j + rem (mod l)]
    bl = pltpu.roll(b, l - rem, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < l - rem, al, bl)


def _compact_kernel(n_cols: int, args):
    keep_ref = args[0]
    col_refs = args[1 : 1 + n_cols]
    out_refs = args[1 + n_cols : 1 + 2 * n_cols]
    cnt_ref = args[1 + 2 * n_cols]

    keep = keep_ref[...].astype(I32)
    nblk = BLOCK_ROWS * LANES
    cs = _scan_add(keep)
    cnt = cs[BLOCK_ROWS - 1, LANES - 1]
    rank = cs - keep  # exclusive
    row = jax.lax.broadcasted_iota(jnp.int32, keep.shape, dimension=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, keep.shape, dimension=1)
    flat = row * LANES + lane
    d = flat - rank  # monotone non-decreasing displacement

    cols = [c[...] for c in col_refs]
    s = 1
    while s < nblk:
        ds = _flat_shift_fwd(d, s)
        sel = ((ds & s) != 0) & (flat + s < nblk)
        cols = [
            jnp.where(sel, _flat_shift_fwd(c, s), c) for c in cols
        ]
        d = jnp.where(sel, ds - s, d)
        s *= 2

    for k in range(n_cols):
        out_refs[k][...] = cols[k]
    cnt_ref[pl.program_id(0)] = cnt


@partial(jax.jit, static_argnames=("interpret",))
def compact_stream_pallas(valid, *cols, interpret: bool = False):
    """Stable-compact rows where valid is True to the front of each column.

    Returns (n_valid (int32 scalar), compacted columns) — rows beyond
    n_valid are UNSPECIFIED (callers must mask).  All columns are moved as
    uint32 bit patterns and cast back."""
    n = valid.shape[0]
    nblk = BLOCK_ROWS * LANES
    n_pad = -(-n // nblk) * nblk
    nblocks = n_pad // nblk
    dtypes = [c.dtype for c in cols]

    def prep(x, fill):
        x = jnp.asarray(x)
        if x.dtype != U32:
            x = x.astype(U32) if x.dtype != jnp.bool_ else x.astype(U32)
        if x.shape[0] < n_pad:
            x = jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)
        return x.reshape(n_pad // LANES, LANES)

    keep2 = prep(jnp.asarray(valid).astype(U32), 0)
    cols2 = [prep(c, 0) for c in cols]
    nc = len(cols)

    grid = (nblocks,)
    bspec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_pad // LANES, LANES), U32) for _ in range(nc)
    ]
    out_shape.append(jax.ShapeDtypeStruct((nblocks,), I32))

    outs = pl.pallas_call(
        lambda *args: _compact_kernel(nc, args),
        grid=grid,
        in_specs=[bspec] * (1 + nc),
        out_specs=tuple(
            [bspec] * nc
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(keep2, *cols2)

    counts = outs[-1]
    blocked = [o.reshape(n_pad) for o in outs[:nc]]
    n_valid = jnp.sum(counts)
    if nblocks == 1:
        res = tuple(
            o[:n].astype(dt) for o, dt in zip(blocked, dtypes)
        )
        return n_valid, res

    # phase 2: stitch block prefixes to their running offsets.  Block 0 is
    # already in place; later blocks move down by (i*nblk - offset[i]).
    offsets = jnp.concatenate(
        [jnp.zeros((1,), I32), jnp.cumsum(counts)[:-1]]
    )

    def body(i, outs):
        start = offsets[i]
        return tuple(
            jax.lax.dynamic_update_slice(
                o, jax.lax.dynamic_slice(d, (i * nblk,), (nblk,)), (start,)
            )
            for o, d in zip(outs, blocked)
        )

    stitched = jax.lax.fori_loop(1, nblocks, body, tuple(blocked))
    res = tuple(
        o[:n].astype(dt) for o, dt in zip(stitched, dtypes)
    )
    return n_valid, res
