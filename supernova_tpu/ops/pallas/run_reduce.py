"""Pallas TPU kernel: fused per-run reduction over the sorted kmer stream.

Replaces ~14 separate XLA cumsum/cummax passes in kmer.count.reduce_
occurrences with ONE VMEM-resident pass: for every row of the sorted
(w0, w1, w2, packed-attrs) occurrence stream it emits, at run-END rows,
the run's total count, distinct-barcode count, ignored flag, and OR'd
extension masks (packed), plus the keep decision — everything the
compaction sort consumes.

The TPU grid is sequential, so an open run's partial statistics carry
across blocks in scratch; within a block, flat cumulative sums over the
(rows, 128) tile come from a per-row cumsum plus an exclusive row-total
prefix.  Cross-block neighbor rows (run start/end detection) come from
passing the same arrays twice with a one-element offset, like
ops/pallas/kmer_extract.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...kmer.count import BC_FIELD_IGNORED

LANES = 128
BLOCK_ROWS = 256  # 32k rows / block

U32 = jnp.uint32
I32 = jnp.int32
SENT = np.uint32(0xFFFFFFFF)

# number of carried scalars: 11 stat partials + 3 words + 1 prev-pk
N_STATS = 11  # [valid, counted_bc, ign, lm0..3, rm0..3]


def _scan(x, axis: int, op, identity):
    """Inclusive Hillis-Steele scan along an axis via circular rolls
    (Mosaic has no cumsum/cummax lowering)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=axis)
        x = op(x, jnp.where(idx >= s, shifted, identity))
        s *= 2
    return x


def _flat_cumsum(x):
    """Inclusive cumulative sum in flat row-major order over (R, L) int32."""
    cs_row = _scan(x, 1, jnp.add, 0)
    row_tot = jnp.broadcast_to(cs_row[:, x.shape[1] - 1 :], x.shape)
    prefix = _scan(row_tot, 0, jnp.add, 0) - row_tot
    return cs_row + prefix


def _flat_cummax(x, identity):
    """Inclusive cumulative max in flat row-major order over (R, L) int32."""
    m_row = _scan(x, 1, jnp.maximum, identity)
    row_last = jnp.broadcast_to(m_row[:, x.shape[1] - 1 :], x.shape)
    prefix = _scan(row_last, 0, jnp.maximum, identity)
    # exclusive over rows: shift the row prefix down by one row
    prev = pltpu.roll(prefix, 1, axis=0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    prefix_excl = jnp.where(rowi >= 1, prev, identity)
    return jnp.maximum(m_row, prefix_excl)


def _shift_next(cur, nxt1):
    """value at flat position +1 (next row's first element wraps in)."""
    r0 = pltpu.roll(cur, LANES - 1, axis=1)
    r1 = pltpu.roll(nxt1, LANES - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, cur.shape, dimension=1)
    return jnp.where(lane < LANES - 1, r0, r1)


def _run_reduce_kernel(
    min_freq: int,
    min_bc: int,
    w0c, w1c, w2c, pkc,  # current blocks
    w0n, w1n, w2n, pkn,  # +1-element-shifted blocks
    keep_ref, count_ref, stats_ref,  # outputs
    carry,  # SMEM scratch: (N_STATS + 5,) int32
):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        # SMEM takes scalar stores only; carried words start as the sentinel
        # (never a canonical kmer) so the stream's first row opens a run
        for k in range(N_STATS + 5):
            carry[k] = jnp.asarray(0, U32)
        carry[N_STATS + 0] = jnp.asarray(SENT)
        carry[N_STATS + 1] = jnp.asarray(SENT)
        carry[N_STATS + 2] = jnp.asarray(SENT)

    w0, w1, w2, pk = w0c[...], w1c[...], w2c[...], pkc[...]
    n0 = _shift_next(w0, w0n[...])
    n1 = _shift_next(w1, w1n[...])
    n2 = _shift_next(w2, w2n[...])

    is_end = (w0 != n0) | (w1 != n1) | (w2 != n2)

    # starts: row differs from previous row (flat); previous of the very
    # first element is the carried words
    p0 = pltpu.roll(w0, 1, axis=1)
    p1 = pltpu.roll(w1, 1, axis=1)
    p2 = pltpu.roll(w2, 1, axis=1)
    pr = pltpu.roll(w0, 1, axis=0)  # row-shifted for the lane-0 seam
    pr1 = pltpu.roll(w1, 1, axis=0)
    pr2 = pltpu.roll(w2, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, w0.shape, dimension=1)
    row = jax.lax.broadcasted_iota(jnp.int32, w0.shape, dimension=0)
    # previous element: same row lane-1, or previous row lane-127
    q0 = jnp.where(lane > 0, p0, pltpu.roll(pr, 1, axis=1))
    q1 = jnp.where(lane > 0, p1, pltpu.roll(pr1, 1, axis=1))
    q2 = jnp.where(lane > 0, p2, pltpu.roll(pr2, 1, axis=1))
    cw0 = carry[N_STATS + 0]
    cw1 = carry[N_STATS + 1]
    cw2 = carry[N_STATS + 2]
    at_origin = (lane == 0) & (row == 0)
    q0 = jnp.where(at_origin, cw0, q0)
    q1 = jnp.where(at_origin, cw1, q1)
    q2 = jnp.where(at_origin, cw2, q2)
    is_start = (w0 != q0) | (w1 != q1) | (w2 != q2)

    # previous pk for the new-pair test
    pp = pltpu.roll(pk, 1, axis=1)
    ppr = pltpu.roll(pk, 1, axis=0)
    qpk = jnp.where(lane > 0, pp, pltpu.roll(ppr, 1, axis=1))
    qpk = jnp.where(at_origin, carry[N_STATS + 3], qpk)

    bcf = pk >> np.uint32(10)
    qbcf = qpk >> np.uint32(10)
    valid = ((pk >> np.uint32(1)) & np.uint32(1)) == 1
    new_pair = is_start | (bcf != qbcf)

    inds = [
        valid,
        valid & (bcf > 0) & (bcf != BC_FIELD_IGNORED) & new_pair,
        valid & (bcf == BC_FIELD_IGNORED),
    ]
    for b in range(4):
        inds.append(valid & (((pk >> np.uint32(6 + b)) & np.uint32(1)) == 1))
    for b in range(4):
        inds.append(valid & (((pk >> np.uint32(2 + b)) & np.uint32(1)) == 1))

    # per-stat run-relative value = flat-cumsum - cumsum@run-start
    # (+ carry when the block's first run continues from the previous block)
    vals = []
    for k, ind in enumerate(inds):
        x = ind.astype(I32)
        cs = _flat_cumsum(x)
        excl = cs - x
        # cummax over start-masked exclusive cumsums (non-decreasing);
        # fill/identity -carry_k charges the carried partial to rows of the
        # block-opening run
        carry_k = carry[k].astype(I32)
        masked = jnp.where(is_start, excl, -carry_k)
        base = _flat_cummax(masked, -carry_k)
        vals.append(cs - base)

    count = vals[0]
    nbc = vals[1]
    has_ign = vals[2] > 0
    lm = jnp.zeros_like(count, dtype=U32)
    rm = jnp.zeros_like(count, dtype=U32)
    for b in range(4):
        lm = lm | ((vals[3 + b] > 0).astype(U32) << b)
        rm = rm | ((vals[7 + b] > 0).astype(U32) << b)

    real = ~((w0 == SENT) & (w1 == SENT) & (w2 == SENT))
    keep = (
        is_end
        & real
        & (count >= min_freq)
        & (has_ign | (nbc >= min_bc))
    )
    stats = (
        (jnp.minimum(nbc, 4095).astype(U32) << np.uint32(9))
        | (lm << np.uint32(5))
        | (rm << np.uint32(1))
        | has_ign.astype(U32)
    )
    keep_ref[...] = keep.astype(U32)
    count_ref[...] = count
    stats_ref[...] = jnp.where(is_end, stats, U32(0))

    # carry out: open-run partials from the LAST element (flat) of the block
    last_vals = [v[BLOCK_ROWS - 1, LANES - 1] for v in vals]
    last_is_end = is_end.astype(I32)[BLOCK_ROWS - 1, LANES - 1] == 1
    for k in range(N_STATS):
        carry[k] = jnp.where(last_is_end, 0, last_vals[k]).astype(U32)
    carry[N_STATS + 0] = w0[BLOCK_ROWS - 1, LANES - 1]
    carry[N_STATS + 1] = w1[BLOCK_ROWS - 1, LANES - 1]
    carry[N_STATS + 2] = w2[BLOCK_ROWS - 1, LANES - 1]
    carry[N_STATS + 3] = pk[BLOCK_ROWS - 1, LANES - 1]
    carry[N_STATS + 4] = jnp.asarray(0, U32)


@partial(jax.jit, static_argnames=("min_freq", "min_bc", "interpret"))
def run_reduce_pallas(
    w0, w1, w2, pk, min_freq: int, min_bc: int, interpret: bool = False
):
    """Sorted occurrence stream -> (keep u32, count i32, stats u32) per row.
    stats = nbc(12b, clamped) | lm(4b) | rm(4b) | has_ign(1b), at end rows.
    n must be a multiple of 128*BLOCK_ROWS after padding (padded here)."""
    n = w0.shape[0]
    rows = -(-n // LANES)
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    need = rows_pad * LANES + LANES

    def prep(x, fill):
        x = jnp.asarray(x).astype(U32)
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]), constant_values=fill)
        cur = x[: rows_pad * LANES].reshape(rows_pad, LANES)
        nxt = x[LANES : rows_pad * LANES + LANES].reshape(rows_pad, LANES)
        return cur, nxt

    (w0c, w0n) = prep(w0, SENT)
    (w1c, w1n) = prep(w1, SENT)
    (w2c, w2n) = prep(w2, SENT)
    (pkc, pkn) = prep(pk, 0)

    grid = (rows_pad // BLOCK_ROWS,)
    spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows_pad, LANES), U32),
        jax.ShapeDtypeStruct((rows_pad, LANES), I32),
        jax.ShapeDtypeStruct((rows_pad, LANES), U32),
    ]
    keep, count, stats = pl.pallas_call(
        partial(_run_reduce_kernel, min_freq, min_bc),
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=(spec, spec, spec),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((N_STATS + 5,), U32)],
        interpret=interpret,
    )(w0c, w1c, w2c, pkc, w0n, w1n, w2n, pkn)
    f = lambda a: a.reshape(-1)[:n]
    return f(keep), f(count), f(stats)
