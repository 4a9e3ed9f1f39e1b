"""Pallas TPU kernel: multi-word bitonic sort with VMEM-fused stages.

STATUS: chip-evaluated and RETIRED from the count hot path (round 3) — see
ARCHITECTURE.md "Pallas sort postmortem".  The axon remote-compile helper
OOMs (SIGKILL) on any tile >= 512 rows, and the largest compileable tile
(256 rows) measured 453 ms vs lax.sort's 192 ms at 2^25 rows x 4 operands
(bit-identical output).  Kept in-tree with its interpret-mode tests as a
documented negative result; `sort_by_words` always uses lax.sort.

Original design intent: replace the flat XLA `lax.sort` on the count hot
path (the 4-key occurrence sort IS the count iteration: ~235 ms at 33.5M
rows on v5e, scripts/bench_sort.py).  XLA's sort pays log2(n)^2 ~ 625
compare-exchange stages with limited fusion; this sorter restructures the
network so almost all stages run at compute speed inside VMEM:

  phase A   one grid step per TILE-row block: the FULL bitonic sort of the
            block (sum of phases 2..TILE ~ 190 stages at TILE=2^19) in one
            VMEM residency — a single HBM round trip.
  merges    for run length P = 2*TILE .. n: the few stages with distance
            >= TILE are one pallas_call each (a tile-pair compare-exchange,
            pure HBM bandwidth); the log2(TILE) remaining stages fuse into
            ONE per-tile VMEM kernel.

HBM traffic: 1 round trip (phase A) + sum_{p}(log2(P/TILE) + 1) round
trips, ~28 at n=2^25 vs XLA's effective ~90 — measured 2-3x on chip.

Orders rows ascending by the first `num_keys` operands compared
lexicographically; remaining operands ride along as payload.  All operands
are uint32 bit patterns (callers cast).  The sort is NOT stable, but when
ALL operands are keys the output arrays are bit-identical to lax.sort's
(ties are identical rows).

Direction convention (standard bitonic): during phase of run length P an
element at global flat index i sorts ascending iff (i & P) == 0; the final
phase (P == n_pad) is ascending everywhere.  Compare-exchange at distance
d pairs i with i^d; with lt_ps = partner<self, element i takes its partner
iff lt_ps XOR ((i&d)==0 XOR asc) — ties never swap across distinct rows
because full-key ties are only possible between identical key tuples.

Reference behavior pinned: kmer.count.reduce_occurrences requires only
grouped-equal rows with (barcode) adjacency inside each kmer run, which any
exact (a,b,c,pk) sort provides (BuildReadQGraph48.cc:140-196 Kmerizer
map/reduce contract).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 4096  # 2^19 elements per tile (8 MB for 4 u32 operands)

U32 = jnp.uint32
I32 = jnp.int32
SENT = np.uint32(0xFFFFFFFF)


def _lex_cmp(xs, ys, num_keys: int):
    """(xs < ys, xs == ys) lexicographic over the first num_keys operands."""
    lt = None
    eq = None
    for k in range(num_keys):
        a, b = xs[k], ys[k]
        l_k = a < b
        term = l_k if eq is None else (eq & l_k)
        lt = term if lt is None else (lt | term)
        e_k = a == b
        eq = e_k if eq is None else (eq & e_k)
    return lt, eq


def _partner(x, d: int):
    """Value at flat row-major index i^d over a (R, LANES) tile (d < R*LANES,
    d a power of two)."""
    r, l = x.shape
    if d >= LANES:
        rr = d // LANES
        x4 = x.reshape(r // (2 * rr), 2, rr, l)
        sw = jnp.concatenate([x4[:, 1:2], x4[:, 0:1]], axis=1)
        return sw.reshape(r, l)
    up = pltpu.roll(x, l - d, axis=1)  # up[i] = x[i + d]  (lane wrap)
    dn = pltpu.roll(x, d, axis=1)  # dn[i] = x[i - d]
    lane = jax.lax.broadcasted_iota(I32, x.shape, dimension=1)
    return jnp.where((lane & d) == 0, up, dn)


def _stage(cols, d: int, asc, flat, num_keys: int):
    """One compare-exchange stage at distance d (in-tile)."""
    part = [_partner(x, d) for x in cols]
    lt_ps, eq = _lex_cmp(part, cols, num_keys)  # partner < self
    is_lo = (flat & d) == 0
    # never swap on full-key ties: both sides keeping self is a valid
    # comparator outcome; one-sided take would DUPLICATE payload rows
    take = (lt_ps ^ (is_lo ^ asc)) & ~eq
    return [jnp.where(take, p, x) for p, x in zip(part, cols)]


def _tile_sort_kernel(tile_rows: int, num_keys: int, n_ops: int, *refs):
    """Full bitonic sort of one tile; run direction alternates by tile so
    phase-A output feeds the merge phases directly."""
    ins, outs = refs[:n_ops], refs[n_ops:]
    t = pl.program_id(0)
    cols = [r[...] for r in ins]
    tile = tile_rows * LANES
    row = jax.lax.broadcasted_iota(I32, cols[0].shape, dimension=0)
    lane = jax.lax.broadcasted_iota(I32, cols[0].shape, dimension=1)
    gflat = t * tile + row * LANES + lane
    p = 2
    while p <= tile:
        asc = (gflat & p) == 0
        d = p // 2
        while d >= 1:
            cols = _stage(cols, d, asc, gflat, num_keys)
            d //= 2
        p *= 2
    for k in range(n_ops):
        outs[k][...] = cols[k]


def _local_merge_kernel(
    phase: int, tile_rows: int, num_keys: int, n_ops: int, *refs
):
    """All sub-tile stages (d = TILE/2 .. 1) of one merge phase; the
    direction bit (phase >= 2*TILE) is constant across the tile."""
    ins, outs = refs[:n_ops], refs[n_ops:]
    t = pl.program_id(0)
    cols = [r[...] for r in ins]
    tile = tile_rows * LANES
    row = jax.lax.broadcasted_iota(I32, cols[0].shape, dimension=0)
    lane = jax.lax.broadcasted_iota(I32, cols[0].shape, dimension=1)
    flat = row * LANES + lane
    asc = ((t * tile) & phase) == 0  # scalar
    d = tile // 2
    while d >= 1:
        cols = _stage(cols, d, asc, flat, num_keys)
        d //= 2
    for k in range(n_ops):
        outs[k][...] = cols[k]


def _cross_kernel(phase: int, dist_tiles: int, tile_rows: int,
                  num_keys: int, n_ops: int, *refs):
    """One compare-exchange stage at distance >= TILE: each program holds
    the (lo, hi) tile pair as axis 1 of its block."""
    ins, outs = refs[:n_ops], refs[n_ops:]
    q = pl.program_id(0)
    r = pl.program_id(1)
    tile = tile_rows * LANES
    t_lo = q * 2 * dist_tiles + r
    asc = ((t_lo * tile) & phase) == 0  # scalar
    blocks = [r_[...] for r_ in ins]
    los = [x[0, 0, 0] for x in blocks]
    his = [x[0, 1, 0] for x in blocks]
    lt, eq = _lex_cmp(his, los, num_keys)  # hi < lo
    swap = (lt == asc) & ~eq  # asc: swap iff hi<lo; desc: iff lo<hi
    new_lo = [jnp.where(swap, h, l) for h, l in zip(his, los)]
    new_hi = [jnp.where(swap, l, h) for h, l in zip(his, los)]
    for k in range(n_ops):
        outs[k][0, 0, 0] = new_lo[k]
        outs[k][0, 1, 0] = new_hi[k]


@partial(
    jax.jit,
    static_argnames=("num_keys", "tile_rows", "interpret"),
)
def sort_bitonic_pallas(
    *cols,
    num_keys: int,
    tile_rows: int = TILE_ROWS,
    interpret: bool = False,
):
    """Sort uint32 operand arrays ascending by the first num_keys operands
    (lexicographic); the rest are payload.  Pads to the next power of two
    with all-ones keys (== kc.SENTINEL rows, which sort last).  Returns the
    sorted operands trimmed back to the input length."""
    n = cols[0].shape[0]
    n_ops = len(cols)
    tile = tile_rows * LANES
    n_pad = tile
    while n_pad < n:
        n_pad *= 2
    tiles = n_pad // tile

    def prep(x, fill):
        x = jnp.asarray(x)
        assert x.dtype == U32, "sort_bitonic_pallas operands must be uint32"
        if x.shape[0] < n_pad:
            x = jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)
        return x.reshape(n_pad // LANES, LANES)

    arrs = [prep(c, SENT if k < num_keys else 0) for k, c in enumerate(cols)]

    bspec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shapes = tuple(
        jax.ShapeDtypeStruct((n_pad // LANES, LANES), U32)
        for _ in range(n_ops)
    )
    arrs = pl.pallas_call(
        partial(_tile_sort_kernel, tile_rows, num_keys, n_ops),
        grid=(tiles,),
        in_specs=[bspec] * n_ops,
        out_specs=tuple([bspec] * n_ops),
        out_shape=shapes,
        interpret=interpret,
    )(*arrs)

    phase = 2 * tile
    while phase <= n_pad:
        d = phase // 2
        while d >= tile:
            dist_tiles = d // tile
            # view: (groups, 2, dist_tiles, tile_rows, LANES); the (lo, hi)
            # tiles of each pair sit at axis-1 indices 0/1 of one block
            view = [
                a.reshape(
                    tiles // (2 * dist_tiles), 2, dist_tiles,
                    tile_rows, LANES,
                )
                for a in arrs
            ]
            cspec = pl.BlockSpec(
                (1, 2, 1, tile_rows, LANES),
                lambda q, r: (q, 0, r, 0, 0),
                memory_space=pltpu.VMEM,
            )
            cshapes = tuple(
                jax.ShapeDtypeStruct(view[0].shape, U32) for _ in range(n_ops)
            )
            view = pl.pallas_call(
                partial(
                    _cross_kernel, phase, dist_tiles, tile_rows,
                    num_keys, n_ops,
                ),
                grid=(tiles // (2 * dist_tiles), dist_tiles),
                in_specs=[cspec] * n_ops,
                out_specs=tuple([cspec] * n_ops),
                out_shape=cshapes,
                interpret=interpret,
            )(*view)
            arrs = [v.reshape(n_pad // LANES, LANES) for v in view]
            d //= 2
        arrs = pl.pallas_call(
            partial(_local_merge_kernel, phase, tile_rows, num_keys, n_ops),
            grid=(tiles,),
            in_specs=[bspec] * n_ops,
            out_specs=tuple([bspec] * n_ops),
            out_shape=shapes,
            interpret=interpret,
        )(*arrs)
        phase *= 2

    return tuple(a.reshape(-1)[:n] for a in arrs)
