"""Sorted-segment reductions and stable compaction.

TPU-native replacement for the reference's MapReduceEngine reduce phase
(lib/assembly/src/MapReduceEngine.h) — after a device sort, groups are
contiguous runs, and reductions become segment ops with sorted indices.

All functions are static-shape: num_segments is always the (padded) input
length N — every row could be unique — and callers track the true count
with scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def run_starts(*key_arrays):
    """Boolean mask marking the first row of each run of equal keys.

    Each key array is (N,) (or (N,W), compared row-wise).  Row 0 is a start.
    """
    n = key_arrays[0].shape[0]
    neq = jnp.zeros((n,), bool)
    for k in key_arrays:
        k = jnp.asarray(k)
        if k.ndim == 1:
            k = k[:, None]
        d = jnp.any(k[1:] != k[:-1], axis=-1)
        neq = neq.at[1:].set(neq[1:] | d)
    return neq.at[0].set(True)


def segment_ids_from_starts(starts):
    """starts bool (N,) -> contiguous segment ids (N,) int32 (0-based)."""
    return jnp.cumsum(starts.astype(jnp.int32)) - 1


def seg_sum(values, seg_ids, num_segments: int):
    return jax.ops.segment_sum(
        values, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )


def seg_max(values, seg_ids, num_segments: int):
    return jax.ops.segment_max(
        values, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )


def seg_min(values, seg_ids, num_segments: int):
    return jax.ops.segment_min(
        values, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )


def seg_or_mask(masks, seg_ids, num_segments: int, nbits: int):
    """Bitwise-OR reduce small bitmasks per segment (nbits static, small).

    OR == per-bit max; decompose, segment_max each bit, reassemble.
    """
    masks = jnp.asarray(masks)
    out = jnp.zeros((num_segments,), masks.dtype)
    for b in range(nbits):
        bit = (masks >> b) & 1
        out = out | (seg_max(bit, seg_ids, num_segments) << b)
    return out


# --------- sorted-run reductions.
# Primitive costs measured on v5e (48M rows): cumsum 0.05s, stable sort
# 0.4-0.6s, scatter 0.4s, gather 1.4s, vectorized binary search 25s.
# Hot reductions therefore use cumsum + cummax run-broadcast + ONE sort (or
# scatter) for placement; binary search only at <= ~1M query scale.

def positions_of_ones(flags, out_len: int):
    """pos[j] = index of the (j+1)-th True in flags, or N if none.
    NOTE: O(out_len * log N) binary search — use only when out_len is small
    relative to N (reads, edges); never at occurrence scale."""
    n = flags.shape[0]
    cs = jnp.cumsum(flags.astype(jnp.int32))
    j = jnp.arange(1, out_len + 1, dtype=jnp.int32)
    return jnp.searchsorted(cs, j, side="left").astype(jnp.int32)


def run_boundaries(starts):
    """starts bool (N,) -> start_pos (N+1,) int32: start_pos[s] = first row
    of run s, = N for s >= n_runs (so end of run s is start_pos[s+1]).
    Scatter-based placement (cheaper than search/gather at this scale)."""
    n = starts.shape[0]
    sid = jnp.cumsum(starts.astype(jnp.int32)) - 1
    sp = jnp.full((n + 1,), n, jnp.int32)
    idx = jnp.where(starts, sid, n)
    return sp.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def run_broadcast_from_start(values, starts, fill=0):
    """Per-row value of the row's run start, propagated forward without
    gathers: requires `values` to be NON-DECREASING along the array (true
    for cumsums) — then a cummax of the masked start values is exact."""
    masked = jnp.where(starts, values, fill)
    return jax.lax.cummax(masked)


def run_end_mask(starts):
    """Row is the last of its run."""
    return jnp.concatenate([starts[1:], jnp.ones((1,), bool)])


def run_sum(values, start_pos):
    """Per-run sum of values (N,) -> (N,) int32 (rows >= n_runs give 0)."""
    cs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(values.astype(jnp.int32))]
    )
    return cs[start_pos[1:]] - cs[start_pos[:-1]]


def run_any(bits, start_pos):
    return run_sum(bits.astype(jnp.int32), start_pos) > 0


def run_or_mask(masks, start_pos, nbits: int):
    """Bitwise-OR of small masks per run via per-bit run_any."""
    out = jnp.zeros((start_pos.shape[0] - 1,), masks.dtype)
    for b in range(nbits):
        out = out | (run_any((masks >> b) & 1, start_pos).astype(masks.dtype) << b)
    return out


def run_first(values, start_pos):
    """First row's value per run (works for 1-D arrays)."""
    n = values.shape[0]
    return values[jnp.minimum(start_pos[:-1], n - 1)]


def stable_compact(valid, *arrays):
    """Stable partition: rows with valid=True first, preserving order.

    Returns (n_valid scalar int32, compacted arrays).  One stable 1-key sort
    carrying all columns (sorts are the fastest bulk-movement primitive on
    TPU); invalid-tail rows are zeroed.
    """
    valid = jnp.asarray(valid)
    n = valid.shape[0]
    key = (~valid).astype(jnp.uint32)
    cols = []
    widths = []
    for a in arrays:
        a = jnp.asarray(a)
        if a.ndim == 1:
            cols.append(a)
            widths.append(0)
        else:
            widths.append(a.shape[1])
            for j in range(a.shape[1]):
                cols.append(a[:, j])
    out = jax.lax.sort((key, *cols), num_keys=1, is_stable=True)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    live = jnp.arange(n) < n_valid
    res = []
    pos = 1
    for w, a in zip(widths, arrays):
        a = jnp.asarray(a)
        if w == 0:
            res.append(jnp.where(live, out[pos], jnp.zeros((), a.dtype)))
            pos += 1
        else:
            stacked = jnp.stack(out[pos : pos + w], axis=-1)
            res.append(jnp.where(live[:, None], stacked, jnp.zeros((), a.dtype)))
            pos += w
    return n_valid, tuple(res)


def masked_fill_rows(arr, valid, fill):
    """Set invalid rows of (N,) or (N,W) array to `fill`."""
    arr = jnp.asarray(arr)
    v = valid if arr.ndim == 1 else valid[:, None]
    return jnp.where(v, arr, jnp.asarray(fill, arr.dtype))
