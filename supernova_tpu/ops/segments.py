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


# --------- sorted-run reductions via cumsum + boundary gathers (no scatter
# per reduction — TPU scatters serialize; cumsum/gather are bandwidth-bound)

def run_boundaries(starts):
    """starts bool (N,) -> start_pos (N+1,) int32: start_pos[s] = first row
    of run s, = N for s >= n_runs (so end of run s is start_pos[s+1])."""
    n = starts.shape[0]
    sid = jnp.cumsum(starts.astype(jnp.int32)) - 1
    sp = jnp.full((n + 1,), n, jnp.int32)
    idx = jnp.where(starts, sid, n)
    return sp.at[idx].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


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

    Returns (n_valid scalar int32, compacted arrays).  One linear scatter
    per array (destination = exclusive cumsum of valid); invalid rows keep
    the output's zero fill.
    """
    valid = jnp.asarray(valid)
    n = valid.shape[0]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, pos, n)  # dropped for invalid rows
    res = []
    for a in arrays:
        a = jnp.asarray(a)
        out = jnp.zeros_like(a)
        res.append(out.at[idx].set(a, mode="drop"))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return n_valid, tuple(res)


def masked_fill_rows(arr, valid, fill):
    """Set invalid rows of (N,) or (N,W) array to `fill`."""
    arr = jnp.asarray(arr)
    v = valid if arr.ndim == 1 else valid[:, None]
    return jnp.where(v, arr, jnp.asarray(fill, arr.dtype))
