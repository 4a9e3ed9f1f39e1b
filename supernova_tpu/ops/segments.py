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
