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

    Returns (n_valid scalar int32, compacted arrays).  Implemented as a
    stable sort on the invalid flag — TPU-friendly, no dynamic shapes.
    """
    key = (~valid).astype(jnp.int32)
    flat = []
    shapes = []
    for a in arrays:
        a = jnp.asarray(a)
        shapes.append(a.shape)
        flat.append(a if a.ndim == 1 else a.reshape(a.shape[0], -1))
    ops = [key]
    widths = []
    for a in flat:
        if a.ndim == 1:
            ops.append(a)
            widths.append(0)
        else:
            widths.append(a.shape[1])
            for j in range(a.shape[1]):
                ops.append(a[:, j])
    out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=True)
    res = []
    pos = 1
    for w, shape in zip(widths, shapes):
        if w == 0:
            res.append(out[pos])
            pos += 1
        else:
            res.append(jnp.stack(out[pos : pos + w], axis=-1).reshape(shape))
            pos += w
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return n_valid, tuple(res)


def masked_fill_rows(arr, valid, fill):
    """Set invalid rows of (N,) or (N,W) array to `fill`."""
    arr = jnp.asarray(arr)
    v = valid if arr.ndim == 1 else valid[:, None]
    return jnp.where(v, arr, jnp.asarray(fill, arr.dtype))
