"""Pallas TPU kernel: sliding 48-mer word extraction.

Replaces the XLA shift-or chain in core.kmer_codec.sliding_words on the TPU
hot path: one VMEM-resident pass produces the three packed kmer words for
every start position.

Layout trick: base codes live as (rows, 128) int32 tiles; a flat shift by
b (< 128 lanes) is a lane roll of the current rows combined with a lane roll
of the next rows, selected at the lane seam:
    y[r, l] = x[r, l+b]            if l < 128-b
            = x[r+1, l+b-128]      otherwise
The kernel receives the same array twice with a one-row offset, so plain
non-overlapping BlockSpecs suffice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.kmer_codec import BASES_PER_WORD, KWORDS, W3

LANES = 128
BLOCK_ROWS = 256  # 256x128 int32 = 128 KiB per operand block


def _extract_kernel(cur_ref, nxt_ref, w0_ref, w1_ref, w2_ref):
    x0 = cur_ref[...]
    x1 = nxt_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, x0.shape, dimension=1)

    def shifted(b: int):
        if b == 0:
            return x0
        r0 = pltpu.roll(x0, LANES - b, axis=1)
        r1 = pltpu.roll(x1, LANES - b, axis=1)
        return jnp.where(lane < LANES - b, r0, r1)

    outs = (w0_ref, w1_ref, w2_ref)
    for w in range(KWORDS):
        acc = jnp.zeros(x0.shape, jnp.uint32)
        for i in range(BASES_PER_WORD):
            acc = (acc << np.uint32(2)) | shifted(
                w * BASES_PER_WORD + i
            ).astype(jnp.uint32)
        outs[w][...] = acc


@partial(jax.jit, static_argnames=("n", "interpret"))
def sliding_words_pallas(codes_ext, n: int, interpret: bool = False) -> W3:
    """codes_ext: (>= n + 128,) int32 base codes; n must be a multiple of
    128 * BLOCK_ROWS / ... (any multiple of 128 works — the grid pads rows).
    Returns W3 of (n,) uint32."""
    assert n % LANES == 0, "n must be a multiple of 128"
    rows = n // LANES
    rows_pad = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    need = rows_pad * LANES + LANES
    codes_ext = jnp.asarray(codes_ext).astype(jnp.int32)
    if codes_ext.shape[0] < need:
        codes_ext = jnp.pad(codes_ext, (0, need - codes_ext.shape[0]))
    cur = codes_ext[: rows_pad * LANES].reshape(rows_pad, LANES)
    nxt = codes_ext[LANES : rows_pad * LANES + LANES].reshape(rows_pad, LANES)

    grid = (rows_pad // BLOCK_ROWS,)
    spec = pl.BlockSpec(
        (BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows_pad, LANES), jnp.uint32)
    w0, w1, w2 = pl.pallas_call(
        _extract_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(cur, nxt)
    return W3(
        w0.reshape(-1)[:n], w1.reshape(-1)[:n], w2.reshape(-1)[:n]
    )
