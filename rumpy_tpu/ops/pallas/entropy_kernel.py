"""Pallas TPU kernel: local-histogram entropy.

The XLA path (ops/entropy.py) one-hots the image into (H, W, levels)
planes and box-filters every plane — `levels`x the memory traffic of the
image. This kernel accumulates per-column histograms in VMEM for an 8-row
output block (TPU sublane granularity): no materialized (H, W, L) tensor
ever exists.

Layout strategy for Mosaic's alignment rules: the image is edge-padded by
half a window vertically (so no boundary clamping inside the kernel) and
rounded up so every program's load starts at a multiple-of-8 row with a
multiple-of-8 row count; per-output-row window slices are then fully
static. Boundary convention is edge-replication (vs the XLA path's
zero-count truncation); interior pixels are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 8  # TPU sublane granularity


def _entropy_block_kernel(img_ref, out_ref, *, region: int, levels: int,
                          width: int, load_rows: int):
    i = pl.program_id(0)
    half = region // 2
    level_ids = jax.lax.broadcasted_iota(jnp.int32, (levels, width), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (levels, width), 1)

    start = pl.multiple_of(i * _BLOCK_ROWS, _BLOCK_ROWS)
    rows = img_ref[pl.ds(start, load_rows), :]  # aligned load

    for j in range(_BLOCK_ROWS):
        window = rows[j:j + region, :]  # static slice per output row
        col_hist = jnp.zeros((levels, width), jnp.float32)
        for r in range(region):
            row = window[r, :]
            col_hist = col_hist + (level_ids
                                   == row[None, :]).astype(jnp.float32)
        hist = jnp.zeros_like(col_hist)
        for dx in range(-half, region - half):
            shifted = pltpu.roll(col_hist, (-dx) % width, 1)
            valid = (col_ids + dx >= 0) & (col_ids + dx < width)
            hist = hist + jnp.where(valid, shifted, 0.0)
        total = jnp.sum(hist, axis=0, keepdims=True)
        p = hist / jnp.maximum(total, 1.0)
        ent = -jnp.sum(jnp.where(p > 0, p * jnp.log2(p), 0.0), axis=0)
        out_ref[j, :] = ent


@functools.partial(jax.jit,
                   static_argnames=("region", "levels", "interpret"))
def local_entropy_pallas(gray_u8: jnp.ndarray, region: int = 10,
                         levels: int = 64,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-pixel window entropy of an (H, W) uint8-valued array."""
    h, w = gray_u8.shape
    half = region // 2
    q = ((gray_u8.astype(jnp.int32) * levels) // 256 if levels != 256
         else gray_u8.astype(jnp.int32))

    # pad: `half` rows of edge context on top, then round the total so the
    # last program's aligned load stays in range
    out_rows = -(-h // _BLOCK_ROWS) * _BLOCK_ROWS
    load_rows = -(-(region + _BLOCK_ROWS - 1) // _BLOCK_ROWS) * _BLOCK_ROWS
    total_rows = out_rows + load_rows  # generous tail padding
    q = jnp.pad(q, ((half, 0), (0, 0)), mode="edge")
    q = jnp.pad(q, ((0, total_rows - q.shape[0]), (0, 0)), mode="edge")

    kernel = functools.partial(_entropy_block_kernel, region=region,
                               levels=levels, width=w,
                               load_rows=load_rows)
    out = pl.pallas_call(
        kernel,
        grid=(out_rows // _BLOCK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, w), jnp.float32),
        interpret=interpret,
    )(q)
    return out[:h]
