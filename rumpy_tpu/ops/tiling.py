"""Spatial tiling for memory-bounded eval of large images.

Reference: SAN forward_chop (rumpy/SISR/models/advanced/handlers.py:85-134)
— recursive 4-way overlap-tile decomposition. This generic version works
for any (N,H,W,C)->(N,sH,sW,C) forward; recursion happens at the host
level, so each distinct tile shape compiles once and the pieces stream
through the chip sequentially (bounding peak HBM at ~tile size).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def forward_chop(forward: Callable, x: jnp.ndarray, scale: int,
                 shave: int = 10, max_size: int = 160000,
                 force_split: bool = False) -> jnp.ndarray:
    """force_split performs the reference SAN handler's UNCONDITIONAL
    top-level 4-way split (handlers.py:85-134 always tiles in run_eval,
    whatever the image size); recursion below the top level is size-gated
    as usual."""
    n, h, w, c = x.shape
    # stop when small enough OR when shaving can no longer shrink tiles
    if not force_split and (h * w <= max_size or h <= 2 * shave + 2
                            or w <= 2 * shave + 2):
        return forward(x)
    if force_split and (h // 2 == 0 or w // 2 == 0):
        return forward(x)  # degenerate: nothing to split
    h_half, w_half = h // 2, w // 2
    # clamp to the image: for small force_split inputs the shaved tile
    # would exceed the image and break the stitch arithmetic (the
    # reference never clamps because it only ever chops large images)
    h_size, w_size = min(h_half + shave, h), min(w_half + shave, w)
    tiles = [
        x[:, :h_size, :w_size],
        x[:, :h_size, (w - w_size):],
        x[:, (h - h_size):, :w_size],
        x[:, (h - h_size):, (w - w_size):],
    ]
    outs = [forward_chop(forward, t, scale, shave, max_size) for t in tiles]
    oh, ow = h * scale, w * scale
    oh_half, ow_half = h_half * scale, w_half * scale
    oh_size, ow_size = h_size * scale, w_size * scale
    out = jnp.zeros((n, oh, ow, c), outs[0].dtype)
    out = out.at[:, :oh_half, :ow_half].set(
        outs[0][:, :oh_half, :ow_half])
    out = out.at[:, :oh_half, ow_half:].set(
        outs[1][:, :oh_half, (ow_size - ow + ow_half):])
    out = out.at[:, oh_half:, :ow_half].set(
        outs[2][:, (oh_size - oh + oh_half):, :ow_half])
    out = out.at[:, oh_half:, ow_half:].set(
        outs[3][:, (oh_size - oh + oh_half):, (ow_size - ow + ow_half):])
    return out
