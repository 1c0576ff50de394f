"""Per-example blur application as one grouped depthwise conv.

Reference behavior: filter2D — reflect-pad then 2-D cross-correlation of
each image with its own kernel (real_esrgan_blur.py:433+; BatchBlur in
srmd_gaussian_blur.py:316-338 does the same with grouped conv).

TPU design: instead of vmapping a conv per example, the batch is folded
into the channel axis — (B,H,W,C) -> (1,H,W,B*C) — and blurred with a
single depthwise conv (feature_group_count=B*C) whose filters are the
per-example kernels broadcast across that example's channels. One conv op,
fully tiled by XLA, no host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_kernels(images: jnp.ndarray, kernels: jnp.ndarray,
                  pad_mode: str = "reflect") -> jnp.ndarray:
    """Blur each image with its own kernel.

    :param images: (B, H, W, C) float array.
    :param kernels: (B, k, k) float array (normalized).
    :param pad_mode: 'reflect' matches torch F.pad(mode='reflect').
    """
    b, h, w, c = images.shape
    k = kernels.shape[-1]
    pad = k // 2
    x = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode=pad_mode)
    # Fold batch into channels: (1, H+2p, W+2p, B*C).
    x = jnp.moveaxis(x, 0, 2).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    # Filters: (k, k, 1, B*C), channel order matching the fold above
    # (channel index = b*C + c after moveaxis/reshape => kernel per b).
    filt = jnp.repeat(kernels.astype(images.dtype), c, axis=0)  # (B*C, k, k)
    filt = jnp.moveaxis(filt, 0, -1)[:, :, None, :]  # (k, k, 1, B*C)
    out = jax.lax.conv_general_dilated(
        x, filt, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out.reshape(h, w, b, c), 2, 0)
