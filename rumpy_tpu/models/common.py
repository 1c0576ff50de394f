"""Shared SR building blocks (flax.linen, NHWC, TPU-first).

Equivalents of the reference's rumpy/SISR/models/advanced/common.py
(default_conv / MeanShift / ResBlock / Upsampler) re-designed for TPU:

  * NHWC layout end-to-end — channels-last rides the TPU conv units and
    avoids transposes at every boundary.
  * PixelShuffle is a pure reshape/transpose (no depth_to_space custom op
    needed; XLA fuses it into the neighboring conv).
  * Modules take a ``dtype`` for bf16 activation compute with fp32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# DIV2K RGB channel means in [0,1] (as used by EDSR/RCAN MeanShift layers).
DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Depth-to-space on NHWC: (N, H, W, C*s^2) -> (N, H*s, W*s, C).

    Channel ordering matches torch.nn.PixelShuffle (C-contiguous blocks of
    s*s per output channel), so torch-trained weights port directly.
    """
    n, h, w, c = x.shape
    oc = c // (scale * scale)
    x = x.reshape(n, h, w, oc, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * scale, w * scale, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Space-to-depth inverse of :func:`pixel_shuffle`."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // scale, scale, w // scale, scale, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // scale, w // scale, c * scale * scale)


class Conv(nn.Module):
    """3x3-ish conv with 'SAME' padding — the zoo's default_conv."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class MeanShift(nn.Module):
    """Subtract/add fixed RGB mean (EDSR/RCAN head/tail normalization)."""
    sign: int = -1
    rgb_range: float = 1.0
    rgb_mean: Sequence[float] = DIV2K_RGB_MEAN

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype) * self.rgb_range
        return x + self.sign * mean


class ResBlock(nn.Module):
    """EDSR-style residual block: conv-act-conv, optional residual scale."""
    features: int
    kernel_size: int = 3
    res_scale: float = 1.0
    act: Callable = nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, self.kernel_size, dtype=self.dtype)(x)
        h = self.act(h)
        h = Conv(self.features, self.kernel_size, dtype=self.dtype)(h)
        return x + h * self.res_scale


class Upsampler(nn.Module):
    """Sub-pixel upsampler: conv to C*s^2 then pixel shuffle, staged in
    factors of 2 (or a single x3 stage), like the reference zoo's tail."""
    scale: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.scale
        if scale == 1:
            return x
        stages = []
        s = scale
        while s % 2 == 0:
            stages.append(2)
            s //= 2
        if s == 3:
            stages.append(3)
        elif s != 1:
            raise ValueError(f"Unsupported scale {scale}")
        for st in stages:
            x = Conv(self.features * st * st, 3, dtype=self.dtype)(x)
            x = pixel_shuffle(x, st)
        return x


class CALayer(nn.Module):
    """Channel attention (RCAN): global-avg-pool -> 1x1 reduce -> 1x1 expand
    -> sigmoid gate. (reference: advanced/architectures.py:24-56)"""
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(max(1, self.features // self.reduction), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        return x * y


class RCAB(nn.Module):
    """Residual channel attention block (RCAN)."""
    features: int
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, 3, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = Conv(self.features, 3, dtype=self.dtype)(h)
        h = CALayer(self.features, self.reduction, dtype=self.dtype)(h)
        return x + h * self.res_scale
