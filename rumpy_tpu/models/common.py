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


# torch nn.Conv2d / nn.Linear DEFAULT initialization:
# kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)), i.e. uniform
# variance-scaling with scale 1/3. The reference's networks train from
# torch defaults (only RRDB overrides, via default_init_weights) — with
# flax's lecun_normal (3x the variance) RCAN's 200-conv residual trunk
# amplifies activations exponentially with depth: |out| at init measured
# 1.3e8 for the full 10-group model vs 0.8 for the torch reference.
TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")
# kaiming_normal scaled by 0.1 (BasicSR default_init_weights(scale=0.1),
# generators.py:40-59): std = 0.1 * sqrt(2 / fan_in).
RRDB_KERNEL_INIT = nn.initializers.variance_scaling(0.02, "fan_in",
                                                    "normal")
# kaiming_normal a=0 fan_in (reference initialize_weights(scale=1),
# manet/architectures.py:9-26, DCLS.py:258).
HE_NORMAL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# normal(0, sqrt(2/(k*k*out_ch))) — he-normal over fan_out (reference
# waveletnets/architectures.py:241-247).
HE_FANOUT_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# trunc_normal(std=.02) for transformer Dense layers (reference
# swinIR/architectures.py trunc_normal_ via timm).
TRUNC_NORMAL_INIT = nn.initializers.truncated_normal(stddev=0.02)


class TConv(nn.Conv):
    """nn.Conv with the torch default kernel init (bias stays zeros — the
    torch U(+-1/sqrt(fan_in)) bias draw is a ~0.04-bound perturbation
    with no effect on trainability; documented deviation)."""
    kernel_init: Any = TORCH_KERNEL_INIT


class TDense(nn.Dense):
    """nn.Dense with the torch default kernel init."""
    kernel_init: Any = TORCH_KERNEL_INIT


class TConvTranspose(nn.ConvTranspose):
    """nn.ConvTranspose with the torch default kernel init (torch computes
    the bound from the transposed fan; the O(1) scale is what matters for
    trainability — documented deviation)."""
    kernel_init: Any = TORCH_KERNEL_INIT


class Conv(nn.Module):
    """3x3-ish conv with 'SAME' padding — the zoo's default_conv."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return TConv(self.features, (self.kernel_size, self.kernel_size),
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
        y = TConv(max(1, self.features // self.reduction), (1, 1), dtype=self.dtype,
                  param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = TConv(self.features, (1, 1), dtype=self.dtype,
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
