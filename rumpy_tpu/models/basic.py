"""Basic SISR family: SRCNN and VDSR.

Reference: rumpy/SISR/models/basic/{architectures,handlers}.py — both take a
pre-interpolated Y-channel input (``im_input='interp'``, colorspace ycbcr)
and train with MSE; VDSR adds a global residual and grad clipping (0.1).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn

from rumpy_tpu.models.common import TConv
import jax.numpy as jnp

from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.registry import register_model


class ConvStack(nn.Module):
    """Plain conv->relu stack (SRCNN); `residual` adds the VDSR skip."""
    kernel_pattern: Sequence[int] = (9, 5, 5)
    channel_pattern: Sequence[int] = (1, 64, 32, 1)
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        depth = len(self.kernel_pattern)
        for i, (k, c_out) in enumerate(zip(self.kernel_pattern,
                                           self.channel_pattern[1:])):
            x = TConv(c_out, (k, k), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            if i != depth - 1:
                x = nn.relu(x)
        if self.residual:
            x = x + inp
        return x


@register_model("srcnn")
class SRCNNHandler(BaseHandler):
    loss_type = "mse"
    colorspace = "ycbcr"
    im_input = "interp"

    def __init__(self, kernel_pattern=None, channel_pattern=None, **kwargs):
        kwargs.setdefault("in_features", 1)
        super().__init__(kernel_pattern=tuple(kernel_pattern or (9, 5, 5)),
                         channel_pattern=tuple(channel_pattern or (1, 64, 32, 1)),
                         **kwargs)

    def build_module(self, kernel_pattern, channel_pattern):
        return ConvStack(kernel_pattern=kernel_pattern,
                         channel_pattern=channel_pattern,
                         residual=False, dtype=self.dtype)


@register_model("vdsr")
class VDSRHandler(BaseHandler):
    loss_type = "mse"
    colorspace = "ycbcr"
    im_input = "interp"

    def __init__(self, kernel_pattern=None, channel_pattern=None,
                 grad_clip: Optional[float] = 0.1, **kwargs):
        kwargs.setdefault("in_features", 1)
        super().__init__(kernel_pattern=tuple(kernel_pattern or (3,) * 20),
                         channel_pattern=tuple(channel_pattern
                                               or (1,) + (64,) * 19 + (1,)),
                         grad_clip=grad_clip, **kwargs)

    def build_module(self, kernel_pattern, channel_pattern):
        return ConvStack(kernel_pattern=kernel_pattern,
                         channel_pattern=channel_pattern,
                         residual=True, dtype=self.dtype)
