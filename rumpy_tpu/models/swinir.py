"""SwinIR — Swin-transformer SR.

Reference: rumpy/SISR/models/swinIR/ (857 LoC, marked "untested" in
Documentation/framework_development.md:92-115). This is a faithful compact
implementation: shallow conv embed, residual Swin transformer blocks
(window MSA with relative position bias, shifted windows, LayerNorm+MLP),
conv after body, pixel-shuffle reconstruction.

TPU notes: window partitioning is pure reshapes; attention is batched
matmuls over (num_windows*B, tokens, heads) — MXU-friendly at window
size 8. Input is reflect-padded to a window multiple and cropped back.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.models.common import (Conv, TRUNC_NORMAL_INIT, TDense,
                                     Upsampler)
from rumpy_tpu.registry import register_model


class SDense(TDense):
    """SwinIR Dense: trunc_normal(std=.02) like the reference's
    _init_weights on nn.Linear (swinIR/architectures.py)."""
    kernel_init: object = TRUNC_NORMAL_INIT


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B_, N, C) with N = window_size^2
        b_, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = SDense(self.dim * 3, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scale = head_dim ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        rpb_table = self.param("relative_position_bias",
                               nn.initializers.normal(0.02),
                               ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
        return SDense(self.dim, dtype=self.dtype,
                        param_dtype=jnp.float32)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C); H, W are window multiples
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype)(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        # window partition
        xw = x.reshape(b, h // ws, ws, w // ws, ws, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        mask = self._attn_mask(h, w) if self.shift else None
        xw = WindowAttention(self.dim, ws, self.num_heads,
                             dtype=self.dtype)(xw, mask)
        x = xw.reshape(b, h // ws, w // ws, ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x
        # MLP
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = SDense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        y = nn.gelu(y)
        y = SDense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(y)
        return x + y

    def _attn_mask(self, h, w):
        ws, shift = self.window_size, self.shift
        img_mask = np.zeros((1, h, w, 1))
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wss in (slice(0, -ws), slice(-ws, -shift),
                        slice(-shift, None)):
                img_mask[:, hs, wss, :] = cnt
                cnt += 1
        mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
        mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
        diff = mw[:, None, :] - mw[:, :, None]
        return jnp.asarray(np.where(diff != 0, -100.0, 0.0),
                           jnp.float32)


class RSTB(nn.Module):
    """Residual Swin transformer block group."""
    dim: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.depth):
            res = SwinBlock(self.dim, self.num_heads, self.window_size,
                            shift=0 if i % 2 == 0 else self.window_size // 2,
                            mlp_ratio=self.mlp_ratio,
                            dtype=self.dtype)(res)
        res = Conv(self.dim, 3, dtype=self.dtype)(res)
        return x + res


# SwinIR's RGB mean (architectures.py:646-649)
_SWIN_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def _nearest_up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class SwinIR(nn.Module):
    """Full reference layout (swinIR/architectures.py:607-817): mean-shift
    by img_range, conv_first, patch-embed LayerNorm, RSTB stack, final
    LayerNorm, conv_after_body + residual, then one of the reference's
    reconstruction heads ('pixelshuffle' / 'pixelshuffledirect' /
    'nearest+conv' / '' denoising tail)."""
    scale: int = 4
    in_chans: int = 3
    embed_dim: int = 60
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    num_feat: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        ws = self.window_size
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
        mean = (jnp.asarray(_SWIN_RGB_MEAN, x.dtype)
                if self.in_chans == 3 else jnp.zeros((1,), x.dtype))
        x = (x - mean) * self.img_range

        feat = Conv(self.embed_dim, 3, dtype=self.dtype)(x)
        # patch_embed norm (patch_norm=True default): LayerNorm on tokens
        res = nn.LayerNorm(dtype=self.dtype)(feat)
        for depth, heads in zip(self.depths, self.num_heads):
            res = RSTB(self.embed_dim, depth, heads, ws,
                       mlp_ratio=self.mlp_ratio, dtype=self.dtype)(res)
        res = nn.LayerNorm(dtype=self.dtype)(res)  # self.norm
        res = Conv(self.embed_dim, 3, dtype=self.dtype)(res)  # after_body
        feat = feat + res

        lrelu = lambda v, s: jnp.where(v >= 0, v, s * v)
        if self.upsampler == "pixelshuffle":
            feat = Conv(self.num_feat, 3, dtype=self.dtype)(feat)
            feat = lrelu(feat, 0.01)  # LeakyReLU(inplace=True) default
            feat = Upsampler(self.scale, self.num_feat,
                             dtype=self.dtype)(feat)
            out = Conv(self.in_chans, 3, dtype=self.dtype)(feat)
        elif self.upsampler == "pixelshuffledirect":
            from rumpy_tpu.models.common import pixel_shuffle
            out = Conv(self.in_chans * self.scale ** 2, 3,
                       dtype=self.dtype)(feat)
            out = pixel_shuffle(out, self.scale)
        elif self.upsampler == "nearest+conv":
            # real-world SR head (x4 only in the reference)
            feat = Conv(self.num_feat, 3, dtype=self.dtype)(feat)
            feat = lrelu(feat, 0.01)
            feat = lrelu(Conv(self.num_feat, 3,
                              dtype=self.dtype)(_nearest_up2(feat)), 0.2)
            feat = lrelu(Conv(self.num_feat, 3,
                              dtype=self.dtype)(_nearest_up2(feat)), 0.2)
            feat = lrelu(Conv(self.num_feat, 3, dtype=self.dtype)(feat),
                         0.2)
            out = Conv(self.in_chans, 3, dtype=self.dtype)(feat)
        else:
            # denoising / artifact-removal tail: residual conv
            out = x + Conv(self.in_chans, 3, dtype=self.dtype)(feat)

        out = out / self.img_range + mean
        return out[:, :h * self.scale, :w * self.scale, :]


@register_model("swinir")
class SwinIRHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, embed_dim=60, depths=(6, 6, 6, 6),
                 num_heads=(6, 6, 6, 6), window_size=8,
                 mlp_ratio=2.0, img_range=1.0,
                 upsampler="pixelshuffle", **kwargs):
        super().__init__(embed_dim=embed_dim, depths=tuple(depths),
                         num_heads=tuple(num_heads),
                         window_size=window_size, mlp_ratio=mlp_ratio,
                         img_range=img_range, upsampler=upsampler,
                         **kwargs)

    def build_module(self, **kw):
        return SwinIR(scale=self.scale, in_chans=self.in_features,
                      dtype=self.dtype, **kw)
