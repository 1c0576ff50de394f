"""SAN — second-order attention network (+ chopped eval, + Q variant).

Reference: rumpy/SISR/models/advanced/SAN_blocks.py + architectures.py:
260-331 + handlers.py:63-134. Second-order channel attention (SOCA) does
global covariance pooling with a Newton-Schulz matrix square root — a
stack of (C,C) matmuls, which is exactly what the MXU wants; the
region-level non-local block runs per image quadrant.

Eval-time memory is bounded via the generic overlap-tile chopper
(ops/tiling.py), the reference's forward_chop behavior.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, Upsampler
import jax
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import ParaCALayer, QModelHandler
from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.ops.tiling import forward_chop
from rumpy_tpu.registry import register_model


def _cov_sqrt(x: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """MPN-COV: covariance pooling + Newton-Schulz square root.
    x: (B, N, C) samples -> (B, C, C) matrix sqrt of covariance."""
    b, n, c = x.shape
    prec = jax.lax.Precision.HIGHEST
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    cov = jnp.einsum("bnc,bnd->bcd", xc, xc, precision=prec) / n
    # pre-normalize by trace
    tr = jnp.trace(cov, axis1=1, axis2=2)[:, None, None] + 1e-8
    a = cov / tr
    eye = jnp.eye(c, dtype=x.dtype)[None]
    y, z = a, jnp.broadcast_to(eye, a.shape)
    for _ in range(iters):
        t = 0.5 * (3.0 * eye - jnp.einsum("bij,bjk->bik", z, y,
                                          precision=prec))
        y = jnp.einsum("bij,bjk->bik", y, t, precision=prec)
        z = jnp.einsum("bij,bjk->bik", t, z, precision=prec)
    return y * jnp.sqrt(tr)


class SOCA(nn.Module):
    """Second-order channel attention (SAN_blocks.py:244-303)."""
    channel: int
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c).astype(jnp.float32)
        cov_sqrt = _cov_sqrt(flat)
        # mean over rows -> (B, C) channel statistic
        stat = jnp.mean(cov_sqrt, axis=1)[:, None, None, :].astype(x.dtype)
        y = TConv(max(1, self.channel // self.reduction), (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32)(stat)
        y = nn.relu(y)
        y = TConv(self.channel, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        return x * nn.sigmoid(y)


class NonLocalBlock2D(nn.Module):
    """Embedded-gaussian non-local block (SAN_blocks.py:11-149, bn off):
    f = softmax(theta @ phi^T), z = W(f @ g) + x.

    Note: the reference's 2-D branch rebinds its `sub_sample` flag to the
    nn.Upsample CLASS (SAN_blocks.py:39), so `if sub_sample:` is always
    truthy and g/phi are unconditionally followed by a stride-2 max-pool
    regardless of the `sub_sample=False` argument SAN passes. That actual
    behavior is reproduced here (and golden-tested)."""
    in_channels: int
    inter_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        conv1 = lambda ch: TConv(ch, (1, 1), dtype=self.dtype,
                                   param_dtype=jnp.float32)
        g_conv = conv1(self.inter_channels)
        w_conv = conv1(self.in_channels)
        pool = lambda t: nn.max_pool(t, (2, 2), (2, 2))
        g = pool(g_conv(x))
        m = g.shape[1] * g.shape[2]
        g = g.reshape(b, m, self.inter_channels)
        theta = conv1(self.inter_channels)(x).reshape(b, n,
                                                      self.inter_channels)
        phi = pool(conv1(self.inter_channels)(x)).reshape(
            b, m, self.inter_channels)
        f = jnp.einsum("bnc,bmc->bnm", theta, phi,
                       precision=jax.lax.Precision.HIGHEST)
        attn = jax.nn.softmax(f, axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", attn, g,
                       precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(b, h, w, self.inter_channels)
        y = w_conv(y)
        return y + x


class NonlocalCA(nn.Module):
    """Region-level non-local: four quadrants processed independently
    (SAN_blocks.py:305-336)."""
    in_feat: int = 64
    inter_feat: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h1, w1 = hh // 2, ww // 2
        block = NonLocalBlock2D(self.in_feat, self.inter_feat,
                                dtype=self.dtype)
        lu = block(x[:, :h1, :w1])
        ld = block(x[:, h1:, :w1])
        ru = block(x[:, :h1, w1:])
        rd = block(x[:, h1:, w1:])
        top = jnp.concatenate([lu, ru], axis=2)
        bot = jnp.concatenate([ld, rd], axis=2)
        return jnp.concatenate([top, bot], axis=1)


class RB(nn.Module):
    n_feat: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.n_feat, 3, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = Conv(self.n_feat, 3, dtype=self.dtype)(y)
        return x + y


class LSRAG(nn.Module):
    """Local-source residual attention group (SAN_blocks.py:366-420)."""
    n_feat: int
    n_resblocks: int = 10
    reduction: int = 8
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        residual = x
        for _ in range(self.n_resblocks):
            x = RB(self.n_feat, dtype=self.dtype)(x)
        x = SOCA(self.n_feat, self.reduction, dtype=self.dtype)(x)
        x = Conv(self.n_feat, 3, dtype=self.dtype)(x)
        if self.num_metadata > 0 and metadata is not None:
            x = ParaCALayer(self.n_feat, self.num_metadata,
                            nonlinearity=True, dtype=self.dtype)(x, metadata)
        return x + residual


class SAN(nn.Module):
    scale: int = 4
    n_colors: int = 3
    n_feats: int = 64
    n_resgroups: int = 20
    n_resblocks: int = 10
    reduction: int = 16
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        nl = NonlocalCA(self.n_feats, self.n_feats // 8, dtype=self.dtype)
        xx = nl(x)
        residual = xx
        for _ in range(self.n_resgroups):
            xx = LSRAG(self.n_feats, self.n_resblocks, self.reduction,
                       self.num_metadata, dtype=self.dtype)(xx, metadata) \
                + gamma * residual
        res = nl(xx)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(self.n_colors, 3, dtype=self.dtype)(res)


@register_model("san")
class SANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, n_feats=64, n_resgroups=20, n_resblocks=10,
                 max_combined_im_size=160000, **kwargs):
        self.max_combined_im_size = max_combined_im_size
        super().__init__(n_feats=n_feats, n_resgroups=n_resgroups,
                         n_resblocks=n_resblocks, **kwargs)

    def build_module(self, **kw):
        return SAN(scale=self.scale, dtype=self.dtype, **kw)

    def run_eval(self, state, batch):
        # the reference's run_eval ALWAYS tiles: forward_chop performs
        # an unconditional top-level 4-way split (handlers.py:126-134) —
        # SOCA/non-local are global ops, so tiled vs whole-image outputs
        # differ and parity requires the same tiling
        return forward_chop(
            lambda t: self._eval_step((state.params, state.extra),
                                      {"lr": t}),
            jnp.asarray(batch["lr"]), self.scale,
            max_size=self.max_combined_im_size, force_split=True)


@register_model("qsan")
class QSANHandler(QModelHandler):
    def __init__(self, n_feats=64, n_resgroups=20, n_resblocks=10,
                 max_combined_im_size=160000, **kwargs):
        self.max_combined_im_size = max_combined_im_size
        super().__init__(n_feats=n_feats, n_resgroups=n_resgroups,
                         n_resblocks=n_resblocks, **kwargs)

    def build_module(self, **kw):
        return SAN(scale=self.scale, num_metadata=self.num_metadata,
                   dtype=self.dtype, **kw)

    def run_eval(self, state, batch):
        # same memory-bounded always-tiled eval as SAN (the reference
        # QSANHandler carries its own forward_chop + max_combined_im_size,
        # attention_manipulators/handlers.py:105-170), with the metadata
        # vector threaded into every tile forward
        meta = batch.get("metadata")
        return forward_chop(
            lambda t: self._eval_step(
                (state.params, state.extra),
                {"lr": t, **({"metadata": meta} if meta is not None
                             else {})}),
            jnp.asarray(batch["lr"]), self.scale,
            max_size=self.max_combined_im_size, force_split=True)
