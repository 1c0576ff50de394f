"""HAN and ELAN families (+ meta-attention Q variants).

Reference: rumpy/SISR/models/advanced/{HAN_blocks,ELAN_blocks}.py and
architectures.py:333-530; Q variants at
attention_manipulators/architectures.py:643-.

TPU notes:
  * HAN's layer-attention (LAM) is a batched matmul over flattened group
    outputs — a natural MXU op; CSAM's Conv3d becomes an NDHWC 3-D conv.
  * ELAN's shift-conv is expressed as pad+slice (zero-fill shifts, matching
    the reference's masked-conv semantics) followed by a 1x1 conv; GMSA
    window attention reshapes are pure layout ops XLA folds away, with the
    window-shift done by jnp.roll (torch.roll wrap semantics).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, Upsampler, pixel_shuffle
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import (ParaCALayer,
                                                     QModelHandler,
                                                     QResidualGroup)
from rumpy_tpu.models.advanced import ResidualGroup
from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.registry import register_model


# ---------------------------------------------------------------------------
# HAN
# ---------------------------------------------------------------------------

class LAMModule(nn.Module):
    """Layer attention over the stack of residual-group outputs
    (HAN_blocks.py:7-37). Input (B, N, H, W, C)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        flat = x.reshape(b, n, h * w * c)
        energy = jnp.einsum("bnd,bmd->bnm", flat, flat)
        energy_new = jnp.max(energy, -1, keepdims=True) - energy
        attention = nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attention, flat)
        out = out.reshape(b, n, h, w, c)
        out = gamma * out + x
        # flatten layers onto channels: (B, H, W, N*C)
        return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)


class CSAMModule(nn.Module):
    """Channel-spatial attention: sigmoid of a 3-D conv over (C, H, W)
    treated as a depth volume (HAN_blocks.py:40-76)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        vol = x.transpose(0, 3, 1, 2)[..., None]  # (B, C, H, W, 1) NDHWC
        conv = TConv(1, (3, 3, 3), dtype=self.dtype,
                       param_dtype=jnp.float32)(vol)
        attn = nn.sigmoid(conv)[..., 0].transpose(0, 2, 3, 1)  # (B,H,W,C)
        return x * (gamma * attn) + x


class HAN(nn.Module):
    scale: int = 4
    n_colors: int = 3
    n_feats: int = 64
    n_resgroups: int = 10
    n_resblocks: int = 20
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        stack = []
        for _ in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, self.n_resblocks,
                                self.reduction, self.res_scale,
                                dtype=self.dtype)(res)
            stack.append(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        stack.append(res)
        out1 = res
        # newest-first stacking (architectures.py:377-381)
        res1 = jnp.stack(stack[::-1], axis=1)
        la = LAMModule(dtype=self.dtype)(res1)
        out2 = Conv(self.n_feats, 3, dtype=self.dtype)(la)
        out1 = CSAMModule(dtype=self.dtype)(out1)
        out = jnp.concatenate([out1, out2], axis=-1)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(out)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(self.n_colors, 3, dtype=self.dtype)(res)


class QHAN(nn.Module):
    """HAN with meta-attention residual groups
    (attention_manipulators/architectures.py:643-741)."""
    scale: int = 4
    n_colors: int = 3
    n_feats: int = 64
    n_resgroups: int = 10
    n_resblocks: int = 20
    reduction: int = 16
    res_scale: float = 1.0
    num_metadata: int = 1
    style: str = "standard"
    include_q_layer: bool = True
    selective_meta_blocks: Optional[Tuple[bool, ...]] = None
    num_q_layers_inner_residual: Optional[int] = None
    num_layers_in_q_layer: int = 2
    include_sft_layer: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, meta_maps=None):
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        stack = []
        for g in range(self.n_resgroups):
            active = (self.selective_meta_blocks is None
                      or self.selective_meta_blocks[g])
            res = QResidualGroup(
                self.n_feats, self.n_resblocks, self.reduction, self.style,
                self.res_scale, q_layer=self.include_q_layer and active,
                sft_layer=self.include_sft_layer and active,
                num_q_layers=self.num_q_layers_inner_residual,
                num_metadata=self.num_metadata,
                num_layers_in_q_layer=self.num_layers_in_q_layer,
                dtype=self.dtype)(res, metadata, meta_maps)
            stack.append(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        stack.append(res)
        out1 = res
        res1 = jnp.stack(stack[::-1], axis=1)
        la = LAMModule(dtype=self.dtype)(res1)
        out2 = Conv(self.n_feats, 3, dtype=self.dtype)(la)
        out1 = CSAMModule(dtype=self.dtype)(out1)
        out = jnp.concatenate([out1, out2], axis=-1)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(out)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(self.n_colors, 3, dtype=self.dtype)(res)


# ---------------------------------------------------------------------------
# ELAN
# ---------------------------------------------------------------------------

def _shift(x, dy: int, dx: int):
    """Zero-fill spatial shift (the masked-conv shift of ShiftConv2d1)."""
    b, h, w, c = x.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pad[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]


class ShiftConv(nn.Module):
    """Grouped direction-shift + 1x1 conv (ELAN_blocks.py:49-70)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = c // 5
        parts = [
            _shift(x[..., 0 * g:1 * g], 0, 1),    # left
            _shift(x[..., 1 * g:2 * g], 0, -1),   # right
            _shift(x[..., 2 * g:3 * g], 1, 0),    # up
            _shift(x[..., 3 * g:4 * g], -1, 0),   # down
            x[..., 4 * g:],                        # identity
        ]
        y = jnp.concatenate(parts, axis=-1)
        return TConv(self.out_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)(y)


class LFE(nn.Module):
    out_channels: int
    exp_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ShiftConv(self.out_channels * self.exp_ratio, dtype=self.dtype)(x)
        y = nn.relu(y)
        return ShiftConv(self.out_channels, dtype=self.dtype)(y)


class GMSA(nn.Module):
    """Group multi-scale self-attention (ELAN_blocks.py:115-187)."""
    channels: int
    shifts: int = 0
    window_sizes: Tuple[int, ...] = (4, 8, 12)
    calc_attn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prev_atns=None, train: bool = False):
        b, h, w, c = x.shape
        mult = 2 if self.calc_attn else 1
        y = TConv(self.channels * mult, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(y)
        split = self.channels * mult // 3
        ys = []
        atns = []
        for idx in range(3):
            x_ = y[..., idx * split:(idx + 1) * split]
            wsize = self.window_sizes[idx]
            if self.shifts > 0:
                x_ = jnp.roll(x_, (-(wsize // 2), -(wsize // 2)),
                              axis=(1, 2))
            nh, nw = h // wsize, w // wsize
            if self.calc_attn:
                cc = split // 2
                # (B, nh, ws, nw, ws, 2c) -> windows (B*nh*nw, ws*ws, ...)
                win = x_.reshape(b, nh, wsize, nw, wsize, split)
                win = win.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b * nh * nw, wsize * wsize, split)
                q, v = win[..., :cc], win[..., cc:]
                atn = nn.softmax(
                    jnp.einsum("bnc,bmc->bnm", q, q), axis=-1)
                y_ = jnp.einsum("bnm,bmc->bnc", atn, v)
            else:
                win = x_.reshape(b, nh, wsize, nw, wsize, split)
                win = win.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b * nh * nw, wsize * wsize, split)
                atn = prev_atns[idx]
                y_ = jnp.einsum("bnm,bmc->bnc", atn, win)
                cc = split
            y_ = y_.reshape(b, nh, nw, wsize, wsize, cc).transpose(
                0, 1, 3, 2, 4, 5).reshape(b, h, w, cc)
            if self.shifts > 0:
                y_ = jnp.roll(y_, (wsize // 2, wsize // 2), axis=(1, 2))
            ys.append(y_)
            atns.append(atn)
        out = jnp.concatenate(ys, axis=-1)
        out = TConv(self.channels, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(out)
        return out, (atns if self.calc_attn else prev_atns)


class ELAB(nn.Module):
    channels: int
    exp_ratio: int = 2
    shifts: int = 0
    window_sizes: Tuple[int, ...] = (4, 8, 12)
    shared_depth: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        atn = None
        for i in range(1 + self.shared_depth):
            x = LFE(self.channels, self.exp_ratio, dtype=self.dtype)(x) + x
            y, atn = GMSA(self.channels, self.shifts, self.window_sizes,
                          calc_attn=(i == 0), dtype=self.dtype)(
                x, atn, train=train)
            x = y + x
        return x


# DIV2K RGB mean used by the reference's MeanShift (ELAN_blocks.py:13-23)
_DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


class ELAN(nn.Module):
    scale: int = 4
    colors: int = 3
    window_sizes: Tuple[int, ...] = (4, 8, 16)
    m_elan: int = 36
    c_elan: int = 180
    n_share: int = 0
    r_expand: int = 2
    apply_mean_shift: bool = True
    rgb_range: float = 1.0
    dtype: Any = jnp.float32
    num_metadata: int = 0           # >0 enables QELAB meta-attention
    meta_every: int = 2

    @nn.compact
    def __call__(self, x, metadata=None, train: bool = False):
        h, w = x.shape[1:3]
        mean = jnp.asarray(_DIV2K_RGB_MEAN, x.dtype) * self.rgb_range
        if self.apply_mean_shift:
            x = x - mean
        # pad to a multiple of the window-size lcm (check_image_size)
        wsize = self.window_sizes[0]
        for ws in self.window_sizes[1:]:
            wsize = wsize * ws // math.gcd(wsize, ws)
        ph = (wsize - h % wsize) % wsize
        pw = (wsize - w % wsize) % wsize
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
        x = TConv(self.c_elan, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        res = x
        n_blocks = self.m_elan // (1 + self.n_share)
        for i in range(n_blocks):
            res = ELAB(self.c_elan, self.r_expand,
                       shifts=0 if (i + 1) % 2 == 1 else 1,
                       window_sizes=self.window_sizes,
                       shared_depth=self.n_share,
                       dtype=self.dtype)(res, train=train)
            if (self.num_metadata > 0 and metadata is not None
                    and (i + 1) % self.meta_every == 0):
                res = ParaCALayer(self.c_elan, self.num_metadata,
                                  nonlinearity=True,
                                  dtype=self.dtype)(res, metadata)
        res = res + x
        out = TConv(self.colors * self.scale ** 2, (3, 3),
                      dtype=self.dtype, param_dtype=jnp.float32)(res)
        out = pixel_shuffle(out, self.scale)
        if self.apply_mean_shift:
            out = out + mean
        return out[:, :h * self.scale, :w * self.scale, :]


QELAN = ELAN  # meta-attention engaged via num_metadata > 0


# ---------------------------------------------------------------------------
# Handlers
# ---------------------------------------------------------------------------

@register_model("han")
class HANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, n_feats=64, n_resgroups=10, n_resblocks=20,
                 reduction=16, **kwargs):
        super().__init__(n_feats=n_feats, n_resgroups=n_resgroups,
                         n_resblocks=n_resblocks, reduction=reduction,
                         **kwargs)

    def build_module(self, **kw):
        return HAN(scale=self.scale, dtype=self.dtype, **kw)


@register_model("elan")
class ELANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, m_elan=36, c_elan=180, window_sizes=(4, 8, 16),
                 n_share=0, r_expand=2, **kwargs):
        super().__init__(m_elan=m_elan, c_elan=c_elan,
                         window_sizes=tuple(window_sizes), n_share=n_share,
                         r_expand=r_expand, **kwargs)

    def build_module(self, **kw):
        return ELAN(scale=self.scale, dtype=self.dtype, **kw)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        variables = {"params": params}
        bstats = (extra or {}).get("vars", {}).get("batch_stats")
        if bstats:
            variables["batch_stats"] = bstats
        if train and bstats:
            sr, mut = self.module.apply(variables, batch["lr"], train=True,
                                        mutable=["batch_stats"])
            new_extra = dict(extra)
            new_extra["vars"] = {"batch_stats": mut["batch_stats"]}
            return sr, {}, new_extra
        sr = self.module.apply(variables, batch["lr"], train=False)
        return sr, {}, extra

    def init_state(self, seed=None):
        import jax
        from rumpy_tpu.models.base import TrainState
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, erng, srng = jax.random.split(rng, 3)
        variables = self.module.init(prng, *self.example_inputs())
        params = variables["params"]
        extra = dict(self.init_extra(erng) or {})
        extra["vars"] = {"batch_stats": variables.get("batch_stats", {})}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra,
                          rng=srng)


@register_model("qhan")
class QHANHandler(QModelHandler):
    def __init__(self, n_feats=64, n_resgroups=10, n_resblocks=20,
                 reduction=16, style="standard", include_q_layer=True,
                 selective_meta_blocks=None,
                 num_q_layers_inner_residual=None, **kwargs):
        super().__init__(
            n_feats=n_feats, n_resgroups=n_resgroups,
            n_resblocks=n_resblocks, reduction=reduction, style=style,
            include_q_layer=include_q_layer,
            selective_meta_blocks=tuple(selective_meta_blocks)
            if selective_meta_blocks else None,
            num_q_layers_inner_residual=num_q_layers_inner_residual,
            **kwargs)

    def build_module(self, **kw):
        return QHAN(scale=self.scale, num_metadata=self.num_metadata,
                    dtype=self.dtype, **kw)


@register_model("qelan")
class QELANHandler(QModelHandler):
    def __init__(self, m_elan=36, c_elan=180, window_sizes=(4, 8, 16),
                 n_share=0, r_expand=2, meta_every=2, **kwargs):
        super().__init__(m_elan=m_elan, c_elan=c_elan,
                         window_sizes=tuple(window_sizes), n_share=n_share,
                         r_expand=r_expand, meta_every=meta_every, **kwargs)

    def build_module(self, **kw):
        return QELAN(scale=self.scale, num_metadata=self.num_metadata,
                     dtype=self.dtype, **kw)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        meta = batch.get("metadata")
        if meta is None:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        variables = {"params": params}
        bstats = (extra or {}).get("vars", {}).get("batch_stats")
        if bstats:
            variables["batch_stats"] = bstats
        meta = meta.astype(jnp.float32)
        if train and bstats:
            sr, mut = self.module.apply(variables, batch["lr"], meta,
                                        train=True,
                                        mutable=["batch_stats"])
            new_extra = dict(extra)
            new_extra["vars"] = {"batch_stats": mut["batch_stats"]}
            return sr, {}, new_extra
        sr = self.module.apply(variables, batch["lr"], meta, train=False)
        return sr, {}, extra

    def init_state(self, seed=None):
        import jax
        from rumpy_tpu.models.base import TrainState
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, erng, srng = jax.random.split(rng, 3)
        variables = self.module.init(prng, *self.example_inputs())
        params = variables["params"]
        extra = dict(self.init_extra(erng) or {})
        extra["vars"] = {"batch_stats": variables.get("batch_stats", {})}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra,
                          rng=srng)
