"""Attribute-conditioned face-SR GANs — faithful ports of the reference's
face_attributes_gan_models/{generators,discriminators,common_blocks}.py
(FaceSR-Attributes-GAN, AGA-GAN, FMFNet; 16x16 celeba faces -> 128x128).

Fidelity notes (verified by running the reference's own torch code):
  * FaceSRAttributesGeneratorNet and AGAGANGenerator execute in the
    reference and are ported exactly (golden parity tests).
  * The reference's AGAGANUNet SEBlock crashes at runtime (Linear applied
    to a (B,C,1,1) pooled map, generators.py:315-331); the port applies
    the evidently intended squeeze-to-(B,C) so the block is usable.
  * FMFBlock/FMFResidualDenseNet only run on CUDA in the reference
    (``x.get_device()`` returns -1 on CPU, generators.py:1038); ported
    exactly, device quirk excluded.

Torch-layout helpers (TorchConvTranspose, Conv2dSame, NCHW-order flatten,
affine_grid/grid_sample with align_corners=True) reproduce torch numerics
bit-close so state dicts convert by order.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
from rumpy_tpu.models.common import TConv as CConv, TDense as CDense
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch-semantics helpers
# ---------------------------------------------------------------------------

def _flatten_nchw(x):
    """torch nn.Flatten on NCHW: channel-major order."""
    n = x.shape[0]
    return x.transpose(0, 3, 1, 2).reshape(n, -1)


class PRelu(nn.Module):
    """torch nn.PReLU(num_parameters, init): shared slope parameter(s),
    default init 0.25 (DIC's blocks.py activation() uses init 0.2)."""
    num: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("prelu", nn.initializers.constant(self.init),
                       (self.num,))
        if self.num == 1:
            a = a[0]
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class TConv(nn.Module):
    """torch Conv2d(k, s, p[, dilation]) with explicit symmetric pad."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    pad: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return CConv(self.out_ch, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=((self.pad, self.pad), (self.pad, self.pad)),
                       kernel_dilation=(self.dilation, self.dilation),
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class TorchConvTranspose(nn.Module):
    """torch ConvTranspose2d(k, s, p): lhs-dilated conv with the flipped
    kernel; param stored as (k, k, out, in) so the order-zip converter's
    OIHW->HWIO transpose of torch's (in, out, k, k) lands directly."""
    out_ch: int
    kernel: int
    stride: int
    pad: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k, s, p = self.kernel, self.stride, self.pad
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (k, k, self.out_ch, in_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        wf = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wf.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(self.dtype)


class Conv2dSame(nn.Module):
    """common_blocks.py:7-34: Keras-style 'same' padding at stride > 1
    (ceil-mode, asymmetric low/high split)."""
    out_ch: int
    kernel: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ih, iw = x.shape[1:3]
        k, s = self.kernel, self.stride

        def pad_amt(i):
            return max((math.ceil(i / s) - 1) * s + k - i, 0)

        ph, pw = pad_amt(ih), pad_amt(iw)
        return CConv(self.out_ch, (k, k), strides=(s, s),
                       padding=((ph // 2, ph - ph // 2),
                                (pw // 2, pw - pw // 2)),
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


def affine_grid(theta, height, width):
    """F.affine_grid(align_corners=True): output (N, H, W, 2) xy grid."""
    ys = jnp.linspace(-1.0, 1.0, height)
    xs = jnp.linspace(-1.0, 1.0, width)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
    return jnp.einsum("nij,hwj->nhwi", theta, base)  # (N, H, W, 2)


def grid_sample(x, grid):
    """F.grid_sample(align_corners=True, padding_mode='zeros') bilinear.
    x: (N, H, W, C); grid: (N, Ho, Wo, 2) xy in [-1, 1]."""
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yc, xc)
        return vals * valid[..., None].astype(x.dtype)

    tl = tap(y0, x0)
    tr = tap(y0, x0 + 1)
    bl = tap(y0 + 1, x0)
    br = tap(y0 + 1, x0 + 1)
    wxe = wx[..., None].astype(x.dtype)
    wye = wy[..., None].astype(x.dtype)
    top = tl * (1 - wxe) + tr * wxe
    bot = bl * (1 - wxe) + br * wxe
    return top * (1 - wye) + bot * wye


def _bn(train, dtype):
    return nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=dtype)


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _maxpool(x, k=2, s=None):
    return nn.max_pool(x, (k, k), (s or k, s or k))


# ---------------------------------------------------------------------------
# FaceSR-Attributes-GAN (generators.py:8-238, discriminators.py:10-84)
# ---------------------------------------------------------------------------

class STN(nn.Module):
    """STN_L1_UpG / STN_L2_UpG (generators.py:8-105): localisation net ->
    6-dof affine theta (identity-init output layer) -> affine_grid +
    grid_sample at a fixed output size."""
    variant: int = 1  # 1: 256-ch input, grid 32x32; 2: 128-ch, grid 64x64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _maxpool(x)
        if self.variant == 1:
            h = TConv(128, 3, 1, 1, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = _maxpool(h)
            h = TConv(20, 3, 1, 1, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = _maxpool(h)
            h = TConv(20, 3, 1, 0, dtype=self.dtype)(h)
            h = nn.relu(h)
            flat_dim = 20 * 2 * 2
            grid_hw = 32
        else:
            h = TConv(64, 5, 1, 0, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = _maxpool(h)
            h = TConv(20, 5, 1, 0, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = _maxpool(h)
            h = TConv(20, 3, 1, 0, dtype=self.dtype)(h)
            h = nn.relu(h)
            flat_dim = 20 * 3 * 3
            grid_hw = 64
        h = _flatten_nchw(h)
        assert h.shape[-1] == flat_dim, (h.shape, flat_dim)
        h = CDense(20, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        # identity-initialized affine head (zeros weight, [1,0,0,0,1,0] b)
        w = self.param("theta_w", nn.initializers.zeros, (20, 6))
        b = self.param("theta_b",
                       lambda key, shape: jnp.array([1, 0, 0, 0, 1, 0],
                                                    jnp.float32), (6,))
        theta = (h @ w + b).reshape(-1, 2, 3)
        grid = affine_grid(theta, grid_hw, grid_hw)
        return grid_sample(x, grid)


class FaceSRAttributesGenerator(nn.Module):
    """generators.py:106-238: 4-step conv encoder, attribute concat at
    the 1x1 bottleneck, skip-connected transposed-conv decoder, nearest
    upsampling tail with optional STNs. 16x16 in -> 128x128 out."""
    n_feats: int = 32
    n_attributes: int = 18
    remove_stn: bool = False
    use_attribute_encoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, train: bool = False):
        nf = self.n_feats
        lrelu = lambda v: nn.leaky_relu(v, 0.2)

        def enc(v, ch, kernel, pad):
            v = TConv(ch, kernel, 2 if kernel == 4 else 1, pad,
                      dtype=self.dtype)(v)
            return lrelu(_bn(train, self.dtype)(v))

        e1 = enc(x, nf, 4, 1)
        e2 = enc(e1, nf * 4, 4, 1)
        e3 = enc(e2, nf * 16, 4, 1)
        # encoder_4: k=2, stride 1, no pad (1x1 bottleneck on 16x16 input)
        e4 = TConv(nf * 64, 2, 1, 0, dtype=self.dtype)(e3)
        e4 = lrelu(_bn(train, self.dtype)(e4))

        meta = metadata.astype(self.dtype)[:, None, None, :]
        if self.use_attribute_encoder:
            meta = TConv(self.n_attributes * 2, 1, 1, 0,
                         dtype=self.dtype)(meta)
            meta = TConv(self.n_attributes, 1, 1, 0, dtype=self.dtype)(meta)
        meta = jnp.broadcast_to(
            meta, e4.shape[:3] + (self.n_attributes,))
        e5 = jnp.concatenate([e4, meta], axis=-1)

        def dec(v, ch):
            v = TorchConvTranspose(ch, 4, 2, 1, dtype=self.dtype)(v)
            return nn.relu(_bn(train, self.dtype)(v))

        d1 = dec(e5, nf * 32)
        d2 = dec(jnp.concatenate([d1, e3], axis=-1), nf * 24)
        d3 = dec(jnp.concatenate([d2, e2], axis=-1), nf * 16)
        d4 = dec(jnp.concatenate([d3, e1], axis=-1), nf * 8)

        u = _up2(d4)
        if not self.remove_stn:
            u = STN(1, dtype=self.dtype)(u)
        u = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(u)
        u = nn.relu(_bn(train, self.dtype)(u))

        u = _up2(u)
        if not self.remove_stn:
            u = STN(2, dtype=self.dtype)(u)
        u = TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(u)
        u = nn.relu(_bn(train, self.dtype)(u))

        u = _up2(u)
        u = TConv(nf, 3, 1, 1, dtype=self.dtype)(u)
        u = nn.relu(_bn(train, self.dtype)(u))
        return TConv(3, 5, 1, 2, dtype=self.dtype)(u)


class FaceSRAttributesDiscriminator(nn.Module):
    """discriminators.py:10-84: conv head, attribute maps concatenated at
    32x32, conv body with dropout + dense sigmoid."""
    n_feats: int = 32
    n_attributes: int = 18
    use_attribute_encoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, train: bool = False):
        nf = self.n_feats
        f = TConv(nf, 5, 1, 2, dtype=self.dtype)(x)
        h = nn.relu(_maxpool(f))
        h = TConv(nf * 2, 5, 1, 2, dtype=self.dtype)(h)
        h = nn.relu(_maxpool(h))

        meta = metadata.astype(self.dtype)[:, None, None, :]
        meta = jnp.broadcast_to(meta, h.shape[:3] + (self.n_attributes,))
        if self.use_attribute_encoder:
            meta = TConv(self.n_attributes * 2, 1, 1, 0,
                         dtype=self.dtype)(meta)
            meta = TConv(self.n_attributes, 1, 1, 0, dtype=self.dtype)(meta)
        h = jnp.concatenate([h, meta], axis=-1)

        h = TConv(nf * 4, 5, 1, 2, dtype=self.dtype)(h)
        h = nn.relu(_maxpool(h))
        # torch nn.Dropout2d: drops whole channel maps
        h = nn.Dropout(0.2, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = TConv(nf * 8, 3, 1, 1, dtype=self.dtype)(h)
        h = nn.relu(_maxpool(h))
        h = nn.Dropout(0.2, broadcast_dims=(1, 2),
                       deterministic=not train)(h)
        h = _flatten_nchw(h)
        h = CDense(1024, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return nn.sigmoid(CDense(1, dtype=self.dtype,
                                   param_dtype=jnp.float32)(h))


# ---------------------------------------------------------------------------
# AGA-GAN (generators.py:241-750, discriminators.py:86-158)
# ---------------------------------------------------------------------------

class ConvPixelShuffleReLU(nn.Module):
    out_ch: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from rumpy_tpu.models.common import pixel_shuffle
        y = TConv(self.out_ch * self.scale ** 2, 3, 1, 1,
                  dtype=self.dtype)(x)
        return nn.relu(pixel_shuffle(y, self.scale))


class RDDB(nn.Module):
    """generators.py:261-313: 5-stage dense block, 0.4-weighted skip."""
    n_feats: int = 64
    out_feats: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.25)
        feats = [x]
        for _ in range(4):
            r = lrelu(TConv(self.n_feats, 3, 1, 1, dtype=self.dtype)(
                jnp.concatenate(feats, axis=-1)))
            feats.append(r)
        r5 = lrelu(TConv(self.out_feats, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate(feats, axis=-1)))
        return r5 * 0.4 + x


class SEBlock(nn.Module):
    """generators.py:315-331. NOTE: the reference's version feeds the
    (B,C,1,1) pooled map straight into nn.Linear and crashes; this is the
    evidently intended squeeze-then-dense form."""
    in_feats: int
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))
        g = CDense(max(1, self.in_feats // self.ratio), dtype=self.dtype,
                     param_dtype=jnp.float32)(g)
        g = nn.relu(g)
        g = CDense(self.in_feats, dtype=self.dtype,
                     param_dtype=jnp.float32)(g)
        return nn.sigmoid(g)[:, None, None, :] * x


class DualAttentionBlock(nn.Module):
    """generators.py:351-386: pixel-shuffle up + skip concat + SE x
    (spatial attention + 1)."""
    out_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        up = nn.relu(ConvPixelShuffleReLU(self.out_feats,
                                          dtype=self.dtype)(x))
        conv = nn.relu(TConv(self.out_feats, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate([skip, up], axis=-1)))
        se = SEBlock(self.out_feats, dtype=self.dtype)(conv)
        sa = TConv(self.out_feats // 4, 1, 1, 0, dtype=self.dtype)(conv)
        sa = nn.relu(sa)
        sa = nn.sigmoid(TConv(1, 1, 1, 0, dtype=self.dtype)(sa))
        return se * (sa + 1.0)


class AGAGANUNet(nn.Module):
    """generators.py:389-527 (attribute-stream U-Net; consumes the 6-ch
    concat of the image and the generator output)."""
    n_feats: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf = self.n_feats
        lrelu = lambda v: nn.leaky_relu(v, 0.25)

        def enc(v, ch, n_convs=2):
            for _ in range(n_convs):
                v = TConv(ch, 3, 1, 1, dtype=self.dtype)(v)
            return lrelu(v)

        x1 = enc(x, nf)
        x1_se = SEBlock(nf, dtype=self.dtype)(x1)
        x2 = enc(_maxpool(x1_se), nf * 2)
        x2_se = SEBlock(nf * 2, dtype=self.dtype)(x2)
        x3 = enc(_maxpool(x2_se), nf * 4)
        x3_se = SEBlock(nf * 4, dtype=self.dtype)(x3)
        x4 = enc(_maxpool(x3_se), nf * 8, n_convs=3)
        x4_se = SEBlock(nf * 8, dtype=self.dtype)(x4)

        x5 = DualAttentionBlock(nf * 4, dtype=self.dtype)(x4_se, x3_se)
        x5_1 = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(x5)
        x5_2 = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(x5_1))
        x5_c = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(x5_1 + x5_2)

        x6 = DualAttentionBlock(nf * 2, dtype=self.dtype)(x5_c, x2_se)
        x6_1 = TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(x6)
        x6_2 = lrelu(TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(x6_1))

        x7 = DualAttentionBlock(nf, dtype=self.dtype)(x6_1 + x6_2, x1_se)
        x7_1 = TConv(nf, 3, 1, 1, dtype=self.dtype)(x7)
        x7_2 = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(x7_1))
        return jnp.tanh(TConv(3, 3, 1, 1, dtype=self.dtype)(x7_1 + x7_2))


class AGAGANGenerator(nn.Module):
    """generators.py:527-750: attribute dense stream (768 -> 3x16x16 map)
    + RDDB main branch with three progressive-attention rounds and a
    pixel-shuffle reconstruction to 8x. Shared submodules (shallow conv
    block, rddb block, conv_only_* ...) are shared exactly as in torch."""
    n_feats: int = 32
    n_attributes: int = 38
    use_transpose: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, train: bool = False):
        nf = self.n_feats
        lrelu = lambda v: nn.leaky_relu(v, 0.25)

        attributes_dense = CDense(768, dtype=self.dtype,
                                    param_dtype=jnp.float32)

        class _Shallow(nn.Module):
            dtype: Any = jnp.float32

            @nn.compact
            def __call__(self, v):
                v = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(v))
                v = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(v))
                return TConv(nf, 3, 1, 1, dtype=self.dtype)(v)

        shallow = _Shallow(self.dtype)
        rddb = RDDB(64, nf * 4, dtype=self.dtype)
        conv_only_1 = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)
        conv_only_2 = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)
        bottleneck_sig = TConv(1, 3, 1, 1, dtype=self.dtype)
        main_body_2 = TConv(nf * 4, 3, 1, 1, dtype=self.dtype)
        up_wide = ConvPixelShuffleReLU(nf * 4, dtype=self.dtype)
        up_narrow = ConvPixelShuffleReLU(nf * 2, dtype=self.dtype)

        lr_f = shallow(x)
        att = lrelu(attributes_dense(metadata.astype(self.dtype)))
        att_r = att.reshape(-1, 3, 16, 16).transpose(0, 2, 3, 1)
        att_f = shallow(att_r)

        f1 = lrelu(TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate([att_f, lr_f], axis=-1)))
        f2 = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(f1))
        f3 = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(f2))
        f4 = lrelu(ConvPixelShuffleReLU(nf * 4, dtype=self.dtype)(f3))

        conv1 = lrelu(TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(x))
        conv2 = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(
            jnp.concatenate([conv1, f1], axis=-1)))
        rddb1 = rddb(conv2)
        conv3 = lrelu(main_body_2(jnp.concatenate([rddb1, f2], axis=-1)))
        rddb2 = rddb(conv3)
        conv4 = lrelu(main_body_2(jnp.concatenate([rddb2, f3], axis=-1)))
        rddb3 = rddb(conv4)
        rddb_out = rddb3 * 0.4 + conv2
        conv5 = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(rddb_out))

        up_conv4 = up_wide(conv5)
        up_conv4_without = lrelu(up_conv4)
        up_conv4_l = lrelu(up_conv4)

        def prog_round(stream, guide):
            p = conv_only_1(conv_only_1(stream))
            g_att = nn.sigmoid(bottleneck_sig(conv_only_1(guide)))
            return p * g_att

        # round 1
        up_conv4_a = up_conv4_l + prog_round(up_conv4_l, f4)
        f4_att = conv_only_1(conv_only_2(
            jnp.concatenate([f4, up_conv4_a], axis=-1)))
        # round 2
        up_conv4_a2 = up_conv4_a + prog_round(up_conv4_a, f4_att)
        f4_att2 = conv_only_1(conv_only_2(
            jnp.concatenate([f4_att, up_conv4_a2], axis=-1)))
        # round 3 multiplies instead of adds (generators.py:733)
        up_conv4_a3 = up_conv4_a2 * prog_round(up_conv4_a2, f4_att2)
        up_conv4_a3 = up_conv4_a3 + up_conv4_without

        f4_a = up_conv4_a3 + f4_att2
        f5 = lrelu(ConvPixelShuffleReLU(nf * 2, dtype=self.dtype)(f4_a))
        f6 = up_narrow(f5)

        up3 = lrelu(ConvPixelShuffleReLU(nf * 4, dtype=self.dtype)(
            jnp.concatenate([up_conv4_a3, f4_a], axis=-1)))
        up2 = lrelu(ConvPixelShuffleReLU(nf * 2, dtype=self.dtype)(
            jnp.concatenate([up3, f5], axis=-1)))
        cat1 = jnp.concatenate([up2, f6], axis=-1)
        if self.use_transpose:
            up1 = TorchConvTranspose(64, 3, 1, 1, dtype=self.dtype)(cat1)
        else:
            up1 = TConv(64, 3, 1, 1, dtype=self.dtype)(cat1)
        up1 = lrelu(up1)
        return jnp.tanh(TConv(3, 3, 1, 1, dtype=self.dtype)(up1))


class AGAGANDiscriminator(nn.Module):
    """discriminators.py:86-158."""
    n_feats: int = 32
    n_attributes: int = 38
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, train: bool = False):
        nf = self.n_feats
        lrelu = lambda v: nn.leaky_relu(v, 0.25)
        att = lrelu(CDense(768, dtype=self.dtype,
                             param_dtype=jnp.float32)(
            metadata.astype(self.dtype)))
        att_r = att.reshape(-1, 3, 16, 16).transpose(0, 2, 3, 1)
        a = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(att_r))
        a = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(a))
        a = lrelu(TorchConvTranspose(nf * 2, 4, 2, 1, dtype=self.dtype)(a))

        h = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(x))
        h = lrelu(Conv2dSame(nf, 4, 2, dtype=self.dtype)(h))
        h = lrelu(TConv(nf, 3, 1, 1, dtype=self.dtype)(h))
        h = lrelu(Conv2dSame(nf * 2, 4, 2, dtype=self.dtype)(h))

        h = jnp.concatenate([h, a], axis=-1)
        h = lrelu(TConv(nf * 2, 3, 1, 1, dtype=self.dtype)(h))
        h = lrelu(Conv2dSame(nf * 4, 4, 2, dtype=self.dtype)(h))
        h = lrelu(TConv(nf * 4, 3, 1, 1, dtype=self.dtype)(h))
        h = lrelu(Conv2dSame(nf * 3, 4, 2, dtype=self.dtype)(h))
        h = lrelu(TConv(nf * 3, 3, 1, 1, dtype=self.dtype)(h))
        h = _flatten_nchw(h)
        h = CDense(1024, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.sigmoid(CDense(1, dtype=self.dtype,
                                   param_dtype=jnp.float32)(h))


# ---------------------------------------------------------------------------
# FMFNet (generators.py:752-1432, discriminators.py:161-270)
# ---------------------------------------------------------------------------

class _ConvPReLU(nn.Module):
    ch: int
    kernel: int = 3
    pad: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TConv(self.ch, self.kernel, 1, self.pad, self.dilation,
                  dtype=self.dtype)(x)
        return PRelu()(x)


class FMFBlock(nn.Module):
    """generators.py:752-1055: 10 parallel multi-scale image encoders ->
    attribute vectors; outer products with raw/encoded attributes form a
    30-channel (A x A) fusion stack, diagonally re-weighted, expanded and
    reduced to a (B, 8A, 1, 1) fused face-meta vector. 16x16 input."""
    n_feats: int = 64
    n_attributes: int = 40
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        nf, na = self.n_feats, self.n_attributes

        def head_out(v):
            v = _flatten_nchw(v)
            v = CDense(4 * na, dtype=self.dtype,
                         param_dtype=jnp.float32)(v)
            v = PRelu()(v)
            return CDense(na, dtype=self.dtype,
                            param_dtype=jnp.float32)(v)

        def enc_pool(v, kernel, pad, dilation=1, stages=2):
            # conv-conv-pool stages (encoders 1/3/5/7/9 pattern)
            ch = nf
            for s in range(stages):
                v = _ConvPReLU(ch, kernel, pad, dilation,
                               dtype=self.dtype)(v)
                v = _ConvPReLU(ch, kernel, pad, dilation,
                               dtype=self.dtype)(v)
                v = _maxpool(v)
                ch *= 2
            return v

        def enc_stride(v, kernel, pad, dilation=1, stages=2):
            # conv / Conv2dSame(2,2) alternation (encoders 2/4/6/8/10)
            ch = nf
            for s in range(stages):
                v = _ConvPReLU(ch, kernel, pad, dilation,
                               dtype=self.dtype)(v)
                v = Conv2dSame(ch * 2, 2, 2, dtype=self.dtype)(v)
                v = PRelu()(v)
                ch *= 2
            return v

        # encoder 1: three conv-conv-pool stages (3x3)
        v = x
        ch = nf
        for _ in range(3):
            v = _ConvPReLU(ch, 3, 1, dtype=self.dtype)(v)
            v = _ConvPReLU(ch if ch == nf else ch, 3, 1,
                           dtype=self.dtype)(v)
            v = _maxpool(v)
            ch *= 2
        x_outs = [head_out(v)]
        # encoder 2: three conv/stride pairs (3x3)
        v = x
        ch = nf
        for _ in range(3):
            v = _ConvPReLU(ch, 3, 1, dtype=self.dtype)(v)
            v = Conv2dSame(ch * 2, 2, 2, dtype=self.dtype)(v)
            v = PRelu()(v)
            ch *= 2
        x_outs.append(head_out(v))
        # encoders 3..10: two-stage variants at 5x5, 7x7, dilated 3x3 x2
        for kernel, pad, dil in ((5, 2, 1), (7, 3, 1), (3, 2, 2),
                                 (3, 3, 3)):
            x_outs.append(head_out(enc_pool(x, kernel, pad, dil)))
            x_outs.append(head_out(enc_stride(x, kernel, pad, dil)))
        # reference registration order is encoder_1..10; ours interleaves
        # pool/stride pairs identically (1,2 then 3..10 pairwise).

        m0 = metadata.astype(self.dtype)
        m1 = m0
        for width in (4 * na, 8 * na, 4 * na, na):
            m1 = CDense(width, dtype=self.dtype,
                          param_dtype=jnp.float32)(m1)
            if width != na:
                m1 = PRelu()(m1)
        # attributes_encoder_1 ends with Linear only; its PReLUs sit
        # between layers (4 Linears, 3 PReLU) — adjust: loop above added
        # PReLU after first three. attributes_encoder_2:
        m2 = m0
        for width in (na // 2, na // 4, na // 2, na):
            m2 = CDense(width, dtype=self.dtype,
                          param_dtype=jnp.float32)(m2)
            if width != na:
                m2 = PRelu()(m2)

        planes = []
        for xv in x_outs:
            for mv in (m0, m1, m2):
                planes.append(jnp.einsum("bi,bj->bij", xv, mv))
        stack = jnp.stack(planes, axis=-1)  # (B, A, A, 30)

        eye = jnp.eye(na, dtype=self.dtype)[None, :, :, None]
        weighted = (stack + eye) * (eye + 0.1)
        full = jnp.concatenate([stack, weighted], axis=-1)  # (B,A,A,60)

        expanded = TConv(4 * na, 1, 1, 0, dtype=self.dtype)(full)
        gap_vec = jnp.mean(expanded, axis=(1, 2))  # (B, 4A)
        sq = TConv(na, 1, 1, 0, dtype=self.dtype)(expanded)
        sq = TConv(na // 2, 1, 1, 0, dtype=self.dtype)(sq)
        sq = TConv(1, 1, 1, 0, dtype=self.dtype)(sq)
        sq = PRelu()(sq)
        sq = _flatten_nchw(sq)
        sq_vec = CDense(4 * na, dtype=self.dtype,
                          param_dtype=jnp.float32)(sq)
        return jnp.concatenate([gap_vec, sq_vec], axis=-1)  # (B, 8A)


class ResidualDenseBlock4C(nn.Module):
    n_feats: int = 64
    skip_weight: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for _ in range(4):
            r = _ConvPReLU(self.n_feats, dtype=self.dtype)(
                jnp.concatenate(feats, axis=-1))
            feats.append(r)
        return feats[-1] * self.skip_weight + x


class FMFResidualDenseNet(nn.Module):
    """generators.py:1103-1425: FMF fused vector drives (a) sigmoid meta
    attention over residual dense groups and (b) the latent dim of three
    per-scale encoder-decoders; pixel-shuffle progression 16->128."""
    n_attributes: int = 40
    n_feats: int = 64
    skip_weight: float = 0.2
    use_meta_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, train: bool = False):
        from rumpy_tpu.models.common import pixel_shuffle
        nf, na = self.n_feats, self.n_attributes
        fmf = FMFBlock(n_attributes=na, dtype=self.dtype)(x, metadata)

        meta_att_convs = [TConv(c, 1, 1, 0, dtype=self.dtype)
                          for c in (6 * na, 4 * na, 3 * na, 2 * na, nf)]

        def meta_attention(v):
            h = v[:, None, None, :]
            for i, conv in enumerate(meta_att_convs):
                h = conv(h)
                h = (nn.sigmoid(h) if i == len(meta_att_convs) - 1
                     else nn.relu(h))
            return h

        body = ResidualDenseBlock4C(nf, self.skip_weight,
                                    dtype=self.dtype)

        def groups(v):
            for g in range(3):
                b1 = body(v if g == 0 else v)
                if self.use_meta_attention and g < 2:
                    b1 = b1 * meta_attention(fmf)
                b2 = body(b1)
                if self.use_meta_attention and g < 2:
                    b2 = b2 * meta_attention(fmf)
                v = v + b2 * 0.2
            return v

        head = _ConvPReLU(nf, dtype=self.dtype)

        class _UpsampleBlock(nn.Module):
            """main_branch_upsample_block — ONE shared Sequential in the
            reference, reused at every scale."""
            dtype: Any = jnp.float32

            @nn.compact
            def __call__(self, v):
                v = TConv(4 * nf, 1, 1, 0, dtype=self.dtype)(v)
                v = PRelu()(v)
                v = pixel_shuffle(v, 2)
                v = TConv(2 * nf, 1, 1, 0, dtype=self.dtype)(v)
                v = PRelu()(v)
                v = _ConvPReLU(2 * nf, dtype=self.dtype)(v)
                v = TConv(nf, 1, 1, 0, dtype=self.dtype)(v)
                return PRelu()(v)

        upsample_block = _UpsampleBlock(self.dtype)

        latent_dense = CDense(16 * nf, dtype=self.dtype,
                                param_dtype=jnp.float32)
        adapter = [TConv(2 * nf, 3, 1, 1, dtype=self.dtype),
                   TConv(nf, 3, 1, 1, dtype=self.dtype),
                   TConv(nf, 3, 1, 1, dtype=self.dtype)]

        def enc_dec(v, depth):
            # encoder: conv-conv-pool x depth; stage width nf, 2nf then
            # capped at 4nf (both convs of a stage at the stage width),
            # ending flattened at 2x2 (16nf)
            h = v
            for d in range(depth):
                width = nf * min(2 ** d, 4)
                h = _ConvPReLU(width, dtype=self.dtype)(h)
                h = _ConvPReLU(width, dtype=self.dtype)(h)
                h = _maxpool(h)
            h = _flatten_nchw(h)
            h = jnp.concatenate([h, fmf], axis=-1)
            h = latent_dense(h)
            h = h.reshape(-1, 4 * nf, 2, 2).transpose(0, 2, 3, 1)
            # decoder back up
            for d in range(depth):
                ch_out = (4 * nf if d < depth - 2
                          else (2 * nf if d == depth - 2 else nf))
                h = TorchConvTranspose(ch_out, 2, 2, 0,
                                       dtype=self.dtype)(h)
                h = _ConvPReLU(ch_out, dtype=self.dtype)(h)
                h = _ConvPReLU(ch_out, dtype=self.dtype)(h)
            out = jnp.concatenate([v, h], axis=-1)
            for conv in adapter:
                out = conv(out)
            return body(out)

        h = head(x)
        h = enc_dec(groups(h), 3)          # 16x16
        h = upsample_block(h)
        h = enc_dec(groups(h), 4)          # 32x32
        h = upsample_block(h)
        h = enc_dec(groups(h), 5)          # 64x64
        h = upsample_block(h)
        h = body(body(h))                  # 128x128
        h = _ConvPReLU(nf, dtype=self.dtype)(h)
        h = _ConvPReLU(nf, dtype=self.dtype)(h)
        return TConv(3, 1, 1, 0, dtype=self.dtype)(h)


class FMFDiscriminator(nn.Module):
    """discriminators.py:161-206."""
    n_feats: int = 64
    use_sigmoid: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None, train: bool = False):
        nf = self.n_feats
        widths = (nf, nf, 2 * nf, 2 * nf, 4 * nf, 4 * nf)
        h = x
        for w in widths:
            h = _ConvPReLU(w, dtype=self.dtype)(h)
            h = _maxpool(h)
        h = _flatten_nchw(h)
        h = CDense(8 * nf, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = PRelu()(h)
        h = CDense(1, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return nn.sigmoid(h) if self.use_sigmoid else h


class FMFAttributeDiscriminator(nn.Module):
    """discriminators.py:209-270: predicts the attribute vector from an
    image (per-attribute sigmoid head)."""
    n_feats: int = 64
    n_attributes: int = 40
    use_sigmoid: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.n_feats
        spec = [(nf, 2), (2 * nf, 2), (2 * nf, 2), (4 * nf, 3),
                (4 * nf, 3), (8 * nf, 3)]
        h = x
        for width, convs in spec:
            for _ in range(convs):
                h = _ConvPReLU(width, dtype=self.dtype)(h)
            h = _maxpool(h)
        h = _flatten_nchw(h)
        h = CDense(8 * nf, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = PRelu()(h)
        out = CDense(self.n_attributes, dtype=self.dtype,
                       param_dtype=jnp.float32)(h)
        # NOTE: the reference constructs a sigmoid final_layer but its
        # forward never applies it (discriminators.py:276-279); kept
        # identical so parity holds.
        return out


# ---------------------------------------------------------------------------
# Handlers (face_attributes_gan_models/handlers.py:13-992): GAN training
# with attribute-conditioned generator AND discriminator; BatchNorm state
# threaded through extra. 16x16 celeba crops -> 128x128 (scale 8).
# ---------------------------------------------------------------------------

import optax

from rumpy_tpu.models.attention_manipulators import compute_num_metadata
from rumpy_tpu.models.base import TrainState
from rumpy_tpu.models.gan_models import BaseGANHandler
from rumpy_tpu.registry import register_model


class AttributeGANHandler(BaseGANHandler):
    uses_metadata = True
    colorspace = "rgb"
    im_input = "unmodified"
    gan_mode = "lsgan"
    arch = "facesrattributes"
    in_size = 16

    def __init__(self, metadata=None, metadata_bypass_len=None,
                 n_feats=None, scale=8, **kwargs):
        if metadata is None and metadata_bypass_len is None:
            metadata = ["all"]
        self.metadata_keys = list(metadata) if metadata else None
        self.num_metadata = compute_num_metadata(metadata,
                                                 metadata_bypass_len)
        self._n_feats = n_feats
        super().__init__(scale=scale, **kwargs)

    # -- module construction -------------------------------------------

    def build_module(self, nf, nb, gc):
        del nf, nb, gc  # RRDB sizing params of the base GAN; unused here
        a = self.arch
        if a == "facesrattributes":
            return FaceSRAttributesGenerator(
                n_feats=self._n_feats or 32,
                n_attributes=self.num_metadata, dtype=self.dtype)
        if a == "agagan":
            return AGAGANGenerator(n_feats=self._n_feats or 32,
                                   n_attributes=self.num_metadata,
                                   dtype=self.dtype)
        if a == "fmf":
            return FMFResidualDenseNet(n_attributes=self.num_metadata,
                                       n_feats=self._n_feats or 64,
                                       dtype=self.dtype)
        raise KeyError(a)

    def build_discriminator(self):
        a = self.arch
        if a == "facesrattributes":
            return FaceSRAttributesDiscriminator(
                n_feats=self._n_feats or 32,
                n_attributes=self.num_metadata, dtype=self.dtype)
        if a == "agagan":
            return AGAGANDiscriminator(n_feats=self._n_feats or 32,
                                       n_attributes=self.num_metadata,
                                       dtype=self.dtype)
        return FMFDiscriminator(n_feats=self._n_feats or 64,
                                dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = None):
        s = size or self.in_size
        return (jnp.zeros((batch, s, s, 3), jnp.float32),
                jnp.zeros((batch, self.num_metadata), jnp.float32))

    def handler_metadata(self):
        return {"metadata_keys_used_in_training": self.metadata_keys,
                "num_metadata": self.num_metadata}

    def select_metadata(self, metadata, keys=None):
        from rumpy_tpu.models.attention_manipulators import (
            select_metadata_columns)
        return select_metadata_columns(metadata, keys, self.metadata_keys)

    # -- state ---------------------------------------------------------

    def init_state(self, seed=None):
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        grng, drng, srng = jax.random.split(rng, 3)
        g_vars = self.module.init(grng, *self.example_inputs())
        self.discriminator = self.build_discriminator()
        d_size = self.in_size * self.scale
        d_args = [jnp.zeros((1, d_size, d_size, 3), jnp.float32)]
        if self.arch != "fmf":
            d_args.append(jnp.zeros((1, self.num_metadata), jnp.float32))
        d_vars = self.discriminator.init(drng, *d_args, train=True)
        params = {"generator": g_vars["params"],
                  "discriminator": d_vars["params"]}
        extra = {"d_vars": {k: v for k, v in d_vars.items()
                            if k != "params"},
                 "g_vars": {k: v for k, v in g_vars.items()
                            if k != "params"}}
        opt_state = {"generator": self.tx.init(params["generator"]),
                     "discriminator": self.d_tx.init(
                         params["discriminator"])}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra=extra, rng=srng)

    # -- forward -------------------------------------------------------

    def _gen_apply(self, g_params, g_vars, lr, meta, train):
        variables = {"params": g_params, **g_vars}
        mutable = [k for k in g_vars] if (train and g_vars) else False
        if mutable:
            sr, mut = self.module.apply(variables, lr,
                                        meta.astype(jnp.float32),
                                        train=True, mutable=mutable)
            return sr, mut
        sr = self.module.apply(variables, lr, meta.astype(jnp.float32),
                               train=False)
        return sr, g_vars

    def _disc_apply(self, d_params, d_vars, img, train, meta=None,
                    rng=None):
        variables = {"params": d_params, **d_vars}
        args = [img] if self.arch == "fmf" else [img, meta]
        mutable = [k for k in d_vars] if (train and d_vars) else False
        rngs = ({"dropout": rng} if (train and rng is not None) else None)
        if mutable:
            out, mut = self.discriminator.apply(variables, *args,
                                                train=train,
                                                mutable=mutable, rngs=rngs)
            return out, mut
        out = self.discriminator.apply(variables, *args, train=train,
                                       rngs=rngs)
        return out, d_vars

    def apply(self, params, batch, train=False, rng=None, extra=None):
        meta = batch.get("metadata")
        if meta is None:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        gp = params["generator"] if "generator" in params else params
        g_vars = (extra or {}).get("g_vars", {})
        sr, _ = self._gen_apply(gp, g_vars, batch["lr"],
                                jnp.asarray(meta), train=False)
        return sr, {}, extra

    # -- training ------------------------------------------------------

    def _gan_step_impl(self, state: TrainState, batch, vgg_params=None):
        rng, drop1, drop2 = jax.random.split(state.rng, 3)
        extra = state.extra
        d_vars = extra["d_vars"]
        g_vars = extra["g_vars"]
        meta = jnp.asarray(batch["metadata"], jnp.float32)

        def g_loss_fn(g_params):
            sr, new_g_vars = self._gen_apply(g_params, g_vars,
                                             batch["lr"], meta, True)
            pixel = jnp.mean(jnp.abs(sr - batch["hr"]))
            pred_fake, _ = self._disc_apply(
                state.params["discriminator"], d_vars, sr, False,
                meta=meta)
            pred_real, _ = self._disc_apply(
                state.params["discriminator"], d_vars, batch["hr"],
                False, meta=meta)
            adv = self._adv_g_loss(pred_fake,
                                   jax.lax.stop_gradient(pred_real))
            if self.vgg_module is not None and vgg_params is not None:
                gen_f = self.vgg_module.apply({"params": vgg_params}, sr)
                real_f = jax.lax.stop_gradient(self.vgg_module.apply(
                    {"params": vgg_params}, batch["hr"]))
                content = jnp.mean(jnp.abs(gen_f - real_f))
            else:
                content = jnp.zeros((), sr.dtype)
            total = (self.lambda_vgg * content + self.lambda_adv * adv
                     + self.lambda_pixel * pixel)
            return total, (sr, pixel, adv, content, new_g_vars)

        g_grads, (sr, pixel, adv, content, new_g_vars) = jax.grad(
            g_loss_fn, has_aux=True)(state.params["generator"])
        g_updates, g_opt = self.tx.update(g_grads,
                                          state.opt_state["generator"],
                                          state.params["generator"])
        g_params = optax.apply_updates(state.params["generator"],
                                       g_updates)

        sr_detached = jax.lax.stop_gradient(sr)

        def d_loss_fn(d_params):
            pred_real, new_vars = self._disc_apply(d_params, d_vars,
                                                   batch["hr"], True,
                                                   meta=meta, rng=drop1)
            pred_fake, new_vars = self._disc_apply(d_params, new_vars,
                                                   sr_detached, True,
                                                   meta=meta, rng=drop2)
            loss_real, loss_fake = self._adv_d_loss(pred_fake, pred_real)
            return loss_real + loss_fake, (loss_real, loss_fake,
                                           new_vars)

        d_grads, (loss_real, loss_fake, new_d_vars) = jax.grad(
            d_loss_fn, has_aux=True)(state.params["discriminator"])
        d_updates, d_opt = self.d_tx.update(
            d_grads, state.opt_state["discriminator"],
            state.params["discriminator"])
        d_params = optax.apply_updates(state.params["discriminator"],
                                       d_updates)

        losses = {"train-loss": self.lambda_vgg * content
                  + self.lambda_pixel * pixel + self.lambda_adv * adv,
                  "l1-loss": pixel, "gan-loss": adv,
                  "vgg-loss": content,
                  "d-loss-real": loss_real, "d-loss-fake": loss_fake}
        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            extra={**extra, "d_vars": new_d_vars, "g_vars": new_g_vars},
            rng=rng)
        return new_state, losses

    def _pretrain_step_impl(self, state: TrainState, batch):
        rng, _sub = jax.random.split(state.rng)
        g_vars = state.extra["g_vars"]
        meta = jnp.asarray(batch["metadata"], jnp.float32)

        def loss_fn(g_params):
            sr, new_g_vars = self._gen_apply(g_params, g_vars,
                                             batch["lr"], meta, True)
            return jnp.mean(jnp.abs(sr - batch["hr"])), new_g_vars

        (loss, new_g_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params["generator"])
        updates, g_opt = self.tx.update(grads,
                                        state.opt_state["generator"],
                                        state.params["generator"])
        g_params = optax.apply_updates(state.params["generator"],
                                       updates)
        z = jnp.zeros(())
        losses = {"train-loss": loss, "l1-loss": loss, "gan-loss": z,
                  "vgg-loss": z, "d-loss-real": z, "d-loss-fake": z}
        return state.replace(
            step=state.step + 1,
            params={**state.params, "generator": g_params},
            opt_state={**state.opt_state, "generator": g_opt},
            extra={**state.extra, "g_vars": new_g_vars}, rng=rng), losses


@register_model("facesrattributesgan")
class FaceSRAttributesGANHandler(AttributeGANHandler):
    """handlers.py:13-361."""
    arch = "facesrattributes"


@register_model("agagan")
class AGAGANHandler(AttributeGANHandler):
    """handlers.py:364-662."""
    arch = "agagan"


@register_model("fmfnet")
class FMFNetHandler(AttributeGANHandler):
    """handlers.py:665-992 (unconditional image discriminator; the
    attribute discriminator FMFAttributeDiscriminator is exposed as a
    module for the reference's auxiliary attribute loss)."""
    arch = "fmf"
