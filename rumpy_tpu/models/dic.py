"""DIC — Deep Iterative Collaboration face SR (reference-exact port).

Reference: rumpy/SISR/models/DICnets/
  * DIC_architecture.py:10-108   (DIC: conv_in + PixelShuffle feat_in,
    FeedbackBlockCustom step 0, FeedbackBlockHeatmapAttention steps 1+,
    deconv reconstruction, FeedbackHourGlass landmark estimator)
  * srfbn_arch.py:7-103          (FeedbackBlock up/down projection groups)
  * srfbn_hg_arch.py:8-131       (merge_heatmap_5, heatmap-attention block)
  * blocks.py                    (ConvBlock/DeconvBlock/ResBlock/
    FeatureHeatmapFusingBlock; PReLU slope 0.2, LeakyReLU 0.2)
  * modules/StackedHourGlass.py:81-245 (FeedbackHourGlass, recursive
    HourGlass with align_corners=True bilinear upsample, BN-free
    ResidualBlock bottlenecks)
  * handlers.py:12-130           (DICHandler: per-step L1 + 0.1*MSE
    landmark-heatmap alignment loss, landmarks.pkl lookup, MultiStepLR
    [10000,20000,40000,80000] x0.5 per step, hourglass grads frozen for
    the first 2M steps)

TPU-first redesign notes:
  * NHWC end-to-end; the iterative num_steps loop is unrolled at trace
    time (step 0 uses different weights than steps 1+, and num_steps is
    4 — unrolling lets XLA pipeline the whole recurrence).
  * The reference rasterizes ground-truth landmark heatmaps per-image in
    numpy inside the host train loop (handlers.py:44-69). Here the host
    only ships (B, 68, 2) landmark coordinates; the Gaussian heatmaps are
    rendered ON DEVICE inside the jitted train step (`render_heatmaps`),
    vectorized over batch and keypoints.
  * The hourglass-freeze schedule (handlers.py:95-102) is a gradient
    mask inside the one jitted step instead of Python-side
    requires_grad flipping.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from rumpy_tpu.models.common import TConv, pixel_shuffle
import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler, PIXEL_LOSSES
from rumpy_tpu.models.face_attribute_gans import PRelu, TorchConvTranspose
from rumpy_tpu.registry import register_model


def _PReLU(name=None):
    """blocks.py:14-25 activation('prelu'): one shared slope, init 0.2."""
    return PRelu(init=0.2, name=name)


class ConvBlock(nn.Module):
    """blocks.py:68-84 ConvBlock (CNA mode, no norm): conv + optional act.

    valid_padding=True -> pad (k-1)//2; otherwise explicit `padding`.
    """
    features: int
    kernel: int
    stride: int = 1
    act: Optional[str] = "prelu"  # 'prelu' | 'lrelu' | None
    valid_padding: bool = True
    padding: int = 0
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2 if self.valid_padding else self.padding
        x = TConv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        if self.act == "prelu":
            x = _PReLU(name="prelu")(x)
        elif self.act == "lrelu":
            x = nn.leaky_relu(x, 0.2)
        return x


class DeconvBlock(nn.Module):
    """blocks.py:167-181 DeconvBlock: ConvTranspose2d(k, s, p) + PReLU."""
    features: int
    kernel: int
    stride: int
    padding: int
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConvTranspose(self.features, self.kernel, self.stride,
                               self.padding, dtype=self.dtype,
                               name="deconv")(x)
        if self.act:
            x = _PReLU(name="prelu")(x)
        return x


class ResidualBlockHG(nn.Module):
    """StackedHourGlass.py:219-245 ResidualBlock with need_bn=False:
    1x1 -> ReLU -> 3x3 -> 1x1 bottleneck, 1x1 skip when channels change.
    (DIC's FeedbackHourGlass path is entirely BN-free.)"""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        r = TConv(half, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="c0")(x)
        r = nn.relu(r)
        r = TConv(half, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="c1")(r)
        r = TConv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="c2")(r)
        if x.shape[-1] != self.features:
            x = TConv(self.features, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="c3_skip")(x)
        return x + r


def upsample_bilinear_align(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Bilinear upsample with torch align_corners=True semantics
    (StackedHourGlass.py:201): out[j] samples src position j*(in-1)/(out-1).
    jax.image.resize uses half-pixel centers (align_corners=False), so the
    gather/lerp is spelled out here; XLA fuses it into neighboring ops."""
    n, h, w, c = x.shape
    oh, ow = h * factor, w * factor

    def axis_weights(size, out_size):
        if out_size == 1 or size == 1:
            idx = jnp.zeros((out_size,), jnp.int32)
            return idx, idx, jnp.zeros((out_size,), x.dtype)
        pos = jnp.arange(out_size) * (size - 1) / (out_size - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size - 1)
        return lo, hi, (pos - lo).astype(x.dtype)

    ylo, yhi, wy = axis_weights(h, oh)
    xlo, xhi, wx = axis_weights(w, ow)
    top = x[:, ylo] * (1 - wy)[None, :, None, None] + \
        x[:, yhi] * wy[None, :, None, None]
    out = top[:, :, xlo] * (1 - wx)[None, None, :, None] + \
        top[:, :, xhi] * wx[None, None, :, None]
    return out


class HourGlassDIC(nn.Module):
    """StackedHourGlass.py:165-201 HourGlass (recursive, BN-free):
    res -> [maxpool -> res -> recurse -> res -> bilinear-up(align=True)]
    summed with the skip branch. Parameter call order matches the torch
    module's registration order exactly (resN_1, resN_2, ..., res_center,
    res1_3, ..., resN_3)."""
    depth: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        up1 = ResidualBlockHG(self.features, dtype=self.dtype,
                              name="r0_up")(x)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = ResidualBlockHG(self.features, dtype=self.dtype,
                              name="r1_low")(low)
        if self.depth > 1:
            low2 = HourGlassDIC(self.depth - 1, self.features,
                                dtype=self.dtype, name="r2_inner")(low)
        else:
            low2 = ResidualBlockHG(self.features, dtype=self.dtype,
                                   name="r2_inner")(low)
        low3 = ResidualBlockHG(self.features, dtype=self.dtype,
                               name="r3_out")(low2)
        return up1 + upsample_bilinear_align(low3, 2)


class FeedbackHourGlass(nn.Module):
    """StackedHourGlass.py:81-117: stride-{1,2} pre-conv pyramid, hidden
    state concat + 1x1 compress, one 2F-channel hourglass; heatmap head on
    the first F channels, the second F channels become the next hidden."""
    num_feature: int
    num_keypoints: int
    scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, last_hidden=None):
        f = self.num_feature
        stride = 2 if self.scale == 8 else 1
        h = TConv(f // 4, (7, 7), strides=(stride, stride),
                    padding=((3, 3), (3, 3)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="p0_conv")(x)
        h = nn.relu(h)
        h = ResidualBlockHG(f // 2, dtype=self.dtype, name="p1_res")(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = ResidualBlockHG(f // 2, dtype=self.dtype, name="p2_res")(h)
        h = ResidualBlockHG(f, dtype=self.dtype, name="p3_res")(h)

        paired = jnp.concatenate(
            [h, h if last_hidden is None else last_hidden], axis=-1)
        paired = TConv(2 * f, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="q0_compress")(paired)
        feature = HourGlassDIC(4, 2 * f, dtype=self.dtype,
                               name="q1_hg")(paired)

        head = ResidualBlockHG(f, dtype=self.dtype,
                               name="q2_res")(feature[..., :f])
        head = TConv(f, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="q3_lin")(head)
        head = nn.relu(head)
        heatmap = TConv(self.num_keypoints, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name="q4_pred")(head)
        return heatmap, feature[..., f:]


def merge_heatmap_5(heatmap: jnp.ndarray, detach: bool) -> jnp.ndarray:
    """srfbn_hg_arch.py:8-43: normalize each channel by its spatial max
    (clamped at 0.05) and merge 68 landmark channels into 5 face regions.
    NHWC (channels last)."""
    max_heat = jnp.max(heatmap, axis=(1, 2), keepdims=True)
    max_heat = jnp.maximum(max_heat, 0.05)
    heatmap = heatmap / max_heat
    k = heatmap.shape[-1]
    if k == 5:
        merged = heatmap
    elif k == 68:
        merged = jnp.stack([
            heatmap[..., 36:42].sum(-1),   # left eye
            heatmap[..., 42:48].sum(-1),   # right eye
            heatmap[..., 27:36].sum(-1),   # nose
            heatmap[..., 48:68].sum(-1),   # mouth
            heatmap[..., :27].sum(-1),     # face silhouette
        ], axis=-1)
    else:
        raise NotImplementedError(
            f"heatmap merge for {k} landmarks not implemented")
    return jax.lax.stop_gradient(merged) if detach else merged


class FeatureHeatmapFusingBlock(nn.Module):
    """blocks.py:120-158: expand features to K groups, grouped residual
    refinement, then softmax-heatmap attention pooling over the groups."""
    features: int
    num_heatmap: int
    num_block: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature, heatmap):
        k = self.num_heatmap
        res_ch = self.features * k
        feature = ConvBlock(res_ch, 1, act="lrelu",
                            dtype=self.dtype, name="a_conv_in")(feature)
        for i in range(self.num_block):
            # blocks.py:103-117 ResBlock (groups=K, lrelu, no norm)
            r = ConvBlock(res_ch, 3, act="lrelu", groups=k,
                          dtype=self.dtype, name=f"b{i:02d}_c0")(feature)
            r = ConvBlock(res_ch, 3, act=None, groups=k,
                          dtype=self.dtype, name=f"b{i:02d}_c1")(r)
            feature = feature + r
        attention = nn.softmax(heatmap, axis=-1)
        b, h, w, _ = feature.shape
        feature = feature.reshape(b, h, w, k, self.features)
        return (feature * attention[..., None]).sum(axis=3)


class _ProjectionGroups(nn.Module):
    """srfbn_arch.py:61-95 (the shared up/down projection-group loop of
    every feedback block, after compress_in): dense LR<->HR projections
    with 1x1 transition compressions, concat of all LR states, 1x1 out."""
    features: int
    groups: int
    scale: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = {2: (6, 2, 2), 3: (7, 3, 2), 4: (8, 4, 2),
                   8: (12, 8, 2)}[self.scale]
        lr_features = [x]
        hr_features = []
        for idx in range(self.groups):
            ld_l = jnp.concatenate(lr_features, axis=-1)
            if idx > 0:
                ld_l = ConvBlock(self.features, 1, dtype=self.dtype,
                                 name=f"g{idx:02d}a_uptran")(ld_l)
            ld_h = DeconvBlock(self.features, k, s, p, dtype=self.dtype,
                               name=f"g{idx:02d}b_up")(ld_l)
            hr_features.append(ld_h)
            ld_h = jnp.concatenate(hr_features, axis=-1)
            if idx > 0:
                ld_h = ConvBlock(self.features, 1, dtype=self.dtype,
                                 name=f"g{idx:02d}c_downtran")(ld_h)
            ld_l = ConvBlock(self.features, k, stride=s,
                             valid_padding=False, padding=p,
                             dtype=self.dtype,
                             name=f"g{idx:02d}d_down")(ld_h)
            lr_features.append(ld_l)
        out = jnp.concatenate(lr_features[1:], axis=-1)
        return ConvBlock(self.features, 1, dtype=self.dtype,
                         name="z_compress_out")(out)


class FeedbackBlockCustom(nn.Module):
    """srfbn_hg_arch.py:105-131: stateless first-step feedback block."""
    features: int
    groups: int
    scale: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.features, 1, dtype=self.dtype,
                      name="a_compress_in")(x)
        return _ProjectionGroups(self.features, self.groups, self.scale,
                                 dtype=self.dtype, name="b_groups")(x)


class FeedbackBlockHeatmapAttention(nn.Module):
    """srfbn_hg_arch.py:46-103: hidden-state feedback block with heatmap
    attention fusion. `last_hidden` is threaded explicitly (the torch
    original mutates self.last_hidden)."""
    features: int
    groups: int
    scale: int
    num_heatmap: int
    num_fusion_block: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, heatmap, last_hidden):
        x = jnp.concatenate([x, last_hidden], axis=-1)
        x = ConvBlock(self.features, 1, dtype=self.dtype,
                      name="a_compress_in")(x)
        x = FeatureHeatmapFusingBlock(self.features, self.num_heatmap,
                                      self.num_fusion_block,
                                      dtype=self.dtype,
                                      name="b_fusion")(x, heatmap)
        return _ProjectionGroups(self.features, self.groups, self.scale,
                                 dtype=self.dtype, name="c_groups")(x)


class DIC(nn.Module):
    """DIC_architecture.py:10-108. Returns (sr_list, heatmap_list), one
    entry per iteration step."""
    scale: int = 4
    num_steps: int = 4
    num_features: int = 48
    num_groups: int = 6
    hg_num_feature: int = 256
    hg_num_keypoints: int = 68
    num_fusion_block: int = 7
    detach_attention: bool = False
    in_channels: int = 3
    out_channels: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        if self.scale == 8:
            dk, ds, dp = 8, 4, 2
        elif self.scale == 4:
            dk, ds, dp = 4, 2, 1
        else:
            raise NotImplementedError(
                f"Upscale factor {self.scale} not implemented!")
        self.conv_in = ConvBlock(4 * self.num_features, 3, dtype=self.dtype)
        self.first_block = FeedbackBlockCustom(
            self.num_features, self.num_groups, self.scale, dtype=self.dtype)
        self.block = FeedbackBlockHeatmapAttention(
            self.num_features, self.num_groups, self.scale, 5,
            self.num_fusion_block, dtype=self.dtype)
        self.out_deconv = DeconvBlock(self.num_features, dk, ds, dp,
                                      dtype=self.dtype)
        self.conv_out = ConvBlock(self.out_channels, 3, act=None,
                                  dtype=self.dtype)
        self.hg = FeedbackHourGlass(self.hg_num_feature,
                                    self.hg_num_keypoints, self.scale,
                                    dtype=self.dtype)

    def __call__(self, x):
        n, h, w, _ = x.shape
        # F.interpolate(mode='bilinear', align_corners=False) == half-pixel
        # linear resize.
        inter_res = jax.image.resize(
            x, (n, h * self.scale, w * self.scale, x.shape[-1]), "linear")

        feat = self.conv_in(x)
        feat = pixel_shuffle(feat, 2)

        sr_outs, heatmap_outs = [], []
        hg_hidden = None
        fb_hidden = None
        heatmap = None
        for step in range(self.num_steps):
            if step == 0:
                fb_out = self.first_block(feat)
                fb_hidden = fb_out
            else:
                fb_out = self.block(
                    feat, merge_heatmap_5(heatmap, self.detach_attention),
                    fb_hidden)
                fb_hidden = fb_out
            sr = inter_res + self.conv_out(self.out_deconv(fb_out))
            heatmap, hg_hidden = self.hg(sr, hg_hidden)
            sr_outs.append(sr)
            heatmap_outs.append(heatmap)
        return sr_outs, heatmap_outs


def render_heatmaps(coords: jnp.ndarray, height: int, width: int,
                    sigma: float = 1.0) -> jnp.ndarray:
    """Rasterize per-keypoint Gaussian heatmaps on device.

    coords: (B, K, 2) landmark (x, y) positions in heatmap pixel units
    (handlers.py:44-55 `_generate_one_heatmap` semantics, vectorized).
    Returns NHWC (B, height, width, K).
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    dx = xs[None, None, :] - coords[..., 0][..., None]      # (B, K, W)
    dy = ys[None, None, :] - coords[..., 1][..., None]      # (B, K, H)
    d2 = dy[:, :, :, None] ** 2 + dx[:, :, None, :] ** 2    # (B, K, H, W)
    hm = jnp.exp(-d2 / (2.0 * sigma * sigma))
    return hm.transpose(0, 2, 3, 1)


@register_model("dic")
class DICHandler(BaseHandler):
    """handlers.py:12-130. Trains with per-step L1 + 0.1 * MSE landmark
    alignment; hourglass grads masked to zero for the first
    `hg_release_step` steps (reference: 2M, handlers.py:95-102).

    Landmarks reach the device as (B, 68, 2) HR-space (x, y) coordinates:
    either directly in the batch (`landmarks` key) or looked up from a
    pickle {image_name: (68, 2) array} given as `landmarks_file`
    (reference reads `landmarks.pkl` from hr_data_loc, handlers.py:27).
    When neither is present the alignment term is 0 and only the pixel
    loss trains (the heatmap branch then trains indirectly through the
    attention path).
    """

    loss_type = "l1"
    colorspace = "rgb"
    size_multiple = 8  # heatmap res is LR*2 and feeds a depth-4 hourglass

    wants_tags = True

    def __init__(self, num_steps=4, num_features=48, num_groups=6,
                 hg_num_feature=256, hg_num_keypoints=68,
                 num_fusion_block=7, detach_attention=False,
                 landmarks_file: Optional[str] = None,
                 heatmap_sigma: float = 1.0,
                 hg_release_step: int = 2_000_000,
                 scheduler="multi_step_lr", scheduler_params=None,
                 **kwargs):
        self.landmarks = None
        if landmarks_file:
            import pickle
            with open(landmarks_file, "rb") as f:
                self.landmarks = pickle.load(f)
        self.heatmap_sigma = heatmap_sigma
        self.hg_release_step = hg_release_step
        if scheduler_params is None and scheduler == "multi_step_lr":
            scheduler_params = {"milestones": [10000, 20000, 40000, 80000],
                                "gamma": 0.5}
        super().__init__(num_steps=num_steps, num_features=num_features,
                         num_groups=num_groups,
                         hg_num_feature=hg_num_feature,
                         hg_num_keypoints=hg_num_keypoints,
                         num_fusion_block=num_fusion_block,
                         detach_attention=detach_attention,
                         scheduler=scheduler,
                         scheduler_params=scheduler_params, **kwargs)

    def build_module(self, **kw):
        return DIC(scale=self.scale, dtype=self.dtype, **kw)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, 3), jnp.float32),)

    def init_state(self, seed=None):
        # jitted init (one compiled program vs ~140s of eager per-op
        # dispatch through the unrolled recurrence). Safe here: DIC's
        # explicit layer names make sorted order == call order, and
        # convert_by_order canonicalizes the leaf-level kernel/bias order.
        from rumpy_tpu.models.base import TrainState
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, srng = jax.random.split(rng)
        variables = jax.jit(self.module.init)(prng, *self.example_inputs())
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra={},
                          rng=srng)

    def _lookup_landmarks(self, tag: str) -> np.ndarray:
        import re
        key = re.sub(r"_(.*?)\.", ".", tag)
        marks = self.landmarks.get(key, self.landmarks.get(tag))
        if marks is None:
            raise KeyError(f"no landmarks for image {tag!r}")
        return np.asarray(marks, np.float32)

    def train_batch(self, state, batch):
        batch = dict(batch)
        tags = batch.pop("tags", None)
        if tags is not None and self.landmarks is not None and \
                "landmarks" not in batch:
            coords = np.stack([self._lookup_landmarks(t) for t in tags])
            batch["landmarks"] = jnp.asarray(coords)
        return super().train_batch(state, batch)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        srs, heatmaps = self.module.apply({"params": params}, batch["lr"])
        return srs[-1], {"_srs": srs, "_heatmaps": heatmaps}, extra

    def compute_losses(self, sr, batch, aux):
        srs = aux.pop("_srs")
        heatmaps = aux.pop("_heatmaps")
        hr = batch["hr"]
        pix = sum(PIXEL_LOSSES["l1"](s, hr) for s in srs)
        losses = {"pix_loss": pix}
        if "landmarks" in batch:
            hm_h, hm_w = heatmaps[0].shape[1], heatmaps[0].shape[2]
            coords = batch["landmarks"] / (self.scale / 2.0)
            gt = render_heatmaps(coords, hm_h, hm_w, self.heatmap_sigma)
            align = sum(jnp.mean((h - gt) ** 2) for h in heatmaps)
            losses["align_loss"] = 0.1 * align
            losses["train-loss"] = pix + 0.1 * align
        else:
            losses["align_loss"] = jnp.zeros(())
            losses["train-loss"] = pix
        losses["full_loss"] = losses["train-loss"]
        return losses

    def transform_grads(self, grads, state, batch):
        # hourglass frozen until hg_release_step (handlers.py:95-102)
        if self.hg_release_step and "hg" in grads:
            gate = (state.step >= self.hg_release_step).astype(jnp.float32)
            grads = dict(grads)
            grads["hg"] = jax.tree_util.tree_map(
                lambda g: g * gate, grads["hg"])
        return grads


# Back-compat alias for configs written against the round-1 compact port
# (which took nf/iterations/num_landmarks and supported any scale; the
# reference-exact DIC supports scale 4/8 only).
@register_model("dicnet")
class DICNetHandler(DICHandler):
    def __init__(self, nf=None, iterations=None, num_landmarks=None,
                 **kwargs):
        if nf is not None:
            kwargs.setdefault("num_features", nf)
        if iterations is not None:
            kwargs.setdefault("num_steps", iterations)
        if num_landmarks is not None:
            import warnings
            warnings.warn(
                "dicnet's old num_landmarks kwarg is ignored — the "
                "reference-exact DIC predicts hg_num_keypoints heatmaps "
                "merged to 5 attention groups", stacklevel=2)
        super().__init__(**kwargs)
