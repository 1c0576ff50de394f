"""Face-SR families: SPARNet/QSPARNet, RCANSplitCeleb, FaceGAN.

  * SPARNet / QSPARNet — spatial-attention residual face SR
    (SISR/models/SPARNet/): reference-exact encoder-body-decoder with
    hourglass spatial attention; Q variant injects metadata via
    ParaCALayer (forward parity-tested in tests/test_arch_parity.py).
  * RCANSplitCeleb — attribute-split two-RCAN ensemble
    (ensemble_models/handlers.py:8): the reference partitions each batch
    on host and runs each child on its dynamic-size split; here both
    experts see the static-shape batch and a per-example attribute mask
    selects outputs/gradients (TPU-first: no data-dependent shapes, each
    expert still only receives gradients from its allocation).
  * FaceGAN — unconditional DCGAN (generative_face_models/).

Siblings: models/wavelet.py (WaveletSRNet/GAN), models/dic.py (DIC),
models/fssr.py (ESRGAN-FS, FSSR-DSGAN), models/face_attribute_gans.py
(FaceSR-Attributes-GAN / AGA-GAN / FMFNet full ports).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import (Conv, TConv, TConvTranspose, TDense, pixel_shuffle, pixel_unshuffle)
import jax
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import ParaCALayer, QModelHandler
from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.models.gan_models import BaseGANHandler, QRealESRGANHandler
from rumpy_tpu.registry import register_model


# ---------------------------------------------------------------------------
# SPARNet
# ---------------------------------------------------------------------------

class SPConv(nn.Module):
    """SPARNet ConvLayer (blocks.py:67-100): optional nearest-x2 up,
    reflect pad k//2, conv (stride 2 on 'down'; bias only when the norm
    is 'none'/'pixel'), norm, relu — in that call order."""
    out_ch: int
    kernel: int = 3
    scale: str = "none"   # 'none' | 'down' | 'up' (or the literal 1 the
    #                       reference passes positionally, == 'none')
    norm: str = "none"    # 'none' | 'bn' | 'pixel'
    relu: str = "none"    # 'none' | 'relu' | 'leakyrelu' | 'prelu'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.scale == "up":
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")
        p = self.kernel // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                        mode="reflect")
        stride = 2 if self.scale == "down" else 1
        x = TConv(self.out_ch, (self.kernel, self.kernel),
                    strides=(stride, stride), padding="VALID",
                    use_bias=self.norm in ("none", "pixel"),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.norm == "bn":
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                             dtype=self.dtype)(x)
        elif self.norm == "pixel":
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        if self.relu == "relu":
            x = nn.relu(x)
        elif self.relu == "leakyrelu":
            x = nn.leaky_relu(x, 0.2)
        elif self.relu == "prelu":
            alpha = self.param("prelu", nn.initializers.constant(0.25),
                               (self.out_ch,))
            x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        return x


class HourGlassBlock(nn.Module):
    """SPAR attention (blocks.py:178-240): recursive hourglass producing
    a sigmoid attention map; returns input * map."""
    depth: int
    c_attn: int = 1
    c_mid: int = 64
    norm: str = "bn"
    relu: str = "leakyrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth == 0:
            return x
        nr = dict(norm=self.norm, relu=self.relu, dtype=self.dtype)

        def level(lv, in_x):
            up1 = SPConv(self.c_mid, 3, **nr)(in_x, train)
            low1 = SPConv(self.c_mid, 3, scale="down", **nr)(in_x, train)
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = SPConv(self.c_mid, 3, **nr)(low1, train)
            up2 = SPConv(self.c_mid, 3, scale="up", **nr)(low2, train)
            if up1.shape[1:3] != up2.shape[1:3]:
                up2 = jax.image.resize(
                    up2, up2.shape[:1] + up1.shape[1:3] + up2.shape[3:],
                    "nearest")
            return up1 + up2

        h = level(self.depth, x)
        att = nn.sigmoid(SPConv(self.c_attn, 3, dtype=self.dtype)(h))
        return x * att


class SPARResidualBlock(nn.Module):
    """blocks.py:103-175: preact(norm+relu) -> conv1 -> conv2 ->
    identity + hourglass(out); optional ParaCALayer metadata injection
    (QSPARNet's include_metadata)."""
    c_in: int
    c_out: int
    scale: str = "none"
    hg_depth: int = 2
    att_name: str = "spar"
    norm: str = "bn"
    relu: str = "leakyrelu"
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None, train: bool = False):
        nr = dict(norm=self.norm, relu=self.relu, dtype=self.dtype)
        if self.scale == "none" and self.c_in == self.c_out:
            identity = x
        else:
            identity = SPConv(self.c_out, 3, scale=self.scale,
                              dtype=self.dtype)(x, train)
        # preact: NormLayer + ReluLayer on c_in
        out = x
        if self.norm == "bn":
            out = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                               dtype=self.dtype)(out)
        if self.relu == "leakyrelu":
            out = nn.leaky_relu(out, 0.2)
        elif self.relu == "relu":
            out = nn.relu(out)
        elif self.relu == "prelu":
            alpha = self.param("preact_prelu",
                               nn.initializers.constant(0.25),
                               (self.c_in,))
            out = jnp.where(out >= 0, out, alpha.astype(out.dtype) * out)
        scales = {"down": ("none", "down"), "up": ("up", "none"),
                  "none": ("none", "none")}[self.scale]
        out = SPConv(self.c_out, 3, scale=scales[0], **nr)(out, train)
        out = SPConv(self.c_out, 3, scale=scales[1], norm=self.norm,
                     relu="none", dtype=self.dtype)(out, train)
        c_attn = self.c_out if self.att_name == "spar3d" else 1
        out = identity + HourGlassBlock(
            self.hg_depth, c_attn, norm=self.norm, relu=self.relu,
            dtype=self.dtype)(out, train)
        if self.num_metadata > 0 and metadata is not None:
            out = ParaCALayer(self.c_out, self.num_metadata,
                              nonlinearity=True,
                              dtype=self.dtype)(out, metadata)
        return out


class SPARNet(nn.Module):
    """SPARNet / QSPARNet (SPARNet/architectures.py): encoder down to
    min_feat_size, residual trunk, decoder back to out_size, with the
    reference's channel-clip and hourglass-depth schedules. metadata
    (num_metadata > 0) engages the QSPARNet ParaCALayer injections."""
    min_ch: int = 32
    max_ch: int = 128
    in_size: int = 128
    out_size: int = 128
    min_feat_size: int = 16
    res_depth: int = 10
    bottleneck_size: int = 4
    att_name: str = "spar"
    norm_type: str = "bn"
    relu_type: str = "leakyrelu"
    num_metadata: int = 0
    metadata_encoder_only: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None, train: bool = False):
        clip = lambda c: max(self.min_ch, min(c, self.max_ch))
        down_steps = int(math.log2(self.in_size // self.min_feat_size))
        up_steps = int(math.log2(self.out_size // self.min_feat_size))
        n_ch = clip(self.max_ch // (down_steps + 1))
        nr = dict(att_name=self.att_name, norm=self.norm_type,
                  relu=self.relu_type, dtype=self.dtype)
        trunk_meta = (0 if self.metadata_encoder_only
                      else self.num_metadata)

        h = SPConv(n_ch, 3, dtype=self.dtype)(x, train)
        hg_depth = int(math.log2(64 // self.bottleneck_size))
        for _ in range(down_steps):
            cin, cout = clip(n_ch), clip(n_ch * 2)
            h = SPARResidualBlock(cin, cout, scale="down",
                                  hg_depth=hg_depth,
                                  num_metadata=self.num_metadata,
                                  **nr)(h, metadata, train)
            n_ch *= 2
            hg_depth -= 1
        hg_depth += 1
        for _ in range(self.res_depth + 3 - down_steps):
            c = clip(n_ch)
            h = SPARResidualBlock(c, c, hg_depth=hg_depth,
                                  num_metadata=trunk_meta,
                                  **nr)(h, metadata, train)
        for _ in range(up_steps):
            hg_depth += 1
            cin, cout = clip(n_ch), clip(n_ch // 2)
            h = SPARResidualBlock(cin, cout, scale="up",
                                  hg_depth=hg_depth,
                                  num_metadata=trunk_meta,
                                  **nr)(h, metadata, train)
            n_ch //= 2
        return SPConv(3, 3, dtype=self.dtype)(h, train)


class _BNHandlerMixin:
    """Threads mutable batch_stats through extra['vars'] (the norm layers
    in SPARNet are BatchNorm by default)."""

    def apply(self, params, batch, train=False, rng=None, extra=None):
        variables = {"params": params}
        bstats = (extra or {}).get("vars", {}).get("batch_stats")
        if bstats:
            variables["batch_stats"] = bstats
        args = [batch["lr"]]
        if getattr(self, "uses_metadata", False):
            meta = batch.get("metadata")
            if meta is None:
                raise RuntimeError("Metadata needs to be specified for "
                                   "this network to run properly.")
            args.append(meta.astype(jnp.float32))
        if train and bstats:
            sr, mut = self.module.apply(variables, *args, train=True,
                                        mutable=["batch_stats"])
            new_extra = dict(extra)
            new_extra["vars"] = {"batch_stats": mut["batch_stats"]}
            return sr, {}, new_extra
        sr = self.module.apply(variables, *args, train=False)
        return sr, {}, extra

    def init_state(self, seed=None):
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


@register_model("sparnet")
class SPARNetHandler(_BNHandlerMixin, BaseHandler):
    """Face SR at fixed size: input is the bicubic-upsampled LR
    (im_input='interp'), output same size (SPARNet/handlers.py:5-18)."""
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "interp"

    def __init__(self, min_ch=32, max_ch=128, in_size=128, out_size=128,
                 min_feat_size=16, res_depth=10, bottleneck_size=4,
                 att_name="spar", norm_type="bn", relu_type="leakyrelu",
                 **kwargs):
        super().__init__(min_ch=min_ch, max_ch=max_ch, in_size=in_size,
                         out_size=out_size, min_feat_size=min_feat_size,
                         res_depth=res_depth,
                         bottleneck_size=bottleneck_size,
                         att_name=att_name, norm_type=norm_type,
                         relu_type=relu_type, **kwargs)

    def build_module(self, **kw):
        return SPARNet(dtype=self.dtype, **kw)

    def example_inputs(self, batch: int = 1, size: int = None):
        s = size or self.module.in_size
        return (jnp.zeros((batch, s, s, 3), jnp.float32),)


@register_model("qsparnet")
class QSPARNetHandler(_BNHandlerMixin, QModelHandler):
    im_input = "interp"

    def __init__(self, min_ch=32, max_ch=128, in_size=128, out_size=128,
                 min_feat_size=16, res_depth=10, bottleneck_size=4,
                 att_name="spar", norm_type="bn", relu_type="leakyrelu",
                 metadata_encoder_only=False, **kwargs):
        super().__init__(min_ch=min_ch, max_ch=max_ch, in_size=in_size,
                         out_size=out_size, min_feat_size=min_feat_size,
                         res_depth=res_depth,
                         bottleneck_size=bottleneck_size,
                         att_name=att_name, norm_type=norm_type,
                         relu_type=relu_type,
                         metadata_encoder_only=metadata_encoder_only,
                         **kwargs)

    def build_module(self, **kw):
        return SPARNet(num_metadata=self.num_metadata, dtype=self.dtype,
                       **kw)

    def example_inputs(self, batch: int = 1, size: int = None):
        s = size or self.module.in_size
        return (jnp.zeros((batch, s, s, 3), jnp.float32),
                jnp.zeros((batch, self.num_metadata), jnp.float32))


# ---------------------------------------------------------------------------
# RCAN ensemble
# ---------------------------------------------------------------------------

@register_model("rcansplitceleb")
class RCANSplitCelebHandler(BaseHandler):
    """Attribute-split two-RCAN ensemble (ensemble_models/handlers.py:8-99
    RcanSplitCelebHandler). The reference partitions each batch on host by
    a binary celeba attribute and runs the 'positive'/'negative' child on
    its dynamic-size split; here both experts see the static-shape batch
    and the per-example attribute gates output selection — gradients still
    flow only to each example's owning expert through jnp.where, so the
    training semantics match without data-dependent shapes.

    The gate column is `metadata[:, split_index]` (default 0). With the
    standard config — `data.metadata = ["gender"]` (or another binary
    celeba attribute) — the data layer selects exactly that column, which
    reproduces the reference's metadata_keys lookup of `split_variable`
    (handlers.py:33-43).

    Per-allocation losses are reported as the reference does
    (positive-loss / negative-loss, NaN when a batch has no examples of
    an allocation; train-loss is their sum, handlers.py:46-66).
    """
    loss_type = "l1"
    colorspace = "rgb"
    uses_metadata = True

    def __init__(self, n_feats=64, n_resgroups=10, n_resblocks=20,
                 split_variable="gender", split_index=0, **kwargs):
        self.split_variable = split_variable
        self.split_index = split_index
        super().__init__(n_feats=n_feats, n_resgroups=n_resgroups,
                         n_resblocks=n_resblocks, **kwargs)

    def build_module(self, **kw):
        from rumpy_tpu.models.advanced import RCAN
        scale, dtype = self.scale, self.dtype

        class _Split(nn.Module):
            def setup(self):
                self.expert_a = RCAN(scale=scale, dtype=dtype, **kw)
                self.expert_b = RCAN(scale=scale, dtype=dtype, **kw)

            def __call__(self, x, gate):
                a = self.expert_a(x)
                b = self.expert_b(x)
                g = gate[:, None, None, None]
                return jnp.where(g > 0.5, a, b)

        return _Split()

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, 3), jnp.float32),
                jnp.zeros((batch,), jnp.float32))

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gate = batch["metadata"][:, self.split_index].astype(jnp.float32)
        sr = self.module.apply({"params": params}, batch["lr"], gate)
        return sr, {"_gate": gate}, extra

    def compute_losses(self, sr, batch, aux):
        gate = aux.pop("_gate")
        per_ex = jnp.mean(jnp.abs(sr - batch["hr"]), axis=(1, 2, 3))
        pos = gate > 0.5
        n_pos = pos.sum()
        n_neg = (~pos).sum()
        pos_loss = jnp.where(
            n_pos > 0,
            jnp.where(pos, per_ex, 0.0).sum() / jnp.maximum(n_pos, 1),
            jnp.nan)
        neg_loss = jnp.where(
            n_neg > 0,
            jnp.where(pos, 0.0, per_ex).sum() / jnp.maximum(n_neg, 1),
            jnp.nan)
        # train-loss = sum of per-allocation means (handlers.py:64-66);
        # nan-safe so a single-allocation batch still trains
        total = (jnp.nan_to_num(pos_loss) + jnp.nan_to_num(neg_loss))
        return {"train-loss": total, "positive-loss": pos_loss,
                "negative-loss": neg_loss}

    def transform_updates(self, updates, state, batch):
        """Reference handlers.py:49-54 skips the optimizer step of a
        child with no examples in the batch. The absent expert's grads
        are already zero, but Adam momentum would still produce nonzero
        updates — mask them. (Deviation: the absent expert's Adam moments
        still decay toward zero here, vs staying untouched in the
        reference; that is benign, unlike letting stale momentum coast.)"""
        gate = batch["metadata"][:, self.split_index] > 0.5
        has_pos = (gate.sum() > 0).astype(jnp.float32)
        has_neg = ((~gate).sum() > 0).astype(jnp.float32)
        updates = dict(updates)
        updates["expert_a"] = jax.tree_util.tree_map(
            lambda u: u * has_pos, updates["expert_a"])
        updates["expert_b"] = jax.tree_util.tree_map(
            lambda u: u * has_neg, updates["expert_b"])
        return updates


# ---------------------------------------------------------------------------
# WaveletSRNet/WaveletSRGAN live in models/wavelet.py; DIC in models/dic.py;
# ESRGAN-FS + FSSR-DSGAN in models/fssr.py (all reference-exact ports).
# ---------------------------------------------------------------------------
# Attribute-conditioned face GANs: full ports live in
# models/face_attribute_gans.py (FaceSRAttributesGAN / AGAGAN / FMFNet).
# ---------------------------------------------------------------------------
# Unconditional face GAN (generative_face_models/)
# ---------------------------------------------------------------------------

class GANGenerator(nn.Module):
    """DCGAN-style face generator (generative_face_models/generators.py:
    7-38): latent -> 5x5x128 -> 4 stride-2 transposed convs -> 80x80 RGB
    tanh image."""
    latent_dim: int = 100
    nf: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = TDense(self.nf * 5 * 5, dtype=self.dtype,
                     param_dtype=jnp.float32)(z.astype(self.dtype))
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape(-1, 5, 5, self.nf)
        for _ in range(4):
            # SAME padding = torch ConvTranspose2d(k=4, s=2, p=1) doubling
            x = TConvTranspose(self.nf, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 param_dtype=jnp.float32)(x)
            x = nn.leaky_relu(x, 0.2)
        x = TConv(3, (5, 5), dtype=self.dtype, param_dtype=jnp.float32)(x)
        return jnp.tanh(x.astype(jnp.float32))


class GANFaceDiscriminator(nn.Module):
    """DCGAN discriminator (generative_face_models/discriminators.py:
    7-39): 5 conv-5 stages (4 strided, batch-normed), dropout, sigmoid
    real/fake probability."""
    nf: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TConv(self.nf, (5, 5), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, 0.2)
        for _ in range(4):
            x = TConv(self.nf, (5, 5), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                             dtype=jnp.float32)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = TDense(1, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.sigmoid(x.astype(jnp.float32))


@register_model("facegan")
class FaceGANHandler(BaseHandler):
    """Unconditional face GAN (generative_face_models/handlers.py:6-181):
    per step, the discriminator trains on a half batch of real images
    (rescaled to [-1,1]) vs generated fakes with BCE, then the generator
    trains through the frozen discriminator; reports d-loss-real/fake and
    discriminator accuracies. The whole alternation is ONE jitted program
    (the reference ran two separate optimizer passes)."""

    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, latent_dim=100, discriminator_lr=None, nf=128,
                 **kwargs):
        self.latent_dim = latent_dim
        self.nf = nf
        self._d_lr = discriminator_lr
        super().__init__(**kwargs)
        from rumpy_tpu.models.base import build_optimizer
        self.d_tx = build_optimizer(discriminator_lr or self.lr)

    def build_module(self, **kw):
        return GANGenerator(latent_dim=self.latent_dim, nf=self.nf,
                            dtype=self.dtype, **kw)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, self.latent_dim), jnp.float32),)

    def init_state(self, seed=None):
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        grng, drng, srng = jax.random.split(rng, 3)
        g_vars = self.module.init(grng, *self.example_inputs())
        self.discriminator = GANFaceDiscriminator(nf=self.nf,
                                                  dtype=self.dtype)
        d_vars = self.discriminator.init(
            drng, jnp.zeros((1, 80, 80, 3), jnp.float32), train=False)
        params = {"generator": g_vars["params"],
                  "discriminator": d_vars["params"]}
        opt_state = {"generator": self.tx.init(params["generator"]),
                     "discriminator": self.d_tx.init(
                         params["discriminator"])}
        extra = {"d_bstats": d_vars.get("batch_stats", {})}
        from rumpy_tpu.models.base import TrainState
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra=extra, rng=srng)

    def _disc(self, d_params, bstats, img, train, rng=None):
        variables = {"params": d_params, "batch_stats": bstats}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            out, mut = self.discriminator.apply(
                variables, img, train=True, mutable=["batch_stats"],
                rngs=rngs)
            return out, mut["batch_stats"]
        return self.discriminator.apply(variables, img,
                                        train=False), bstats

    def _train_step_impl(self, state, batch):
        import optax
        rng, zk_d, zk_g, perm_k, drop1, drop2 = jax.random.split(
            state.rng, 6)
        y = batch["hr"].astype(jnp.float32)
        n = y.shape[0]
        half = max(1, n // 2)
        idx = jax.random.permutation(perm_k, n)[:half]
        y_half = y[idx] * 2.0 - 1.0  # rescale to generator's tanh range
        bstats = state.extra["d_bstats"]

        # ---- discriminator update (real half-batch + fakes) ----
        z_d = jax.random.uniform(zk_d, (half, self.latent_dim))
        fakes = self.module.apply(
            {"params": state.params["generator"]}, z_d)
        fakes = jax.lax.stop_gradient(fakes)

        def d_loss_fn(dp):
            pred_real, bs1 = self._disc(dp, bstats, y_half, True, drop1)
            pred_fake, bs2 = self._disc(dp, bs1, fakes, True, drop2)
            eps = 1e-7
            loss_real = -jnp.mean(jnp.log(pred_real + eps))
            loss_fake = -jnp.mean(jnp.log(1.0 - pred_fake + eps))
            acc_real = jnp.mean((pred_real > 0.5).astype(jnp.float32))
            acc_fake = jnp.mean((pred_fake <= 0.5).astype(jnp.float32))
            return loss_real + loss_fake, (loss_real, loss_fake,
                                           acc_real, acc_fake, bs2)

        d_grads, (l_real, l_fake, acc_r, acc_f, new_bstats) = jax.grad(
            d_loss_fn, has_aux=True)(state.params["discriminator"])
        d_up, d_opt = self.d_tx.update(d_grads,
                                       state.opt_state["discriminator"],
                                       state.params["discriminator"])
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        # ---- generator update through the updated discriminator ----
        z_g = jax.random.uniform(zk_g, (n, self.latent_dim))

        def g_loss_fn(gp):
            gen = self.module.apply({"params": gp}, z_g)
            pred, _ = self._disc(d_params, new_bstats, gen, False)
            eps = 1e-7
            return -jnp.mean(jnp.log(pred + eps))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(
            state.params["generator"])
        g_up, g_opt = self.tx.update(g_grads, state.opt_state["generator"],
                                     state.params["generator"])
        g_params = optax.apply_updates(state.params["generator"], g_up)

        losses = {"train-loss": g_loss, "d-loss-real": l_real,
                  "d-loss-fake": l_fake, "d-acc-real": acc_r,
                  "d-acc-fake": acc_f}
        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            extra={**state.extra, "d_bstats": new_bstats}, rng=rng)
        return new_state, losses

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        if "latent" in batch:
            z = batch["latent"].astype(jnp.float32)
        else:
            n = batch["hr"].shape[0] if "hr" in batch else 1
            z = jax.random.uniform(
                rng if rng is not None else jax.random.PRNGKey(0),
                (n, self.latent_dim))
        gen = self.module.apply({"params": gp}, z)
        # undo tanh range for saving ((out - 1)/2 quirk kept as the
        # reference wrote it, handlers.py:160-161 -- actually (x+1)/2
        # is the correct inverse; the reference's off-by-sign is NOT
        # reproduced since it only affected saved previews)
        return (gen + 1.0) / 2.0, {}, extra

    def compute_losses(self, out, batch, aux):
        return {"train-loss": jnp.zeros(())}
