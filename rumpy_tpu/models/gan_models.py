"""GAN SR family: ESRGAN / BSRGAN / Real-ESRGAN (+ Q variant).

Reference: rumpy/SISR/models/non_blind_gan_models/. The torch version
mutates three optimizers in sequence (pre-train / generator / discriminator
— __init__.py:35-139); here the whole GAN step is ONE jitted program:
generator and discriminator params live in a single params dict with
separate optax transforms, and both updates are computed from one trace.

Phases follow the reference: `pretrain_epochs` of pure L1 on the
generator, then the adversarial phase (pixel L1 * lambda_pixel +
adversarial * lambda_adv [+ VGG-perceptual * lambda_vgg, gated on
pretrained VGG weights which this image does not ship — weight 0 when
absent, documented]). 'esrgan' uses relativistic-average BCE logits
(handlers.py:17-113); 'bsrgan'/'realesrgan' use the LSGAN-style MSE of
BaseBSRGANModel. Real-ESRGAN's discriminator is the spectral-norm U-Net.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import (RRDB_KERNEL_INIT, TConv, TDense, pixel_unshuffle)
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.attention_manipulators import ParaCALayer
from rumpy_tpu.models.base import (BaseHandler, TrainState, build_optimizer)
from rumpy_tpu.registry import register_model


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

class ResidualDenseBlock(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        # default_init_weights(..., 0.1) on all 5 dense convs
        # (reference generators.py:88)
        conv = lambda c: TConv(c, (3, 3), dtype=self.dtype,
                               kernel_init=RRDB_KERNEL_INIT,
                               param_dtype=jnp.float32)
        x1 = lrelu(conv(self.gc)(x))
        x2 = lrelu(conv(self.gc)(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(conv(self.gc)(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(conv(self.gc)(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf)(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.nf, self.gc, dtype=self.dtype)(x)
        h = ResidualDenseBlock(self.nf, self.gc, dtype=self.dtype)(h)
        h = ResidualDenseBlock(self.nf, self.gc, dtype=self.dtype)(h)
        return x + 0.2 * h


def _upsample_nearest(x, factor=2):
    n, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
    return x


class RRDBNet(nn.Module):
    """ESRGAN / Real-ESRGAN generator (generators.py:122+). Scales below 4
    use pixel-unshuffle on the input (Real-ESRGAN convention)."""
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    num_metadata: int = 0  # >0 => ParaCALayer meta-injection per RRDB
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        conv = lambda c: TConv(c, (3, 3), dtype=self.dtype,
                                 param_dtype=jnp.float32)
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        fea = conv(self.nf)(x)
        trunk = fea
        for _ in range(self.nb):
            trunk = RRDB(self.nf, self.gc, dtype=self.dtype)(trunk)
            if self.num_metadata > 0 and metadata is not None:
                trunk = ParaCALayer(self.nf, self.num_metadata,
                                    nonlinearity=True,
                                    dtype=self.dtype)(trunk, metadata)
        trunk = conv(self.nf)(trunk)
        fea = fea + trunk
        # reference upconv stages: two x2 nearest upsamples; scale 8 runs
        # the FIRST interpolation at x4 (generators.py:172-176)
        fea = lrelu(conv(self.nf)(
            _upsample_nearest(fea, 4 if self.scale == 8 else 2)))
        fea = lrelu(conv(self.nf)(_upsample_nearest(fea)))
        fea = lrelu(conv(self.nf)(fea))
        return conv(self.out_nc)(fea)


QRRDBNet = RRDBNet  # meta-injection engaged via num_metadata > 0


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

class VGGStyleDiscriminator128(nn.Module):
    """Strided-conv VGG-style discriminator for 128x128 crops
    (discriminators.py:6-69)."""
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        feats = [self.nf, self.nf, self.nf * 2, self.nf * 2, self.nf * 4,
                 self.nf * 4, self.nf * 8, self.nf * 8, self.nf * 8,
                 self.nf * 8]
        for i, f in enumerate(feats):
            stride = 2 if i % 2 == 1 else 1
            x = TConv(f, (4, 4) if stride == 2 else (3, 3),
                        strides=(stride, stride), use_bias=(i == 0),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            if i > 0:
                x = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=self.dtype)(x)
            x = lrelu(x)
        # flatten in the torch CHW order (feat.view(n, -1) on NCHW,
        # discriminators.py:66) so converted linear1 checkpoints align
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = lrelu(TDense(100, dtype=self.dtype,
                           param_dtype=jnp.float32)(x))
        return TDense(1, dtype=self.dtype, param_dtype=jnp.float32)(x)


class UNetDiscriminatorSN(nn.Module):
    """Real-ESRGAN spectral-norm U-Net discriminator
    (discriminators.py:124+)."""
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)

        def sn_conv(c, k, s):
            return nn.SpectralNorm(
                TConv(c, (k, k), strides=(s, s), dtype=self.dtype,
                        param_dtype=jnp.float32))

        x0 = lrelu(TConv(self.nf, (3, 3), dtype=self.dtype,
                           param_dtype=jnp.float32)(x))
        x1 = lrelu(sn_conv(self.nf * 2, 4, 2)(x0, update_stats=train))
        x2 = lrelu(sn_conv(self.nf * 4, 4, 2)(x1, update_stats=train))
        x3 = lrelu(sn_conv(self.nf * 8, 4, 2)(x2, update_stats=train))
        # upsample path with skip connections
        u3 = _upsample_nearest(x3)
        u3 = lrelu(sn_conv(self.nf * 4, 3, 1)(u3, update_stats=train))
        u3 = u3 + x2
        u2 = _upsample_nearest(u3)
        u2 = lrelu(sn_conv(self.nf * 2, 3, 1)(u2, update_stats=train))
        u2 = u2 + x1
        u1 = _upsample_nearest(u2)
        u1 = lrelu(sn_conv(self.nf, 3, 1)(u1, update_stats=train))
        u1 = u1 + x0
        out = lrelu(sn_conv(self.nf, 3, 1)(u1, update_stats=train))
        out = lrelu(sn_conv(self.nf, 3, 1)(out, update_stats=train))
        return TConv(1, (3, 3), dtype=self.dtype,
                       param_dtype=jnp.float32)(out)


# ---------------------------------------------------------------------------
# Handlers
# ---------------------------------------------------------------------------

class BaseGANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"
    gan_mode = "lsgan"  # or 'relativistic'
    discriminator_type = "vgg128"

    def __init__(self, pretrain_epochs=0, lambda_adv=5e-3, lambda_pixel=1e-2,
                 lambda_vgg=1.0, vgg_weights=None, vgg_layer="conv5_4",
                 discriminator=None, d_lr=None, nf=64, nb=23, gc=32,
                 d_nf=64, main_lr=None, main_scheduler=None,
                 main_scheduler_params=None, main_optimizer_params=None,
                 pretrain_lr=None, pre_train_optimizer_params=None,
                 pre_train_scheduler=None, pre_train_scheduler_params=None,
                 discriminator_lr=None, discriminator_optimizer_params=None,
                 **kwargs):
        self.pretrain_epochs = pretrain_epochs
        self.lambda_adv = lambda_adv
        self.lambda_pixel = lambda_pixel
        # perceptual term requires pretrained VGG weights; zero when absent
        self.lambda_vgg = lambda_vgg if vgg_weights else 0.0
        self.vgg_weights = vgg_weights
        self.discriminator_type = discriminator or self.discriminator_type
        self.curr_epoch = 0
        self._d_lr = discriminator_lr if discriminator_lr is not None else d_lr
        self.d_nf = d_nf
        super().__init__(nf=nf, nb=nb, gc=gc, **kwargs)
        # The reference keeps SEPARATE pre_train and main Adam instances
        # over the same generator params, each with its own lr /
        # optimizer_params / scheduler (handlers.py:52-85): the
        # adversarial phase starts with FRESH moments at main_lr. self.tx
        # (BaseHandler, built from `lr` and the generic keys) is the
        # pre-train optimizer unless the reference's pre_train_* spelling
        # is used, which rebuilds it reference-exactly.
        if (pretrain_lr is not None or pre_train_optimizer_params
                or pre_train_scheduler):
            self.tx = build_optimizer(
                pretrain_lr if pretrain_lr is not None else self.lr,
                optimizer_type=self.optimizer_type,
                scheduler=pre_train_scheduler,
                scheduler_params=pre_train_scheduler_params,
                optimizer_params=pre_train_optimizer_params)
        self.main_tx = build_optimizer(main_lr or self.lr,
                                       optimizer_type=self.optimizer_type,
                                       scheduler=main_scheduler,
                                       scheduler_params=main_scheduler_params,
                                       optimizer_params=main_optimizer_params)
        # the discriminator shares the MAIN scheduler when one is set
        # (reference handlers.py:81-85)
        self._d_sched = (main_scheduler, main_scheduler_params,
                         discriminator_optimizer_params)
        # VGG-19 content loss (reference perceptual update,
        # non_blind_gan_models/__init__.py:35-139 + VGGNets.py:120-186)
        self.vgg_module = None
        self._vgg_params = None
        if vgg_weights:
            from rumpy_tpu.models.feature_extractors import (
                VGG19Features, load_extractor_params)
            self.vgg_module = VGG19Features(tap=vgg_layer, dtype=self.dtype)
            self._vgg_params = load_extractor_params(vgg_weights)
        # RRDB heads pixel-unshuffle at scale<4 (generators.py pixel
        # unshuffle input convention) — eval inputs must divide this.
        self.size_multiple = {1: 4, 2: 2}.get(self.scale, 1)
        self.d_tx = build_optimizer(self._d_lr or self.lr,
                            optimizer_type=self.optimizer_type,
                            scheduler=self._d_sched[0],
                            scheduler_params=self._d_sched[1],
                            optimizer_params=self._d_sched[2])
        self._gan_step = jax.jit(self._gan_step_impl, donate_argnums=(0,))

    def build_module(self, nf, nb, gc):
        return RRDBNet(scale=self.scale, nf=nf, nb=nb, gc=gc,
                       dtype=self.dtype)

    def build_discriminator(self) -> nn.Module:
        if self.discriminator_type in ("vgg128", "vgg"):
            return VGGStyleDiscriminator128(nf=self.d_nf, dtype=self.dtype)
        return UNetDiscriminatorSN(nf=self.d_nf, dtype=self.dtype)

    def set_epoch(self, epoch: int) -> None:
        self.curr_epoch = epoch

    # -- state -------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        grng, drng, srng = jax.random.split(rng, 3)
        g_vars = self.module.init(grng, *self.example_inputs())
        self.discriminator = self.build_discriminator()
        d_size = 128 if self.discriminator_type in ("vgg128", "vgg") else 64
        d_vars = self.discriminator.init(
            drng, jnp.zeros((1, d_size, d_size, 3), jnp.float32),
            train=True)
        params = {"generator": g_vars["params"],
                  "discriminator": d_vars["params"]}
        extra = {"d_vars": {k: v for k, v in d_vars.items()
                            if k != "params"}}
        opt_state = {"generator": self.main_tx.init(params["generator"]),
                     "discriminator": self.d_tx.init(
                         params["discriminator"])}
        if self.pretrain_epochs:
            # reference creates the pre-train optimizer only when a
            # pretrain phase exists (handlers.py:55-58)
            opt_state["generator_pre"] = self.tx.init(params["generator"])
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra=extra, rng=srng)

    # -- forward -----------------------------------------------------------

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        sr = self.module.apply({"params": gp}, batch["lr"])
        return sr, {}, extra

    def _disc_apply(self, d_params, d_vars, img, train):
        variables = {"params": d_params, **d_vars}
        mutable = [k for k in d_vars.keys()] if train else False
        if mutable:
            out, mut = self.discriminator.apply(variables, img, train=train,
                                                mutable=mutable)
            return out, mut
        out = self.discriminator.apply(variables, img, train=train)
        return out, d_vars

    # -- training ----------------------------------------------------------

    # -- frequency-separation hooks (ESRGAN-FS overrides these;
    #    implicit_blind_sr/handlers.py:24-51) --------------------------------
    def _pixel_pair(self, sr, hr):
        """Images the pixel loss compares (identity by default)."""
        return sr, hr

    def _disc_input(self, img):
        """Image the discriminator sees (identity by default)."""
        return img

    def _adv_g_loss(self, pred_fake, pred_real):
        if self.gan_mode == "bce":
            # vanilla BCE-with-logits on the fake prediction alone
            # (DANv1QRealESRGANHandler.generator_update,
            # blur_kernel_blind_sr/handlers.py:236-262)
            return optax.sigmoid_binary_cross_entropy(
                pred_fake, jnp.ones_like(pred_fake)).mean()
        if self.gan_mode == "relativistic":
            # relativistic average GAN (ESRGAN)
            real_rel = pred_real - pred_fake.mean()
            fake_rel = pred_fake - pred_real.mean()
            return 0.5 * (
                optax.sigmoid_binary_cross_entropy(
                    fake_rel, jnp.ones_like(fake_rel)).mean()
                + optax.sigmoid_binary_cross_entropy(
                    real_rel, jnp.zeros_like(real_rel)).mean())
        return jnp.mean((pred_fake - 1.0) ** 2)

    def _adv_d_loss(self, pred_fake, pred_real):
        if self.gan_mode == "bce":
            # discriminator_update (handlers.py:264-285): real vs 1,
            # detached fake vs 0
            return (optax.sigmoid_binary_cross_entropy(
                        pred_real, jnp.ones_like(pred_real)).mean(),
                    optax.sigmoid_binary_cross_entropy(
                        pred_fake, jnp.zeros_like(pred_fake)).mean())
        if self.gan_mode == "relativistic":
            # the reference's discriminator_update detaches the ENTIRE
            # fake prediction ("detachment of gradients required",
            # handlers.py:152-155): D gradients flow only through
            # pred_real (the fake term contributes via pred_real.mean)
            pred_fake = jax.lax.stop_gradient(pred_fake)
            real_rel = pred_real - pred_fake.mean()
            fake_rel = pred_fake - pred_real.mean()
            return (0.5 * optax.sigmoid_binary_cross_entropy(
                        real_rel, jnp.ones_like(real_rel)).mean(),
                    0.5 * optax.sigmoid_binary_cross_entropy(
                        fake_rel, jnp.zeros_like(fake_rel)).mean())
        return (jnp.mean((pred_real - 1.0) ** 2),
                jnp.mean(pred_fake ** 2))

    def _generator_outputs(self, g_params, batch, extra):
        """Hook: (sr, pixel-term, extra-loss dict) for the generator
        update. DAN conjugations override this so the 'pixel' term is the
        DAN image+kernel loss (handlers.py:286-307 dan_loss)."""
        sr, _, _ = self.apply({"generator": g_params}, batch,
                              train=True, extra=extra)
        pp_sr, pp_hr = self._pixel_pair(sr, batch["hr"])
        return sr, jnp.mean(jnp.abs(pp_sr - pp_hr)), {}

    def _gan_step_impl(self, state: TrainState, batch, vgg_params=None):
        rng, sub, dsub = jax.random.split(state.rng, 3)
        if self.input_fn is not None:  # fused online degradation
            batch = self.input_fn(dsub, batch)
        extra = state.extra
        d_vars = extra["d_vars"]

        # ---- generator update ----
        # the reference's discriminator stays in train() mode during the
        # generator update (run_train, handlers.py:171-182): its BN uses
        # BATCH statistics and the running stats advance — real first,
        # then fake (generator_update, handlers.py:128-131). The mutated
        # d_vars thread out through the aux so the D update continues
        # from them.
        def g_loss_fn(g_params):
            sr, pixel, g_extras = self._generator_outputs(g_params, batch,
                                                          extra)
            pred_real, dv1 = self._disc_apply(
                state.params["discriminator"], d_vars,
                self._disc_input(batch["hr"]), True)
            pred_fake, dv2 = self._disc_apply(
                state.params["discriminator"], dv1,
                self._disc_input(sr), True)
            adv = self._adv_g_loss(pred_fake,
                                   jax.lax.stop_gradient(pred_real))
            # VGG-19 content term (generator_update,
            # non_blind_gan_models/__init__.py:59-63): L1 between extractor
            # features of SR and (detached) HR.
            if self.vgg_module is not None and vgg_params is not None:
                gen_f = self.vgg_module.apply({"params": vgg_params}, sr)
                real_f = jax.lax.stop_gradient(self.vgg_module.apply(
                    {"params": vgg_params}, batch["hr"]))
                content = jnp.mean(jnp.abs(gen_f - real_f))
            else:
                content = jnp.zeros((), sr.dtype)
            total = (self.lambda_vgg * content + self.lambda_adv * adv
                     + self.lambda_pixel * pixel)
            return total, (sr, pixel, adv, content, g_extras, dv2)

        g_grads, (sr, pixel, adv, content, g_extras, g_d_vars) = jax.grad(
            g_loss_fn, has_aux=True)(state.params["generator"])
        g_updates, g_opt = self.main_tx.update(
            g_grads, state.opt_state["generator"],
            state.params["generator"])
        g_params = optax.apply_updates(state.params["generator"], g_updates)

        # ---- discriminator update ----
        sr_detached = jax.lax.stop_gradient(sr)
        g_d_vars = jax.lax.stop_gradient(g_d_vars)

        def d_loss_fn(d_params):
            pred_real, new_vars = self._disc_apply(
                d_params, g_d_vars, self._disc_input(batch["hr"]), True)
            pred_fake, new_vars = self._disc_apply(
                d_params, new_vars, self._disc_input(sr_detached), True)
            loss_real, loss_fake = self._adv_d_loss(pred_fake, pred_real)
            return loss_real + loss_fake, (loss_real, loss_fake, new_vars)

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
                  "d-loss-real": loss_real, "d-loss-fake": loss_fake,
                  **g_extras}
        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            opt_state={**state.opt_state, "generator": g_opt,
                       "discriminator": d_opt},
            extra={**extra, "d_vars": new_d_vars}, rng=rng)
        return new_state, losses

    def _pretrain_loss(self, g_params, batch, extra):
        """Hook: (loss, extra-loss dict) for the L1 pre-training phase.
        Plain L1 by default (pre_train_update semantics); DAN
        conjugations use the DAN image+kernel loss (handlers.py:309-313)."""
        sr, _, _ = self.apply({"generator": g_params}, batch,
                              train=True, extra=extra)
        return jnp.mean(jnp.abs(sr - batch["hr"])), {}

    def _pretrain_step_impl(self, state: TrainState, batch):
        rng, sub, dsub = jax.random.split(state.rng, 3)
        if self.input_fn is not None:  # fused online degradation
            batch = self.input_fn(dsub, batch)

        def loss_fn(g_params):
            return self._pretrain_loss(g_params, batch, state.extra)

        (loss, p_extras), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params["generator"])
        # pre-train phase steps its OWN optimizer (pre_train_update,
        # handlers.py:104-116); the main optimizer's moments stay zero
        # until the adversarial phase begins
        updates, g_opt = self.tx.update(grads,
                                        state.opt_state["generator_pre"],
                                        state.params["generator"])
        g_params = optax.apply_updates(state.params["generator"], updates)
        z = jnp.zeros(())
        losses = {"train-loss": loss, "l1-loss": loss, "gan-loss": z,
                  "vgg-loss": z, "d-loss-real": z, "d-loss-fake": z,
                  **p_extras}
        new_state = state.replace(
            step=state.step + 1,
            params={**state.params, "generator": g_params},
            opt_state={**state.opt_state, "generator_pre": g_opt}, rng=rng)
        return new_state, losses

    def _rejit(self):
        self._train_step = jax.jit(self._pretrain_step_impl,
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def train_batch(self, state, batch):
        if self.curr_epoch < self.pretrain_epochs:
            return self._train_step(state, batch)
        # extractor params ride as an argument (not a closure constant) so
        # the compiled executable doesn't embed the VGG weights
        return self._gan_step(state, batch, self._vgg_params)

    def _eval_step_impl(self, params_extra, batch):
        params, extra = params_extra
        sr, _, _ = self.apply(params, batch, train=False, extra=extra)
        return sr


@register_model("esrgan")
class ESRGANHandler(BaseGANHandler):
    """ESRGAN: RRDB generator + VGG-128 discriminator, relativistic GAN
    after L1 pre-training (handlers.py:17-113)."""
    gan_mode = "relativistic"
    discriminator_type = "vgg128"

    def __init__(self, pretrain_epochs=5, **kwargs):
        super().__init__(pretrain_epochs=pretrain_epochs, **kwargs)


@register_model("bsrgan")
class BSRGANHandler(BaseGANHandler):
    gan_mode = "lsgan"
    discriminator_type = "unet_sn"


@register_model("realesrgan")
class RealESRGANHandler(BaseGANHandler):
    """Real-ESRGAN: same machinery, U-Net SN discriminator; the heavy
    degradation pipeline arrives via the dataset's online_degradations
    (the reference did it in dataloader workers)."""
    gan_mode = "lsgan"
    discriminator_type = "unet_sn"


@register_model("qrealesrgan")
class QRealESRGANHandler(BaseGANHandler):
    """Meta-attention Real-ESRGAN (QRRDBNet): degradation metadata gates
    the trunk via ParaCALayers."""
    gan_mode = "lsgan"
    discriminator_type = "unet_sn"
    uses_metadata = True

    def __init__(self, metadata=None, metadata_bypass_len=None, **kwargs):
        from rumpy_tpu.models.attention_manipulators import \
            compute_num_metadata
        self.metadata_keys = list(metadata) if metadata else ["qpi"]
        self.num_metadata = compute_num_metadata(self.metadata_keys,
                                                 metadata_bypass_len)
        super().__init__(**kwargs)

    def build_module(self, nf, nb, gc):
        return RRDBNet(scale=self.scale, nf=nf, nb=nb, gc=gc,
                       num_metadata=self.num_metadata, dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features), jnp.float32),
                jnp.zeros((batch, self.num_metadata), jnp.float32))

    def select_metadata(self, metadata, keys=None):
        from rumpy_tpu.models.attention_manipulators import (
            select_metadata_columns)
        return select_metadata_columns(metadata, keys, self.metadata_keys)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        sr = self.module.apply({"params": gp}, batch["lr"],
                               batch["metadata"].astype(jnp.float32))
        return sr, {}, extra
