"""FSSR — frequency-separation SR (reference-exact ports).

Reference: rumpy/SISR/models/implicit_blind_sr/
  * handlers.py:10-90     ESRGANFSHandler — ESRGAN whose pixel loss runs
    on low-pass-filtered images and whose discriminator sees only the
    high-frequency band (FilterLow/FilterHigh, models_dsgan.py:117-155).
  * handlers.py:93-203    FSSRDSGANHandler — DSGAN degradation simulator
    (scale 1): 8-ResBlock sigmoid generator, high-pass texture
    discriminator, color loss (low-pass L1) + adversarial texture loss
    + LPIPS perceptual, epoch-linear LR decay.
  * fssr_modules/models_dsgan.py (Generator/Discriminator/filters),
    fssr_modules/loss_functions.py (generator/discriminator BCE-style
    losses, GeneratorLoss weights w_col=1, w_tex=0.005, w_per=0.01).

TPU-first notes: both adversarial alternations are single jitted
programs; the low/high-pass filters are depthwise average pools that XLA
fuses into the surrounding graph.

Deviation note (documented): the reference's FSSRDSGANHandler backprops
the discriminator loss through a non-detached generator output and then
reuses the same freed graph for the generator update
(handlers.py:155-166) — that sequence raises a double-backward RuntimeError
in torch, i.e. the reference handler cannot actually run (the family is
marked unvalidated). This port implements the intended semantics:
discriminator update on detached fakes, generator update through a fresh
discriminator forward.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from rumpy_tpu.models.common import TConv
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.base import BaseHandler, TrainState, build_optimizer
from rumpy_tpu.models.face_attribute_gans import PRelu as _PReLU1
from rumpy_tpu.models.gan_models import ESRGANHandler
from rumpy_tpu.registry import register_model


# ---------------------------------------------------------------------------
# Frequency filters (models_dsgan.py:85-155)
# ---------------------------------------------------------------------------

def filter_low(x: jnp.ndarray, kernel_size: int = 5, padding: bool = True,
               include_pad: bool = True) -> jnp.ndarray:
    """AvgPool2d(k, stride 1) low-pass. padding=False shrinks the map
    (GeneratorLoss's color filter); include_pad=False renormalizes border
    windows by the true overlap count (torch count_include_pad=False)."""
    k = kernel_size
    pad = (k - 1) // 2 if padding else 0
    window = (1, k, k, 1)
    strides = (1, 1, 1, 1)
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides,
                                   pads)
    if include_pad or pad == 0:
        return summed / (k * k)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides,
                                   pads)
    return summed / counts


def filter_high(x: jnp.ndarray, kernel_size: int = 5,
                include_pad: bool = True,
                normalize: bool = True) -> jnp.ndarray:
    """models_dsgan.py:138-155: img - low_pass(img), optionally mapped to
    [0, 1] as 0.5 + hf * 0.5."""
    hf = x - filter_low(x, kernel_size, include_pad=include_pad)
    return 0.5 + hf * 0.5 if normalize else hf


# ---------------------------------------------------------------------------
# ESRGAN-FS (handlers.py:10-90)
# ---------------------------------------------------------------------------

@register_model("esrganfs")
class ESRGANFSHandler(ESRGANHandler):
    """ESRGAN with frequency separation: pixel L1 on the low band,
    adversarial supervision on the normalized high band only."""

    def __init__(self, use_filters: bool = True, **kwargs):
        self.use_filters = use_filters
        super().__init__(**kwargs)

    def _pixel_pair(self, sr, hr):
        if self.use_filters:
            return filter_low(sr), filter_low(hr)
        return sr, hr

    def _disc_input(self, img):
        if self.use_filters:
            # FilterHigh() with default include_pad=True (handlers.py:19)
            return filter_high(img)
        return img


# Back-compat alias for round-1 configs that used the "fssr" name for the
# frequency-separated ESRGAN.
@register_model("fssr")
class FSSRHandler(ESRGANFSHandler):
    pass


# ---------------------------------------------------------------------------
# DSGAN (models_dsgan.py:6-80)
# ---------------------------------------------------------------------------

class DSGANGenerator(nn.Module):
    """models_dsgan.py:6-22: conv+PReLU head, 8 residual blocks,
    sigmoid-bounded same-size output."""
    n_res_blocks: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = TConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="g00_conv")(x)
        h = _PReLU1(name="g01_act")(h)
        for i in range(self.n_res_blocks):
            r = TConv(64, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"r{i:02d}a_conv")(h)
            r = _PReLU1(name=f"r{i:02d}b_act")(r)
            r = TConv(64, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"r{i:02d}c_conv")(r)
            h = h + r
        h = TConv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="z_conv")(h)
        return nn.sigmoid(h.astype(jnp.float32))


class DSGANDiscriminator(nn.Module):
    """models_dsgan.py:25-66: optional high-pass front filter, 5x5 conv
    stack with BatchNorm, sigmoid patch output."""
    highpass: bool = True
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.highpass:
            x = filter_high(x, self.kernel_size, include_pad=False)
        h = TConv(64, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="d0_conv")(x)
        h = nn.leaky_relu(h, 0.2)
        h = TConv(128, (5, 5), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="d1_conv")(h)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                         dtype=jnp.float32, name="d2_bn")(h)
        h = nn.leaky_relu(h, 0.2)
        h = TConv(256, (5, 5), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="d3_conv")(h)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                         dtype=jnp.float32, name="d4_bn")(h)
        h = nn.leaky_relu(h, 0.2)
        h = TConv(1, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="d5_conv")(h)
        return nn.sigmoid(h.astype(jnp.float32))


@register_model("fssrdsgan")
class FSSRDSGANHandler(BaseHandler):
    """handlers.py:93-203. Same-size degradation-simulation GAN trained
    with w_col*low-pass-L1 + w_tex*(-log D(fake)) + w_per*LPIPS.

    The LPIPS perceptual term needs converted VGG-LPIPS weights
    (`lpips_weights`); pass `use_perceptual_loss=False` to train without
    it (no silent degradation)."""
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, generator_lr=2e-4, discriminator_lr=2e-4,
                 n_res_blocks=8, w_col=1.0, w_tex=0.005, w_per=0.01,
                 use_perceptual_loss: bool = True,
                 lpips_weights: Optional[str] = None,
                 global_scheduler: Optional[str] = "custom",
                 ds_epochs: int = 300, decay_epochs: int = 150,
                 scale: int = 1, **kwargs):
        self.w_col, self.w_tex, self.w_per = w_col, w_tex, w_per
        self.use_perceptual_loss = use_perceptual_loss
        self.curr_epoch = 0
        self.global_scheduler = global_scheduler
        self.ds_epochs = ds_epochs
        self.decay_epochs = decay_epochs
        self._lpips = None
        if use_perceptual_loss:
            if not lpips_weights:
                raise ValueError(
                    "FSSR-DSGAN's perceptual loss needs converted LPIPS "
                    "weights (lpips_weights=...); pass "
                    "use_perceptual_loss=False to train without it "
                    "(reference: loss_functions.py:96-160)")
            from rumpy_tpu.utils.lpips_jax import LPIPS
            self._lpips = LPIPS(lpips_weights)
        kwargs.pop("lr", None)
        super().__init__(scale=scale, lr=generator_lr,
                         n_res_blocks=n_res_blocks, **kwargs)
        self.d_tx = build_optimizer(discriminator_lr)
        self._gan_step = jax.jit(self._gan_step_impl, donate_argnums=(0,))

    def set_epoch(self, epoch: int) -> None:
        self.curr_epoch = epoch

    def _lr_factor(self) -> float:
        """handlers.py:111-114 custom per-epoch linear decay."""
        if self.global_scheduler != "custom":
            return 1.0
        start_decay = self.ds_epochs - self.decay_epochs
        e = self.curr_epoch
        if e < start_decay:
            return 1.0
        return 1.0 - max(0.0, float(e - start_decay) / self.decay_epochs)

    def build_module(self, n_res_blocks):
        return DSGANGenerator(n_res_blocks=n_res_blocks, dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, 3), jnp.float32),)

    def init_state(self, seed=None):
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        grng, drng, srng = jax.random.split(rng, 3)
        g_vars = jax.jit(self.module.init)(grng, *self.example_inputs())
        self.discriminator = DSGANDiscriminator(dtype=self.dtype)
        d_vars = self.discriminator.init(
            drng, jnp.zeros((1, 16, 16, 3), jnp.float32), train=True)
        params = {"generator": g_vars["params"],
                  "discriminator": d_vars["params"]}
        opt_state = {"generator": self.tx.init(params["generator"]),
                     "discriminator": self.d_tx.init(
                         params["discriminator"])}
        extra = {"d_bstats": d_vars.get("batch_stats", {})}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra=extra, rng=srng)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        # the simulator consumes the HR-domain input ("lr" slot for
        # interface compatibility; scale == 1)
        x = batch.get("lr", batch.get("hr"))
        return self.module.apply({"params": gp}, x), {}, extra

    def _disc(self, d_params, bstats, img, train):
        variables = {"params": d_params, "batch_stats": bstats}
        if train:
            out, mut = self.discriminator.apply(
                variables, img, train=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]
        return self.discriminator.apply(variables, img,
                                        train=False), bstats

    def _gan_step_impl(self, state, batch, lpips_params, lr_factor):
        rng, _ = jax.random.split(state.rng)
        x = batch["lr"].astype(jnp.float32)
        y = batch["hr"].astype(jnp.float32)
        eps = 1e-8

        gen = self.module.apply({"params": state.params["generator"]}, x)
        gen_detached = jax.lax.stop_gradient(gen)

        # ---- discriminator update (detached fakes; see deviation note) --
        def d_loss_fn(dp):
            real, b1 = self._disc(dp, state.extra["d_bstats"], y, True)
            fake, b2 = self._disc(dp, b1, gen_detached, True)
            loss = (-jnp.log(real + eps).mean()
                    - jnp.log(1 - fake + eps).mean())
            return loss, b2

        (d_loss, new_bstats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params["discriminator"])
        d_up, d_opt = self.d_tx.update(d_grads,
                                       state.opt_state["discriminator"],
                                       state.params["discriminator"])
        d_up = jax.tree_util.tree_map(lambda u: u * lr_factor, d_up)
        d_params = optax.apply_updates(state.params["discriminator"], d_up)

        # ---- generator update (fresh forward through updated D) ---------
        # NOTE: the content-preservation terms (color low-pass L1, LPIPS)
        # compare against the generator INPUT x, not y — y is only the
        # discriminator's texture-domain target. DSGAN trains on unpaired
        # domains; regressing toward y would destroy the input content
        # (reference handlers.py:166 criterion(fake_tex, gen_img, x)).
        def g_loss_fn(gp):
            out = self.module.apply({"params": gp}, x)
            fake, _ = self._disc(d_params, new_bstats, out, False)
            tex = -jnp.log(fake + eps).mean()
            col = jnp.mean(jnp.abs(
                filter_low(out, padding=False)
                - filter_low(x, padding=False)))
            loss = self.w_col * col + self.w_tex * tex
            if lpips_params is not None:
                per = self._lpips.distance(out, x, *lpips_params).mean()
            else:
                per = jnp.zeros(())
            if self.use_perceptual_loss:
                loss = loss + self.w_per * per
            return loss, (tex, col, per)

        (g_loss, (tex, col, per)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params["generator"])
        g_up, g_opt = self.tx.update(g_grads, state.opt_state["generator"],
                                     state.params["generator"])
        g_up = jax.tree_util.tree_map(lambda u: u * lr_factor, g_up)
        g_params = optax.apply_updates(state.params["generator"], g_up)

        losses = {"train-loss": g_loss, "generator-loss": g_loss,
                  "discriminator-loss": d_loss, "color-loss": col,
                  "texture-loss": tex, "perceptual-loss": per}
        new_state = state.replace(
            step=state.step + 1,
            params={"generator": g_params, "discriminator": d_params},
            opt_state={"generator": g_opt, "discriminator": d_opt},
            extra={**state.extra, "d_bstats": new_bstats}, rng=rng)
        return new_state, losses

    def _rejit(self):
        self._eval_step = jax.jit(self._eval_step_impl)

    def train_batch(self, state, batch):
        lpips_params = ((self._lpips.params, self._lpips.lins)
                        if self._lpips else None)
        return self._gan_step(state, batch, lpips_params,
                              jnp.float32(self._lr_factor()))

    def _eval_step_impl(self, params_extra, batch):
        params, extra = params_extra
        out, _, _ = self.apply(params, batch, train=False, extra=extra)
        return out
