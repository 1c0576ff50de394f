"""DAN (Deep Alternating Network) blind SR.

Reference: rumpy/SISR/models/blur_kernel_blind_sr/DANv1.py + handlers.py:
27-136. An Estimator predicts the (PCA-encoded) blur kernel from
(SR, LR); a Restorer conditions on the kernel code to super-resolve;
the two alternate for `loop` iterations with stop-gradients between them
(sr.detach() into the Estimator, ker_map.detach() into the Restorer).

Loss parity quirk kept: per-iteration image/kernel losses are *logged*,
but the optimized loss is the LAST iteration's image L1 + kernel L1
(handlers.py:101-119 overwrites d_sr/d_kr each loop turn).

The iteration count is static, so the loop unrolls at trace time with
shared weights (flax setup-defined submodules); XLA pipelines the whole
alternation as one program — no Python-loop dispatch per step as in the
reference.

DANv1Q* conjugations (DANv1Models.py): the Restorer is swapped for a
meta-attention generator (QRCAN/QHAN/QELAN) fed the kernel code as its
metadata vector.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, pixel_shuffle
import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler, PIXEL_LOSSES
from rumpy_tpu.models.gan_models import BaseGANHandler
from rumpy_tpu.registry import register_model


class DANCALayer(nn.Module):
    nf: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = TConv(max(1, self.nf // self.reduction), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = nn.leaky_relu(y, 0.2)
        y = TConv(self.nf, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        return x * nn.sigmoid(y)


class CRBLayer(nn.Module):
    """Conditional residual block: concat(f, cond) -> conv-lrelu-conv-CA,
    residual on f (DANv1.py:37-53)."""
    nf1: int
    nf2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, cond):
        h = jnp.concatenate([f, cond], axis=-1)
        h = Conv(self.nf1 + self.nf2, 3, dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.nf1, 3, dtype=self.dtype)(h)
        h = DANCALayer(self.nf1, dtype=self.dtype)(h)
        return f + h


class Estimator(nn.Module):
    """Kernel-code estimator from (SR guess, LR) (DANv1.py:56-82)."""
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 10
    nf: int = 64
    num_blocks: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sr, lr):
        lrf = TConv(self.nf // 2, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(lr)
        hrf = TConv(self.nf // 2, (9, 9), strides=(self.scale, self.scale),
                      padding=4, dtype=self.dtype,
                      param_dtype=jnp.float32)(sr)
        f = lrf
        for _ in range(self.num_blocks):
            f = CRBLayer(self.nf // 2, self.nf // 2, dtype=self.dtype)(f, hrf)
        f = Conv(self.out_nc, 3, dtype=self.dtype)(f)
        return jnp.mean(f, axis=(1, 2))  # global average pool -> (N, out_nc)


class Restorer(nn.Module):
    """Kernel-conditioned restorer (DANv1.py:85-152)."""
    scale: int = 4
    nf: int = 64
    nb: int = 8
    input_para: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lr, ker_code):
        n, h, w, _ = lr.shape
        cond = jnp.broadcast_to(ker_code[:, None, None, :].astype(lr.dtype),
                                (n, h, w, ker_code.shape[-1]))
        f = Conv(self.nf, 3, dtype=self.dtype)(lr)
        for _ in range(self.nb):
            f = CRBLayer(self.nf, self.input_para, dtype=self.dtype)(f, cond)
        f = Conv(self.nf, 3, dtype=self.dtype)(f)
        if self.scale == 4:
            f = Conv(self.nf * 4, 3, dtype=self.dtype)(f)
            f = pixel_shuffle(f, 2)
            f = Conv(self.nf * 4, 3, dtype=self.dtype)(f)
            f = pixel_shuffle(f, 2)
            return Conv(3, 3, dtype=self.dtype)(f)
        f = Conv(self.nf * self.scale ** 2, 3, dtype=self.dtype)(f)
        f = pixel_shuffle(f, self.scale)
        return Conv(3, 3, dtype=self.dtype)(f)


class DAN(nn.Module):
    scale: int = 4
    nf: int = 64
    nb: int = 40
    input_para: int = 10
    kernel_size: int = 21
    loop: int = 4
    init_ker_map: Tuple[float, ...] = ()
    generator: Optional[nn.Module] = None  # meta-attention swap-in
    dtype: Any = jnp.float32

    def setup(self):
        if self.generator is None:
            self.restorer = Restorer(scale=self.scale, nf=self.nf,
                                     nb=self.nb,
                                     input_para=self.input_para,
                                     dtype=self.dtype)
        else:
            self.restorer = self.generator
        self.estimator = Estimator(scale=self.scale,
                                   out_nc=self.input_para,
                                   dtype=self.dtype)

    def __call__(self, lr):
        n = lr.shape[0]
        ker_map = jnp.broadcast_to(
            jnp.asarray(self.init_ker_map, jnp.float32)[None],
            (n, self.input_para))
        srs = []
        ker_maps = []
        for _ in range(self.loop):
            sr = self.restorer(lr, jax.lax.stop_gradient(ker_map))
            ker_map = self.estimator(jax.lax.stop_gradient(sr), lr)
            srs.append(sr)
            ker_maps.append(ker_map)
        return srs, ker_maps


class DPCB(nn.Module):
    """Dual-path conditional block (DANv2.py:21-45): two residual conv
    streams; stream 0 is gated by stream 1 via elementwise multiply (the
    kernel-code stream stays (N,1,1,nf) in the Restorer and broadcasts
    over space — XLA fuses the broadcast into the multiply)."""
    nf1: int
    nf2: int
    ksize1: int = 3
    ksize2: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        f1 = Conv(self.nf1, self.ksize1, dtype=self.dtype)(x0)
        f1 = nn.leaky_relu(f1, 0.2)
        f1 = Conv(self.nf1, self.ksize1, dtype=self.dtype)(f1)
        f2 = Conv(self.nf1, self.ksize2, dtype=self.dtype)(x1)
        f2 = nn.leaky_relu(f2, 0.2)
        f2 = Conv(self.nf1, self.ksize2, dtype=self.dtype)(f2)
        return x0 + f1 * f2, x1 + f2


class DPCG(nn.Module):
    """Group of DPCBs with an outer dual residual (DANv2.py:48-58)."""
    nf1: int
    nf2: int
    ksize1: int
    ksize2: int
    nb: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, x1):
        y0, y1 = x0, x1
        for _ in range(self.nb):
            y0, y1 = DPCB(self.nf1, self.nf2, self.ksize1, self.ksize2,
                          dtype=self.dtype)(y0, y1)
        return x0 + y0, x1 + y1


class EstimatorV2(nn.Module):
    """DANv2 full-kernel estimator (DANv2.py:61-96): LR head + strided
    SR head feed a dual-path group; tail global-pools and softmaxes over
    kernel-size^2 channels so the output is a normalized blur kernel."""
    scale: int = 4
    nf: int = 64
    kernel_size: int = 21
    num_blocks: int = 5
    residual_form: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sr, lr, previous_kernel=None):
        lrf = Conv(self.nf // 2, 5, dtype=self.dtype)(lr)
        hk = self.scale * 4 + 1
        hrf = TConv(self.nf // 2, (hk, hk),
                      strides=(self.scale, self.scale),
                      padding=self.scale * 2, dtype=self.dtype,
                      param_dtype=jnp.float32)(sr)
        f, _ = DPCG(self.nf // 2, self.nf // 2, 3, 3, self.num_blocks,
                    dtype=self.dtype)(lrf, hrf)
        f = Conv(self.nf, 3, dtype=self.dtype)(f)
        f = jnp.mean(f, axis=(1, 2), keepdims=True)
        f = TConv(self.kernel_size ** 2, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(f)
        kernel = nn.softmax(f[:, 0, 0, :].astype(jnp.float32), axis=-1)
        if self.residual_form and previous_kernel is not None:
            kernel = kernel + previous_kernel
        return kernel


class RestorerV2(nn.Module):
    """DANv2 kernel-conditioned restorer (DANv2.py:99-172): the kernel
    code becomes a (N,1,1,nf) stream gating the image stream through
    `ng` dual-path groups, then fusion conv + pixel-shuffle upsample."""
    scale: int = 4
    nf: int = 64
    nb: int = 10
    ng: int = 5
    input_para: int = 10
    residual_form: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lr, ker_code, previous_sr=None):
        f1 = Conv(self.nf, 3, dtype=self.dtype)(lr)
        f2 = TConv(self.nf, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(
            ker_code[:, None, None, :].astype(lr.dtype))
        for _ in range(self.ng):
            f1, f2 = DPCG(self.nf, self.nf, 3, 1, self.nb,
                          dtype=self.dtype)(f1, f2)
        f = Conv(self.nf, 3, dtype=self.dtype)(f1)
        if self.scale == 4:
            f = Conv(self.nf * 4, 3, dtype=self.dtype)(f)
            f = pixel_shuffle(f, 2)
            f = Conv(self.nf * 4, 3, dtype=self.dtype)(f)
            f = pixel_shuffle(f, 2)
            out = Conv(3, 3, dtype=self.dtype)(f)
        elif self.scale == 1:
            out = Conv(3, 3, dtype=self.dtype)(f)
        else:
            f = Conv(self.nf * self.scale ** 2, 3, dtype=self.dtype)(f)
            f = pixel_shuffle(f, self.scale)
            out = Conv(3, 3, dtype=self.dtype)(f)
        if self.residual_form and previous_sr is not None:
            out = out + previous_sr
        return out


class DANv2(nn.Module):
    """DANv2 (DANv2.py:175-249): alternates RestorerV2/EstimatorV2; the
    estimator emits the FULL kernel (softmax over k^2), which is PCA-
    projected to the 10-dim code fed back to the restorer. The PCA matrix
    is a fixed (para, k^2) constant baked into the trace. Returns
    (srs, ker_maps, kernels) per iteration."""
    scale: int = 4
    nf: int = 64
    nb: int = 10
    ng: int = 5
    input_para: int = 10
    kernel_size: int = 21
    loop: int = 4
    residual_kernel: bool = False
    residual_sr: bool = False
    pca_matrix: Tuple[Tuple[float, ...], ...] = ()  # (para, k^2)
    dtype: Any = jnp.float32

    def setup(self):
        self.restorer = RestorerV2(scale=self.scale, nf=self.nf,
                                   nb=self.nb, ng=self.ng,
                                   input_para=self.input_para,
                                   residual_form=self.residual_sr,
                                   dtype=self.dtype)
        self.estimator = EstimatorV2(scale=self.scale, nf=self.nf,
                                     kernel_size=self.kernel_size,
                                     residual_form=self.residual_kernel,
                                     dtype=self.dtype)

    def __call__(self, lr):
        n, h, w, c = lr.shape
        ks = self.kernel_size
        enc = jnp.asarray(self.pca_matrix, jnp.float32)  # (para, k^2)
        delta = jnp.zeros((ks * ks,), jnp.float32)
        delta = delta.at[(ks // 2) * ks + ks // 2].set(1.0)
        kernel = jnp.broadcast_to(delta[None], (n, ks * ks))
        ker_map = jnp.matmul(kernel, enc.T)
        sr = jnp.zeros((n, h * self.scale, w * self.scale, c), lr.dtype)
        srs, ker_maps, kernels = [], [], []
        for _ in range(self.loop):
            sr = self.restorer(
                lr, jax.lax.stop_gradient(ker_map),
                previous_sr=jax.lax.stop_gradient(sr)
                if self.residual_sr else None)
            kernel = self.estimator(
                jax.lax.stop_gradient(sr), lr,
                previous_kernel=jax.lax.stop_gradient(kernel)
                if self.residual_kernel else None)
            ker_map = jnp.matmul(kernel, enc.T)
            srs.append(sr)
            ker_maps.append(ker_map)
            kernels.append(kernel)
        return srs, ker_maps, kernels


def _default_pca_matrix(input_para: int, kernel_size: int,
                        seed: int = 0) -> Tuple[Tuple[float, ...], ...]:
    """Fit the (para, k^2) PCA basis from SRMD kernels — stands in for
    the reference's shipped pca_matrix.pth (DANv2.py:204-207)."""
    from rumpy_tpu.degradations.pca import fit_kernel_pca
    from rumpy_tpu.ops.blur_kernels import sample_srmd_kernels

    enc = fit_kernel_pca(
        lambda key, n: sample_srmd_kernels(key, n, kernel_size,
                                           rate_iso=0.5, random=True)[0],
        batch_len=2000, k=input_para, seed=seed)
    return tuple(tuple(row) for row in np.asarray(enc.matrix).tolist())


def _default_init_ker_map(input_para: int, kernel_size: int,
                          seed: int = 0) -> Tuple[float, ...]:
    """PCA-encode the identity (delta) kernel with a basis fit from SRMD
    kernels — stands in for the reference's shipped pca_matrix.pth
    (DANv1.py:161-184)."""
    from rumpy_tpu.degradations.pca import fit_kernel_pca
    from rumpy_tpu.ops.blur_kernels import sample_srmd_kernels

    enc = fit_kernel_pca(
        lambda key, n: sample_srmd_kernels(key, n, kernel_size,
                                           rate_iso=0.5, random=True)[0],
        batch_len=2000, k=input_para, seed=seed)
    delta = np.zeros((kernel_size, kernel_size), np.float32)
    delta[kernel_size // 2, kernel_size // 2] = 1.0
    return tuple(np.asarray(enc(jnp.asarray(delta.reshape(1, -1))))[0]
                 .tolist())


@register_model("dan")
class DANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"
    uses_metadata = True  # kernel-loss target comes from metadata

    def __init__(self, mode="v1", nf=64, nb=None, ng=5, input_para=10,
                 kernel_size=21, loop=4, selected_metadata=None,
                 init_ker_map=None, generator=None, pca_matrix=None,
                 residual_kernel=False, residual_sr=False,
                 generator_params=None, **kwargs):
        if mode not in ("v1", "v2", "v1QRCAN", "v1QHAN", "v1QELAN"):
            raise NotImplementedError("Set mode to v1, v2 or a v1Q* "
                                      "variant")
        self.mode = mode
        self.selected_metadata = selected_metadata
        if selected_metadata:
            input_para = len(selected_metadata)
        if mode == "v2":
            # v2: PCA matrix lives inside the net; kernel loss is on the
            # FULL softmaxed kernel (handlers.py:84-101)
            mat = (tuple(tuple(r) for r in pca_matrix)
                   if pca_matrix is not None
                   else _default_pca_matrix(input_para, kernel_size))
            super().__init__(nf=nf, nb=(nb if nb is not None else 10),
                             ng=ng, input_para=input_para,
                             kernel_size=kernel_size, loop=loop,
                             residual_kernel=residual_kernel,
                             residual_sr=residual_sr,
                             pca_matrix=mat, **kwargs)
            return
        ikm = (tuple(init_ker_map) if init_ker_map is not None
               else _default_init_ker_map(input_para, kernel_size))
        gen = None
        if mode != "v1":
            from rumpy_tpu.models.blind_sr import _build_generator
            gname = mode.replace("v1", "").lower()
            gen = _build_generator(gname, kwargs.get("scale", 4),
                                   input_para, jnp.float32,
                                   dict(generator_params or {}), False,
                                   False)
        super().__init__(nf=nf, nb=(nb if nb is not None else 40),
                         input_para=input_para,
                         kernel_size=kernel_size, loop=loop,
                         init_ker_map=ikm, generator=gen, **kwargs)

    def build_module(self, **kw):
        if self.mode == "v2":
            kw.pop("generator", None)
            return DANv2(scale=self.scale, dtype=self.dtype, **kw)
        kw.pop("ng", None)
        return DAN(scale=self.scale, dtype=self.dtype, **kw)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        out = self.module.apply({"params": params}, batch["lr"])
        if train:
            return out, {}, extra
        return out[0][-1], {}, extra

    def compute_losses(self, out, batch, aux):
        if self.mode == "v2":
            srs, ker_maps, kernels = out
            # v2 trains the full softmaxed kernel against the true blur
            # kernel (handlers.py:99-101); kernel target comes from
            # batch['blur_kernels'] (or the metadata matrix when it IS
            # the flattened kernel, request_full_kernels mode)
            target = batch.get("blur_kernels", batch.get("metadata"))
            target = target.reshape(target.shape[0], -1)
            kernel_preds = kernels
        else:
            srs, ker_maps = out
            target = batch["metadata"]
            kernel_preds = ker_maps
            if self.selected_metadata and \
                    target.shape[-1] != len(self.selected_metadata):
                raise ValueError(
                    f"DAN selected_metadata={self.selected_metadata} "
                    f"predicts {len(self.selected_metadata)} values but "
                    f"the batch metadata has {target.shape[-1]} columns — "
                    "set data.metadata to the same key list so the "
                    "pipeline selects matching columns")
        target = target.astype(jnp.float32)
        crit = PIXEL_LOSSES[self.loss_type]
        losses: Dict[str, jnp.ndarray] = {}
        d_sr = d_kr = 0.0
        for i, (sr, kp) in enumerate(zip(srs, kernel_preds)):
            d_sr = crit(sr, batch["hr"])
            d_kr = crit(kp, target)
            losses[f"image-loss-iter-{i}"] = d_sr
            losses[f"kernel-loss-iter-{i}"] = d_kr
        losses["train-loss"] = d_sr + d_kr
        return losses

    def _train_step_impl(self, state, batch):
        import optax
        rng, sub, dsub = jax.random.split(state.rng, 3)
        if self.input_fn is not None:
            batch = self.input_fn(dsub, batch)

        def loss_fn(params):
            out, aux, _ = self.apply(params, batch, train=True, rng=sub,
                                     extra=state.extra)
            losses = self.compute_losses(out, batch, aux)
            return losses["train-loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), losses


@register_model("danv1qrealesrgan")
class DANv1QRealESRGANHandler(BaseGANHandler):
    """DAN v1 with a QRRDBNet (meta-attention Real-ESRGAN) restorer
    trained under the GAN recipe (DANv1QRealESRGANHandler,
    blur_kernel_blind_sr/handlers.py:139-334 + DANv1Models.py:176-230):
    the per-iteration estimator predicts the PCA kernel code the
    restorer conditions on; the generator loss is
    lambda_pixel * (last-iter image L1 + kernel L1) + lambda_vgg *
    VGG content + lambda_adv * vanilla-BCE adversarial against a U-Net
    SN discriminator, after `pretrain_epochs` of pure DAN loss."""

    gan_mode = "bce"
    discriminator_type = "unet_sn"
    uses_metadata = True
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, selected_metadata=None, input_para=10,
                 kernel_size=21, loop=4, use_pca_encoder=True,
                 init_ker_map=None, pretrain_epochs=100,
                 lambda_adv=0.1, lambda_pixel=1.0, lambda_vgg=1.0,
                 nf=64, nb=23, gc=32, **kwargs):
        self.selected_metadata = selected_metadata
        if selected_metadata:
            input_para = len(selected_metadata)
        self.input_para = input_para
        self.kernel_size = kernel_size
        self.loop = loop
        if init_ker_map is not None:
            self._ikm = tuple(init_ker_map)
        elif use_pca_encoder:
            self._ikm = _default_init_ker_map(input_para, kernel_size)
        else:
            # use_pca_encoder=False fallback (DANv1Models.py:208)
            self._ikm = (0.5,) * input_para
        super().__init__(pretrain_epochs=pretrain_epochs,
                         lambda_adv=lambda_adv, lambda_pixel=lambda_pixel,
                         lambda_vgg=lambda_vgg, nf=nf, nb=nb, gc=gc,
                         **kwargs)

    def build_module(self, nf, nb, gc):
        from rumpy_tpu.models.gan_models import QRRDBNet
        restorer = QRRDBNet(scale=self.scale, nf=nf, nb=nb, gc=gc,
                            num_metadata=self.input_para, dtype=self.dtype)
        return DAN(scale=self.scale, input_para=self.input_para,
                   kernel_size=self.kernel_size, loop=self.loop,
                   init_ker_map=self._ikm, generator=restorer,
                   dtype=self.dtype)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        out = self.module.apply({"params": gp}, batch["lr"])
        if train:
            return out, {}, extra
        return out[0][-1], {}, extra

    def _dan_loss(self, g_params, batch):
        srs, ker_maps = self.module.apply({"params": g_params},
                                          batch["lr"])
        target = batch["metadata"].astype(jnp.float32)
        if self.selected_metadata and \
                target.shape[-1] != len(self.selected_metadata):
            raise ValueError(
                f"selected_metadata={self.selected_metadata} predicts "
                f"{len(self.selected_metadata)} values but the batch "
                f"metadata has {target.shape[-1]} columns — set "
                "data.metadata to the same key list")
        iter_losses: Dict[str, jnp.ndarray] = {}
        d_sr = d_kr = 0.0
        for i, (sr, km) in enumerate(zip(srs, ker_maps)):
            d_sr = jnp.mean(jnp.abs(sr - batch["hr"]))
            d_kr = jnp.mean(jnp.abs(km - target))
            iter_losses[f"image-loss-iter-{i}"] = d_sr
            iter_losses[f"kernel-loss-iter-{i}"] = d_kr
        return srs[-1], d_sr + d_kr, iter_losses

    def _generator_outputs(self, g_params, batch, extra):
        return self._dan_loss(g_params, batch)

    def _pretrain_loss(self, g_params, batch, extra):
        _, dan_loss, iter_losses = self._dan_loss(g_params, batch)
        return dan_loss, iter_losses
