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
import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler, PIXEL_LOSSES
from rumpy_tpu.models.common import Conv, pixel_shuffle
from rumpy_tpu.registry import register_model


class DANCALayer(nn.Module):
    nf: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.Conv(max(1, self.nf // self.reduction), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.nf, (1, 1), dtype=self.dtype,
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
        lrf = nn.Conv(self.nf // 2, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(lr)
        hrf = nn.Conv(self.nf // 2, (9, 9), strides=(self.scale, self.scale),
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

    def __init__(self, mode="v1", nf=64, nb=40, input_para=10,
                 kernel_size=21, loop=4, selected_metadata=None,
                 init_ker_map=None, generator=None,
                 generator_params=None, **kwargs):
        if mode not in ("v1", "v1QRCAN", "v1QHAN", "v1QELAN"):
            raise NotImplementedError("Set mode to v1 or a v1Q* variant")
        self.mode = mode
        self.selected_metadata = selected_metadata
        if selected_metadata:
            input_para = len(selected_metadata)
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
        super().__init__(nf=nf, nb=nb, input_para=input_para,
                         kernel_size=kernel_size, loop=loop,
                         init_ker_map=ikm, generator=gen, **kwargs)

    def build_module(self, **kw):
        return DAN(scale=self.scale, dtype=self.dtype, **kw)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        srs, ker_maps = self.module.apply({"params": params}, batch["lr"])
        if train:
            return (srs, ker_maps), {}, extra
        return srs[-1], {}, extra

    def compute_losses(self, out, batch, aux):
        srs, ker_maps = out
        crit = PIXEL_LOSSES[self.loss_type]
        target = batch["metadata"].astype(jnp.float32)
        losses: Dict[str, jnp.ndarray] = {}
        d_sr = d_kr = 0.0
        for i, (sr, km) in enumerate(zip(srs, ker_maps)):
            d_sr = crit(sr, batch["hr"])
            d_kr = crit(km, target)
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
