"""DASR — degradation-aware SR with contrastive representation.

Reference: rumpy/SISR/models/blur_kernel_blind_sr/DASR.py (+ handler
:339-403). A MoCo-trained DASR encoder produces a 256-d degradation
embedding, compressed to 64-d; DA_conv blocks predict a per-example
depthwise 3x3 kernel from it (applied with the same batch-into-channels
grouped conv as the degradation engine) plus a channel-attention branch.

Training protocol parity: `encoder_pretrain_epochs` of contrastive-only
training, then joint SR-L1 + contrastive CE.

DCLS (DCLS.py:368+) is represented by a compact estimator producing a
normalized full 21x21 kernel from LR — behavioral stand-in for the
dynamic constrained-least-squares module (documented simplification).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from rumpy_tpu.models.common import (Conv, HE_NORMAL_INIT, TConv, TDense, Upsampler)
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.base import BaseHandler, TrainState, build_optimizer
from rumpy_tpu.models.contrastive import DASREncoder, _normalize
from rumpy_tpu.registry import register_model


class DAConv(nn.Module):
    """Degradation-aware conv (DASR.py:14-46): per-example predicted
    depthwise kernel + channel attention."""
    channels_out: int
    kernel_size: int = 3
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_v):
        b, h, w, c = x.shape
        ks = self.kernel_size
        # branch 1: per-(example, channel) depthwise kernels from the
        # embedding: the reference views its (B, 64*ks*ks) prediction as
        # (B*64, 1, ks, ks) and convolves with groups=b*c (DASR.py:39-40,
        # channels fixed at 64 there); generalized to c channels here
        k = TDense(64, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(k_v)
        k = nn.leaky_relu(k, 0.1)
        k = TDense(c * ks * ks, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(k)
        kernels = k.reshape(b * c, ks, ks)
        pad = (ks - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        # folded channel index = example*c + channel, matching the
        # kernel flattening order above
        folded = jnp.moveaxis(xp, 0, 2).reshape(1, h + 2 * pad, w + 2 * pad,
                                                b * c)
        filt = jnp.moveaxis(kernels.astype(x.dtype), 0, -1)[:, :, None, :]
        out = jax.lax.conv_general_dilated(
            folded, filt, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c)
        out = jnp.moveaxis(out.reshape(h, w, b, c), 2, 0)
        out = nn.leaky_relu(out, 0.1)
        out = TConv(self.channels_out, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(out)
        # branch 2: channel attention from the embedding
        att = TConv(max(1, c // self.reduction), (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32)(
            k_v[:, None, None, :].astype(x.dtype))
        att = nn.leaky_relu(att, 0.1)
        att = TConv(self.channels_out, (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32)(att)
        return out + x * nn.sigmoid(att)


class DAB(nn.Module):
    n_feat: int
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_v):
        out = nn.leaky_relu(DAConv(self.n_feat, 3, self.reduction,
                                   dtype=self.dtype)(x, k_v), 0.1)
        out = nn.leaky_relu(Conv(self.n_feat, 3, dtype=self.dtype)(out), 0.1)
        out = nn.leaky_relu(DAConv(self.n_feat, 3, self.reduction,
                                   dtype=self.dtype)(out, k_v), 0.1)
        return Conv(self.n_feat, 3, dtype=self.dtype)(out) + x


class DAG(nn.Module):
    n_feat: int
    n_blocks: int = 5
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_v):
        res = x
        for _ in range(self.n_blocks):
            res = DAB(self.n_feat, self.reduction, dtype=self.dtype)(res, k_v)
        res = Conv(self.n_feat, 3, dtype=self.dtype)(res)
        return res + x


class DASRNet(nn.Module):
    scale: int = 4
    n_groups: int = 5
    n_blocks: int = 5
    n_feats: int = 64
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embedding):
        k_v = TDense(64, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)(embedding)
        k_v = nn.leaky_relu(k_v, 0.1)
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        for _ in range(self.n_groups):
            res = DAG(self.n_feats, self.n_blocks, self.reduction,
                      dtype=self.dtype)(res, k_v)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(3, 3, dtype=self.dtype)(res)


class _DASRPipeline(nn.Module):
    sr_net: nn.Module
    encoder: nn.Module

    def __call__(self, x, train: bool = False):
        fea, _ = self.encoder(x, train=train)
        return self.sr_net(x, fea)

    def embed(self, x, train: bool = False):
        return self.encoder(x, train=train)


@register_model("dasr")
class DASRHandler(BaseHandler):
    """DASR joint handler (blur_kernel_blind_sr/handlers.py:339-403)."""

    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, encoder_pretrain_epochs=0, n_groups=5, n_blocks=5,
                 n_feats=64, contrastive_K=8192, contrastive_T=0.07,
                 contrastive_m=0.999, **kwargs):
        self.encoder_pretrain_epochs = encoder_pretrain_epochs
        self.K = contrastive_K
        self.T = contrastive_T
        self.m = contrastive_m
        self.curr_epoch = 0
        super().__init__(n_groups=n_groups, n_blocks=n_blocks,
                         n_feats=n_feats, **kwargs)

    def set_epoch(self, epoch: int) -> None:
        self.curr_epoch = epoch

    def build_module(self, **kw):
        return _DASRPipeline(
            sr_net=DASRNet(scale=self.scale, dtype=self.dtype, **kw),
            encoder=DASREncoder(dtype=self.dtype))

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),)

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, qrng, srng = jax.random.split(rng, 3)
        variables = self.module.init(prng, *self.example_inputs(),
                                     train=True)
        params = variables["params"]
        extra = {
            "bstats": variables.get("batch_stats", {}),
            "key_params": jax.tree_util.tree_map(jnp.copy,
                                                 params["encoder"]),
            "queue": _normalize(jax.random.normal(qrng, (self.K, 256))),
            "queue_ptr": jnp.zeros((), jnp.int32),
        }
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra,
                          rng=srng)

    def _encode(self, params, bstats, x, train):
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
            if train:
                (fea, outs), mut = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    method="embed")
                return fea, outs, mut["batch_stats"]
            fea, outs = self.module.apply(variables, x, train=False,
                                          method="embed")
            return fea, outs, bstats
        fea, outs = self.module.apply(variables, x, train=train,
                                      method="embed")
        return fea, outs, bstats

    def _train_step_impl(self, state: TrainState, batch):
        rng, _ = jax.random.split(state.rng)
        extra = state.extra
        joint = batch.get("hr") is not None

        key_params = jax.tree_util.tree_map(
            lambda kp, qp: kp * self.m + qp * (1.0 - self.m),
            extra["key_params"], state.params["encoder"])
        _, k_outs, _ = self._encode({"encoder": key_params},
                                    extra["bstats"], batch["image_key"],
                                    True)
        k = jax.lax.stop_gradient(_normalize(k_outs["q"]))

        def loss_fn(params):
            variables = {"params": params}
            new_bstats = extra["bstats"]
            if new_bstats:
                variables["batch_stats"] = new_bstats
                (fea, outs), mut = self.module.apply(
                    variables, batch["image_query"], train=True,
                    mutable=["batch_stats"], method="embed")
                new_bstats = mut["batch_stats"]
            else:
                fea, outs = self.module.apply(variables,
                                              batch["image_query"],
                                              train=True, method="embed")
            q = _normalize(outs["q"])
            queue = jax.lax.stop_gradient(extra["queue"])
            l_pos = jnp.sum(q * k, axis=1, keepdims=True) / self.T
            l_neg = jnp.matmul(q, queue.T,
                               precision=jax.lax.Precision.HIGHEST) / self.T
            logits = jnp.concatenate([l_pos, l_neg], axis=1)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.zeros(q.shape[0], jnp.int32)).mean()
            losses = {"contrastive-loss": ce}
            total = ce
            if joint:
                # fea is NOT detached: the reference's joint phase
                # backpropagates the SR L1 into the encoder too
                # (DASR.py:195-203 G(x, fea) on the live embedding)
                sr = self.module.apply(
                    {"params": params, **({"batch_stats": new_bstats}
                                          if new_bstats else {})},
                    batch["image_query"],
                    method=lambda m, v: m.sr_net(v, fea))
                pixel = jnp.mean(jnp.abs(sr - batch["hr"]))
                losses["pixel-loss"] = pixel
                total = pixel + ce
            losses["train-loss"] = total
            return total, (losses, new_bstats)

        grads, (losses, new_bstats) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        if not joint:
            # encoder-pretrain phase: zero SR-net grads
            grads = {**grads,
                     "sr_net": jax.tree_util.tree_map(jnp.zeros_like,
                                                      grads["sr_net"])}
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        ptr = extra["queue_ptr"]
        n = k.shape[0] // max(1, batch["image_key"].shape[0]
                              // batch["image_query"].shape[0])
        enq = k[:batch["image_query"].shape[0]].astype(
            extra["queue"].dtype)
        if self.K % enq.shape[0] != 0:
            raise ValueError(
                f"queue size K={self.K} must be a multiple of the global "
                f"enqueue batch {enq.shape[0]}")
        new_extra = dict(extra)
        new_extra.update({
            "key_params": key_params, "bstats": new_bstats,
            "queue": jax.lax.dynamic_update_slice(extra["queue"], enq,
                                                  (ptr, jnp.int32(0))),
            "queue_ptr": (ptr + enq.shape[0]) % self.K})
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, extra=new_extra,
                             rng=rng), losses

    def train_batch(self, state, batch):
        batch = dict(batch)
        lr = batch.get("lr")
        if "image_query" not in batch and lr is not None and lr.ndim == 5:
            # multi-crop dataset stack (B, P, h, w, C): crop 0 is the
            # query, crop 1 the key — the reference's run_train slices
            # x[:, 0]/x[:, 1] the same way (handlers.py:369-375)
            batch["image_query"] = lr[:, 0]
            batch["image_key"] = lr[:, 1 % lr.shape[1]]
            batch.pop("lr")
        if self.curr_epoch < self.encoder_pretrain_epochs:
            batch.pop("hr", None)
        return self._train_step(state, batch)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        variables = {"params": params}
        if extra and extra.get("bstats"):
            variables["batch_stats"] = extra["bstats"]
        sr = self.module.apply(variables, batch["lr"], train=False)
        return sr, {}, extra


@register_model("dcls")
class DCLSHandler(BaseHandler):
    """Compact DCLS-style full-kernel estimator: LR -> normalized 21x21
    kernel (stand-in for DCLS.py:368+, documented simplification)."""

    loss_type = "l1"
    colorspace = "rgb"
    uses_metadata = True

    def __init__(self, kernel_size=21, nf=64, **kwargs):
        self.kernel_size = kernel_size
        super().__init__(nf=nf, **kwargs)

    def build_module(self, nf):
        ks = self.kernel_size
        dtype = self.dtype

        class _Estimator(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = x
                for stride in (1, 2, 1, 2):
                    h = TConv(nf, (5, 5), strides=(stride, stride),
                              kernel_init=HE_NORMAL_INIT,
                                dtype=dtype, param_dtype=jnp.float32)(h)
                    h = nn.leaky_relu(h, 0.2)
                h = jnp.mean(h, axis=(1, 2))
                logits = TDense(ks * ks, dtype=dtype,
                                  param_dtype=jnp.float32)(h)
                kernel = nn.softmax(logits, axis=-1)
                return kernel.reshape(-1, ks, ks)

        return _Estimator()

    def apply(self, params, batch, train=False, rng=None, extra=None):
        k = self.module.apply({"params": params}, batch["lr"])
        return k, {}, extra

    def compute_losses(self, kernels, batch, aux):
        target = batch["metadata"].astype(jnp.float32)
        flat = kernels.reshape(kernels.shape[0], -1)
        return {"train-loss": jnp.mean(jnp.abs(flat - target))}
