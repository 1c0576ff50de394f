"""Contrastive degradation predictors (MoCo / SupMoCo / WeakCon / SupCon).

Reference: rumpy/regression/models/contrastive_learning/. Functional
redesign: the momentum (key) encoder parameters, the negative queue, its
pointer and its label/vector side-queues all live in the TrainState's
``extra`` pytree, so the whole training step — EMA update, key forward,
query forward, queue contrast, enqueue — is ONE jitted program. Under
data-parallel jit the queue update consumes the *global* batch (jit's
global-view semantics), which fixes the reference's single-device queue
assumption for free (SURVEY.md §2.1: MoCo's DDP gather was dead code).

Parity notes:
  * DASR Encoder: 6 convs + BN + LeakyReLU(0.1) + GAP + 2-layer MLP
    (encoding_models.py:5-55), optional dropdown regression head;
  * MoCo logits (moco.py:135-191): multi-positive extension included;
  * SupMoCo (supmoco.py:53-125): label queue, positives from same class;
    optional include_direct_loss L1 on the dropdown head;
  * WeakCon (weak_con.py:36-104): cdist weights on negative logits from
    continuous degradation vectors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import TConv, TDense
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.base import BaseHandler, TrainState
from rumpy_tpu.registry import register_model


class DASREncoder(nn.Module):
    """DASR 6-conv encoder + projection MLP (encoding_models.py:5-55)."""
    dropdown_q: Optional[int] = None
    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lrelu = lambda v: nn.leaky_relu(v, 0.1)
        spec = [(64, 1), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1)]
        for feats, stride in spec:
            # explicit (1,1) padding: torch Conv2d(padding=1) pads both
            # sides even at stride 2, where flax 'SAME' pads (0,1)
            x = TConv(feats, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train,
                             dtype=self.dtype)(x)
            x = lrelu(x)
        fea = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 256)
        out = TDense(256, dtype=self.dtype, param_dtype=jnp.float32)(fea)
        out = lrelu(out)
        out = TDense(self.out_dim, dtype=self.dtype,
                       param_dtype=jnp.float32)(out)
        outputs = {"q": out}
        if self.dropdown_q is not None:
            # reference feeds the PROJECTED embedding into the dropdown
            # head (encoding_models.py:52: drop_mlp(out)), not fea
            d = TDense(64, dtype=self.dtype, param_dtype=jnp.float32)(out)
            d = lrelu(d)
            d = TDense(32, dtype=self.dtype, param_dtype=jnp.float32)(d)
            d = lrelu(d)
            outputs["dropdown_q"] = TDense(
                self.dropdown_q, dtype=self.dtype,
                param_dtype=jnp.float32)(d)
        return fea, outputs


def _normalize(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


@register_model("moco")
class MoCoHandler(BaseHandler):
    """Momentum-contrast degradation encoder (moco.py:8-197)."""

    colorspace = "rgb"
    task = "regression"

    def __init__(self, dim=256, K=8192, m=0.999, T=0.07, positives=1,
                 dropdown=None, contrastive_dropdown=False, **kwargs):
        self.dim = dim
        self.K = K
        self.m = m
        self.T = T
        self.positives = positives
        self.dropdown = dropdown
        self.contrastive_dropdown = contrastive_dropdown and dropdown
        # dimension of the vector actually contrasted/enqueued
        self.proj_dim = dropdown if self.contrastive_dropdown else dim
        super().__init__(**kwargs)

    def set_input_pipeline(self, fn) -> None:
        raise NotImplementedError(
            "contrastive handlers take query/key VIEW batches, not raw "
            "hr batches — online on-device view degradation is driven by "
            "the regression trainer (training/regression_trainer.py), "
            "not by the fused input_fn hook")

    def build_module(self, **kw):
        return DASREncoder(dropdown_q=self.dropdown, out_dim=self.dim,
                           dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = 32):
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),)

    # -- state ------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, qrng, srng = jax.random.split(rng, 3)
        variables = self.module.init(prng, *self.example_inputs())
        params = variables["params"]
        bstats = variables.get("batch_stats", {})
        queue = _normalize(jax.random.normal(qrng, (self.K, self.proj_dim)))
        extra = {
            "key_params": jax.tree_util.tree_map(jnp.copy, params),
            "q_bstats": bstats,
            "k_bstats": jax.tree_util.tree_map(jnp.copy, bstats),
            "queue": queue,
            "queue_ptr": jnp.zeros((), jnp.int32),
        }
        extra.update(self.init_queue_sides())
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra,
                          rng=srng)

    def init_queue_sides(self) -> Dict[str, jnp.ndarray]:
        return {}

    # -- contrast logic ---------------------------------------------------

    def _proj(self, outputs):
        if self.contrastive_dropdown:
            return outputs["dropdown_q"]
        return outputs["q"]

    def compute_logits(self, q, k, extra, batch) -> Tuple[jnp.ndarray, Dict]:
        """MoCo logits; returns (logits, queue-side updates)."""
        queue = jax.lax.stop_gradient(extra["queue"])  # (K, dim)
        n = q.shape[0]
        if self.positives == 1:
            l_pos = jnp.sum(q * k, axis=1, keepdims=True) / self.T
            enqueue = k
        else:
            kp = k.reshape(n, self.positives, self.proj_dim)
            l_pos = (jnp.sum(q[:, None, :] * kp, axis=2) / self.T
                     ).sum(axis=1, keepdims=True) / self.positives
            enqueue = kp[:, 0]
        l_neg = jnp.matmul(q, queue.T,
                           precision=jax.lax.Precision.HIGHEST) / self.T
        return jnp.concatenate([l_pos, l_neg], axis=1), {"enqueue": enqueue}

    def queue_side_updates(self, extra, batch, ptr, n):
        return {}

    # -- train step -------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        extra = state.extra

        # momentum update of the key encoder
        key_params = jax.tree_util.tree_map(
            lambda kp, qp: kp * self.m + qp * (1.0 - self.m),
            extra["key_params"], state.params)

        kv = {"params": key_params}
        if extra["k_bstats"]:
            kv["batch_stats"] = extra["k_bstats"]
            (k_fea, k_out), k_mut = self.module.apply(
                kv, batch["image_key"], train=True, mutable=["batch_stats"])
            new_k_bstats = k_mut["batch_stats"]
        else:
            k_fea, k_out = self.module.apply(kv, batch["image_key"],
                                             train=True)
            new_k_bstats = extra["k_bstats"]
        k = jax.lax.stop_gradient(_normalize(self._proj(k_out)))

        def loss_fn(params):
            qv = {"params": params}
            if extra["q_bstats"]:
                qv["batch_stats"] = extra["q_bstats"]
                (fea, out), mut = self.module.apply(
                    qv, batch["image_query"], train=True,
                    mutable=["batch_stats"])
                new_bstats = mut["batch_stats"]
            else:
                fea, out = self.module.apply(qv, batch["image_query"],
                                             train=True)
                new_bstats = extra["q_bstats"]
            q = _normalize(self._proj(out))
            logits, side = self.compute_logits(q, k, extra, batch)
            labels = jnp.zeros(logits.shape[0], jnp.int32)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            losses = {"train-loss": loss, "contrastive-loss": loss}
            losses.update(self.extra_losses(out, batch))
            total = losses["train-loss"]
            for k2, v in losses.items():
                if k2 not in ("train-loss", "contrastive-loss"):
                    total = total + v
            losses["train-loss"] = total
            return total, (losses, new_bstats, side)

        grads, (losses, new_q_bstats, side) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)

        # dequeue/enqueue at ptr — K must divide evenly by the global
        # batch (the reference's _dequeue_and_enqueue asserts this;
        # dynamic_update_slice would otherwise CLAMP the start index and
        # silently desynchronize the pointer from the writes)
        enq = jax.lax.stop_gradient(side["enqueue"]).astype(
            extra["queue"].dtype)
        n = enq.shape[0]
        if self.K % n != 0:
            raise ValueError(
                f"queue size K={self.K} must be a multiple of the global "
                f"enqueue batch {n} (moco.py _dequeue_and_enqueue assert)")
        ptr = extra["queue_ptr"]
        queue = jax.lax.dynamic_update_slice(extra["queue"], enq,
                                             (ptr, jnp.int32(0)))
        new_extra = dict(extra)
        new_extra.update({"key_params": key_params, "queue": queue,
                          "queue_ptr": (ptr + n) % self.K,
                          "q_bstats": new_q_bstats,
                          "k_bstats": new_k_bstats})
        new_extra.update(self.queue_side_updates(extra, batch, ptr, n))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, extra=new_extra,
                             rng=rng), losses

    def extra_losses(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        return {}

    # -- eval -------------------------------------------------------------

    def _eval_step_impl(self, params_extra, batch):
        params, extra = params_extra
        variables = {"params": params}
        if extra.get("q_bstats"):
            variables["batch_stats"] = extra["q_bstats"]
        fea, out = self.module.apply(variables, batch["lr"], train=False)
        return fea

    def run_embedding(self, state: TrainState, images, get_q: bool = False):
        variables = {"params": state.params}
        if state.extra.get("q_bstats"):
            variables["batch_stats"] = state.extra["q_bstats"]
        fea, out = self.module.apply(variables, jnp.asarray(images),
                                     train=False)
        if get_q:
            return fea, out["q"]
        return fea


@register_model("supmoco")
class SupMoCoHandler(MoCoHandler):
    """Supervised MoCo: positives from the same degradation class, found
    both in-batch and in the queue via a label side-queue
    (supmoco.py:53-125)."""

    def __init__(self, num_classes=0, positives_per_class=4,
                 contrastive_dropdown=True, include_direct_loss=False,
                 direct_loss_keys=None, **kwargs):
        self.num_classes = num_classes
        self.positives_per_class = positives_per_class
        self.include_direct_loss = include_direct_loss
        self.direct_loss_keys = direct_loss_keys
        super().__init__(contrastive_dropdown=contrastive_dropdown, **kwargs)

    def register_classes(self, num_classes: int) -> None:
        self.num_classes = int(num_classes)

    def init_queue_sides(self):
        # unseen-class sentinel = -1: one_hot(-1) is the zero vector, so
        # unfilled queue slots can never one-hot-match a real class (the
        # reference's ones*num_classes sentinel relied on num_classes
        # being registered before init — with the 0 default it collided
        # with class 1)
        return {"queue_labels": jnp.full((self.K,), -1, jnp.int32)}

    def compute_logits(self, q, k, extra, batch):
        if self.num_classes == 0:
            raise RuntimeError("Maximum number of classes must be "
                               "registered before running a training step.")
        labels = batch["labels"].astype(jnp.int32)
        queue = jax.lax.stop_gradient(extra["queue"])
        queue_labels = extra["queue_labels"]
        n = q.shape[0]
        p = self.positives_per_class
        kp = k.reshape(n, p, self.proj_dim)
        l_pos = jnp.sum(q[:, None, :] * kp, axis=2) / self.T  # (N, P)

        nc = self.num_classes + 1
        yb = jax.nn.one_hot(labels, nc)
        yq = jax.nn.one_hot(queue_labels, nc)
        pos_y_q = jnp.matmul(yb, yq.T,
                             precision=jax.lax.Precision.HIGHEST)  # (N, K)
        pos_f_q = jnp.matmul(pos_y_q, queue,
                             precision=jax.lax.Precision.HIGHEST)  # (N, C)
        pos_q = jnp.sum(q * pos_f_q, axis=1) / self.T
        num_positives = p + pos_y_q.sum(axis=1)
        l_pos_total = (l_pos.sum(axis=1) + pos_q) / num_positives

        l_neg = jnp.matmul(q, queue.T,
                           precision=jax.lax.Precision.HIGHEST) / self.T
        logits = jnp.concatenate([l_pos_total[:, None], l_neg], axis=1)
        return logits, {"enqueue": kp[:, 0]}

    def queue_side_updates(self, extra, batch, ptr, n):
        labels = batch["labels"].astype(jnp.int32)
        return {"queue_labels": jax.lax.dynamic_update_slice(
            extra["queue_labels"], labels, (ptr,))}

    def extra_losses(self, outputs, batch):
        if not (self.include_direct_loss and self.dropdown):
            return {}
        target = batch["vector"].astype(jnp.float32)
        pred = outputs["dropdown_q"]
        return {"direct-loss": jnp.mean(jnp.abs(pred - target))}


@register_model("weakcon")
class WeakConHandler(SupMoCoHandler):
    """Weakly-supervised contrast: continuous degradation-vector distances
    weight the negative logits (weak_con.py:36-104)."""

    def __init__(self, vector_size=2, **kwargs):
        self.vector_size = vector_size
        kwargs.setdefault("contrastive_dropdown", False)
        kwargs.setdefault("num_classes", 1)  # unused; satisfies SupMoCo gate
        super().__init__(**kwargs)

    def register_vector(self, vector_size: int) -> None:
        self.vector_size = int(vector_size)

    def init_queue_sides(self):
        return {"queue_vectors": jnp.zeros((self.K, self.vector_size))}

    def compute_logits(self, q, k, extra, batch):
        vec = batch["vector"].astype(jnp.float32)  # (N, V)
        queue = jax.lax.stop_gradient(extra["queue"])
        queue_vectors = extra["queue_vectors"]  # (K, V)
        n = q.shape[0]
        p = self.positives_per_class
        kp = k.reshape(n, p, self.proj_dim)
        l_pos = (jnp.sum(q[:, None, :] * kp, axis=2) / self.T
                 ).sum(axis=1) / p
        l_neg = jnp.matmul(q, queue.T,
                           precision=jax.lax.Precision.HIGHEST)
        # cdist weights
        d2 = (jnp.sum(vec ** 2, 1)[:, None]
              + jnp.sum(queue_vectors ** 2, 1)[None, :]
              - 2 * jnp.matmul(vec, queue_vectors.T,
                               precision=jax.lax.Precision.HIGHEST))
        weights = jnp.sqrt(jnp.maximum(d2, 0.0))
        l_neg = l_neg * weights / self.T
        logits = jnp.concatenate([l_pos[:, None], l_neg], axis=1)
        return logits, {"enqueue": kp[:, 0]}

    def queue_side_updates(self, extra, batch, ptr, n):
        vec = batch["vector"].astype(jnp.float32)
        return {"queue_vectors": jax.lax.dynamic_update_slice(
            extra["queue_vectors"], vec, (ptr, jnp.int32(0)))}


@register_model("supcon")
class SupConHandler(MoCoHandler):
    """Plain SupCon (no queue/momentum): SupConLoss over the two views
    (handlers.py:215-256; loss from sr_tools/loss_functions.py:41-130)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("K", 8)  # queue unused; keep tiny
        super().__init__(**kwargs)

    def _train_step_impl(self, state: TrainState, batch):
        from rumpy_tpu.utils.losses import supcon_loss
        rng, sub = jax.random.split(state.rng)
        extra = state.extra

        def loss_fn(params):
            qv = {"params": params}
            if extra["q_bstats"]:
                qv["batch_stats"] = extra["q_bstats"]
                (fea, out), mut = self.module.apply(
                    qv, batch["image_query"], train=True,
                    mutable=["batch_stats"])
                (fea2, out2), mut = self.module.apply(
                    {**qv, "batch_stats": mut["batch_stats"]},
                    batch["image_key"], train=True, mutable=["batch_stats"])
                new_bstats = mut["batch_stats"]
            else:
                fea, out = self.module.apply(qv, batch["image_query"],
                                             train=True)
                fea2, out2 = self.module.apply(qv, batch["image_key"],
                                               train=True)
                new_bstats = extra["q_bstats"]
            feats = jnp.stack([_normalize(out["q"]),
                               _normalize(out2["q"])], axis=1)
            loss = supcon_loss(feats, labels=batch.get("labels"),
                               temperature=self.T)
            return loss, ({"train-loss": loss}, new_bstats)

        grads, (losses, new_bstats) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_extra = dict(extra)
        new_extra["q_bstats"] = new_bstats
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, extra=new_extra,
                             rng=rng), losses


@register_model("degradationregressor")
class DegradationRegressorHandler(BaseHandler):
    """Direct regression of degradation parameters from LR patches
    (regression/models/__init__.py:26+): DASR backbone + dropdown MLP,
    L1 loss against the metadata vector."""

    colorspace = "rgb"
    task = "regression"
    loss_type = "l1"

    def __init__(self, num_targets=2, **kwargs):
        self.num_targets = num_targets
        super().__init__(**kwargs)

    def build_module(self, **kw):
        return DASREncoder(dropdown_q=self.num_targets, dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = 32):
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),)

    def init_state(self, seed=None):
        state = super().init_state(seed)
        # re-init to capture batch_stats
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        variables = self.module.init(rng, *self.example_inputs())
        extra = {"q_bstats": variables.get("batch_stats", {})}
        return state.replace(params=variables["params"],
                             opt_state=self.tx.init(variables["params"]),
                             extra=extra)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        variables = {"params": params}
        new_extra = extra
        if extra and extra.get("q_bstats"):
            variables["batch_stats"] = extra["q_bstats"]
            if train:
                (fea, out), mut = self.module.apply(
                    variables, batch["lr"], train=True,
                    mutable=["batch_stats"])
                new_extra = dict(extra)
                new_extra["q_bstats"] = mut["batch_stats"]
            else:
                fea, out = self.module.apply(variables, batch["lr"],
                                             train=False)
        else:
            fea, out = self.module.apply(variables, batch["lr"], train=train)
        return out["dropdown_q"], {}, new_extra

    def apply_for_loss(self, params, batch, train, rng, extra):
        return self.apply(params, batch, train, rng, extra)

    def compute_losses(self, pred, batch, aux):
        target = batch["metadata"].astype(jnp.float32)
        return {"train-loss": jnp.mean(jnp.abs(pred - target))}
