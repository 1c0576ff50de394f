"""Model handler layer: functional train/eval steps over flax modules.

This is the TPU-native redesign of the reference's handler stack
(rumpy/shared_framework/models/base_architecture.py:17-612 ``BaseModel``):
instead of an object mutating a torch module + optimizer in place, each
handler owns

  * a pure flax ``nn.Module`` (NHWC),
  * an optax optimizer/schedule built from the same config vocabulary the
    reference exposes (adam/rmsprop; multi_step_lr / step_lr /
    cosine_warm_restarts / one_cycle; grad clipping —
    base_architecture.py:79-186, :425-440),
  * jitted, donation-friendly ``train_step`` / ``eval_step`` closures.

State lives in an immutable :class:`TrainState` pytree (params, opt state,
RNG, handler extras such as EMA encoders / MoCo queues / discriminator
state), which makes the whole thing trivially shardable: replicate the
state, shard the batch over the mesh's ``data`` axis, and ``jit`` compiles
the SPMD program with the gradient all-reduce on ICI.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rumpy_tpu.utils import checkpoint as ckpt


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    extra: Any  # handler-specific mutable state (EMA params, queues, GAN disc, ...)
    rng: jax.Array


# ---------------------------------------------------------------------------
# Schedules / optimizers (config vocabulary of base_architecture.py:79-186)
# ---------------------------------------------------------------------------

def build_schedule(lr: float, scheduler: Optional[str],
                   sp: Optional[Dict[str, Any]] = None):
    """Reference scheduler vocabulary (base_architecture.py:105-186),
    stepped per OPTIMIZER step as the reference does (scheduler.step()
    inside standard_update, base_architecture.py:440). The custom
    lambdas keep torch LambdaLR semantics: returned values MULTIPLY the
    base lr."""
    sp = dict(sp or {})
    if scheduler is None:
        return lr
    if scheduler == "multi_step_lr":
        gamma = sp.get("gamma", 0.5)
        milestones = sp.get("milestones", [])
        return optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in milestones})
    if scheduler == "step_lr":
        gamma = sp.get("gamma", 0.1)
        step_size = int(sp.get("step_size", 1000))
        return lambda t: lr * gamma ** (t // step_size)
    if scheduler in ("cosine_annealing_warm_restarts",
                     "cosine_warm_restarts"):
        t0 = int(sp.get("restart_period", sp.get("t_0", 100000)))
        t_mult = int(sp.get("t_mult", 1))
        eta_min = sp.get("lr_min", sp.get("eta_min", 1e-7))
        if t_mult == 1:
            def sched(t):
                frac = (t % t0) / t0
                return eta_min + (lr - eta_min) * 0.5 * (
                    1 + jnp.cos(jnp.pi * frac))
        else:
            def sched(t):
                # torch CosineAnnealingWarmRestarts with T_mult > 1:
                # cycle i spans T0*T_mult^i steps starting at
                # T0*(T_mult^i - 1)/(T_mult - 1)
                t = jnp.asarray(t, jnp.float32)
                n = jnp.floor(jnp.log(t / t0 * (t_mult - 1) + 1.0)
                              / jnp.log(float(t_mult)))
                start = t0 * (t_mult ** n - 1.0) / (t_mult - 1.0)
                frac = (t - start) / (t0 * t_mult ** n)
                return eta_min + (lr - eta_min) * 0.5 * (
                    1 + jnp.cos(jnp.pi * frac))
        return sched
    if scheduler in ("one_cycle_lr", "one_cycle"):
        # torch OneCycleLR's exact two-phase anneal (its phase endpoints
        # are pct_start*total-1 and total-1, which optax's onecycle
        # schedules shift by one step)
        total = int(sp.get("total_steps", 100000))
        peak = float(sp.get("lr_max", sp.get("max_lr", lr * 10)))
        div = float(sp.get("div_factor", 25.0))
        fdiv = float(sp.get("final_div_factor", 1e4))
        initial = peak / div
        min_lr = initial / fdiv
        peak_step = float(sp.get("pct_start", 0.3)) * total - 1
        end_step = float(total - 1)
        if peak_step <= 0 or end_step <= peak_step:
            raise ValueError(
                "one_cycle_lr needs 1 < pct_start*total_steps < "
                f"total_steps; got pct_start={sp.get('pct_start', 0.3)}, "
                f"total_steps={total} (degenerate warmup/anneal phase "
                "would divide by zero)")
        linear = sp.get("anneal_strategy", "cos") == "linear"

        def _anneal(a, b, pct):
            if linear:
                return a + (b - a) * pct
            return b + (a - b) * 0.5 * (1 + jnp.cos(jnp.pi * pct))

        def sched(t):
            t = jnp.asarray(t, jnp.float32)
            up = _anneal(initial, peak, t / peak_step)
            down = _anneal(peak, min_lr,
                           (t - peak_step) / (end_step - peak_step))
            return jnp.where(t <= peak_step, up, down)
        return sched
    if scheduler == "custom_dasr":
        train_type = sp.get("train_type")

        def _dasr(t, warm, drop, c0, cd):
            t = jnp.asarray(t, jnp.float32)
            cyc = jnp.maximum(jnp.floor((t - c0) / cd), 0.0)
            lam = jnp.where(t < warm, 1e-3,
                            jnp.where(t < drop, 1e-4,
                                      1e-4 * jnp.power(0.5, cyc)))
            return lr * lam

        if train_type == "long":
            return lambda t: _dasr(t, 60, 225, 100, 125)
        if train_type == "short":
            return lambda t: _dasr(t, 21, 79, 35, 44)
        if train_type == "no_encoder_long":
            return lambda t: _dasr(t, 0, 225, 100, 125)
        raise ValueError("Need to select from long or short scheduler "
                         "type for DASR.")
    if scheduler == "custom_contrastive":
        return lambda t: lr * jnp.where(jnp.asarray(t) < 260, 0.1, 5e-4)
    if scheduler == "custom":
        fn = sp["function"]  # jnp-traceable callable of the step count
        return lambda t: lr * fn(t)
    if scheduler == "cosine":
        total = int(sp.get("total_steps", 100000))
        return optax.cosine_decay_schedule(lr, total,
                                           alpha=sp.get("alpha", 0.0))
    raise ValueError(f"Unknown scheduler {scheduler!r}")


def build_optimizer(lr: float = 1e-4, optimizer_type: str = "adam",
                    scheduler: Optional[str] = None,
                    scheduler_params: Optional[Dict[str, Any]] = None,
                    grad_clip: Optional[float] = None,
                    weight_decay: float = 0.0,
                    optimizer_params: Optional[Dict[str, Any]] = None
                    ) -> optax.GradientTransformation:
    """Reference optimizer factory vocabulary (define_optimizer,
    base_architecture.py:79-103): case-insensitive type names, adam
    betas via optimizer_params {beta_1, beta_2}, rmsprop smoothing via
    {alpha} (torch default 0.99)."""
    schedule = build_schedule(lr, scheduler, scheduler_params)
    op = dict(optimizer_params or {})
    optimizer_type = optimizer_type.lower()
    if optimizer_type == "adam":
        opt = optax.adam(schedule, b1=op.get("beta_1", 0.9),
                         b2=op.get("beta_2", 0.999))
    elif optimizer_type == "adamw":
        opt = optax.adamw(schedule, b1=op.get("beta_1", 0.9),
                          b2=op.get("beta_2", 0.999),
                          weight_decay=weight_decay)
    elif optimizer_type == "rmsprop":
        # eps_in_sqrt=False: torch adds eps OUTSIDE the sqrt
        opt = optax.rmsprop(schedule, decay=op.get("alpha", 0.99),
                            eps_in_sqrt=False)
    elif optimizer_type == "sgd":
        opt = optax.sgd(schedule, momentum=op.get(
            "momentum", scheduler_params.get("momentum", 0.9)
            if scheduler_params else 0.9))
    else:
        raise ValueError(f"Unknown optimizer {optimizer_type!r}")
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(opt)
    return optax.chain(*chain)


PIXEL_LOSSES: Dict[str, Callable] = {
    "l1": lambda a, b: jnp.mean(jnp.abs(a - b)),
    "l2": lambda a, b: jnp.mean((a - b) ** 2),
    "mse": lambda a, b: jnp.mean((a - b) ** 2),
    "charbonnier": lambda a, b: jnp.mean(jnp.sqrt((a - b) ** 2 + 1e-6)),
}


# ---------------------------------------------------------------------------
# Base handler
# ---------------------------------------------------------------------------

class BaseHandler:
    """One handler per architecture family; the registry instantiates these
    by name (mirrors `define_model`, shared_framework/models/__init__.py:28)."""

    loss_type: str = "l1"
    # Q-models flip this so the eval path feeds degradation metadata in.
    uses_metadata: bool = False
    # Channels the network consumes ('rgb' => 3, 'ycbcr'-Y-only => 1).
    colorspace: str = "rgb"
    # Input spatial dims must divide this (e.g. pixel-unshuffle heads);
    # the eval interface pads up to it and crops the SR output back.
    size_multiple: int = 1

    def __init__(self, scale: int = 4, in_features: int = 3,
                 lr: float = 1e-4, optimizer_type: str = "adam",
                 scheduler: Optional[str] = None,
                 scheduler_params: Optional[Dict[str, Any]] = None,
                 grad_clip: Optional[float] = None,
                 loss: Optional[str] = None,
                 dtype: str = "float32",
                 seed: int = 0,
                 optimizer_params: Optional[Dict[str, Any]] = None,
                 loss_masking: bool = False,
                 **model_kwargs):
        self.scale = scale
        self.in_features = in_features
        # reference loss-masking mechanism (base_architecture.py:24, :475-
        # 478): when active and the batch carries a "mask" image, SR and
        # HR are multiplied by the binary non-black-pixel mask before the
        # loss. Activated by the trainer from multi_frame_config.use_masks.
        self.loss_masking = bool(loss_masking)
        self.dtype = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32
        self.lr = lr
        self.optimizer_type = optimizer_type
        if loss is not None:
            self.loss_type = loss
        self.model_kwargs = model_kwargs
        self.module = self.build_module(**model_kwargs)
        self.tx = build_optimizer(lr, optimizer_type, scheduler,
                                  scheduler_params, grad_clip,
                                  optimizer_params=optimizer_params)
        self.seed = seed
        # Optional batch pre-transform traced INTO the train step (e.g. the
        # fused on-device degradation pipeline: hr -> (lr, metadata)).
        self.input_fn = None
        self._rejit()

    def _rejit(self):
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    def set_input_pipeline(self, fn) -> None:
        """fn(key, batch) -> batch, run on-device inside the jitted train
        step — this is how online blind-SR datagen fuses with training
        (the reference ran it per-image in DataLoader workers,
        SURVEY.md §3.3)."""
        self.input_fn = fn
        self._rejit()

    # -- subclass surface --------------------------------------------------

    def build_module(self, **kwargs) -> nn.Module:
        raise NotImplementedError

    def example_inputs(self, batch: int = 1, size: int = 16) -> Tuple:
        """Inputs used for parameter init / compile checks."""
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),)

    def apply(self, params, batch: Dict[str, Any], train: bool = False,
              rng: Optional[jax.Array] = None, extra: Any = None):
        """Network forward for a batch dict. Returns (sr, aux_dict, new_extra)."""
        sr = self.module.apply({"params": params}, batch["lr"])
        return sr, {}, extra

    def compute_losses(self, sr, batch, aux: Dict[str, Any]) -> Dict[str, Any]:
        pixel = PIXEL_LOSSES[self.loss_type](sr, batch["hr"])
        losses = {"train-loss": pixel}
        losses.update(aux)
        return losses

    def init_extra(self, rng) -> Any:
        return {}

    def transform_grads(self, grads, state, batch):
        """Hook for gradient surgery inside the jitted step (e.g. DIC's
        hourglass freeze schedule). Default: identity."""
        return grads

    def transform_updates(self, updates, state, batch):
        """Hook for masking optimizer updates inside the jitted step
        (e.g. RCANSplit's skip-absent-allocation semantics). Default:
        identity."""
        return updates

    # -- state lifecycle ---------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, erng, srng = jax.random.split(rng, 3)
        # NOTE: eager init on purpose — jax.jit would canonicalize the
        # param tree to key-sorted dicts, breaking convert_by_order's
        # insertion-order contract for auto-named modules. Handlers whose
        # modules carry explicit sort==call-order layer names (dic,
        # wavelet, fssr) override with a jitted init for speed.
        variables = self.module.init(prng, *self.example_inputs())
        params = variables["params"]
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra=self.init_extra(erng),
                          rng=srng)

    def num_parameters(self, state: TrainState) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(state.params))

    # -- train / eval ------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch):
        rng, sub, dsub = jax.random.split(state.rng, 3)
        if self.input_fn is not None:
            batch = self.input_fn(dsub, batch)

        def loss_fn(params):
            sr, aux, new_extra = self.apply(params, batch, train=True,
                                            rng=sub, extra=state.extra)
            lbatch = batch
            if self.loss_masking and "mask" in batch:
                # reference get_binary_masks (base_architecture.py:451-
                # 455): a pixel counts only when EVERY channel is
                # non-black; SR and HR are masked before the loss
                m = jnp.all(batch["mask"] != 0, axis=-1,
                            keepdims=True).astype(sr.dtype)
                sr = sr * m
                lbatch = dict(batch)
                lbatch["hr"] = batch["hr"] * m
            losses = self.compute_losses(sr, lbatch, aux)
            return losses["train-loss"], (losses, new_extra)

        grads, (losses, new_extra) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = self.transform_grads(grads, state, batch)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = self.transform_updates(updates, state, batch)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng,
                                  extra=new_extra if new_extra is not None
                                  else state.extra)
        return new_state, losses

    def train_batch(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        """One optimizer step (``standard_update`` parity:
        base_architecture.py:425-440 — grads, clip, step, schedule)."""
        state, losses = self._train_step(state, batch)
        return state, losses

    def _eval_step_impl(self, state_params_extra, batch):
        params, extra = state_params_extra
        sr, aux, _ = self.apply(params, batch, train=False, extra=extra)
        return sr

    def run_eval(self, state: TrainState, batch) -> jnp.ndarray:
        return self._eval_step((state.params, state.extra), batch)

    def run_model(self, state: TrainState, lr_img, metadata=None):
        batch = {"lr": lr_img}
        if metadata is not None:
            batch["metadata"] = metadata
        return self.run_eval(state, batch)

    def run_forensic(self, state: TrainState, batch):
        """Forward pass capturing per-block diagnostic intermediates
        (run_forensic parity, base_architecture.py:522-530). Meta-attention
        layers `sow` their attention vectors; the handler's own `apply`
        (with all its metadata preprocessing) runs against a proxy module
        whose apply collects the "intermediates" collection. Returns
        (output, {module_path: np.ndarray}); empty dict for architectures
        with no sown intermediates."""
        store: Dict[str, Any] = {}
        handler = self

        class _Capturing:
            def __getattr__(self, k):
                return getattr(handler.__dict__["_forensic_orig"], k)

            def apply(self, variables, *a, **kw):
                mod = handler.__dict__["_forensic_orig"]
                if kw.get("mutable"):
                    return mod.apply(variables, *a, **kw)
                out, mods = mod.apply(variables, *a,
                                      mutable=["intermediates"], **kw)
                store.update(mods.get("intermediates", {}))
                return out

        self.__dict__["_forensic_orig"] = self.module
        self.module = _Capturing()
        try:
            out, _, _ = self.apply(state.params, batch, train=False,
                                   extra=state.extra)
        finally:
            self.module = self.__dict__.pop("_forensic_orig")

        forensic: Dict[str, Any] = {}

        def walk(tree, path):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, path + (k,))
            else:
                arr = tree[0] if isinstance(tree, tuple) else tree
                forensic["/".join(path)] = np.asarray(jnp.squeeze(arr))
        walk(store, ())
        return out, forensic

    # -- checkpointing (base_architecture.py:231-423 contract) -------------

    def handler_metadata(self) -> Dict[str, Any]:
        return {}

    def save_model(self, state: TrainState, model_save_dir: str, epoch: int,
                   minimal: bool = False) -> str:
        path = ckpt.checkpoint_path(model_save_dir, epoch)
        payload = {
            "network": state.params,
            "optimizer": state.opt_state,
            "extra": state.extra,
            "step": state.step,
            "rng": state.rng,
            "model_name": getattr(self, "registered_name", type(self).__name__),
            "model_epoch": epoch,
            "handler_metadata": self.handler_metadata(),
        }
        ckpt.save_checkpoint(path, payload, minimal=minimal)
        return path

    def load_model(self, model_save_dir: str, epoch="last",
                   summary_csv: Optional[str] = None,
                   skip_optimizer_load: bool = False) -> Tuple[TrainState, int]:
        epoch = ckpt.select_epoch(model_save_dir, epoch, summary_csv)
        path = ckpt.checkpoint_path(model_save_dir, epoch)
        template_state = self.init_state()
        template = {
            "network": template_state.params,
            "extra": template_state.extra,
            "step": template_state.step,
            "rng": template_state.rng,
            "model_name": "",
            "model_epoch": 0,
            "handler_metadata": self.handler_metadata(),
        }
        if not skip_optimizer_load:
            # leaving the optimizer out of the template means a caller
            # that explicitly skips it can load checkpoints saved under a
            # DIFFERENT optimizer/scheduler config (e.g. probing a
            # scheduler-trained encoder with a plain handler) — a typed
            # restore of a mismatched optax tree would raise first
            template["optimizer"] = template_state.opt_state
        loaded = ckpt.load_checkpoint(path, template)
        # minimal=True checkpoints carry no optimizer state — fall back
        # to a fresh one (base_interface.py minimal-save semantics)
        opt_state = (template_state.opt_state
                     if skip_optimizer_load or "optimizer" not in loaded
                     else loaded["optimizer"])
        state = TrainState(step=jnp.asarray(loaded["step"]),
                           params=loaded["network"], opt_state=opt_state,
                           extra=loaded["extra"], rng=jnp.asarray(loaded["rng"]))
        return state, epoch
