"""IKC — iterative kernel correction (MultiModel).

Reference: rumpy/SISR/models/blur_kernel_blind_sr/{IKC.py,handlers.py:1068-
1229}. Three child networks under one state: SFTMD (sr_model), a kernel
Predictor, and a Corrector that refines the kernel code from the SR output.

Training protocol parity:
  * epochs < sftmd_pretrain_epochs: only SFTMD trains, on the TRUE kernel
    code;
  * after: the Predictor trains on (LR -> kernel code); then
    `correction_steps` alternations run — SFTMD eval (stop-grad), Corrector
    optimizer update against the true code — inside ONE jitted step (the
    loop is static so XLA pipelines all iterations; the reference
    dispatched each step separately);
  * train-loss reports the best (min) per-iteration SFTMD image loss and
    the returned image is the best-loss iteration's (handlers.py:1186-1193).

Best-epoch selection ignores the pretrain phase (handlers.py:1212-1229) —
recorded in handler_metadata as best_epoch_cutoff.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from rumpy_tpu.models.common import TConv, TDense
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.base import BaseHandler, TrainState, build_optimizer
from rumpy_tpu.models.sftmd_variants import SFTMD
from rumpy_tpu.registry import register_model


class Predictor(nn.Module):
    """LR -> kernel code (IKC.py:6-32)."""
    code_length: int = 10
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        strides = [1, 1, 1, 2, 1, 1]
        feats = [self.nf] * 5 + [self.code_length]
        for f, s in zip(feats, strides):
            # explicit symmetric padding 2: torch Conv2d(k=5, pad=2); XLA
            # 'SAME' would pad (1,2) at stride 2 and shift the grid
            x = TConv(f, (5, 5), strides=(s, s), padding=2,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = lrelu(x)
        return jnp.mean(x, axis=(1, 2))


class Corrector(nn.Module):
    """(SR, code) -> refined code (IKC.py:34-95)."""
    code_length: int = 10
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sr, code):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        x = sr
        strides = [1, 2, 1, 2, 1, 1, 1]
        for s in strides:
            # symmetric padding 2 (see Predictor note)
            x = TConv(self.nf, (5, 5), strides=(s, s), padding=2,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = lrelu(x)
        b, h, w, _ = x.shape
        c = lrelu(TDense(self.nf, dtype=self.dtype,
                           param_dtype=jnp.float32)(code))
        c = lrelu(TDense(self.nf, dtype=self.dtype,
                           param_dtype=jnp.float32)(c))
        c = jnp.broadcast_to(c[:, None, None, :], (b, h, w, self.nf))
        mid = jnp.concatenate([x, c], axis=-1)
        mid = lrelu(TConv(self.nf * 2, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(mid))
        mid = lrelu(TConv(self.nf, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(mid))
        mid = TConv(self.code_length, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(mid)
        delta = jnp.mean(mid, axis=(1, 2))
        return delta + code


@register_model("ikc")
class IKCHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"
    uses_metadata = True

    def __init__(self, sftmd_pretrain_epochs=5, correction_steps=7,
                 code_length=10, num_features=64, num_blocks=16,
                 force_final_eval_iter=True, sft_type="standard", **kwargs):
        self.sftmd_pretrain_epochs = sftmd_pretrain_epochs
        self.correction_steps = correction_steps
        self.code_length = code_length
        self.force_final_eval_iter = force_final_eval_iter
        self.curr_epoch = 0
        super().__init__(num_features=num_features, num_blocks=num_blocks,
                         sft_type=sft_type, **kwargs)
        # per-child optimizers (MultiModel parity: independent LRs possible)
        self.child_tx = {name: build_optimizer(self.lr)
                         for name in ("sr_model", "predictor", "corrector")}
        self._pretrain_step = jax.jit(self._pretrain_impl,
                                      donate_argnums=(0,))
        self._ikc_step = jax.jit(self._ikc_impl, donate_argnums=(0,))
        self._eval_pre = jax.jit(self._eval_pretrain_impl)
        self._eval_blind = jax.jit(self._eval_blind_impl)

    def set_epoch(self, epoch: int) -> None:
        self.curr_epoch = epoch

    def build_module(self, num_features, num_blocks, sft_type):
        # Container module for clean param partitioning.
        sr = SFTMD(scale=self.scale, in_nc=self.in_features,
                   input_para=self.code_length, num_features=num_features,
                   num_blocks=num_blocks, sft_type=sft_type,
                   dtype=self.dtype)
        pred = Predictor(code_length=self.code_length, dtype=self.dtype)
        corr = Corrector(code_length=self.code_length, dtype=self.dtype)
        dtype = self.dtype

        class _IKC(nn.Module):
            def setup(self):
                self.sr_model = sr
                self.predictor = pred
                self.corrector = corr

            def __call__(self, x, code):
                return self.sr_model(x, code)

            def predict(self, x):
                return self.predictor(x)

            def correct(self, sr_img, code):
                return self.corrector(sr_img, code)

        return _IKC()

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features), jnp.float32),
                jnp.zeros((batch, self.code_length), jnp.float32))

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, srng = jax.random.split(rng)
        x, code = self.example_inputs()
        variables = self.module.init(prng, x, code)
        # trigger predictor/corrector param creation
        variables_p = self.module.init(prng, x, method="predict")
        variables_c = self.module.init(
            prng, jnp.zeros((1, 16 * self.scale, 16 * self.scale, 3)),
            code, method="correct")
        params = {**variables["params"], **variables_p["params"],
                  **variables_c["params"]}
        opt_state = {name: self.child_tx[name].init(params[name])
                     for name in ("sr_model", "predictor", "corrector")}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, extra={}, rng=srng)

    # ------------------------------------------------------------------

    def _sr_apply(self, params, x, code):
        return self.module.apply({"params": params}, x, code)

    def _pretrain_impl(self, state: TrainState, batch):
        rng, dsub = jax.random.split(state.rng)
        if self.input_fn is not None:  # fused online degradation
            batch = self.input_fn(dsub, batch)
        code = batch["metadata"].astype(jnp.float32)

        def loss_fn(sr_params):
            sr = self._sr_apply({**state.params, "sr_model": sr_params},
                                batch["lr"], code)
            return jnp.mean(jnp.abs(sr - batch["hr"]))

        loss, grads = jax.value_and_grad(loss_fn)(state.params["sr_model"])
        updates, opt = self.child_tx["sr_model"].update(
            grads, state.opt_state["sr_model"], state.params["sr_model"])
        new_params = {**state.params,
                      "sr_model": optax.apply_updates(
                          state.params["sr_model"], updates)}
        losses = {"train-loss": loss, "predictor-loss": jnp.zeros(())}
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state={**state.opt_state, "sr_model": opt},
                             rng=rng), losses

    def _ikc_impl(self, state: TrainState, batch):
        rng, dsub = jax.random.split(state.rng)
        if self.input_fn is not None:  # fused online degradation
            batch = self.input_fn(dsub, batch)
        real_code = batch["metadata"].astype(jnp.float32)
        params = dict(state.params)
        opt_state = dict(state.opt_state)
        losses: Dict[str, jnp.ndarray] = {}

        # predictor update — MSE: IKCPredictorHandler overrides the
        # BaseModel L1 with nn.MSELoss (handlers.py:1041-1051)
        def p_loss_fn(p_params):
            pred = self.module.apply({"params": {**params,
                                                 "predictor": p_params}},
                                     batch["lr"], method="predict")
            return jnp.mean(jnp.square(pred - real_code)), pred

        (p_loss, pred_code), p_grads = jax.value_and_grad(
            p_loss_fn, has_aux=True)(params["predictor"])
        updates, opt_state["predictor"] = self.child_tx["predictor"].update(
            p_grads, opt_state["predictor"], params["predictor"])
        params["predictor"] = optax.apply_updates(params["predictor"],
                                                  updates)
        losses["predictor-loss"] = p_loss

        # corrector loop: SFTMD eval + corrector update per step
        code = jax.lax.stop_gradient(pred_code)
        sftmd_losses = []
        images = []
        for step in range(self.correction_steps):
            sr = jax.lax.stop_gradient(
                self._sr_apply(params, batch["lr"], code))
            s_loss = jnp.mean(jnp.abs(sr - batch["hr"]))

            # MSE: IKCCorrectorHandler's criterion (handlers.py:1053-1066)
            def c_loss_fn(c_params):
                new_code = self.module.apply(
                    {"params": {**params, "corrector": c_params}}, sr, code,
                    method="correct")
                return jnp.mean(jnp.square(new_code - real_code)), new_code

            (c_loss, new_code), c_grads = jax.value_and_grad(
                c_loss_fn, has_aux=True)(params["corrector"])
            updates, opt_state["corrector"] = \
                self.child_tx["corrector"].update(
                    c_grads, opt_state["corrector"], params["corrector"])
            params["corrector"] = optax.apply_updates(params["corrector"],
                                                      updates)
            code = jax.lax.stop_gradient(new_code)
            losses[f"sftmd_loss_{step}"] = s_loss
            losses[f"corrector_loss_{step}"] = c_loss
            sftmd_losses.append(s_loss)
            images.append(sr)

        losses["train-loss"] = jnp.min(jnp.stack(sftmd_losses))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), losses

    def train_batch(self, state, batch):
        if self.curr_epoch < self.sftmd_pretrain_epochs:
            return self._pretrain_step(state, batch)
        return self._ikc_step(state, batch)

    def _eval_pretrain_impl(self, params_extra, batch):
        """SFTMD-pretrain-phase eval: ground-truth kernel code."""
        params, _ = params_extra
        return self._sr_apply(params, batch["lr"],
                              batch["metadata"].astype(jnp.float32))

    def _eval_blind_impl(self, params_extra, batch):
        """Blind eval: predictor init + corrector loop (ikc_loop)."""
        params, _ = params_extra
        code = self.module.apply({"params": params}, batch["lr"],
                                 method="predict")
        for _ in range(self.correction_steps):
            sr = self._sr_apply(params, batch["lr"], code)
            code = self.module.apply({"params": params}, sr, code,
                                     method="correct")
        return sr

    def run_eval(self, state, batch):
        # Phase dispatch happens HERE, per call — a curr_epoch check
        # inside one jitted impl would be baked into the jit cache at
        # first trace and never re-evaluated (and a freshly-loaded blind
        # model would silently score against the ground-truth code).
        if (self.curr_epoch < self.sftmd_pretrain_epochs
                and batch.get("metadata") is not None):
            return self._eval_pre((state.params, state.extra), batch)
        return self._eval_blind((state.params, state.extra), batch)

    def handler_metadata(self):
        return {"best_epoch_cutoff": self.sftmd_pretrain_epochs,
                "correction_steps": self.correction_steps}
