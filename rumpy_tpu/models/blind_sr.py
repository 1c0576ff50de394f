"""Blind-SR family: Best-of-Both-Worlds contrastive pipelines and DAN.

Reference: rumpy/SISR/models/blur_kernel_blind_sr/.

ContrastiveBlindSRPipeline (contrastive_blind_sr.py:90-349): a degradation
encoder E feeds an embedding into a meta-attention generator
G(x, embedding). Modes:

  * frozen / 'nonblind' — E is a pre-trained DASR/MoCo encoder whose
    params live OUTSIDE the gradient tree (state.extra), optionally
    warm-started from a predictor experiment checkpoint;
  * combined 'moco' / 'supmoco' — E trains jointly with G: total loss =
    L1(sr, hr) + contrastive CE, with the MoCo queue machinery in the
    train-state extra (one jitted step for the whole pipeline).

Embedding taps: 'pre-q' (backbone GAP features), 'q' (projection MLP),
'q-dropdown'. SFT/SRMD modes tile the embedding to (N,H,W,E). An optional
reducer MLP shrinks the embedding before injection.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import TDense
import jax
import jax.numpy as jnp
import optax

from rumpy_tpu.models.attention_manipulators import QEDSR, QRCAN
from rumpy_tpu.models.base import BaseHandler, PIXEL_LOSSES, TrainState
from rumpy_tpu.models.contrastive import DASREncoder, _normalize
from rumpy_tpu.registry import register_model


class EncodingReducer(nn.Module):
    """Shrink the encoder embedding via an MLP before injection
    (contrastive_blind_sr.py EncodingReducer)."""
    layer_sizes: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.layer_sizes):
            x = TDense(size, dtype=self.dtype, param_dtype=jnp.float32)(x)
            if i != len(self.layer_sizes) - 1:
                x = nn.leaky_relu(x, 0.1)
        return x


class _BlindSRPipeline(nn.Module):
    """E + optional reducer + G as one flax module so params partition
    cleanly into G / E / reducer subtrees."""
    generator: nn.Module
    encoder: nn.Module
    reducer_sizes: Optional[Tuple[int, ...]] = None
    embedding_type: str = "pre-q"
    sft_mode: bool = False
    srmd_mode: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.reducer_sizes is not None:
            self.reducer = EncodingReducer(tuple(self.reducer_sizes),
                                           dtype=self.dtype)

    def embed(self, x, train: bool = False):
        fea, outs = self.encoder(x, train=train)
        if self.embedding_type == "pre-q":
            emb = fea
        elif self.embedding_type == "q":
            emb = outs["q"]
        elif self.embedding_type == "q-dropdown":
            emb = outs["dropdown_q"]
        else:
            raise RuntimeError("Incorrect type of embedding selected.")
        if self.reducer_sizes is not None:
            emb = self.reducer(emb)
        return emb, outs

    def generate(self, x, emb):
        if self.sft_mode:
            n, h, w, _ = x.shape
            maps = jnp.broadcast_to(emb[:, None, None, :],
                                    (n, h, w, emb.shape[-1]))
            if self.srmd_mode:
                x_chan = jnp.concatenate([x, maps.astype(x.dtype)], axis=-1)
                return self.generator(x_chan, emb)
            return self.generator(x, emb, maps)
        return self.generator(x, emb)

    def __call__(self, x, train: bool = False):
        emb, _ = self.embed(x, train=train)
        return self.generate(x, emb)


def _build_generator(name: str, scale: int, num_metadata: int, dtype,
                     gen_kwargs: Dict[str, Any], sft_mode: bool,
                     srmd_mode: bool) -> nn.Module:
    name = name.lower()
    if name in ("qrcan", "rcan"):
        return QRCAN(scale=scale, num_metadata=num_metadata,
                     include_q_layer=gen_kwargs.pop("include_q_layer", True),
                     include_sft_layer=sft_mode and not srmd_mode,
                     in_feats=gen_kwargs.pop("in_feats", 3)
                     + (num_metadata if srmd_mode else 0),
                     style=gen_kwargs.pop("style", "max_concat"),
                     dtype=dtype, **gen_kwargs)
    if name in ("qedsr", "edsr"):
        return QEDSR(scale=scale, input_para=num_metadata, dtype=dtype,
                     **gen_kwargs)
    if name in ("qhan", "han"):
        from rumpy_tpu.models.han_elan import QHAN
        return QHAN(scale=scale, num_metadata=num_metadata, dtype=dtype,
                    **gen_kwargs)
    if name in ("qelan", "elan"):
        from rumpy_tpu.models.han_elan import QELAN
        return QELAN(scale=scale, num_metadata=num_metadata, dtype=dtype,
                     **gen_kwargs)
    if name in ("qsan", "san"):
        from rumpy_tpu.models.san import SAN
        return SAN(scale=scale, num_metadata=num_metadata, dtype=dtype,
                   **gen_kwargs)
    if name in ("qrealesrgan", "qrrdbnet", "realesrgan"):
        from rumpy_tpu.models.gan_models import QRRDBNet
        return QRRDBNet(scale=scale, num_metadata=num_metadata, dtype=dtype,
                        **gen_kwargs)
    if name == "metabed":
        from rumpy_tpu.models.metabed import Metabed
        return Metabed(scale=scale, input_para=num_metadata, dtype=dtype,
                       **gen_kwargs)
    raise KeyError(f"Unknown generator {name}")


class ContrastiveBlindSRHandler(BaseHandler):
    """Frozen-encoder and joint-training BoBW pipelines."""

    uses_metadata = False
    colorspace = "rgb"
    im_input = "unmodified"
    generator_name = "qrcan"

    def __init__(self, generator=None, contrastive_encoder="default",
                 embedding_type="pre-q", encoder_freeze_mode="all",
                 combined_loss_mode=None, crop_count=None,
                 pre_trained_encoder_weights=None,
                 block_encoder_loading=False,
                 encoder_dropdown=None,
                 reducer_layer_sizes=None,
                 sft_mode=False, srmd_mode=False,
                 contrastive_T=0.07, contrastive_m=0.999, contrastive_K=8192,
                 num_classes=0,
                 l1_weight=1.0, contrastive_weight=1.0,
                 encoder_dim=256,
                 **kwargs):
        self.embedding_type = embedding_type
        self.encoder_freeze_mode = encoder_freeze_mode
        self.combined_loss_mode = combined_loss_mode
        self.crop_count = crop_count
        self.pre_trained_encoder_weights = pre_trained_encoder_weights
        self.block_encoder_loading = block_encoder_loading
        self.encoder_dropdown = encoder_dropdown
        self.reducer_layer_sizes = (tuple(reducer_layer_sizes)
                                    if reducer_layer_sizes else None)
        self.sft_mode = sft_mode or srmd_mode
        self.srmd_mode = srmd_mode
        self.T = contrastive_T
        self.m = contrastive_m
        self.K = contrastive_K
        self.num_classes = num_classes
        self.l1_weight = l1_weight
        self.contrastive_weight = contrastive_weight
        self.encoder_dim = encoder_dim
        self._generator = generator or self.generator_name
        super().__init__(**kwargs)

    # embedding width as seen by the generator
    @property
    def emb_size(self) -> int:
        if self.reducer_layer_sizes:
            return self.reducer_layer_sizes[-1]
        if self.embedding_type == "q-dropdown":
            return self.encoder_dropdown
        return 256 if self.embedding_type == "pre-q" else self.encoder_dim

    def build_module(self, **gen_kwargs):
        encoder = DASREncoder(dropdown_q=self.encoder_dropdown,
                              out_dim=self.encoder_dim, dtype=self.dtype)
        base_emb = (256 if self.embedding_type == "pre-q"
                    else (self.encoder_dropdown
                          if self.embedding_type == "q-dropdown"
                          else self.encoder_dim))
        generator = _build_generator(self._generator, self.scale,
                                     self.emb_size, self.dtype, gen_kwargs,
                                     self.sft_mode, self.srmd_mode)
        del base_emb
        return _BlindSRPipeline(generator=generator, encoder=encoder,
                                reducer_sizes=self.reducer_layer_sizes,
                                embedding_type=self.embedding_type,
                                sft_mode=self.sft_mode,
                                srmd_mode=self.srmd_mode, dtype=self.dtype)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),)

    # ------------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        prng, qrng, srng = jax.random.split(rng, 3)
        variables = self.module.init(prng, *self.example_inputs(), train=True)
        params = dict(variables["params"])
        bstats = variables.get("batch_stats", {})
        extra: Dict[str, Any] = {"bstats": bstats}

        joint = self.combined_loss_mode in ("moco", "supmoco")
        frozen_all = (self.encoder_freeze_mode == "all") and not joint
        if frozen_all:
            # Encoder params leave the gradient tree entirely.
            extra["frozen_encoder"] = params.pop("encoder")
        if joint:
            extra["key_params"] = jax.tree_util.tree_map(
                jnp.copy, params["encoder"])
            extra["queue"] = _normalize(
                jax.random.normal(qrng, (self.K, self.encoder_dim)))
            extra["queue_ptr"] = jnp.zeros((), jnp.int32)
            if self.combined_loss_mode == "supmoco":
                # -1 sentinel: one_hot(-1) == 0, never matches a class
                extra["queue_labels"] = jnp.full((self.K,), -1, jnp.int32)

        opt_params = params
        state = TrainState(step=jnp.zeros((), jnp.int32), params=opt_params,
                           opt_state=self.tx.init(opt_params), extra=extra,
                           rng=srng)
        if self.pre_trained_encoder_weights and not self.block_encoder_loading:
            state = self.load_encoder(state,
                                      self.pre_trained_encoder_weights)
        return state

    def load_encoder(self, state: TrainState, weights_dir: str,
                     epoch="last") -> TrainState:
        """Warm-start E from a trained predictor experiment or a packaged
        pretrained network name (rumpy_tpu/pretrained/<name>; parity role
        of pre_trained_encoder_weights)."""
        from rumpy_tpu.utils import checkpoint as ckpt
        weights_dir = ckpt.resolve_packaged(weights_dir)
        ep = ckpt.select_epoch(weights_dir, epoch)
        raw = ckpt.load_checkpoint(ckpt.checkpoint_path(weights_dir, ep))
        from flax import serialization
        enc_template = (state.extra.get("frozen_encoder")
                        or state.params.get("encoder"))
        loaded = serialization.from_state_dict(enc_template,
                                               raw["network"])
        # the predictor's BatchNorm running stats travel with its
        # checkpoint as extra['q_bstats'] — without them the frozen
        # encoder would run use_running_average=True against fresh
        # mean-0/var-1 statistics and emit garbage embeddings
        new_extra = dict(state.extra)
        ckpt_bstats = (raw.get("extra") or {}).get("q_bstats")
        if ckpt_bstats and state.extra.get("bstats"):
            # the predictor's stats are the encoder's internal layout;
            # the pipeline nests them under its 'encoder' submodule
            tmpl = state.extra["bstats"]
            if "encoder" in tmpl and "encoder" not in ckpt_bstats:
                new_extra["bstats"] = {
                    **tmpl,
                    "encoder": serialization.from_state_dict(
                        tmpl["encoder"], ckpt_bstats)}
            else:
                new_extra["bstats"] = serialization.from_state_dict(
                    tmpl, ckpt_bstats)
        if "frozen_encoder" in state.extra:
            new_extra["frozen_encoder"] = loaded
            return state.replace(extra=new_extra)
        params = dict(state.params)
        params["encoder"] = loaded
        return state.replace(params=params, extra=new_extra,
                             opt_state=self.tx.init(params))

    # ------------------------------------------------------------------

    def _full_params(self, params, extra):
        if "frozen_encoder" in extra:
            return {**params, "encoder": extra["frozen_encoder"]}
        return params

    def _apply_pipeline(self, params, extra, x, train):
        variables = {"params": self._full_params(params, extra)}
        if extra.get("bstats"):
            variables["batch_stats"] = extra["bstats"]
            if train:
                out, mut = self.module.apply(variables, x, train=True,
                                             mutable=["batch_stats"])
                return out, mut["batch_stats"]
            out = self.module.apply(variables, x, train=False)
            return out, extra["bstats"]
        out = self.module.apply(variables, x, train=train)
        return out, extra.get("bstats", {})

    def apply(self, params, batch, train=False, rng=None, extra=None):
        sr, new_bstats = self._apply_pipeline(params, extra, batch["lr"],
                                              train)
        new_extra = dict(extra)
        new_extra["bstats"] = new_bstats
        return sr, {}, new_extra

    # ------------------------------------------------------------------
    # Joint (combined_loss_mode) training step
    # ------------------------------------------------------------------

    def train_batch(self, state, batch):
        if self.combined_loss_mode in ("moco", "supmoco"):
            batch = dict(batch)
            lr = batch.get("lr")
            if "image_key" not in batch and lr is not None and lr.ndim == 5:
                # multi-crop dataset stack (B, P, h, w, C): crop 0 is the
                # SR/query view, crops 1.. the contrastive keys
                # (reference crop_count reshaping, handlers.py:534-537)
                batch["lr"] = lr[:, 0]
                batch["image_key"] = lr[:, 1:].reshape((-1,) + lr.shape[2:])
        return self._train_step(state, batch)

    def _train_step_impl(self, state: TrainState, batch):
        if self.combined_loss_mode not in ("moco", "supmoco"):
            return super()._train_step_impl(state, batch)

        rng, sub = jax.random.split(state.rng)
        extra = state.extra

        key_params = jax.tree_util.tree_map(
            lambda kp, qp: kp * self.m + qp * (1.0 - self.m),
            extra["key_params"], state.params["encoder"])

        def enc_apply(enc_params, x, bstats):
            variables = {"params": {"encoder": enc_params}}
            if bstats:
                variables["batch_stats"] = bstats
                (fea, outs), mut = self.module.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    method=lambda m, v, train: m.encoder(v, train=train))
                return fea, outs, mut["batch_stats"]
            fea, outs = self.module.apply(
                variables, x, train=True,
                method=lambda m, v, train: m.encoder(v, train=train))
            return fea, outs, bstats

        # key forward (stop-grad)
        kb = {k: v for k, v in extra["bstats"].items()} if extra["bstats"] else {}
        _, k_outs, _ = enc_apply(key_params, batch["image_key"], kb)
        k = jax.lax.stop_gradient(_normalize(k_outs["q"]))

        p = ((self.crop_count - 1) if self.crop_count
             else k.shape[0] // batch["lr"].shape[0])

        def loss_fn(params):
            sr, new_bstats = self._apply_pipeline(params, extra, batch["lr"],
                                                  True)
            # contrastive logits on the query crop — same train-mode BN
            # (batch statistics) as the embedding the generator just
            # consumed; the extra mutation is discarded so stats advance
            # exactly once per step
            variables = {"params": params}
            if new_bstats:
                variables["batch_stats"] = new_bstats
                (fea, outs), _ = self.module.apply(
                    variables, batch["lr"], train=True,
                    mutable=["batch_stats"],
                    method=lambda m, v, train: m.encoder(v, train=train))
            else:
                fea, outs = self.module.apply(
                    variables, batch["lr"], train=True,
                    method=lambda m, v, train: m.encoder(v, train=train))
            q = _normalize(outs["q"])
            queue = jax.lax.stop_gradient(extra["queue"])
            n = q.shape[0]
            kp = k.reshape(n, p, self.encoder_dim)
            if self.combined_loss_mode == "supmoco":
                labels = batch["labels"].astype(jnp.int32)
                nc = max(self.num_classes, 1) + 1
                yb = jax.nn.one_hot(labels, nc)
                yq = jax.nn.one_hot(extra["queue_labels"], nc)
                pos_y_q = yb @ yq.T
                pos_q = jnp.sum(q * (pos_y_q @ queue), axis=1) / self.T
                l_pos = (jnp.sum(q[:, None, :] * kp, axis=2) / self.T
                         ).sum(axis=1)
                l_pos = (l_pos + pos_q) / (p + pos_y_q.sum(axis=1))
            else:
                l_pos = (jnp.sum(q[:, None, :] * kp, axis=2) / self.T
                         ).sum(axis=1) / p
            l_neg = jnp.matmul(q, queue.T,
                               precision=jax.lax.Precision.HIGHEST) / self.T
            logits = jnp.concatenate([l_pos[:, None], l_neg], axis=1)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.zeros(n, jnp.int32)).mean()
            pixel = PIXEL_LOSSES[self.loss_type](sr, batch["hr"])
            total = self.l1_weight * pixel + self.contrastive_weight * ce
            losses = {"train-loss": total, "pixel-loss": pixel,
                      "contrastive-loss": ce}
            return total, (losses, new_bstats, kp[:, 0])

        grads, (losses, new_bstats, enq) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)

        n = enq.shape[0]
        if self.K % n != 0:
            raise ValueError(
                f"queue size K={self.K} must be a multiple of the global "
                f"enqueue batch {n} (moco.py _dequeue_and_enqueue assert)")
        ptr = extra["queue_ptr"]
        new_extra = dict(extra)
        new_extra.update({
            "key_params": key_params,
            "bstats": new_bstats,
            "queue": jax.lax.dynamic_update_slice(
                extra["queue"],
                jax.lax.stop_gradient(enq).astype(extra["queue"].dtype),
                (ptr, jnp.int32(0))),
            "queue_ptr": (ptr + n) % self.K,
        })
        if self.combined_loss_mode == "supmoco":
            new_extra["queue_labels"] = jax.lax.dynamic_update_slice(
                extra["queue_labels"], batch["labels"].astype(jnp.int32),
                (ptr,))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, extra=new_extra,
                             rng=rng), losses

    def handler_metadata(self):
        return {"combined_loss_mode": self.combined_loss_mode,
                "embedding_type": self.embedding_type,
                "generator": self._generator}


@register_model("contrastiveblindqrcan")
class ContrastiveBlindQRCANHandler(ContrastiveBlindSRHandler):
    generator_name = "qrcan"


@register_model("contrastiveblindqedsr")
class ContrastiveBlindQEDSRHandler(ContrastiveBlindSRHandler):
    generator_name = "qedsr"


@register_model("contrastiveblindqhan")
class ContrastiveBlindQHANHandler(ContrastiveBlindSRHandler):
    generator_name = "qhan"


@register_model("contrastiveblindqelan")
class ContrastiveBlindQELANHandler(ContrastiveBlindSRHandler):
    generator_name = "qelan"


@register_model("contrastiveblindqsan")
class ContrastiveBlindQSANHandler(ContrastiveBlindSRHandler):
    generator_name = "qsan"


@register_model("contrastiveblindqrealesrgan")
class ContrastiveBlindQRealESRGANHandler(ContrastiveBlindSRHandler):
    generator_name = "qrealesrgan"


@register_model("contrastiveblindmetabed")
class ContrastiveBlindMetaBedHandler(ContrastiveBlindSRHandler):
    """Mini-EDSR Metabed generator under the BoBW pipeline
    (ContrastiveBlindMetaBedHandler, handlers.py:406-461): encoder
    embedding feeds the Metabed's per-block metadata hooks;
    selective_meta_blocks 'front_only' gates only block 0 (the
    reference's hard-coded 8-long [True, False x7])."""

    generator_name = "metabed"

    def __init__(self, selective_meta_blocks="front_only",
                 meta_block="q-layer", num_blocks=8, **kwargs):
        if selective_meta_blocks == "front_only":
            smb = (True,) + (False,) * (num_blocks - 1)
        elif selective_meta_blocks in ("none", None):
            smb = None
        else:
            smb = tuple(selective_meta_blocks)
        super().__init__(selective_meta_blocks=smb, meta_block=meta_block,
                         num_blocks=num_blocks, **kwargs)
