"""SISRInterface — the model interface layer.

Mirror of rumpy/shared_framework/models/base_interface.py:23-316 +
rumpy/SISR/models/interface.py:12-131, functional-state edition: owns the
experiment directory layout (``saved_models/``, ``result_outputs/``),
config persistence/diff arbitration, epoch selection (int | 'best' |
'last'), branching, handler construction via the registry, and colorspace
post-processing of eval outputs (Y-channel models get Cb/Cr carried over
from the bicubic-interpolated LR — interface.py:115-122).
"""

from __future__ import annotations

import copy
import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.config.loader import (NoneDict, config_diff, dump_toml,
                                     load_config, to_none_dict)
from rumpy_tpu.registry import get_model
from rumpy_tpu.utils import checkpoint as ckpt
from rumpy_tpu.utils.color import rgb_to_ycbcr, ycbcr_to_rgb


class SISRInterface:
    def __init__(self, model_loc: Optional[str] = None,
                 experiment: str = "experiment",
                 gpu: str = "single",  # accepted for config parity; unused
                 sp_gpu: int = 0,
                 mode: str = "train",
                 new_params: Optional[Dict[str, Any]] = None,
                 load_epoch=None,
                 scale: Optional[int] = None,
                 no_directories: bool = False,
                 new_params_override_load: Optional[bool] = None,
                 save_subdir: Optional[str] = None,
                 seed: int = 0,
                 **kwargs):
        self.experiment = experiment
        self.mode = mode
        self.scale = scale
        self.no_directories = no_directories

        self.base_folder = (os.path.join(model_loc, experiment)
                            if model_loc else None)
        if save_subdir and self.base_folder:
            self.base_folder = os.path.join(self.base_folder, save_subdir)
        self.model_save_dir = (os.path.join(self.base_folder, "saved_models")
                               if self.base_folder else None)
        self.logs_dir = (os.path.join(self.base_folder, "result_outputs")
                         if self.base_folder else None)
        if self.base_folder and not no_directories:
            os.makedirs(self.model_save_dir, exist_ok=True)
            os.makedirs(self.logs_dir, exist_ok=True)

        self.metadata = self._metadata_load(new_params or {}, load_epoch,
                                            new_params_override_load)
        _name = self.metadata.get("name")
        if not _name:
            # Fail loudly: a silent architecture default here once trained
            # the wrong model for an entire study (the reference errors
            # too — define_model(None) cannot resolve, net_train.py:71-82).
            raise ValueError(
                "config declares no model name — add a [model] table with "
                "name = \"...\" (and the checkpoint being loaded, if any, "
                "carries no saved name either)")
        self.name = _name.lower()

        internal = dict(self.metadata.get("internal_params") or {})
        if scale is not None:
            internal.setdefault("scale", scale)
        internal.setdefault("seed", seed)
        self.configuration = internal
        handler_cls = get_model(self.name)
        self.model = handler_cls(**internal)

        self.state = self.model.init_state(seed)
        self.model_epoch = 0
        if load_epoch is not None:
            summary = (os.path.join(self.logs_dir, "summary.csv")
                       if self.logs_dir else None)
            self.state, self.model_epoch = self.model.load_model(
                self.model_save_dir, load_epoch, summary_csv=summary)
            self.model_epoch += 1  # resume from the NEXT epoch
            # phase-switched handlers (IKC pretrain gate, GAN phases)
            # must know the loaded epoch — a freshly-loaded model is not
            # at epoch 0 (reference restores curr_epoch from checkpoint,
            # base_architecture.py:286-300)
            if hasattr(self.model, "set_epoch"):
                self.model.set_epoch(self.model_epoch)

    # ------------------------------------------------------------------
    # Config persistence / diff arbitration (base_interface.py:170-206)
    # ------------------------------------------------------------------

    def _metadata_load(self, new_params, load_epoch, override):
        cfg_path = (os.path.join(self.base_folder, "config.toml")
                    if self.base_folder else None)
        new_params = (new_params.as_plain()
                      if isinstance(new_params, NoneDict) else dict(new_params))
        if load_epoch is None or not cfg_path or not os.path.isfile(cfg_path):
            meta = new_params
        else:
            original = load_config(cfg_path).as_plain().get("model", {})
            diff = config_diff(original, new_params) if new_params else {}
            changed = {k: v for k, v in diff.items()
                       if v["old"] is not None and v["new"] is not None}
            if not changed:
                meta = new_params if override else (original or new_params)
            elif override is None:
                raise RuntimeError(
                    "Parameter inconsistencies between current config and "
                    f"saved-model config at {cfg_path}. Set "
                    "new_params_override_load under [training] to True/False "
                    f"to arbitrate. Diff: {changed}")
            else:
                meta = new_params if override else original
        if (meta and self.scale is not None
                and meta.get("internal_params", {}).get("scale") not in
                (None, self.scale)):
            raise Exception("The model loaded has been trained for a "
                            "different scale, and cannot produce the "
                            "requested images.")
        return meta or {}

    def save_metadata(self) -> None:
        if not self.base_folder or self.no_directories:
            return
        dump_toml({"model": self.metadata},
                  os.path.join(self.base_folder, "config.toml"))

    # ------------------------------------------------------------------
    # Branching (base_interface.py:148-158): resuming from a non-final
    # epoch forks into branch_epoch_N to protect existing results.
    # ------------------------------------------------------------------

    def branch(self, epoch: int) -> str:
        branch_dir = os.path.join(self.base_folder, f"branch_epoch_{epoch}")
        new_models = os.path.join(branch_dir, "saved_models")
        new_logs = os.path.join(branch_dir, "result_outputs")
        os.makedirs(new_models, exist_ok=True)
        os.makedirs(new_logs, exist_ok=True)
        src_ckpt = ckpt.checkpoint_path(self.model_save_dir, epoch)
        if os.path.isfile(src_ckpt):
            shutil.copy(src_ckpt, ckpt.checkpoint_path(new_models, epoch))
        summary = os.path.join(self.logs_dir, "summary.csv")
        if os.path.isfile(summary):
            shutil.copy(summary, os.path.join(new_logs, "summary.csv"))
        self.base_folder = branch_dir
        self.model_save_dir = new_models
        self.logs_dir = new_logs
        return branch_dir

    # ------------------------------------------------------------------
    # Train / eval entry points
    # ------------------------------------------------------------------

    def train_batch(self, lr=None, hr=None, metadata=None, fetch=True,
                    **kwargs):
        batch = {}
        if lr is not None:
            batch["lr"] = jnp.asarray(lr)
        if hr is not None:
            batch["hr"] = jnp.asarray(hr)
        if metadata is not None and np.size(metadata):
            batch["metadata"] = jnp.asarray(metadata)
        # Handlers that need image names on host (e.g. DIC's landmark
        # lookup, reference handlers.py:56-69) declare wants_tags; the
        # handler pops them before the jitted step sees the batch.
        if kwargs.get("tags") is not None and getattr(
                self.model, "wants_tags", False):
            batch["tags"] = list(kwargs["tags"])
        self.state, losses = self.model.train_batch(self.state, batch)
        if not fetch:
            # keep losses as device scalars: every float() here is a
            # blocking device->host round-trip (seconds over a remote-TPU
            # tunnel), so the training loop fetches once per epoch instead
            return losses
        return {k: float(v) for k, v in losses.items()}

    def set_epoch(self, epoch: int) -> None:
        self.model_epoch = epoch
        # forward to the handler (reference base_interface.py:313-315) —
        # epoch-switched handlers (GAN pretrain phases, WaveletSRGAN's
        # training_switch, FSSR-DSGAN's per-epoch LR decay) depend on it
        if hasattr(self.model, "set_epoch"):
            self.model.set_epoch(epoch)

    def net_run_and_process(self, lr=None, hr=None, metadata=None,
                            timing: bool = False,
                            pad_multiple: Optional[int] = None, **kwargs):
        """Eval forward with colorspace post-processing. `lr` is channel-last
        RGB float [0,1] (pre-interpolated for interp-input models).
        Returns (rgb, ycbcr) outputs, both clipped.

        Variable-size eval (SURVEY.md §7 hard part 2): by default images
        are only padded to the handler's declared ``size_multiple`` (1 for
        most conv SR nets), so metric outputs are bit-identical to the
        reference's unpadded forward. Passing an explicit `pad_multiple`
        opts into shape bucketing (one compiled program per bucket instead
        of one per image shape). Bucket padding is ZEROS, not reflect:
        zeros best mimic the implicit zero padding every conv applies at
        the true image border, so the cropped output stays metric-close
        to the unpadded forward (measured |dPSNR| ~0.004 dB vs ~0.009 for
        reflect/edge on 24/12-px pads); the handler's own size_multiple
        keeps reflect (SwinIR's window-pad convention)."""
        import time
        lr = jnp.asarray(lr)
        if lr.ndim == 3:
            lr = lr[None]
        orig_h, orig_w = lr.shape[1:3]
        bucket = pad_multiple is not None
        size_mult = getattr(self.model, "size_multiple", 1)
        if pad_multiple is None:
            pad_multiple = size_mult
        elif size_mult > 1:
            import math
            pad_multiple = math.lcm(int(pad_multiple), int(size_mult))
        if pad_multiple and pad_multiple > 1:
            ph = (-orig_h) % pad_multiple
            pw = (-orig_w) % pad_multiple
            if ph or pw:
                lr = jnp.pad(lr, ((0, 0), (0, ph), (0, pw), (0, 0)),
                             mode="constant" if bucket else "reflect")
        batch: Dict[str, Any] = {}
        if metadata is not None and np.size(metadata):
            batch["metadata"] = jnp.asarray(metadata)
        t0 = time.perf_counter()
        if self.model.colorspace == "rgb":
            batch["lr"] = lr
            out_rgb = self.model.run_eval(self.state, batch)
            out_rgb = jnp.clip(out_rgb, 0.0, 1.0)
            out_ycc = rgb_to_ycbcr(out_rgb, im_type="jpg")
        else:
            ycc = rgb_to_ycbcr(lr, im_type="jpg")
            batch["lr"] = ycc[..., :1]
            out_y = self.model.run_eval(self.state, batch)
            out_ycc = jnp.concatenate([out_y, ycc[..., 1:]], axis=-1)
            out_rgb = jnp.clip(ycbcr_to_rgb(out_ycc, im_type="jpg"), 0.0, 1.0)
        # Host-fetch inside the timed region: under the remote-TPU tunnel
        # block_until_ready returns before execution completes and would
        # silently time dispatch only (same fix as bench.py).
        out_rgb = np.asarray(out_rgb)
        elapsed = time.perf_counter() - t0
        out_ycc = np.asarray(out_ycc)
        s = out_rgb.shape[1] // lr.shape[1]
        out_rgb = out_rgb[:, :orig_h * s, :orig_w * s]
        out_ycc = out_ycc[:, :orig_h * s, :orig_w * s]
        if timing:
            return out_rgb, out_ycc, None, elapsed
        return out_rgb, out_ycc, None, None

    def net_forensic(self, lr, metadata=None, **kwargs):
        """Forward + per-block diagnostic data (interface.py:126-131):
        returns (image, {module_path: attention ndarray})."""
        lr = jnp.asarray(lr)
        if lr.ndim == 3:
            lr = lr[None]
        batch: Dict[str, Any] = {"lr": lr}
        if metadata is not None and np.size(metadata):
            batch["metadata"] = jnp.asarray(metadata)
        out, forensic = self.model.run_forensic(self.state, batch)
        return np.asarray(out), forensic

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------

    def save(self, minimal: bool = False) -> str:
        return self.model.save_model(self.state, self.model_save_dir,
                                     self.model_epoch, minimal=minimal)

    def num_parameters(self) -> int:
        return self.model.num_parameters(self.state)

    def print_overview(self) -> None:
        print(f"Model: {self.name} | params: {self.num_parameters():,} | "
              f"scale: {self.configuration.get('scale')}")

    def model_structure_dump(self) -> None:
        """torchinfo-equivalent: flax tabulate into model_structure.txt
        (base_interface.py:271-275)."""
        if not self.logs_dir or self.no_directories:
            return
        try:
            import flax.linen as nn
            table = nn.tabulate(
                self.model.module, jax.random.PRNGKey(0),
                console_kwargs={"width": 120})(*self.model.example_inputs())
            with open(os.path.join(self.logs_dir, "model_structure.txt"),
                      "w") as f:
                f.write(table)
        except Exception as e:  # tabulate is best-effort diagnostics
            print(f"model structure dump skipped: {e}")
