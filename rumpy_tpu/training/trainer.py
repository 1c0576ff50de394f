"""Training orchestration.

Mirror of rumpy/shared_framework/training/base_handler.py:28-436 (epoch
loop, loss aggregation, eval-metric hub, summary.csv + loss_plots.pdf,
early stopping, per-epoch checkpointing, periodic cleanup, resume with
branching) rebuilt around functional state:

  * the hot path is ONE jitted SPMD step per batch — when online
    degradations are configured, the fused degradation pipeline is traced
    into the same step (handler.set_input_pipeline), so blind-SR datagen
    runs on the TPU between the HR feed and the forward pass;
  * batches are sharded over the mesh's ``data`` axis; params replicated;
    XLA inserts the gradient all-reduce (parallel/mesh.py);
  * the data-vs-compute efficiency line is kept (the reference prints it
    per batch, base_handler.py:234-240) — it is the north-star's
    input-boundness metric.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from rumpy_tpu.config.constants import metric_best_val
from rumpy_tpu.data.loader import sisr_data_setup
from rumpy_tpu.interface import SISRInterface
from rumpy_tpu.parallel import mesh as mesh_mod
from rumpy_tpu.utils import stats as stats_mod
from rumpy_tpu.utils.checkpoint import available_epochs, checkpoint_path
from rumpy_tpu.utils.metrics import Metrics


class TrainingHandler:
    def __init__(self, config, use_mesh: bool = True, verbose: bool = True):
        self.cfg = config
        self.verbose = verbose
        data_cfg = config.get("data") or {}
        model_cfg = config.get("model") or {}
        train_cfg = config.get("training") or {}

        self.seed = int(train_cfg.get("seed") or 0)
        # num_epochs counts epochs to run FROM the resume point;
        # epoch_cutoff is the absolute total including previously-run
        # epochs (reference base_handler.py:150-152, :333)
        self.num_epochs = int(train_cfg.get("num_epochs") or 1)
        self.epoch_cutoff = train_cfg.get("epoch_cutoff")
        self.metrics_list = list(train_cfg.get("metrics")
                                 or ["PSNR", "SSIM"])
        self.early_stopping_patience = train_cfg.get("early_stopping_patience")
        self.best_metric = train_cfg.get("best_metric") or "val-PSNR"
        self.aggressive_cleanup = bool(train_cfg.get("aggressive_cleanup"))
        # reference training-kwarg vocabulary (base_handler.py:38-95):
        # separate early-stopping / cleanup metrics, periodic cleanup,
        # eval every N epochs, sample-save gate, metric peak value
        self.early_stopping_metric = (train_cfg.get("early_stopping_metric")
                                      or self.best_metric)
        self.cleanup_metric = (train_cfg.get("cleanup_metric")
                               or self.best_metric)
        self.model_cleanup_frequency = train_cfg.get(
            "model_cleanup_frequency")
        self.eval_frequency = int(train_cfg.get("eval_frequency") or 1)
        self.save_samples = (bool(train_cfg.get("save_samples"))
                             if train_cfg.get("save_samples") is not None
                             else True)
        self.max_im_val = float(train_cfg.get("max_im_val") or 1.0)
        if self.max_im_val != 1.0 and verbose:
            # honored reference-exactly (base_handler.py:108 passes it
            # straight into Metrics), but the rumpy_tpu data layer always
            # normalizes images to [0, 1] — a 255-style setting therefore
            # shifts PSNR by the same constant it would in the reference
            # given normalized data. Flag it rather than silently skew.
            print(f"WARNING: training.max_im_val={self.max_im_val} but "
                  "the data layer emits [0, 1] images; validation "
                  "PSNR/SSIM will use this as the peak value verbatim "
                  "(reference parity). Use 1.0 unless you know why.")
        # [training] profile_steps = N: capture a jax.profiler device
        # trace of the first N steps of the first epoch into
        # result_outputs/profile/ (SURVEY §5 tracing; view with
        # tensorboard or xprof)
        self.profile_steps = int(train_cfg.get("profile_steps") or 0)

        scale = int(data_cfg.get("scale") or 4)
        # the reference's sample configs put batch_size under [data]
        # (data_setup.py consumes it there); [training] wins if both set
        self.batch_size = int(train_cfg.get("batch_size")
                              or data_cfg.get("batch_size") or 8)
        load_epoch = train_cfg.get("continue_from_epoch")

        # multi_frame_config.use_masks activates loss masking on the
        # model, exactly as the reference trainer does
        # (base_handler.py:110-123 -> base_architecture.py loss_masking)
        if (data_cfg.get("multi_frame_config") or {}).get("use_masks"):
            model_cfg = dict(model_cfg)
            internal = dict(model_cfg.get("internal_params") or {})
            internal.setdefault("loss_masking", True)
            model_cfg["internal_params"] = internal

        # model interface
        self.model = SISRInterface(
            model_loc=config.get("experiment_save_loc"),
            experiment=config.get("experiment") or "experiment",
            mode="train",
            new_params=model_cfg,
            load_epoch=load_epoch,
            scale=scale,
            no_directories=bool(config.get("no_directories")),
            new_params_override_load=train_cfg.get("new_params_override_load"),
            seed=self.seed)

        # branching: resuming from a non-final epoch forks a branch dir
        if load_epoch is not None and self.model.model_save_dir:
            eps = available_epochs(self.model.model_save_dir)
            if eps and self.model.model_epoch - 1 < max(eps):
                self.model.branch(self.model.model_epoch - 1)
            # truncate stats past the resume point even when NOT
            # branching: a crash between the CSV row write and the (much
            # slower) checkpoint save leaves an orphan row for an epoch
            # that will be re-run — without this the re-run appends a
            # duplicate epoch index
            if eps:
                stats_mod.truncate_statistics(self.model.logs_dir,
                                              self.model.model_epoch - 1)

        # mesh + sharding: data axis sized to divide the global batch
        if use_mesh:
            import math
            n = math.gcd(self.batch_size, len(jax.devices()))
            self.mesh = mesh_mod.get_mesh(n_data=max(1, n))
        else:
            self.mesh = None

        # data
        handler = self.model.model
        if data_cfg.get("online_degradations"):
            # a global online-degradation pipeline implies HR-only
            # training sets (LR is synthesized on-device inside the step)
            for ds in (data_cfg.get("training_sets") or {}).values():
                if ds.get("online_degradations") is None:
                    ds["online_degradations"] = True
        self.train_data, self.eval_data = sisr_data_setup(
            data_cfg, scale=scale,
            batch_size=self.batch_size,
            dataloader_threads=int(data_cfg.get("dataloader_threads") or 4),
            input=getattr(handler, "im_input", "unmodified"),
            colorspace=handler.colorspace,
            crop=data_cfg.get("crop"),
            crop_count=int(data_cfg.get("crop_count") or 1),
            augmentations=bool(data_cfg.get("augmentations")),
            metadata=data_cfg.get("metadata"),
            sampler_attributes=data_cfg.get("sampler_attributes"),
            seed=self.seed)

        # online on-device degradations
        self.online_pipeline = None
        online_cfg = data_cfg.get("online_degradations")
        if online_cfg and not isinstance(online_cfg, dict):
            raise ValueError(
                "[data.online_degradations] must be a table with a "
                "'pipeline' list (got a bare boolean); see "
                "examples/train_rcan_blind_x4.toml")
        if online_cfg:
            from rumpy_tpu.degradations.pipeline import ImagePipeline
            pipe = ImagePipeline(online_cfg["pipeline"],
                                 deg_configs=online_cfg.get("deg_configs"),
                                 scale=scale)
            self.online_pipeline = pipe
            requested = data_cfg.get("metadata")

            def input_fn(key, batch):
                lr, meta = pipe.degrade_batch(key, batch["hr"])
                mat, keys = pipe.metadata_matrix(meta)
                new_batch = dict(batch)
                new_batch["lr"] = lr
                if requested and "all" not in requested:
                    idx = [i for r in requested for i, k in enumerate(keys)
                           if k == r or k.endswith(f"-{r}")]
                    if idx:
                        new_batch["metadata"] = mat[:, np.asarray(idx)]
                else:
                    # no key list (or 'all'): pass every column
                    # (generate_channels 'all' semantics)
                    new_batch["metadata"] = mat
                return new_batch

            try:
                handler.set_input_pipeline(input_fn)
            except NotImplementedError:
                # contrastive handlers refuse the hook: the regression
                # trainer degrades query/key views itself on device
                pass

        # face-boundary metrics read face_boundaries_0.csv from the first
        # eval set's HR dir (reference Metrics.__init__, metrics.py:78-88);
        # LPIPS needs converted weights ([training] lpips_weights)
        eval_sets = data_cfg.get("eval_sets") or {}
        first_eval = (next(iter(eval_sets.values())) if eval_sets else {})
        self.metric_hub = Metrics(
            self.metrics_list,
            lpips_weights=train_cfg.get("lpips_weights"),
            hr_data_loc=(first_eval.get("hr_dir") or first_eval.get("hr")))
        self.stats: Dict[int, Dict[str, float]] = {}

        # Optional Aim experiment tracking (reference base_handler.py:182-204
        # gates on the aim import the same way).
        self.tracker = None
        import jax as _jax
        if (train_cfg.get("logging") == "aim"
                and not config.get("no_directories")
                and _jax.process_index() == 0):
            try:
                import aim
                self.tracker = aim.Run(
                    experiment=config.get("experiment") or "experiment",
                    # system metrics at 60s like the reference
                    # (base_handler.py:183-204 aim_setup)
                    system_tracking_interval=60)
                self.tracker["hparams"] = config.as_plain() \
                    if hasattr(config, "as_plain") else dict(config)
                # metric replay on resume (base_handler.py:325-329): feed
                # previously-logged epochs back into the new Aim run
                if self.model.model_epoch > 0 and self.model.logs_dir:
                    prior = stats_mod.load_statistics(self.model.logs_dir)
                    if prior is not None:
                        for ep, row in prior.iterrows():
                            for k, v in row.items():
                                self.tracker.track(
                                    float(v), name=k, epoch=int(ep))
            except ImportError:
                print("aim not installed; experiment tracking disabled")

    # ------------------------------------------------------------------

    def _put(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object
                  and v.size > 0}
        if self.mesh is not None:
            n = self.mesh.shape["data"]
            shardable = {k: v for k, v in arrays.items()
                         if v.shape[0] % n == 0}
            rest = {k: v for k, v in arrays.items() if k not in shardable}
            out = mesh_mod.shard_batch(self.mesh, shardable)
            out.update(rest)
            return out
        return arrays

    def train(self, epoch: int) -> Dict[str, float]:
        agg: Dict[str, List[float]] = defaultdict(list)
        data_t = compute_t = 0.0
        profiling = False
        if (self.profile_steps and not getattr(self, "_profiled", False)
                and self.model.logs_dir and not self.model.no_directories):
            self._profiled = True
            jax.profiler.start_trace(
                os.path.join(self.model.logs_dir, "profile"))
            profiling = True
        t0 = time.perf_counter()
        step_idx = 0
        for batch in self.train_data:
            t1 = time.perf_counter()
            data_t += t1 - t0
            device_batch = self._put(batch)
            # fetch=False: losses stay on device; steps dispatch
            # asynchronously and the whole epoch's scalars come back in
            # ONE device_get below — per-step float() fetches would pay a
            # full host round-trip each (seconds over the axon tunnel)
            losses = self.model.train_batch(
                lr=device_batch.get("lr"), hr=device_batch.get("hr"),
                metadata=device_batch.get("metadata"),
                tags=batch.get("tag"), fetch=False)
            for k, v in losses.items():
                agg[k].append(v)
            step_idx += 1
            if profiling and step_idx >= self.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
            t0 = time.perf_counter()
            compute_t += t0 - t1
        if profiling:
            jax.profiler.stop_trace()
        if not agg:
            n = len(self.train_data.dataset) \
                if hasattr(self.train_data, "dataset") else "?"
            raise RuntimeError(
                f"Training loader produced no batches (dataset size {n}, "
                f"batch_size {self.train_data.batch_size}, drop_last) — "
                "reduce batch_size or add training data.")
        # one synchronizing transfer for every step's loss scalars —
        # identical values to the per-step fetch, minus the round-trips;
        # the sync time is epoch compute, so count it as such
        t1 = time.perf_counter()
        agg = jax.device_get(dict(agg))
        compute_t += time.perf_counter() - t1
        out = {k: float(np.mean(v)) for k, v in agg.items()}
        total = data_t + compute_t
        out["compute_efficiency"] = (compute_t / total * 100.0) if total else 0.0
        if self.verbose:
            print(f"epoch {epoch}: train-loss "
                  f"{out.get('train-loss', float('nan')):.5f} | "
                  f"compute efficiency {out['compute_efficiency']:.1f}%")
        return out

    def eval(self, epoch: int) -> Dict[str, float]:
        if self.eval_data is None:
            return {}
        agg: Dict[str, List[float]] = defaultdict(list)
        # Bucket validation images by shape and run ONE batched dispatch
        # per bucket (+ one metric round-trip) instead of one per image —
        # the reference's per-image loop is quadratic pain on DIV2K-100
        # (r1 weak #8). Fixed-crop val sets collapse into a single bucket.
        groups: Dict[tuple, list] = defaultdict(list)
        for batch in self.eval_data:
            if "hr" not in batch:
                raise ValueError(
                    "eval set yields no HR images — validation metrics "
                    "need ground truth (add hr_dir to the eval_sets "
                    "table, or drop eval_sets to skip validation)")
            lrs = batch["lr"] if isinstance(batch["lr"], list) else [batch["lr"][i] for i in range(len(batch["lr"]))]
            hrs = batch["hr"] if isinstance(batch["hr"], list) else [batch["hr"][i] for i in range(len(batch["hr"]))]
            metas = batch.get("metadata")
            meta_keys = batch.get("metadata_keys")
            if meta_keys and meta_keys[0] and isinstance(
                    meta_keys[0], (list, tuple)):
                meta_keys = meta_keys[0]
            for i, (lr, hr) in enumerate(zip(lrs, hrs)):
                meta = None
                if metas is not None and np.size(metas):
                    m = metas[i] if not isinstance(metas, list) else metas[i]
                    m = np.asarray(m)
                    # select the handler's requested keys from the full
                    # CSV row (QModel.generate_channels semantics)
                    selector = getattr(self.model.model, "select_metadata",
                                       None)
                    if selector is not None and meta_keys:
                        m = selector(m[None], list(meta_keys))[0]
                    meta = np.asarray(m)
                lr = np.asarray(lr)
                if lr.ndim == 4:
                    lr = lr[0]
                # bucket by LR shape AND metadata shape: mixing CSV-backed
                # and metadata-less eval sets must not land in one stack
                mshape = None if meta is None else tuple(np.shape(meta))
                tag_i = batch["tag"][i] if "tag" in batch else f"im{i}"
                groups[(lr.shape, mshape)].append(
                    (lr, np.asarray(hr), meta,
                     os.path.splitext(str(tag_i))[0]))

        from rumpy_tpu.utils.color import rgb_to_ycbcr
        first = True
        # Per-dispatch cap within a shape bucket: a 100-image same-shape
        # val set (DIV2K 2K) must not become one 100-image dispatch —
        # the SR activations alone would blow HBM. The cap still
        # amortizes compiles (one program per bucket shape regardless).
        chunk = int((self.cfg.get("training") or {}).get("eval_batch_size")
                    or 8)
        for shape, items in groups.items():
            for lo in range(0, len(items), chunk):
                part = items[lo:lo + chunk]
                lr_stack = np.stack([it[0] for it in part])
                meta_stack = (np.stack([it[2] for it in part])
                              if part[0][2] is not None else None)
                rgb, ycc, _, _ = self.model.net_run_and_process(
                    lr_stack, metadata=meta_stack)
                hr_stack = np.stack([it[1] for it in part])
                if hr_stack.shape[-1] == 3:
                    hr_y = np.asarray(rgb_to_ycbcr(hr_stack, y_only=True,
                                                   im_type="jpg"))
                else:
                    hr_y = hr_stack
                sr_y = np.clip(np.asarray(ycc[..., :1]), 0, 1)
                res = self.metric_hub.run_metrics(
                    sr_y, hr_y, max_value=self.max_im_val,
                    probe_names=[it[3] for it in part],
                    rgb_a=np.clip(np.asarray(rgb), 0, 1),
                    rgb_ref=(hr_stack if hr_stack.shape[-1] == 3
                             else None))
                for k, v in res.items():
                    agg[f"val-{k}"].extend(v)
                if first and self.save_samples and self.model.logs_dir \
                        and not self.model.no_directories:
                    # first val SR sample per epoch (base_handler.py:287-291)
                    from rumpy_tpu.utils.visualization import safe_image_save
                    sample_dir = os.path.join(self.model.logs_dir, "samples")
                    safe_image_save(np.asarray(rgb[0]), sample_dir,
                                    f"epoch_{epoch}_sample.png")
                    first = False
        return {k: float(np.mean(v)) for k, v in agg.items()}

    # ------------------------------------------------------------------

    def _best_epoch_by(self, metric: str) -> int:
        """Best epoch of this run under `metric`'s improve direction
        (cleanup_metric semantics, reference base_handler.py:60-61)."""
        d = metric_best_val.get(metric, "max")
        vals = {e: r[metric] for e, r in self.stats.items() if metric in r}
        if not vals:
            return max(self.stats) if self.stats else 0
        return (max if d == "max" else min)(vals, key=vals.get)

    def _cleanup_checkpoints(self, best_epoch: int, last_epoch: int,
                             force: bool = False) -> None:
        """Keep best-1 / best / best+1 / last (helper_functions.py:383-400)."""
        if not (self.aggressive_cleanup or force) \
                or not self.model.model_save_dir:
            return
        keep = {best_epoch - 1, best_epoch, best_epoch + 1, last_epoch}
        for e in available_epochs(self.model.model_save_dir):
            if e not in keep:
                os.remove(checkpoint_path(self.model.model_save_dir, e))

    def run_experiment(self) -> Dict[int, Dict[str, float]]:
        self.model.save_metadata()
        self.model.model_structure_dump()
        start = self.model.model_epoch
        direction = metric_best_val.get(self.early_stopping_metric, "max")
        best_val = -np.inf if direction == "max" else np.inf
        best_epoch = start
        stale = 0
        end = (int(self.epoch_cutoff) if self.epoch_cutoff is not None
               else start + self.num_epochs)
        for epoch in range(start, end):
            self.model.set_epoch(epoch)
            row: Dict[str, float] = {"epoch": epoch}
            row.update(self.train(epoch))
            if epoch % self.eval_frequency == 0:
                row.update(self.eval(epoch))
            self.stats[epoch] = row
            if self.model.logs_dir and not self.model.no_directories:
                stats_mod.save_statistics(self.model.logs_dir, row)
                try:
                    stats_mod.plot_stats(self.model.logs_dir)
                except Exception:
                    pass
            if self.model.model_save_dir and not self.model.no_directories:
                self.model.save()
            if self.tracker is not None:
                for k, v in row.items():
                    if k != "epoch":
                        self.tracker.track(v, name=k, epoch=epoch)

            # early stopping on the tracked metric plateau
            track = row.get(self.early_stopping_metric)
            if track is not None:
                improved = (track > best_val if direction == "max"
                            else track < best_val)
                if improved:
                    best_val, best_epoch, stale = track, epoch, 0
                else:
                    stale += 1
                if (self.early_stopping_patience
                        and stale >= self.early_stopping_patience):
                    if self.verbose:
                        print(f"early stopping at epoch {epoch} "
                              f"(no {self.early_stopping_metric} "
                              f"improvement for {stale} epochs)")
                    self._cleanup_checkpoints(
                        self._best_epoch_by(self.cleanup_metric), epoch)
                    break
            freq = self.model_cleanup_frequency
            self._cleanup_checkpoints(
                self._best_epoch_by(self.cleanup_metric), epoch,
                force=bool(freq and (epoch + 1) % int(freq) == 0))
        return self.stats
