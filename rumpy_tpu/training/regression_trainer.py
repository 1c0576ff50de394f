"""Regression (degradation-predictor) training orchestration.

Mirror of rumpy/regression/training/training_handler.py:20-238: trains
contrastive encoders (MoCo/SupMoCo/WeakCon/SupCon) or direct regressors on
degraded LR patches, with per-epoch contrastive evaluation (embedding dump
+ clustering scores + t-SNE plots via ContrastiveEval) and optional warm
start from a previous experiment's checkpoint.

Task-specific data flow: the dataset yields `crop_count` patches per image
(query + positives); degradation-class labels / weak-label vectors are
computed on the fly from the metadata CSV with the vectorized decision
tree (models/contrastive_labelling.py).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Any, Dict, List

import numpy as np

from rumpy_tpu.models import contrastive_labelling as cl
from rumpy_tpu.training.trainer import TrainingHandler
from rumpy_tpu.utils import stats as stats_mod


class RegressionTrainingHandler(TrainingHandler):
    def __init__(self, config, **kwargs):
        data_cfg = config.get("data") or {}
        model_cfg = config.get("model") or {}
        internal = dict(model_cfg.get("internal_params") or {})
        self._labelling_strategy = (internal.pop("labelling_strategy", None)
                                    or "default")
        self._selected_metadata = internal.pop("selected_metadata", None) or "all"
        self._warm_start = (config.get("training") or {}).get("warm_start")
        # positives_per_class drives the dataset's crop_count; when the
        # config is silent, the default must come from the HANDLER's own
        # signature (SupMoCo/WeakCon default to 4 positives, MoCo to 1) —
        # a hardcoded 1 here would build 2-crop batches that crash
        # SupMoCo's (n, positives, dim) key reshape
        positives = (internal.get("positives_per_class")
                     or internal.get("positives"))
        cfg_crops = data_cfg.get("crop_count")
        if not positives and cfg_crops:
            # explicit data.crop_count is the other way users state the
            # same fact: crop_count = positives + 1
            positives = int(cfg_crops) - 1
        if not positives:
            import inspect

            from rumpy_tpu.registry import get_model
            try:
                # walk the MRO: subclasses like WeakCon(vector_size=2,
                # **kwargs) inherit positives_per_class from SupMoCo's
                # __init__ without re-declaring it
                for klass in inspect.getmro(
                        get_model(model_cfg.get("name") or "")):
                    init = klass.__dict__.get("__init__")
                    if init is None:
                        continue
                    sig = inspect.signature(init)
                    par = (sig.parameters.get("positives_per_class")
                           or sig.parameters.get("positives"))
                    if par is not None \
                            and par.default is not inspect.Parameter.empty:
                        positives = par.default
                        break
            except KeyError:
                pass
        self._positives = int(positives or 1)
        if cfg_crops and int(cfg_crops) != self._positives + 1:
            raise ValueError(
                f"data.crop_count={cfg_crops} conflicts with "
                f"positives_per_class={self._positives}: contrastive "
                f"batches need crop_count = positives + 1 "
                f"= {self._positives + 1}")
        data_cfg["crop_count"] = self._positives + 1
        # SimCLR colour jitter on contrastive views (reference
        # image_functions.py:364-371, applied per-crop in workers; here an
        # on-device batched op with per-view independent draws)
        self._colour_distort = bool(data_cfg.get("colour_distort"))
        self._distortion_strength = float(
            data_cfg.get("distortion_strength") or 1.0)
        model_cfg["internal_params"] = internal
        super().__init__(config, **kwargs)

        handler = self.model.model
        # class labelling setup from the training dataset's metadata keys
        self._m_map: Dict[str, int] = {}
        self._valid: List[str] = []
        self._mags: List[int] = []
        self._num_classes = 0
        ds = self._first_dataset()
        meta_keys = list(ds.metadata_keys) if (
            ds is not None and ds.metadata_keys) else []
        if not meta_keys and self.online_pipeline is not None:
            # online mode: labelling keys come from the degradation
            # pipeline itself (degrade a dummy batch to enumerate them)
            import jax
            import jax.numpy as jnp
            _, meta = self.online_pipeline.degrade_batch(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
            _, meta_keys = self.online_pipeline.metadata_matrix(meta)
        if meta_keys:
            std_keys = cl.register_metadata(meta_keys)
            self._m_map = {k: i for i, k in enumerate(std_keys)}
            self._valid, self._mags, self._num_classes = cl.partition_metadata(
                self._m_map, self._selected_metadata,
                self._labelling_strategy)
        if hasattr(handler, "register_classes") and self._num_classes:
            handler.register_classes(self._num_classes)
            handler.num_classes = self._num_classes
            # (queue_labels already hold the -1 unseen-slot sentinel from
            # init_queue_sides — no re-initialization needed here)
        if hasattr(handler, "register_vector") and self._valid:
            vsize = cl.degradation_vector_size(self._valid)
            handler.register_vector(vsize)
            import jax.numpy as jnp
            if "queue_vectors" in self.model.state.extra and \
                    self.model.state.extra["queue_vectors"].shape[1] != vsize:
                self.model.state = self.model.state.replace(
                    extra={**self.model.state.extra,
                           "queue_vectors": jnp.zeros((handler.K, vsize))})

        if self._warm_start:
            self._do_warm_start(self._warm_start)

    def _first_dataset(self):
        if self.train_data is None:
            return None
        ds = self.train_data.dataset
        return ds.datasets[0] if hasattr(ds, "datasets") else ds

    def _do_warm_start(self, spec):
        """Load encoder weights from a previous experiment or a packaged
        pretrained network (training_handler.py:92-118: the reference
        resolves bare names against its in-repo
        regression/pretrained_networks/<name>; here bare names resolve
        against rumpy_tpu/pretrained/<name>).

        Only shape-compatible state is taken from the checkpoint:
        network params must match exactly (fail loud otherwise); extra
        entries transfer per-key when shapes match (EMA/key encoder,
        BatchNorm stats, the feature queue when K agrees) — EXCEPT the
        label/vector queues, which keep THIS run's initialization: the
        old run's class ids belong to its labelling scheme, not ours."""
        import jax

        from rumpy_tpu.utils import checkpoint as ckpt
        path_dir = spec.get("model_save_dir") if isinstance(spec, dict) else spec
        if isinstance(path_dir, str):
            path_dir = ckpt.resolve_packaged(path_dir)
        summary = os.path.join(os.path.dirname(path_dir.rstrip(os.sep)),
                               "result_outputs", "summary.csv")
        loaded, epoch = self.model.model.load_model(
            path_dir, (spec.get("epoch", "last")
                       if isinstance(spec, dict) else "last"),
            summary_csv=summary if os.path.isfile(summary) else None,
            skip_optimizer_load=True)
        fresh = self.model.state

        def _shapes_match(a, b):
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            return (jax.tree_util.tree_structure(a)
                    == jax.tree_util.tree_structure(b)
                    and len(la) == len(lb)
                    and all(np.shape(x) == np.shape(y)
                            for x, y in zip(la, lb)))

        if not _shapes_match(loaded.params, fresh.params):
            raise RuntimeError(
                f"warm start from {path_dir}: checkpoint network shapes "
                f"do not match this model's configuration")
        new_extra = dict(fresh.extra or {})
        for k, lv in (loaded.extra or {}).items():
            if k in ("queue_labels", "queue_vectors"):
                continue
            fv = new_extra.get(k)
            if fv is not None and _shapes_match(lv, fv):
                new_extra[k] = lv
        if ("queue" in new_extra
                and new_extra["queue"] is (fresh.extra or {}).get("queue")
                and "queue_ptr" in (fresh.extra or {})):
            # feature queue was NOT transferred (K mismatch) — its fill
            # pointer must stay fresh too
            new_extra["queue_ptr"] = fresh.extra["queue_ptr"]
        self.model.state = fresh.replace(params=loaded.params,
                                         extra=new_extra)
        print(f"warm-started from {path_dir} (epoch {epoch})")

    # ------------------------------------------------------------------

    def _degrade_views(self, batch, epoch: int, step: int
                       ) -> Dict[str, Any]:
        """On-device degradation of contrastive views: every crop slot of
        an image is degraded with the SAME per-image kernel/noise draw
        (same RNG key across slots -> identical degradation samples), so
        query/key pairs share a degradation class — the construction the
        reference performed per-image on CPU workers."""
        import jax
        import jax.numpy as jnp
        hr = np.asarray(batch["hr"], np.float32)
        if hr.ndim == 4:
            hr = hr[:, None]
        n, p = hr.shape[:2]
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.PRNGKey(self.seed), epoch), step)
        views = []
        mat = None
        for s in range(p):
            lr_s, meta = self.online_pipeline.degrade_batch(
                key, jnp.asarray(hr[:, s]))
            views.append(np.asarray(lr_s))
            if mat is None:
                m, _ = self.online_pipeline.metadata_matrix(meta)
                mat = np.asarray(m, np.float32)
        stacked = np.stack(views, axis=1)  # (N, P, h, w, C)
        if self._colour_distort:
            from rumpy_tpu.ops.color_aug import colour_distortion
            for s in range(p):
                # per-view keys differ -> views of one image get
                # independent jitters (the SimCLR construction)
                stacked[:, s] = np.asarray(colour_distortion(
                    jax.random.fold_in(key, 1000 + s),
                    jnp.asarray(stacked[:, s]),
                    dist_strength=self._distortion_strength))
        out = dict(batch)
        out["lr"] = stacked
        out["metadata"] = mat
        return out

    def _assemble_contrastive_batch(self, batch) -> Dict[str, Any]:
        """crops (N, P+1, h, w, C) -> query/key views + labels/vectors."""
        crops = batch["lr"]
        n, pc = crops.shape[0], crops.shape[1]
        out: Dict[str, Any] = {
            "image_query": crops[:, 0],
            "image_key": crops[:, 1:].reshape((n * (pc - 1),)
                                              + crops.shape[2:]),
        }
        metas = batch.get("metadata")
        if metas is not None and np.size(metas) and self._m_map:
            metas = np.asarray(metas, np.float32)
            if self._num_classes:
                out["labels"] = np.asarray(cl.assign_classes(
                    metas, self._m_map, self._valid, self._mags,
                    self._num_classes, self._labelling_strategy))
            if self._valid:
                out["vector"] = np.asarray(cl.degradation_vectors(
                    metas, self._m_map, self._valid))
        if metas is not None and np.size(metas):
            out["metadata"] = np.asarray(metas, np.float32)
        return out

    def train(self, epoch: int) -> Dict[str, float]:
        import time

        import jax
        handler = self.model.model
        agg: Dict[str, List[float]] = defaultdict(list)
        data_t = compute_t = 0.0
        t0 = time.perf_counter()
        step_counter = 0
        for batch in self.train_data:
            t1 = time.perf_counter()
            data_t += t1 - t0
            if "lr" not in batch and self.online_pipeline is not None:
                batch = self._degrade_views(batch, epoch, step_counter)
                step_counter += 1
            if getattr(handler, "task", None) == "regression" and \
                    batch["lr"].ndim == 5:
                db = self._assemble_contrastive_batch(batch)
            else:
                db = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray) and v.dtype != object}
            db = self._put(db)
            self.model.state, losses = handler.train_batch(self.model.state,
                                                           db)
            # device scalars aggregate unfetched; one device_get per epoch
            # (per-step float() pays a host round-trip each — seconds over
            # a remote-TPU tunnel)
            for k, v in losses.items():
                agg[k].append(v)
            t0 = time.perf_counter()
            compute_t += t0 - t1
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
        """Contrastive eval: embeddings over the eval set -> clustering
        scores (+ scatter plots when plotting enabled)."""
        if self.eval_data is None:
            return {}
        from rumpy_tpu.evaluation.contrastive_eval import ContrastiveEval
        ce = ContrastiveEval(self.model.model, self.model.state,
                             m_map=self._m_map, valid=self._valid,
                             mags=self._mags,
                             num_classes=self._num_classes,
                             labelling_strategy=self._labelling_strategy)
        embeddings, labels = ce.generate_data_encoding(self.eval_data)
        scores = ce.clustering_scores(embeddings, labels)
        if self.model.logs_dir and not self.model.no_directories:
            ce.dump_embeddings(embeddings, labels,
                               os.path.join(self.model.logs_dir,
                                            f"encodings_epoch_{epoch}"))
            # reference eval_hub writes BOTH a TSNE and a UMAP scatter per
            # epoch (regression/evaluation/eval_hub.py); UMAP silently
            # falls back to TSNE semantics inside scatter_plot when the
            # optional umap package is absent, so only emit its file when
            # the package is importable.
            try:
                ce.scatter_plot(embeddings, labels,
                                os.path.join(self.model.logs_dir,
                                             f"tsne_epoch_{epoch}.pdf"),
                                method="tsne")
                try:
                    import umap  # noqa: F401
                    ce.scatter_plot(embeddings, labels,
                                    os.path.join(self.model.logs_dir,
                                                 f"umap_epoch_{epoch}.pdf"),
                                    method="umap")
                except ImportError:
                    pass
            except Exception:
                pass
        return {f"val-{k}": v for k, v in scores.items()}
