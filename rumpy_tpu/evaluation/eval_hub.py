"""EvalHub — multi-model comparison evaluation.

Mirror of rumpy/shared_framework/evaluation/standard_eval.py:31-563:

  * loads N (experiment, epoch) model bundles through SISRInterface;
  * always computes the bicubic reference (optional Lanczos) with
    PIL-parity resampling and timing (:240-276);
  * models whose required metadata is missing from the dataset are
    auto-dropped (:63-76);
  * PSNR/SSIM computed on the Y channel of jpg-mode BT.601 YCbCr,
    clip-to-[0,1] — the parity-defining semantics (metrics.py:109-149);
  * writes `individual_metrics.csv` (rows = images, multi-level columns
    model>metric) and `average_metrics.csv`, plus per-model SR PNGs and
    optional comparison collages; per-model `runtime` columns kept.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from rumpy_tpu.data.datasets import SuperResImages
from rumpy_tpu.data.loader import DataLoader
from rumpy_tpu.interface import SISRInterface
from rumpy_tpu.ops import resize as resize_ops
from rumpy_tpu.utils.color import rgb_to_ycbcr
from rumpy_tpu.utils.metrics import Metrics
from rumpy_tpu.utils.visualization import (interpret_sisr_images,
                                           safe_image_save)


class EvalHub:
    def __init__(self,
                 models: Sequence[Dict[str, Any]],
                 model_loc: str,
                 data_cfg: Dict[str, Any],
                 out_loc: str,
                 scale: int = 4,
                 metrics: Sequence[str] = ("PSNR", "SSIM"),
                 save_im: bool = False,
                 gallery: bool = False,
                 lanczos_upsample: bool = False,
                 time_models: bool = False,
                 no_image_comparison: bool = False,
                 lpips_weights: Optional[str] = None,
                 fr_gallery: Optional[str] = None,
                 fr_extractor: str = "lightcnn",
                 fr_extractor_weights: Optional[str] = None,
                 pad_to_bucket: Optional[int] = None):
        self.out_loc = out_loc
        self.scale = scale
        # Bounded-compile eval (SURVEY §7 hard part 2): pad every model
        # input up to the next multiple of this value (zeros; output
        # cropped back before metrics), so a folder of arbitrary shapes
        # compiles at most ceil(max_dim/bucket)^2 programs per model
        # instead of one per distinct shape. Opt-in — None keeps the
        # reference's exact unpadded forward.
        self.pad_to_bucket = pad_to_bucket
        self.save_im = save_im
        self.gallery = gallery
        self.lanczos = lanczos_upsample
        self.time_models = time_models
        self.collages = not no_image_comparison and gallery
        os.makedirs(out_loc, exist_ok=True)

        # dataset: RGB full images, all available metadata
        ds_cfg = dict(data_cfg)
        ds_cfg.setdefault("scale", scale)
        ds_cfg.setdefault("colorspace", "rgb")
        self.dataset = SuperResImages(**ds_cfg)
        self.loader = DataLoader(self.dataset, batch_size=1, shuffle=False,
                                 num_workers=2)

        # model bundles; drop models whose metadata is unavailable
        self.models: Dict[str, SISRInterface] = {}
        available_keys = set(self.dataset.metadata_keys)
        for spec in models:
            name = spec.get("label") or spec["experiment"]
            iface = SISRInterface(
                model_loc=model_loc, experiment=spec["experiment"],
                mode="eval", load_epoch=spec.get("epoch", "best"),
                scale=scale, no_directories=True,
                new_params=spec.get("new_params") or {})
            required = getattr(iface.model, "metadata_keys", None)
            if required:
                # 'all' consumes whatever the dataset provides
                # (generate_channels semantics) — never a literal key
                missing = [k for k in required if k != "all"
                           and not any(a == k or a.endswith(f"-{k}")
                                       for a in available_keys)]
                if missing:
                    print(f"dropping {name}: dataset lacks metadata "
                          f"{missing}")
                    continue
            self.models[name] = iface

        # Face-recognition profiling (standard_eval.py:488-531): gated on a
        # gallery + a weight-loaded embedding extractor. Per-image FR_rank
        # columns are computed here (features extracted once and reused for
        # the final CMC/ROC report), so 'FR_rank' is stripped from the
        # metric-hub list.
        metrics = list(metrics)
        self.face_recognizer = None
        if fr_gallery or "FR_rank" in metrics:
            from rumpy_tpu.models.feature_extractors import \
                perceptual_loss_mechanism
            from rumpy_tpu.utils.face_recognition import FaceRecognizer
            if not fr_gallery:
                raise KeyError("FR_rank requested but no fr_gallery "
                               "configured (dir of <id>.png images or a "
                               "features .npz)")
            extractor = perceptual_loss_mechanism(
                fr_extractor, weights=fr_extractor_weights)
            self.face_recognizer = FaceRecognizer(extractor)
            self._register_gallery(fr_gallery)
            self._fr_feats: Dict[str, list] = defaultdict(list)
            metrics = [m for m in metrics if m != "FR_rank"]

        # face-boundary PSNR metrics read face_boundaries_0.csv from the
        # dataset's HR dir (reference metrics.py:78-88)
        self.metric_hub = Metrics(metrics, lpips_weights=lpips_weights,
                                  hr_data_loc=self.dataset.hr_dir)

    def _register_gallery(self, source: str) -> None:
        """Gallery = a features .npz (reference load_gallery format:
        out_stack/id_stack) or a directory of <identity>.png images."""
        if source.endswith(".npz"):
            g = np.load(source, allow_pickle=True)
            self.face_recognizer.register_gallery(
                features=g["out_stack"], gallery_ids=list(g["id_stack"]))
            return
        from PIL import Image
        names = sorted(n for n in os.listdir(source)
                       if n.lower().endswith((".png", ".jpg", ".jpeg")))
        if not names:
            raise FileNotFoundError(f"No gallery images in {source}")
        ims, ids = [], []
        shape = None
        for n in names:
            im = Image.open(os.path.join(source, n)).convert("RGB")
            if shape is None:
                shape = im.size
            elif im.size != shape:
                im = im.resize(shape, Image.BICUBIC)
            ims.append(np.asarray(im, np.float32) / 255.0)
            ids.append(os.path.splitext(n)[0])
        self.face_recognizer.register_gallery(images=np.stack(ims),
                                              gallery_ids=ids)

    # ------------------------------------------------------------------

    def _reference_outputs(self, lr_u8: np.ndarray
                           ) -> Dict[str, Tuple[np.ndarray, float]]:
        """Bicubic (and optional Lanczos) upsampled references + timing."""
        h, w = lr_u8.shape[:2]
        out = {}
        # steady-state timing: first call per shape jit-compiles
        if ("bicubic", (h, w)) not in getattr(self, "_timed_shapes", set()):
            np.asarray(resize_ops.pil_resize(
                lr_u8, (h * self.scale, w * self.scale)))
            if self.lanczos:
                np.asarray(resize_ops.pil_resize(
                    lr_u8, (h * self.scale, w * self.scale),
                    filter="lanczos"))
            if hasattr(self, "_timed_shapes"):
                self._timed_shapes.add(("bicubic", (h, w)))
        t0 = time.perf_counter()
        bic = np.asarray(resize_ops.pil_resize(
            lr_u8, (h * self.scale, w * self.scale)))
        out["bicubic"] = (bic.astype(np.float32) / 255.0,
                          time.perf_counter() - t0)
        if self.lanczos:
            t0 = time.perf_counter()
            lcz = np.asarray(resize_ops.pil_resize(
                lr_u8, (h * self.scale, w * self.scale), filter="lanczos"))
            out["lanczos"] = (lcz.astype(np.float32) / 255.0,
                              time.perf_counter() - t0)
        return out

    @staticmethod
    def _y_channel(rgb: np.ndarray) -> np.ndarray:
        return np.asarray(rgb_to_ycbcr(np.clip(rgb, 0.0, 1.0), y_only=True,
                                       im_type="jpg"))

    def full_image_protocol(self) -> pd.DataFrame:
        rows: Dict[str, Dict[str, float]] = defaultdict(dict)
        self._timed_shapes: set = set()
        for batch in self.loader:
            lr = batch["lr"][0]
            hr = batch["hr"][0]
            tag = batch["tag"][0]
            meta = None
            metas = batch.get("metadata")
            if metas is not None and np.size(metas[0]):
                meta = np.asarray(metas[0])[None]

            lr_u8 = (np.clip(lr, 0, 1) * 255.0).astype(np.uint8)
            hr_y = self._y_channel(hr)

            outputs: Dict[str, np.ndarray] = {}
            for ref_name, (ref_img, elapsed) in \
                    self._reference_outputs(lr_u8).items():
                outputs[ref_name] = ref_img
                rows[tag][f"{ref_name}>runtime"] = elapsed

            for name, iface in self.models.items():
                inp = lr
                if getattr(iface.model, "im_input", "unmodified") == "interp":
                    inp = outputs["bicubic"]
                # narrow the full metadata matrix to the model's requested
                # keys (reference generate_channels selection semantics)
                model_meta = meta
                selector = getattr(iface.model, "select_metadata", None)
                if meta is not None and selector is not None:
                    model_meta = selector(meta,
                                          keys=self.dataset.metadata_keys)
                if self.time_models:
                    # warm-up forward so the runtime column reports
                    # steady-state inference, not the one-off XLA compile
                    # (the reference's per-image timing has no compile
                    # step to worry about; on TPU it would dominate).
                    # Under bucketing the compile key is the BUCKET shape.
                    h_, w_ = inp.shape[:2]
                    if self.pad_to_bucket:
                        b = self.pad_to_bucket
                        h_, w_ = h_ + (-h_) % b, w_ + (-w_) % b
                    key = (name, (h_, w_))
                    if key not in self._timed_shapes:
                        iface.net_run_and_process(
                            inp[None], metadata=model_meta,
                            pad_multiple=self.pad_to_bucket)
                        self._timed_shapes.add(key)
                rgb, _ycc, _loss, elapsed = iface.net_run_and_process(
                    inp[None], metadata=model_meta, timing=self.time_models,
                    pad_multiple=self.pad_to_bucket)
                outputs[name] = rgb[0]
                if self.time_models and elapsed is not None:
                    rows[tag][f"{name}>runtime"] = elapsed

            stem = os.path.splitext(tag)[0]
            for name, img in outputs.items():
                sr_y = self._y_channel(img)
                res = self.metric_hub.run_metrics(sr_y[None], hr_y[None],
                                                  max_value=1.0,
                                                  rgb_a=img[None],
                                                  rgb_ref=hr[None],
                                                  probe_names=[stem])
                for metric, vals in res.items():
                    rows[tag][f"{name}>{metric}"] = vals[0]
                if self.face_recognizer is not None:
                    # extract once; reused for both the per-image rank
                    # column and the final CMC/ROC report
                    feats = self.face_recognizer._extract(
                        np.clip(img, 0.0, 1.0)[None])
                    rank = self.face_recognizer.fr_rank(
                        features=feats, probe_ids=[stem])
                    rows[tag][f"{name}>FR_rank"] = float(rank[0])
                    self._fr_feats[name].append((stem, feats[0]))
                if self.save_im:
                    safe_image_save(img, os.path.join(self.out_loc, name),
                                    tag)

            if self.collages:
                caps = {n: f"PSNR {rows[tag].get(f'{n}>PSNR', 0):.2f}"
                        for n in outputs}
                outputs_w_hr = {"HR": hr, **outputs}
                interpret_sisr_images(
                    outputs_w_hr,
                    os.path.join(self.out_loc,
                                 os.path.splitext(tag)[0] + "_comparison.pdf"),
                    captions=caps)

        if self.face_recognizer is not None:
            self.face_recognition_calculations()
        return self.manipulate_and_save_metrics(rows)

    def face_recognition_calculations(self) -> str:
        """CMC/ROC report files (standard_eval.py:488-531): per-model CMC
        curves plotted + saved as cmc_fr_metrics.csv, AUC/EER as
        extra_fr_metrics.csv, per-image ranks as individual_im_ranks.csv,
        all under <out_loc>/fr_metrics/."""
        from rumpy_tpu.utils.face_recognition import plot_cmc
        fr_dir = os.path.join(self.out_loc, "fr_metrics")
        os.makedirs(fr_dir, exist_ok=True)
        cmc_plot_data, cmc_cols, extra_cols, rank_cols = {}, {}, {}, {}
        for name, entries in self._fr_feats.items():
            stems = [s for s, _ in entries]
            feats = np.stack([f for _, f in entries])
            pkg = self.face_recognizer.full_package(
                features=feats, probe_ids=stems)
            cmc_plot_data[name] = (pkg["CMC_x"], pkg["CMC_y"])
            cmc_cols[name] = pd.Series(pkg["CMC_y"],
                                       index=pd.Index(pkg["CMC_x"],
                                                      name="Rank"))
            extra_cols[name] = pd.Series([pkg["AUC"], pkg["EER"]],
                                         index=pd.Index(["AUC", "EER"],
                                                        name="Metric"))
            rank_cols[name] = pd.Series(pkg["ranks"],
                                        index=pd.Index(stems,
                                                       name="Image_Name"))
        plot_cmc(cmc_plot_data, save_loc=fr_dir)
        pd.DataFrame(cmc_cols).to_csv(
            os.path.join(fr_dir, "cmc_fr_metrics.csv"))
        pd.DataFrame(extra_cols).to_csv(
            os.path.join(fr_dir, "extra_fr_metrics.csv"))
        pd.DataFrame(rank_cols).to_csv(
            os.path.join(fr_dir, "individual_im_ranks.csv"))
        return fr_dir

    def manipulate_and_save_metrics(self, rows) -> pd.DataFrame:
        df = pd.DataFrame.from_dict(rows, orient="index")
        df.index.rename("image", inplace=True)
        # multi-level columns model>metric (standard_eval.py:537-556)
        df.columns = pd.MultiIndex.from_tuples(
            [tuple(c.split(">", 1)) for c in df.columns],
            names=["model", "metric"])
        df = df.sort_index(axis=1)
        df.to_csv(os.path.join(self.out_loc, "individual_metrics.csv"))
        avg = df.mean(axis=0).to_frame("mean").T
        avg.to_csv(os.path.join(self.out_loc, "average_metrics.csv"))
        return df
