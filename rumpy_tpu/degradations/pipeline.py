"""Degradation pipeline: config-driven op chains, offline and on-device.

Mirrors the reference ImagePipeline contract
(rumpy/image_tools/image_pipeline.py:54-257):

  * ``pipeline = [[op, cfg-id], ...]`` + ``deg_configs`` tables;
  * per-op metadata keys formatted ``<step>-<op>-<attr>``;
  * ``multiples`` copies per image with ``_qN`` name suffixes;
  * ``degradation_metadata.csv`` (index 'image') and
    ``degradation_hyperparameters.csv`` written next to outputs;
  * vector/list metadata (PCA blur kernels) expanded with repeated keys,
    keys emitted in sorted order.

The TPU-native addition is :func:`fused_degrade`: when every op in the
chain has a device path, the whole pipeline compiles into ONE jitted
function (B,H,W,C)->(lr, metadata matrix) that runs inside the training
input step — the reference ran the same chain per-image on CPU in
DataLoader workers, which is the single biggest perf lever identified in
SURVEY.md §3.3.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rumpy_tpu.registry import get_tool


def _parse_pipeline(pipeline) -> List[Tuple[str, str]]:
    if all(isinstance(i, (list, tuple)) for i in pipeline):
        return [(op.lower(), cfg) for op, cfg in pipeline]
    return [(op.lower(), "default") for op in pipeline]


def format_metadata_key(step: int, operation: str, attribute: str) -> str:
    return f"{step}-{operation}-{attribute}"


class ImagePipeline:
    def __init__(self, pipeline, deg_configs=None, output_extension=".png",
                 seed: Optional[int] = None, **kwargs):
        ops_cfgs = _parse_pipeline(pipeline)
        op_names = [o for o, _ in ops_cfgs]
        self.jm_present = ("jmcompress" in op_names
                           or "randomcompress" in op_names)
        self.blur_present: Optional[Tuple[int, str]] = None
        self.pipeline: "OrderedDict[Tuple[int, str], Any]" = OrderedDict()
        if seed is not None:
            np.random.seed(seed)
        for index, (operation, cfg_id) in enumerate(ops_cfgs):
            op_params = ({} if cfg_id == "default"
                         else dict(deg_configs[cfg_id]))
            if operation == "downsample" and "scale" in kwargs:
                op_params["scale"] = kwargs["scale"]
            if operation == "downsample" and self.jm_present:
                op_params["jm"] = True
            if seed is not None:
                op_params.setdefault("seed", seed + index)
            self.pipeline[(index, operation)] = get_tool(operation)(**op_params)
            if operation in ("srmdgaussianblur", "bsrganblur",
                             "realesrganblur"):
                self.blur_present = (index, operation)
        self.output_extension = output_extension

    # ------------------------------------------------------------------
    # Host path (offline datagen / image_manipulate CLI)
    # ------------------------------------------------------------------

    def run_pipeline(self, images=None, image_files=None, save_to_dir=None,
                     progress_bar_off=False, multiples=1):
        if (images is None) == (image_files is None):
            raise RuntimeError("Either image variables or image files need "
                               "to be provided.")
        if isinstance(image_files, str):
            image_files = [image_files]

        named: "OrderedDict[str, Any]" = OrderedDict()
        if image_files is None:
            if not isinstance(images, list):
                images = [images]
            for i, im in enumerate(images):
                named[f"temp_name_{i}"] = im
        else:
            for f in image_files:
                b = os.path.splitext(os.path.basename(f))[0]
                named[b + self.output_extension] = f

        if save_to_dir and self.blur_present:
            self.pipeline[self.blur_present].save_pca_matrix(save_to_dir)

        items = named.items()
        if not progress_bar_off:
            from tqdm import tqdm
            items = tqdm(items)

        final_images: List[Any] = []
        final_metadata: "OrderedDict[str, Dict]" = OrderedDict()
        for image_name, image in items:
            start = (Image.open(image).convert("RGB")
                     if isinstance(image, str) else image)
            for m in range(multiples):
                flux = start.copy() if hasattr(start, "copy") else start
                meta_dict: Dict[str, Any] = {}
                for (step, opname), op in self.pipeline.items():
                    flux, meta = op(flux)
                    meta_dict.update({
                        format_metadata_key(step, opname, k): v
                        for k, v in meta.items()})
                if multiples == 1:
                    out_name = image_name
                else:
                    dot = image_name.find(".")
                    out_name = image_name[:dot] + f"_q{m}" + image_name[dot:]
                final_metadata[out_name] = meta_dict
                if save_to_dir:
                    pil = (flux if hasattr(flux, "save") else
                           Image.fromarray(np.clip(
                               np.asarray(flux) * (255.0 if np.asarray(
                                   flux).dtype.kind == "f" else 1.0),
                               0, 255).astype(np.uint8)))
                    if not os.path.splitext(out_name)[1]:
                        out_name += ".png"  # raw-array inputs carry no ext
                    pil.save(os.path.join(save_to_dir, out_name))
                else:
                    final_images.append(flux)

        if save_to_dir:
            self._write_csvs(save_to_dir, final_metadata)

        meta_vals, meta_keys = self._vectorize_metadata(final_metadata)
        if len(final_images) == 1:
            final_images = final_images[0]
        return final_images, meta_vals, meta_keys

    @staticmethod
    def _vectorize_metadata(final_metadata):
        """Flatten per-image metadata dicts into a value matrix + key
        list. Returns a 1-D vector for a single image, an (N, K) matrix
        for several (each row in the same sorted-key order)."""
        meta_keys: List[str] = []
        rows: List[List[float]] = []
        ordered_keys: List[str] = []
        for image, meta_dict in final_metadata.items():
            values: List[float] = []
            if not ordered_keys:
                ordered_keys = sorted(meta_dict.keys())
            meta_keys = []
            for k in ordered_keys:
                v = meta_dict[k]
                if isinstance(v, list):
                    values.extend(v)
                    meta_keys.extend([k] * len(v))
                else:
                    values.append(v)
                    meta_keys.append(k)
            rows.append(values)
        if not rows:
            return np.zeros(0), meta_keys
        meta_vals = np.asarray(rows)
        if meta_vals.shape[0] == 1:
            meta_vals = meta_vals[0]
        return meta_vals, meta_keys

    def _write_csvs(self, save_to_dir, final_metadata):
        import pandas as pd
        df = pd.DataFrame.from_dict(final_metadata, orient="index")
        df.index.rename("image", inplace=True)
        df.to_csv(os.path.join(save_to_dir, "degradation_metadata.csv"))

        rows = {"index_num": [], "degradation": [], "hyperparam": [],
                "value": []}
        for (step, opname), op in self.pipeline.items():
            for hp, val in op.get_hyperparams().items():
                rows["index_num"].append(step)
                rows["degradation"].append(opname)
                rows["hyperparam"].append(hp)
                rows["value"].append(val)
        if rows["index_num"]:
            pd.DataFrame.from_dict(rows).set_index(["index_num"]).to_csv(
                os.path.join(save_to_dir,
                             "degradation_hyperparameters.csv"))

    # ------------------------------------------------------------------
    # Device path (online training datagen)
    # ------------------------------------------------------------------

    def supports_fused(self) -> bool:
        from rumpy_tpu.degradations.base import DegradationOp
        for op in self.pipeline.values():
            # host-only ops inherit the raising base batch_apply — an
            # identity check, since every op *has* the attribute
            if type(op).batch_apply is DegradationOp.batch_apply:
                return False
        return True

    def degrade_batch(self, key: jax.Array, hr_batch: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Run the whole chain on a (B,H,W,C) float batch on device.
        Returns (lr_batch, {step-op-attr: (B,) or (B,M) arrays})."""
        x = hr_batch
        metadata: Dict[str, jnp.ndarray] = {}
        keys = jax.random.split(key, len(self.pipeline))
        for k, ((step, opname), op) in zip(keys, self.pipeline.items()):
            x, meta = op.batch_apply(k, x)
            metadata.update({format_metadata_key(step, opname, a): v
                             for a, v in meta.items()})
        return x, metadata

    def metadata_matrix(self, metadata: Dict[str, jnp.ndarray]
                        ) -> Tuple[jnp.ndarray, List[str]]:
        """Flatten a metadata dict to a (B, M) matrix + expanded key list in
        sorted-key order (the reference's csv/vector contract)."""
        cols: List[jnp.ndarray] = []
        keys: List[str] = []
        for k in sorted(metadata.keys()):
            v = metadata[k]
            if v.ndim == 1:
                cols.append(v[:, None])
                keys.append(k)
            else:
                cols.append(v)
                keys.extend([k] * v.shape[1])
        if not cols:
            b = 0
            return jnp.zeros((b, 0)), []
        return jnp.concatenate(cols, axis=1).astype(jnp.float32), keys


def fused_degrade(pipeline: ImagePipeline):
    """Wrap a pipeline's device path as a single jitted function
    key, hr(B,H,W,C) -> (lr, metadata_matrix, keys). Keys are returned
    statically (computed once from a dry trace)."""
    if not pipeline.supports_fused():
        raise NotImplementedError(
            "pipeline contains host-only ops; run offline instead")

    def fn(key, hr_batch):
        lr, meta = pipeline.degrade_batch(key, hr_batch)
        mat, _ = pipeline.metadata_matrix(meta)
        return lr, mat

    jitted = jax.jit(fn)

    def with_keys(key, hr_batch):
        return jitted(key, hr_batch)

    def metadata_keys(sample_shape=(1, 64, 64, 3)) -> List[str]:
        _, meta = jax.eval_shape(
            lambda k, h: pipeline.degrade_batch(k, h),
            jax.random.PRNGKey(0), jnp.zeros(sample_shape, jnp.float32))
        keys: List[str] = []
        for k in sorted(meta.keys()):
            v = meta[k]
            keys.extend([k] * (1 if len(v.shape) == 1 else v.shape[1]))
        return keys

    with_keys.metadata_keys = metadata_keys
    return with_keys


def pipeline_prep_and_run(pipeline_config, source_dir=None, output_dir=None,
                          seed=None, multiples=1, recursive=False, **kwargs):
    """CLI entry helper (image_pipeline.py:260-311): build pipeline from a
    config dict, enumerate images in a folder, run, and write outputs +
    config copy."""
    from rumpy_tpu.config.loader import dump_toml

    cfg = dict(pipeline_config)
    pipeline = cfg.pop("pipeline")
    deg_configs = cfg.pop("deg_configs", None)
    seed = cfg.pop("seed", seed)
    multiples = cfg.pop("multiples", multiples)
    source_dir = cfg.pop("source_dir", source_dir)
    output_dir = cfg.pop("output_dir", output_dir)

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    files = []
    for root, _dirs, names in os.walk(source_dir):
        for n in sorted(names):
            if n.lower().endswith(exts):
                files.append(os.path.join(root, n))
        if not recursive:
            break
    if not files:
        raise FileNotFoundError(f"No images found in {source_dir}")

    os.makedirs(output_dir, exist_ok=True)
    pipe = ImagePipeline(pipeline, deg_configs=deg_configs, seed=seed, **cfg,
                         **kwargs)
    pipe.run_pipeline(image_files=files, save_to_dir=output_dir,
                      multiples=multiples)
    dump_toml({"pipeline": [list(p) if isinstance(p, (list, tuple)) else p
                            for p in pipeline],
               **({"deg_configs": {k: dict(v) for k, v in deg_configs.items()}}
                  if deg_configs else {})},
              os.path.join(output_dir, "degradation_config.toml"))
    return output_dir
