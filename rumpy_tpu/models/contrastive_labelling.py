"""Degradation class labelling for supervised-contrastive training.

Vectorized mirror of rumpy/regression/models/contrastive_learning/
__init__.py:8-273: metadata keys are canonicalized (register_metadata), a
decision tree is laid out per available degradation type
(partition_metadata), and each example's metadata vector maps to a unique
integer class via mixed-radix encoding of the decision bits
(class_retrieval) — here computed for a whole batch in jnp (the reference
loops per example on host).

Decision layout (labelling_strategy):
  * noise:        default [colour(2), type(2)]; double [mag(2), colour, type];
                  triple [mag(3), colour, type]
  * compression:  [mag(2 or 3)] (+ [type(2)] when both JM and JPEG present)
  * blur:         [kernel_type(7), sigma_x(3), sigma_y(3)]
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def register_metadata(keys: Sequence[str]) -> List[str]:
    processed = []
    for key in keys:
        if "gaussian_noise" in key:
            processed.append("gaussian_noise_scale")
        elif "poisson_noise" in key:
            processed.append("poisson_noise_scale")
        elif "downsample" in key:
            processed.append("scale")
        elif "gray_noise" in key:
            processed.append("gray_noise_boolean")
        elif "jpeg" in key:
            processed.append("jpeg_quality_factor")
        elif "qpi" in key:
            processed.append("jm_qpi")
        elif "realesrganblur" in key:
            processed.append(key.split("realesrganblur-")[-1])
        else:
            processed.append("unknown")
    return processed


def partition_metadata(m_map: Dict[str, int], selected_metadata="all",
                       labelling_strategy: str = "default"
                       ) -> Tuple[List[str], List[int], int]:
    accepted = (["blur", "compression", "noise"]
                if selected_metadata == "all" else list(selected_metadata))
    available: List[str] = []
    decisions: List[int] = []

    if "poisson_noise_scale" in m_map and "noise" in accepted:
        available.append("noise")
        decisions.extend({"default": [2, 2],
                          "double_precision": [2, 2, 2],
                          "triple_precision": [3, 2, 2]}[labelling_strategy])

    if (("jpeg_quality_factor" in m_map or "jm_qpi" in m_map)
            and "compression" in accepted):
        available.append("compression")
        decisions.extend([3] if labelling_strategy == "triple_precision"
                         else [2])
        if "jpeg_quality_factor" in m_map and "jm_qpi" in m_map:
            decisions.append(2)
            available.append("jm_jpg_compression")

    if "kernel_type" in m_map and "blur" in accepted:
        available.append("blur")
        decisions.extend([7, 3, 3])

    num_classes = int(np.prod(decisions)) if decisions else 0
    mags = [int(np.prod(decisions[:i])) if i else 1
            for i in range(len(decisions))]
    return available, mags, num_classes


def _partition_magnitude(mag, splits: int):
    if splits == 2:
        return jnp.where(mag > 0.5, 1, 0)
    return jnp.where(mag > 0.66, 2, jnp.where(mag > 0.33, 1, 0))


def assign_classes(metadata: jnp.ndarray, m_map: Dict[str, int],
                   valid_metadata: Sequence[str],
                   decision_mags: Sequence[int], num_classes: int,
                   labelling_strategy: str = "default") -> jnp.ndarray:
    """Batched class_retrieval: metadata (N, M) -> labels (N,) int32."""
    split = 3 if labelling_strategy == "triple_precision" else 2
    split_noise = labelling_strategy in ("double_precision",
                                         "triple_precision")
    tree: List[jnp.ndarray] = []
    col = lambda name: metadata[:, m_map[name]]

    if "noise" in valid_metadata:
        gauss = col("gaussian_noise_scale")
        is_gauss = gauss > 0
        mag = jnp.where(is_gauss, gauss, col("poisson_noise_scale"))
        if split_noise:
            tree.append(_partition_magnitude(mag, split))
        tree.append(jnp.where(col("gray_noise_boolean") > 0, 1, 0))
        tree.append(jnp.where(is_gauss, 1, 0))

    if "compression" in valid_metadata:
        has_jpeg = "jpeg_quality_factor" in m_map
        has_jm = "jm_qpi" in m_map
        if has_jpeg and has_jm:
            is_jpeg = col("jpeg_quality_factor") > 0
            c_mag = jnp.where(is_jpeg, col("jpeg_quality_factor"),
                              col("jm_qpi"))
        elif has_jpeg:
            is_jpeg = jnp.ones(metadata.shape[0], bool)
            c_mag = col("jpeg_quality_factor")
        else:
            is_jpeg = jnp.zeros(metadata.shape[0], bool)
            c_mag = col("jm_qpi")
        tree.append(_partition_magnitude(c_mag, split))
        if "jm_jpg_compression" in valid_metadata:
            tree.append(jnp.where(is_jpeg, 0, 1))

    if "blur" in valid_metadata:
        tree.append(col("kernel_type").astype(jnp.int32))
        tree.append(_partition_magnitude(col("sigma_x"), 3))
        tree.append(_partition_magnitude(col("sigma_y"), 3))

    labels = jnp.zeros(metadata.shape[0], jnp.int32)
    for d, mag in zip(tree, decision_mags):
        labels = labels + d.astype(jnp.int32) * mag
    return labels


def degradation_vector_size(valid_metadata: Sequence[str]) -> int:
    return 2 * sum(1 for d in valid_metadata
                   if d in ("noise", "compression", "blur"))


def degradation_vectors(metadata: jnp.ndarray, m_map: Dict[str, int],
                        valid_metadata: Sequence[str]) -> jnp.ndarray:
    """Batched vector_retrieval (WeakCon continuous labels): (N, V)."""
    cols: List[jnp.ndarray] = []
    col = lambda name: metadata[:, m_map[name]]
    if "noise" in valid_metadata:
        gauss = col("gaussian_noise_scale")
        is_gauss = gauss > 0
        cols.append(jnp.where(is_gauss, gauss, 0.0))
        cols.append(jnp.where(is_gauss, 0.0, col("poisson_noise_scale")))
    if "compression" in valid_metadata:
        has_jpeg = "jpeg_quality_factor" in m_map
        has_jm = "jm_qpi" in m_map
        if has_jpeg and (not has_jm):
            cols.append(col("jpeg_quality_factor"))
            cols.append(jnp.zeros(metadata.shape[0]))
        elif has_jpeg and has_jm:
            is_jpeg = col("jpeg_quality_factor") > 0
            cols.append(jnp.where(is_jpeg, col("jpeg_quality_factor"), 0.0))
            cols.append(jnp.where(is_jpeg, 0.0, col("jm_qpi")))
        else:
            cols.append(jnp.zeros(metadata.shape[0]))
            cols.append(col("jm_qpi"))
    if "blur" in valid_metadata:
        cols.append(col("sigma_x"))
        cols.append(col("sigma_y"))
    return jnp.stack(cols, axis=1) if cols else jnp.zeros(
        (metadata.shape[0], 0))
