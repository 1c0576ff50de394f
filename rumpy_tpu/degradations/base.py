"""Shared machinery for degradation-pipeline ops.

Each op exposes BOTH interfaces:

  * host path — ``__call__(image) -> (image, metadata)`` on a single PIL
    image / uint8 array, mirroring the reference op contract
    (image_tools/*/__init__.py) for the offline ``image_manipulate`` CLI;
  * device path — ``batch_apply(key, imgs) -> (imgs, metadata)`` on a
    (B, H, W, C) float batch, pure and jittable, composed by
    :func:`rumpy_tpu.degradations.pipeline.fused_degrade` into one fused
    on-device program for online training datagen (the reference ran the
    same ops per-image on CPU inside DataLoader workers — SURVEY.md §3.3).

Host randomness uses global numpy RNG so a single seed reproduces a whole
offline run (matching ``np.random.seed`` in pipeline_prep_and_run); device
randomness is functional via the supplied key.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
from PIL import Image


def to_float_array(image) -> Tuple[np.ndarray, bool]:
    """PIL/uint8 -> (H, W, C) float32 in [0,1]; returns (arr, was_pil)."""
    was_pil = isinstance(image, Image.Image)
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr, was_pil


def from_float_array(arr: np.ndarray, as_pil: bool):
    """[0,1] float -> uint8 (clamped, truncating like torchvision
    ToPILImage's mul(255).byte(), but clamped rather than wrapped on
    out-of-range sinc overshoot — deliberate fix)."""
    u8 = np.clip(np.asarray(arr) * 255.0, 0, 255).astype(np.uint8)
    if as_pil:
        return Image.fromarray(u8.squeeze(-1) if u8.shape[-1] == 1 else u8)
    return u8


def normalize(value, lo, hi):
    return (value - lo) / (hi - lo)


class DegradationOp:
    def get_hyperparams(self) -> Dict[str, Any]:
        raise NotImplementedError

    def __call__(self, image):
        raise NotImplementedError

    def batch_apply(self, key, imgs):
        """Pure jittable batch transform; ops that cannot run on device
        (e.g. external JM binary) raise NotImplementedError and force the
        pipeline down the host path."""
        raise NotImplementedError(
            f"{type(self).__name__} has no on-device implementation")
