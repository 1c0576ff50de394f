"""Downsample / Upsample pipeline ops.

Reference: rumpy/image_tools/image_manipulation/__init__.py:6-108 —
PIL-bicubic resize with HR pre-crop to a scale multiple (JM even-dimension
correction when JM compression is downstream), random-scale option, and a
normalized `scale` metadata column.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rumpy_tpu.degradations.base import DegradationOp, normalize, to_float_array
from rumpy_tpu.ops import resize as resize_ops
from rumpy_tpu.registry import register_tool


def center_crop_np(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - height) // 2
    left = (w - width) // 2
    return arr[top:top + height, left:left + width]


def downsample_pair(image, scale: int, jm: bool = False):
    """(HR cropped to scale multiple, LR bicubic) — image_functions.py:13-35."""
    arr, was_pil = to_float_array(image)
    h, w = arr.shape[:2]
    if jm:
        cw = (math.floor(w / scale) // 2) * 2
        ch = (math.floor(h / scale) // 2) * 2
    else:
        cw = math.floor(w / scale)
        ch = math.floor(h / scale)
    rh, rw = ch * scale, cw * scale
    u8 = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    hr = center_crop_np(u8, rh, rw)
    lr = np.asarray(resize_ops.pil_resize(hr, (ch, cw)))
    if was_pil:
        return Image.fromarray(hr), Image.fromarray(lr)
    return hr, lr


@register_tool("downsample")
class Downsample(DegradationOp):
    def __init__(self, scale=4, jm=False, random_scale=False,
                 scale_range=(2, 8), normalize_metadata=True,
                 restrict_metadata=False, seed=0):
        self.scale = scale
        self.jm = jm
        self.random_scale = random_scale
        self.scale_range = tuple(scale_range)
        self.normalize_metadata = normalize_metadata
        self.restrict_metadata = restrict_metadata
        self._rng = np.random.default_rng(seed)

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"min_scale": self.scale_range[0],
                "max_scale": self.scale_range[1]}

    def _norm(self, s):
        return (normalize(s, *self.scale_range)
                if self.normalize_metadata else s)

    def __call__(self, image):
        scale = (int(self._rng.integers(self.scale_range[0],
                                       self.scale_range[1] + 1))
                 if self.random_scale else self.scale)
        _, lr = downsample_pair(image, scale, jm=self.jm)
        meta = {} if self.restrict_metadata else {"scale": self._norm(scale)}
        return lr, meta

    def batch_apply(self, key, imgs):
        """Device path: fixed scale only (random scale changes output shape,
        which XLA cannot trace); antialiased PIL-kernel float resize."""
        if self.random_scale:
            raise NotImplementedError(
                "random_scale produces dynamic shapes; use the host path")
        b, h, w, c = imgs.shape
        out = resize_ops.resize_float(imgs, (h // self.scale, w // self.scale))
        if self.restrict_metadata:
            return out, {}
        return out, {"scale": jnp.full((b,), float(self._norm(self.scale)))}


@register_tool("upsample")
class Upsample(DegradationOp):
    def __init__(self, scale=4, random_scale=False, scale_range=(2, 8),
                 normalize_metadata=True, seed=0):
        self.scale = scale
        self.random_scale = random_scale
        self.scale_range = tuple(scale_range)
        self.normalize_metadata = normalize_metadata
        self._rng = np.random.default_rng(seed)

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"min_scale": self.scale_range[0],
                "max_scale": self.scale_range[1]}

    def _norm(self, s):
        return (normalize(s, *self.scale_range)
                if self.normalize_metadata else s)

    def __call__(self, image):
        scale = (int(self._rng.integers(self.scale_range[0],
                                       self.scale_range[1] + 1))
                 if self.random_scale else self.scale)
        arr, was_pil = to_float_array(image)
        u8 = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
        h, w = u8.shape[:2]
        up = np.asarray(resize_ops.pil_resize(u8, (h * scale, w * scale)))
        out = Image.fromarray(up) if was_pil else up
        return out, {"scale": self._norm(scale)}

    def batch_apply(self, key, imgs):
        if self.random_scale:
            raise NotImplementedError(
                "random_scale produces dynamic shapes; use the host path")
        b, h, w, c = imgs.shape
        out = resize_ops.resize_float(imgs, (h * self.scale, w * self.scale))
        return out, {"scale": jnp.full((b,), float(self._norm(self.scale)))}
