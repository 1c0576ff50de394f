"""PIL-compatible separable resampling as TPU matmuls.

PSNR parity with the reference hinges on bit-level-close LR generation: the
reference produces LR images with ``PIL.Image.resize(..., BICUBIC)``
(rumpy/image_tools/image_manipulation/image_functions.py:13-41), i.e.
Pillow's antialiased, fixed-point (INT32, 22 fractional bits) separable
resampler — which ``jax.image.resize`` does NOT match.

This module re-derives Pillow's algorithm:

  * coefficient precompute per output pixel (support scaled by the
    downscale factor => antialiasing), normalized, then quantized to
    round-half-away-from-zero 22-bit fixed point exactly as Pillow's
    ``normalize_coeffs_8bpc`` does;
  * horizontal pass then vertical pass, each clipping to uint8 via
    ``clip8(floor(acc + 0.5))``.

Rather than Pillow's per-pixel gather loops, each pass is expressed as a
dense (out_size, in_size) matrix multiply — banded-sparse in theory, but a
dense matmul rides the MXU and makes batched resizing of thousands of
patches essentially free on TPU. Coefficient matrices are cached per
(in_size, out_size, filter).

Float products are exact to ~2^-24 relative, so <0.03% of pixels can differ
by ±1 from Pillow at .5-rounding boundaries — verified far below the 0.01 dB
parity budget (see tests/test_resize.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION_BITS = 32 - 8 - 2  # Pillow's fixed-point fraction bits for 8bpc


# ---------------------------------------------------------------------------
# Filter definitions (support, kernel fn) — Pillow Resample.c equivalents.
# ---------------------------------------------------------------------------

def _bicubic(x: np.ndarray) -> np.ndarray:
    # Keys cubic with a = -0.5 (Pillow's BICUBIC).
    a = -0.5
    x = np.abs(x)
    out = np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


def _bilinear(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _sinc(x: np.ndarray) -> np.ndarray:
    return np.where(x == 0.0, 1.0, np.sinc(x))


def _lanczos(x: np.ndarray) -> np.ndarray:
    return np.where(np.abs(x) < 3.0, _sinc(x) * _sinc(x / 3.0), 0.0)


def _box(x: np.ndarray) -> np.ndarray:
    return np.where((x > -0.5) | np.isclose(x, -0.5), np.where(x <= 0.5, 1.0, 0.0), 0.0)


def _hamming(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    out = np.where(x == 0.0, 1.0,
                   (0.54 + 0.46 * np.cos(np.pi * np.clip(x, 1e-12, None)))
                   * _sinc(np.clip(x, 1e-12, None)))
    return np.where(x >= 1.0, 0.0, out)


FILTERS = {
    "bicubic": (2.0, _bicubic),
    "bilinear": (1.0, _bilinear),
    "lanczos": (3.0, _lanczos),
    "box": (0.5, _box),
    "hamming": (1.0, _hamming),
}


# ---------------------------------------------------------------------------
# Coefficient precompute (Pillow precompute_coeffs equivalent, vectorized)
# ---------------------------------------------------------------------------

def _precompute_coeffs(in_size: int, out_size: int, filter: str) -> np.ndarray:
    """Dense float64 (out_size, in_size) row-normalized coefficient matrix."""
    support0, fn = FILTERS[filter]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ss = 1.0 / filterscale

    W = np.zeros((out_size, in_size), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        x = np.arange(xmin, xmax, dtype=np.float64)
        w = fn((x - center + 0.5) * ss)
        total = w.sum()
        if total != 0.0:
            w = w / total
        W[xx, xmin:xmax] = w
    return W


def _quantize_coeffs(W: np.ndarray) -> np.ndarray:
    """Pillow normalize_coeffs_8bpc: round-half-away-from-zero to 22-bit
    fixed point, returned as exact float32 multiples of 2**-22."""
    k = np.where(W < 0,
                 np.ceil(W * (1 << _PRECISION_BITS) - 0.5),
                 np.floor(W * (1 << _PRECISION_BITS) + 0.5))
    return (k / (1 << _PRECISION_BITS)).astype(np.float32)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, filter: str = "bicubic",
                  quantized: bool = True) -> np.ndarray:
    W = _precompute_coeffs(in_size, out_size, filter)
    return _quantize_coeffs(W) if quantized else W.astype(np.float32)


# ---------------------------------------------------------------------------
# Resize ops
# ---------------------------------------------------------------------------

def _clip8(acc):
    # clip8(floor(acc + 0.5)) on float accumulators.
    return jnp.clip(jnp.floor(acc + 0.5), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "filter"))
def _pil_resize_u8(img, out_h: int, out_w: int, filter: str):
    in_h, in_w = img.shape[-3], img.shape[-2]
    Wh = jnp.asarray(resize_matrix(in_w, out_w, filter))
    Wv = jnp.asarray(resize_matrix(in_h, out_h, filter))
    x = img.astype(jnp.float32)
    # Horizontal pass, then uint8 quantization (matches Pillow pass order).
    x = jnp.einsum("...hwc,ow->...hoc", x, Wh,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = _clip8(x)
    # Vertical pass.
    x = jnp.einsum("...hwc,oh->...owc", x, Wv,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = _clip8(x)
    return x.astype(jnp.uint8)


def pil_resize(img, size, filter: str = "bicubic"):
    """Bit-faithful PIL.Image.resize for uint8 channel-last images.

    :param img: (H, W, C) or (N, H, W, C) uint8 array.
    :param size: (out_h, out_w).
    :param filter: one of 'bicubic', 'bilinear', 'lanczos', 'box', 'hamming'.
    """
    img = jnp.asarray(img)
    if img.dtype != jnp.uint8:
        raise TypeError("pil_resize expects uint8 input; use resize_float "
                        "for float images")
    out_h, out_w = size
    return _pil_resize_u8(img, out_h, out_w, filter)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "filter", "antialias"))
def _resize_f(img, out_h: int, out_w: int, filter: str, antialias: bool):
    in_h, in_w = img.shape[-3], img.shape[-2]
    if antialias:
        Wh = jnp.asarray(resize_matrix(in_w, out_w, filter, quantized=False),
                         dtype=img.dtype)
        Wv = jnp.asarray(resize_matrix(in_h, out_h, filter, quantized=False),
                         dtype=img.dtype)
    else:
        # Unscaled-support kernels (align with torch/OpenCV non-AA behavior).
        Wh = jnp.asarray(_unscaled_matrix(in_w, out_w, filter), dtype=img.dtype)
        Wv = jnp.asarray(_unscaled_matrix(in_h, out_h, filter), dtype=img.dtype)
    x = jnp.einsum("...hwc,ow->...hoc", img, Wh,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("...hwc,oh->...owc", x, Wv,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return x


@functools.lru_cache(maxsize=256)
def _unscaled_matrix(in_size: int, out_size: int, filter: str) -> np.ndarray:
    support0, fn = FILTERS[filter]
    scale = in_size / out_size
    W = np.zeros((out_size, in_size), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = max(int(math.floor(center - support0)), 0)
        xmax = min(int(math.ceil(center + support0)) + 1, in_size)
        x = np.arange(xmin, xmax, dtype=np.float64)
        w = fn(x - center + 0.5)
        total = w.sum()
        if total != 0.0:
            w = w / total
        W[xx, xmin:xmax] = w
    return W.astype(np.float32)


def resize_float(img, size, filter: str = "bicubic", antialias: bool = True):
    """Differentiable float resize with PIL kernel semantics (no uint8
    quantization). Channel-last (..., H, W, C). Used on-device inside the
    degradation pipeline where images stay float end-to-end."""
    out_h, out_w = size
    return _resize_f(jnp.asarray(img), out_h, out_w, filter, antialias)
