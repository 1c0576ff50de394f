"""On-device JPEG (and H.264-intra-style) compression simulation.

The reference compresses LR images through PIL/libjpeg
(compression_utils.py:16-21, quality 10-95, subsampling=0) or the JM H.264
reference encoder run as a subprocess with pure-intra settings
(IntraPeriod=1, qpi 20-51; compression/__init__.py:52-85). Neither runs
on-device; both serialize training through the CPU.

Here the codec pipeline — color transform, 8x8 block DCT, quality-scaled
quantization, dequantization, inverse DCT — is expressed as batched jnp
matmuls so compression artifacts are synthesized inside the jitted input
step, with a *per-example* quality factor.

Parity notes:
  * Quantization tables and quality scaling follow ITU-T T.81 Annex K and
    libjpeg's `jpeg_quality_scaling` (5000/q below 50, 200-2q above).
  * 4:4:4 (subsampling=0), matching the reference's PIL call.
  * libjpeg's integer DCT introduces its own rounding; this float DCT is a
    close approximation, not bit-exact libjpeg. Offline datagen that needs
    bit parity uses the host-side PIL op (degradations/compression.py).
  * The H.264-intra approximation reuses the same machinery with a flat
    quantization matrix whose step follows Qstep(QP) = 0.625*2^((QP-4)/6) —
    the JM metadata contract (`qpi` column) is preserved. Documented
    distribution shift vs the real JM binary.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.utils.color import rgb_to_ycbcr, ycbcr_to_rgb

# ITU-T T.81 Annex K quantization tables.
LUMA_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

CHROMA_QTABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float32)


@functools.lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    d = np.zeros((8, 8), dtype=np.float64)
    for i in range(8):
        c = np.sqrt(1 / 8) if i == 0 else np.sqrt(2 / 8)
        for j in range(8):
            d[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16)
    return d.astype(np.float32)


def quality_to_scale(quality):
    """libjpeg jpeg_quality_scaling."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - 2.0 * quality)


def scaled_qtable(base: np.ndarray, quality) -> jnp.ndarray:
    """Per-example (B, 8, 8) scaled quantization table."""
    scale = quality_to_scale(quality)[:, None, None]
    t = jnp.floor((jnp.asarray(base)[None] * scale + 50.0) / 100.0)
    return jnp.clip(t, 1.0, 255.0)


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H/8, W/8, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4)

def _from_blocks(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _quantize_channel(chan: jnp.ndarray, qtab: jnp.ndarray) -> jnp.ndarray:
    """DCT -> quantize -> dequantize -> IDCT on a (B, H, W) plane with
    per-example (B, 8, 8) tables. Levels are centered at 0 (input -128)."""
    b, h, w = chan.shape
    d = jnp.asarray(_dct_matrix())
    blocks = _to_blocks(chan)
    prec = jax.lax.Precision.HIGHEST
    coeff = jnp.einsum("ij,bnmjk,lk->bnmil", d, blocks, d, precision=prec)
    q = qtab[:, None, None]
    coeff = jnp.round(coeff / q) * q
    rec = jnp.einsum("ji,bnmjk,kl->bnmil", d, coeff, d, precision=prec)
    return _from_blocks(rec, h, w)


def _pad_to_blocks(img: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
    b, h, w, c = img.shape
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return img, h, w


@jax.jit
def jpeg_compress(img: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """Simulate JPEG round-trip. img (B,H,W,3) in [0,1]; quality (B,) in
    1..100. Returns same shape, clipped to [0,1]."""
    img, h, w = _pad_to_blocks(img)
    x = img * 255.0
    ycc = rgb_to_ycbcr(x, max_val=255.0, im_type="jpg") - 128.0
    ql = scaled_qtable(LUMA_QTABLE, quality)
    qc = scaled_qtable(CHROMA_QTABLE, quality)
    planes = []
    for ch in range(3):
        qt = ql if ch == 0 else qc
        planes.append(_quantize_channel(ycc[..., ch], qt))
    ycc_rec = jnp.stack(planes, axis=-1) + 128.0
    rgb = ycbcr_to_rgb(ycc_rec, max_val=255.0, im_type="jpg")
    rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]


def h264_qstep(qpi):
    """H.264 quantization step: doubles every 6 QP (Qstep(4)=1.0 ref pts)."""
    qpi = jnp.asarray(qpi, jnp.float32)
    return 0.625 * jnp.exp2(qpi / 6.0)


@jax.jit
def h264_intra_compress(img: jnp.ndarray, qpi: jnp.ndarray) -> jnp.ndarray:
    """JM-style intra-frame compression *approximation*: same block-DCT
    pipeline with a flat quantization step derived from QP. Preserves the
    reference's `qpi` metadata semantics (20..51); artifact distribution
    approximates, not replicates, the JM binary (SURVEY.md §7 hard part 3)."""
    img, h, w = _pad_to_blocks(img)
    x = img * 255.0
    ycc = rgb_to_ycbcr(x, max_val=255.0, im_type="jpg") - 128.0
    step = h264_qstep(qpi)[:, None, None]
    flat = jnp.ones((1, 8, 8), jnp.float32) * step
    planes = [_quantize_channel(ycc[..., ch], flat) for ch in range(3)]
    ycc_rec = jnp.stack(planes, axis=-1) + 128.0
    rgb = ycbcr_to_rgb(ycc_rec, max_val=255.0, im_type="jpg")
    rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]
