"""BT.601 YCbCr <-> RGB conversion, matching the reference's two variants.

The reference (rumpy/image_tools/image_manipulation/image_functions.py:72-171)
implements two BT.601 flavors used throughout data prep and metrics:

  * ``jpg``  — full-range JFIF: Y = 0.299 R + 0.587 G + 0.114 B, chroma
               biased by 128*(max_val/255). This is what Y-channel PSNR uses.
  * ``png``  — studio-swing (16..235 luma): Y = 16 + (65.481R+128.553G+24.966B)/255.

All functions operate channel-last (..., H, W, C) on jnp arrays and are
jit/vmap-friendly; matrices are applied as a single einsum so XLA fuses them
into neighboring ops. A channel-first wrapper is provided for parity tests
against the reference's C,H,W convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Color conversion is parity-critical: force full-precision contraction so
# TPU matmuls don't drop to bfloat16.
_PREC = jax.lax.Precision.HIGHEST

# Forward matrices, rows = (Y, Cb, Cr), cols = (R, G, B).
_JPG_FWD = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312],
], dtype=np.float64)

_PNG_FWD = np.array([
    [65.481, 128.553, 24.966],
    [-37.797, -74.203, 112.0],
    [112.0, -93.786, -18.214],
], dtype=np.float64) / 255.0


def _biases(im_type: str, max_val: float) -> np.ndarray:
    s = max_val / 255.0
    if im_type == "jpg":
        return np.array([0.0, 128.0 * s, 128.0 * s])
    return np.array([16.0 * s, 128.0 * s, 128.0 * s])


def rgb_to_ycbcr(img, y_only: bool = False, max_val: float = 1.0,
                 im_type: str = "png"):
    """RGB -> YCbCr on channel-last input (..., C=3)."""
    fwd = _JPG_FWD if im_type == "jpg" else _PNG_FWD
    bias = _biases(im_type, max_val)
    if y_only:
        m = jnp.asarray(fwd[0], dtype=img.dtype)
        y = jnp.tensordot(img, m, axes=[[-1], [0]],
                          precision=_PREC) + jnp.asarray(bias[0], img.dtype)
        return y[..., None]
    m = jnp.asarray(fwd.T, dtype=img.dtype)
    return jnp.matmul(img, m, precision=_PREC) + jnp.asarray(bias, img.dtype)


def ycbcr_to_rgb(img, max_val: float = 1.0, im_type: str = "png"):
    """YCbCr -> RGB on channel-last input (..., C=3).

    Uses the exact inverse coefficients of the reference
    (image_functions.py:108-132), including the png-mode 298.082/256-style
    fixed constants rather than a matrix inverse, for bit-parity.
    """
    s = max_val / 255.0
    y, cb, cr = img[..., 0], img[..., 1], img[..., 2]
    if im_type == "jpg":
        bias = 128.0 * s
        r = y + 1.402 * cr - 1.402 * bias
        g = y - 0.344136 * cb - 0.714136 * cr + (0.714136 + 0.344136) * bias
        b = y + 1.772 * cb - 1.772 * bias
    else:
        r = 298.082 * y / 256.0 + 408.583 * cr / 256.0 - 222.921 * s
        g = (298.082 * y / 256.0 - 100.291 * cb / 256.0
             - 208.120 * cr / 256.0 + 135.576 * s)
        b = 298.082 * y / 256.0 + 516.412 * cb / 256.0 - 276.836 * s
    return jnp.stack([r, g, b], axis=-1)


def ycbcr_convert(img, y_only: bool = True, max_val: float = 1.0,
                  im_type: str = "png", input: str = "rgb"):
    """Channel-FIRST convenience wrapper mirroring the reference signature
    (image_functions.py:135-171): img is (C, H, W) or (N, C, H, W)."""
    img = jnp.asarray(img)
    squeeze = False
    if img.ndim == 4 and img.shape[0] == 1:
        img = img[0]
        squeeze = False  # reference squeezes batch dim and keeps (C,H,W)
    chl = jnp.moveaxis(img, -3, -1)
    if input == "rgb":
        out = rgb_to_ycbcr(chl, y_only=y_only, max_val=max_val, im_type=im_type)
    else:
        out = ycbcr_to_rgb(chl, max_val=max_val, im_type=im_type)
    out = jnp.moveaxis(out, -1, -3)
    if squeeze:
        out = out[None]
    return out
