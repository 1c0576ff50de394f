"""Image quality metrics (PSNR / SSIM / LPIPS-gated), jit-friendly.

Semantics match the reference's implementations exactly:

  * PSNR — rumpy/sr_tools/metrics.py:33-44: float32 MSE, 20*log10(max/rms),
    and the quirk that mse == 0 returns 100 (not inf).
  * SSIM — metrics.py:123-149 calls skimage.structural_similarity with
    gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
    i.e. truncate=3.5 => win_size 11, scipy 'reflect' (symmetric) padding,
    cov_norm=1, border crop of (win_size-1)//2, channel mean.

Both are implemented in pure jnp so they run on-device inside jitted eval
loops; tests golden-check SSIM against an independent scipy.ndimage
reference (skimage itself is not available in this image).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1, img2, max_value: float = 255.0):
    """PSNR between two arrays of any (matching) shape."""
    a = jnp.asarray(img1, dtype=jnp.float32)
    b = jnp.asarray(img2, dtype=jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    val = 20.0 * jnp.log10(max_value / jnp.sqrt(mse))
    return jnp.where(mse == 0, 100.0, val)


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gaussian_kernel(sigma: float, truncate: float) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d(x, kernel: jnp.ndarray):
    """Separable symmetric-padded ('reflect' in scipy terms) 2-D filtering
    of a (..., H, W) array."""
    r = kernel.shape[0] // 2
    # Along H.
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)], mode="symmetric")
    x = jnp.tensordot(_windows(xp, kernel.shape[0], axis=-2), kernel, axes=[[-1], [0]])
    # Along W.
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)], mode="symmetric")
    x = jnp.tensordot(_windows(xp, kernel.shape[0], axis=-1), kernel, axes=[[-1], [0]])
    return x


def _windows(x, size: int, axis: int):
    """Sliding windows of `size` along `axis`, windows stacked on a new last
    axis. Implemented as stacked slices so XLA turns it into cheap fused
    shifts rather than a gather."""
    axis = axis % x.ndim
    n = x.shape[axis] - size + 1
    slices = []
    for i in range(size):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(i, i + n)
        slices.append(x[tuple(idx)])
    return jnp.stack(slices, axis=-1)


def ssim_single(x, y, data_range: float = 1.0, sigma: float = 1.5,
                truncate: float = 3.5, k1: float = 0.01, k2: float = 0.03):
    """SSIM of two (H, W) single-channel float images."""
    kernel = jnp.asarray(_gaussian_kernel(sigma, truncate))
    win_size = kernel.shape[0]
    pad = (win_size - 1) // 2

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    ux = _filter2d(x, kernel)
    uy = _filter2d(y, kernel)
    uxx = _filter2d(x * x, kernel)
    uyy = _filter2d(y * y, kernel)
    uxy = _filter2d(x * y, kernel)

    # use_sample_covariance=False => cov_norm = 1.
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    return jnp.mean(s[pad:-pad, pad:-pad])


def ssim(x, y, data_range: float = 1.0):
    """SSIM for (H, W), (H, W, C), or (N, H, W, C) channel-last images.
    Channels are scored independently and averaged (skimage multichannel)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 2:
        return ssim_single(x, y, data_range)
    if x.ndim == 3:
        per_c = jax.vmap(lambda a, b: ssim_single(a, b, data_range),
                         in_axes=(-1, -1))(x, y)
        return jnp.mean(per_c)
    if x.ndim == 4:
        return jax.vmap(lambda a, b: ssim(a, b, data_range))(x, y)
    raise ValueError(f"Unsupported ndim {x.ndim}")


# ---------------------------------------------------------------------------
# Face-boundary PSNR (reference metrics.py:78-88, :151-203)
# ---------------------------------------------------------------------------

def load_boundary_data(hr_data_loc: str) -> Dict[str, Dict[str, int]]:
    """Load per-image face bounding boxes from `face_boundaries_0.csv` in
    the HR data dir (reference Metrics.__init__, metrics.py:78-88):
    index = image filename, columns include top/left/height/width; rows
    with NaNs are dropped, then any entry containing a negative value."""
    import os

    import pandas as pd
    df = pd.read_csv(os.path.join(hr_data_loc, "face_boundaries_0.csv"),
                     header=0, index_col=0)
    data = df.dropna().astype(int).to_dict("index")
    return {k: v for k, v in data.items()
            if not any(val < 0 for val in v.values())}


def _boundary_entry(boundary_data: Dict[str, Dict[str, int]], name):
    """Boundary lookup. The reference indexes with `name + '.png'`
    hardcoded (metrics.py:161, its own TODO notes the unsynchronized
    extension) — try that first for parity, then the raw name and a
    stem match, so non-png datasets measure the face box instead of
    silently falling back to whole-image PSNR for every image."""
    import os
    n = str(name)
    entry = boundary_data.get(n + ".png")
    if entry is None:
        entry = boundary_data.get(n)
    if entry is None:
        stem = os.path.splitext(n)[0]
        for k, v in boundary_data.items():
            if os.path.splitext(str(k))[0] == stem:
                return v
    return entry


def _boundary_mask(shape, box) -> np.ndarray:
    """(H, W) 0/1 mask for a top/left/height/width box dict."""
    mask = np.zeros(shape[:2], np.float32)
    mask[box["top"]:box["top"] + box["height"],
         box["left"]:box["left"] + box["width"]] = 1.0
    return mask


def face_psnr(im_a, im_ref, probe_names, boundary_data,
              max_value: float = 1.0) -> List[float]:
    """PSNR with everything outside the face box zeroed in BOTH images
    but the full image area kept in the mean (run_face_PSNR semantics,
    metrics.py:151-177). Inputs: (N, H, W, C) channel-last; scores
    channel 0 (Y for YCbCr inputs) per image. Images without a boundary
    entry are scored whole (crop_area[index] = 1 fallback)."""
    a = np.asarray(im_a, np.float32)
    r = np.asarray(im_ref, np.float32)
    out = []
    for i, name in enumerate(probe_names):
        entry = _boundary_entry(boundary_data, name)
        if entry is not None:
            mask = _boundary_mask(a.shape[1:3], entry)
        else:
            mask = np.ones(a.shape[1:3], np.float32)
        out.append(float(psnr(a[i, :, :, 0] * mask, r[i, :, :, 0] * mask,
                              max_value)))
    return out


def true_face_psnr(im_a, im_ref, probe_names, boundary_data,
                   max_value: float = 1.0) -> List[float]:
    """PSNR computed ONLY over the cropped face region
    (run_true_face_PSNR, metrics.py:179-203)."""
    a = np.asarray(im_a, np.float32)
    r = np.asarray(im_ref, np.float32)
    out = []
    for i, name in enumerate(probe_names):
        entry = _boundary_entry(boundary_data, name)
        if entry is not None:
            t, l = entry["top"], entry["left"]
            h, w = entry["height"], entry["width"]
            fa = a[i, t:t + h, l:l + w, 0]
            fr = r[i, t:t + h, l:l + w, 0]
        else:
            fa, fr = a[i, :, :, 0], r[i, :, :, 0]
        out.append(float(psnr(fa, fr, max_value)))
    return out


# ---------------------------------------------------------------------------
# Metrics hub
# ---------------------------------------------------------------------------

class Metrics:
    """Batch metrics calculator (reference: rumpy/sr_tools/metrics.py:47+).

    Operates on channel-last float images in [0, max_value]. For Y-channel
    models pass single-channel images; the eval hub handles color conversion
    upstream (mirroring the reference, which converts before calling).

    LPIPS requires pretrained AlexNet weights that are not shipped; the
    metric is registered but raises unless a weights file is supplied
    (reference gates LPIPS on an optional package the same way).
    """

    SUPPORTED = ("PSNR", "SSIM", "face_PSNR", "true_face_PSNR")

    def __init__(self, metrics: Sequence[str] = ("PSNR", "SSIM"),
                 delimeter: str = "-", lpips_weights: str | None = None,
                 face_recognizer=None, hr_data_loc: str | None = None):
        self.metrics = list(metrics)
        self.delimeter = delimeter
        self.lpips = None
        self.face_recognizer = face_recognizer
        self.boundary_data = None
        if "face_PSNR" in self.metrics or "true_face_PSNR" in self.metrics:
            # boundary boxes ship next to the HR data
            # (reference metrics.py:78-88)
            if hr_data_loc is None:
                raise KeyError("face_PSNR/true_face_PSNR need hr_data_loc "
                               "(directory containing face_boundaries_0.csv)")
            self.boundary_data = load_boundary_data(hr_data_loc)
        for m in self.metrics:
            if m == "LPIPS":
                from rumpy_tpu.utils.lpips_jax import LPIPS
                self.lpips = LPIPS(lpips_weights)  # raises without weights
            elif m == "FR_rank":
                # face-identification rank (metrics.py:204-222); needs a
                # FaceRecognizer with a registered gallery
                if face_recognizer is None:
                    raise KeyError(
                        "FR_rank requires a face_recognizer (see "
                        "rumpy_tpu.utils.face_recognition.FaceRecognizer)")
            elif m not in self.SUPPORTED:
                raise KeyError(f"Unsupported metric {m}")

    def run_metrics(self, im_a, im_ref, max_value: float = 1.0,
                    key_prefix: str | None = None,
                    probe_names=None, rgb_a=None,
                    rgb_ref=None) -> Dict[str, List[float]]:
        """Per-image metric values for a (N, H, W, C) batch pair.

        PSNR/SSIM score `im_a` vs `im_ref` (typically Y-channel); the
        RGB-domain metrics (LPIPS, FR_rank) use `rgb_a`/`rgb_ref` when
        given — the reference converts YCbCr back to RGB internally for
        these (metrics.py run_image_metric); passing RGB directly avoids
        the double conversion its TODO complains about."""
        im_a = jnp.asarray(im_a, jnp.float32)
        im_ref = jnp.asarray(im_ref, jnp.float32)
        out: Dict[str, List[float]] = {}
        for m in self.metrics:
            if m == "FR_rank":
                if probe_names is None:
                    raise ValueError("Need a probe ID to evaluate face "
                                     "recognition performance.")
                probes = np.asarray(rgb_a if rgb_a is not None else im_a)
                ranks = self.face_recognizer.fr_rank(
                    probes=probes, probe_ids=list(probe_names))
                key = (f"{key_prefix}{self.delimeter}{m}"
                       if key_prefix else m)
                out[key] = [float(r) for r in ranks]
                continue
            if m in ("face_PSNR", "true_face_PSNR"):
                if probe_names is None:
                    raise ValueError("Need probe names to extract face "
                                     "boundaries")
                fn = (face_psnr if m == "face_PSNR" else true_face_psnr)
                vals = fn(im_a, im_ref, list(probe_names),
                          self.boundary_data, max_value)
                key = (f"{key_prefix}{self.delimeter}{m}"
                       if key_prefix else m)
                out[key] = vals
                continue
            if m == "PSNR":
                # vmap over the batch: one device round-trip, not N
                vals = np.asarray(jax.vmap(
                    lambda a, b: psnr(a, b, max_value))(im_a, im_ref)
                ).tolist()
            elif m == "SSIM":
                vals = np.asarray(jax.vmap(
                    lambda a, b: ssim(a, b, max_value))(im_a, im_ref)
                ).tolist()
            elif m == "LPIPS" and self.lpips is not None:
                la = rgb_a if rgb_a is not None else im_a
                lb = rgb_ref if rgb_ref is not None else im_ref
                vals = [float(v) for v in
                        np.asarray(self.lpips(jnp.asarray(la) / max_value,
                                              jnp.asarray(lb) / max_value))]
            else:
                continue
            key = f"{key_prefix}{self.delimeter}{m}" if key_prefix else m
            out[key] = vals
        return out
