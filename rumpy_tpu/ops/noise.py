"""On-device Gaussian / Poisson noise injection (Real-ESRGAN style).

Reference: rumpy/image_tools/noise/real_esrgan_noise.py. Parity notes:

  * Gaussian: noise = N(0,1) * sigma/255 per example; gray noise is a
    single-channel field broadcast over RGB. The reference's batched torch
    path applies gray noise to the whole batch if *any* example drew it
    (real_esrgan_noise.py:76-82 `cal_gray_noise = sum > 0`); here the
    per-example gray mask blends correctly — deliberate bug-fix.
  * Poisson: rate = img * vals with vals = 2^ceil(log2(#unique levels of
    the 0..255-rounded image)) (:300-330). #unique is computed with a
    jit-friendly 256-bin occupancy count instead of torch.unique.
  * Output convention matches `clip=True, rounds=False`: clip to [0,1].

Metadata contract: per-example gaussian_noise_scale / gray_noise /
poisson_noise_scale columns, as written to degradation_metadata.csv.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _luma(img):
    # ITU-R BT.601 luma as used by rgb_to_grayscale.
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def add_gaussian_noise(key: jax.Array, img: jnp.ndarray,
                       sigma_range: Tuple[float, float] = (0.0, 10.0),
                       gray_prob: float = 0.0, clip: bool = True,
                       return_noise: bool = False):
    """img: (B, H, W, C) in [0,1]. sigma in 0..255 units.

    With ``return_noise`` also returns the scaled noise field (the third
    return of the reference's random_add_gaussian_noise_pt,
    real_esrgan_noise.py:140-149) for the noise-image PCA option."""
    b, h, w, c = img.shape
    k_sig, k_gray, k_noise = jax.random.split(key, 3)
    sigma = jax.random.uniform(k_sig, (b,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(img.dtype)
    noise = jax.random.normal(k_noise, img.shape, img.dtype)
    noise_gray = noise[..., :1]
    scale = (sigma / 255.0)[:, None, None, None]
    g = gray[:, None, None, None]
    scaled = scale * (g * noise_gray + (1.0 - g) * noise)
    out = img + scaled
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    meta = {"gaussian_noise_scale": sigma, "gray_noise": gray,
            "poisson_noise_scale": jnp.zeros((b,))}
    if return_noise:
        return out, meta, scaled
    return out, meta


def _poisson_vals(img: jnp.ndarray) -> jnp.ndarray:
    """vals = 2^ceil(log2(#unique levels)) per example, via 256-bin
    occupancy of the rounded 0..255 image."""
    b = img.shape[0]
    levels = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    flat = levels.reshape(b, -1)
    occupancy = jax.vmap(
        lambda v: jnp.zeros((256,), jnp.int32).at[v].add(1))(flat)
    nuniq = jnp.sum(occupancy > 0, axis=-1).astype(jnp.float32)
    return jnp.exp2(jnp.ceil(jnp.log2(nuniq)))


def add_poisson_noise(key: jax.Array, img: jnp.ndarray,
                      scale_range: Tuple[float, float] = (0.0, 1.0),
                      gray_prob: float = 0.0, clip: bool = True,
                      return_noise: bool = False):
    b = img.shape[0]
    k_scale, k_gray, k_poisson = jax.random.split(key, 3)
    scale = jax.random.uniform(k_scale, (b,), minval=scale_range[0],
                               maxval=scale_range[1])
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(img.dtype)

    rounded = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    gray_img = jnp.clip(jnp.round(_luma(img) * 255.0), 0, 255) / 255.0

    vals_c = _poisson_vals(rounded)[:, None, None, None]
    vals_g = _poisson_vals(gray_img)[:, None, None, None]

    noise_c = (jax.random.poisson(k_poisson, rounded * vals_c).astype(img.dtype)
               / vals_c) - rounded
    noise_g = (jax.random.poisson(k_poisson, gray_img * vals_g).astype(img.dtype)
               / vals_g) - gray_img

    g = gray[:, None, None, None]
    noise = g * noise_g + (1.0 - g) * noise_c
    scaled = scale[:, None, None, None] * noise
    out = img + scaled
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    meta = {"poisson_noise_scale": scale, "gray_noise": gray,
            "gaussian_noise_scale": jnp.zeros((b,))}
    if return_noise:
        return out, meta, scaled
    return out, meta
