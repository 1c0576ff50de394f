"""Noise degradation op (Real-ESRGAN Gaussian/Poisson, gray/color).

Reference: rumpy/image_tools/noise/__init__.py:14-194. Metadata columns:
gaussian_noise_scale / poisson_noise_scale / gray_noise, normalized by
their configured ranges when requested.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from rumpy_tpu.degradations.base import (DegradationOp, from_float_array,
                                         normalize, to_float_array)
from rumpy_tpu.ops import noise as noise_ops
from rumpy_tpu.registry import register_tool


@register_tool("realesrgannoise")
class RealESRGANNoise(DegradationOp):
    def __init__(self, normalize_metadata=True, gaussian_poisson_ratio=0.5,
                 poisson_noise_scale_range=(0, 1.0),
                 gaussian_noise_sigma_range=(0, 1.0),
                 gray_noise_probability=0.4,
                 random_noise_generation=True, seed=0,
                 request_noise_image_pca=False,
                 noise_image_pca_length=100,
                 pca_patch_size=64,
                 pca_batch_len=500,
                 load_pca_matrix=None,
                 **specific_noise_params):
        self.normalize_metadata = normalize_metadata
        self.gaussian_poisson_ratio = gaussian_poisson_ratio
        self.poisson_noise_scale_range = tuple(poisson_noise_scale_range)
        self.gaussian_noise_sigma_range = tuple(gaussian_noise_sigma_range)
        self.gray_noise_probability = gray_noise_probability
        self.random_noise = random_noise_generation
        self.specific = specific_noise_params
        self._key = jax.random.PRNGKey(seed)
        # Noise-image PCA option (reference noise/__init__.py:23-28,
        # :74-101, :191-195 — marked "not fully tested" there; its
        # __call__ even references a deleted tensor). Here the encoding
        # is functional: the pre-clip scaled noise field is center-
        # cropped to pca_patch_size and projected onto a basis fit from
        # pca_batch_len generated noise fields (half Gaussian, half
        # Poisson-on-blank — faithfully zero, as in the reference).
        self.request_noise_image_pca = request_noise_image_pca
        self.pca_patch_size = pca_patch_size
        self.pca_encoder = None
        if request_noise_image_pca:
            from rumpy_tpu.degradations import pca as pca_mod
            if load_pca_matrix:
                self.pca_encoder = pca_mod.read_pca_matrix(load_pca_matrix)
            else:
                self._key, kg, kp = jax.random.split(self._key, 3)
                blank = jnp.zeros((pca_batch_len // 2, pca_patch_size,
                                   pca_patch_size, 3), jnp.float32)
                _, _, n_gauss = noise_ops.add_gaussian_noise(
                    kg, blank, self.gaussian_noise_sigma_range,
                    self.gray_noise_probability, return_noise=True)
                _, _, n_poiss = noise_ops.add_poisson_noise(
                    kp, blank, self.poisson_noise_scale_range,
                    self.gray_noise_probability, return_noise=True)
                samples = jnp.concatenate([n_gauss, n_poiss])
                # 2*(pca_batch_len//2) rows — derive the row count from
                # the data so an odd pca_batch_len cannot break the
                # reshape
                samples = samples.reshape((samples.shape[0], -1))
                self.pca_encoder = pca_mod.PCAEncoder(
                    pca_mod.fit_pca(samples, k=noise_image_pca_length))

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"gaussian_poisson_ratio": self.gaussian_poisson_ratio,
                "poisson_noise_scale_range": list(self.poisson_noise_scale_range),
                "gaussian_noise_sigma_range": list(self.gaussian_noise_sigma_range),
                "gray_noise_probability": self.gray_noise_probability}

    def batch_apply(self, key, imgs):
        out, meta, _ = self._batch_apply_noise(key, imgs)
        return out, meta

    def _batch_apply_noise(self, key, imgs):
        b = imgs.shape[0]
        k_type, k_apply = jax.random.split(key)
        if self.random_noise:
            use_gauss = (jax.random.uniform(k_type, (b,))
                         < self.gaussian_poisson_ratio)
            g_out, g_meta, g_noise = noise_ops.add_gaussian_noise(
                k_apply, imgs, self.gaussian_noise_sigma_range,
                self.gray_noise_probability, return_noise=True)
            p_out, p_meta, p_noise = noise_ops.add_poisson_noise(
                k_apply, imgs, self.poisson_noise_scale_range,
                self.gray_noise_probability, return_noise=True)
        else:
            # reference non-random selection (noise/__init__.py:129-152):
            # value-based — the type whose scale is > 0; when BOTH are
            # positive the type is drawn from gaussian_poisson_ratio
            gs = float(self.specific.get("gaussian_noise_scale") or 0.0)
            ps = float(self.specific.get("poisson_noise_scale") or 0.0)
            if gs > 0 and ps > 0:
                use_gauss = (jax.random.uniform(k_type, (b,))
                             < self.gaussian_poisson_ratio)
            else:
                use_gauss = jnp.full((b,), gs > 0)
            gray = self.specific.get("gray_noise")
            if gray is None:
                # reference quirk kept: gray_noise = 0.0 when
                # rand < gray_noise_probability, i.e. gray applied with
                # probability 1 - p (inverted vs the random path)
                gray_p = 1.0 - self.gray_noise_probability
            else:
                if float(gray) not in (0.0, 1.0):
                    raise RuntimeError(
                        "gray noise must be 1 or 0, not in between.")
                gray_p = float(gray)
            g_out, g_meta, g_noise = noise_ops.add_gaussian_noise(
                k_apply, imgs, (gs, gs), gray_p, return_noise=True)
            p_out, p_meta, p_noise = noise_ops.add_poisson_noise(
                k_apply, imgs, (ps, ps), gray_p, return_noise=True)
        sel = use_gauss[:, None, None, None]
        out = jnp.where(sel, g_out, p_out)
        noise = jnp.where(sel, g_noise, p_noise)
        meta = {
            "gaussian_noise_scale": jnp.where(
                use_gauss, g_meta["gaussian_noise_scale"], 0.0),
            "poisson_noise_scale": jnp.where(
                use_gauss, 0.0, p_meta["poisson_noise_scale"]),
            "gray_noise": jnp.where(use_gauss, g_meta["gray_noise"],
                                    p_meta["gray_noise"]),
        }
        if self.normalize_metadata:
            lo_g, hi_g = self.gaussian_noise_sigma_range
            lo_p, hi_p = self.poisson_noise_scale_range
            if hi_g > lo_g:
                meta["gaussian_noise_scale"] = jnp.where(
                    use_gauss,
                    normalize(meta["gaussian_noise_scale"], lo_g, hi_g), 0.0)
            if hi_p > lo_p:
                meta["poisson_noise_scale"] = jnp.where(
                    use_gauss, 0.0,
                    normalize(meta["poisson_noise_scale"], lo_p, hi_p))
        return out, meta, noise

    def _center_crop_noise(self, noise):
        """CenterCrop(pca_patch_size) with zero padding for small images
        (torchvision CenterCrop semantics used at noise/__init__.py:99)."""
        h, w = noise.shape[1:3]
        s = self.pca_patch_size
        if h < s or w < s:
            ph, pw = max(0, s - h), max(0, s - w)
            noise = jnp.pad(noise, ((0, 0),
                                    (ph // 2, ph - ph // 2),
                                    (pw // 2, pw - pw // 2), (0, 0)))
            h, w = noise.shape[1:3]
        top, left = (h - s) // 2, (w - s) // 2
        return noise[:, top:top + s, left:left + s, :]

    def __call__(self, image):
        arr, was_pil = to_float_array(image)
        self._key, sub = jax.random.split(self._key)
        out, meta, noise = self._batch_apply_noise(sub,
                                                   jnp.asarray(arr)[None])
        import numpy as np
        host_meta = {k: float(np.asarray(v[0])) for k, v in meta.items()}
        if self.pca_encoder is not None:
            crop = self._center_crop_noise(noise)
            enc = self.pca_encoder(crop.reshape((1, -1)))
            host_meta["pca_noise"] = np.asarray(enc[0]).tolist()
        return from_float_array(np.asarray(out[0]), was_pil), host_meta
