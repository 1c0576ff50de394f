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
                 **specific_noise_params):
        self.normalize_metadata = normalize_metadata
        self.gaussian_poisson_ratio = gaussian_poisson_ratio
        self.poisson_noise_scale_range = tuple(poisson_noise_scale_range)
        self.gaussian_noise_sigma_range = tuple(gaussian_noise_sigma_range)
        self.gray_noise_probability = gray_noise_probability
        self.random_noise = random_noise_generation
        self.specific = specific_noise_params
        self._key = jax.random.PRNGKey(seed)

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"gaussian_poisson_ratio": self.gaussian_poisson_ratio,
                "poisson_noise_scale_range": list(self.poisson_noise_scale_range),
                "gaussian_noise_sigma_range": list(self.gaussian_noise_sigma_range),
                "gray_noise_probability": self.gray_noise_probability}

    def batch_apply(self, key, imgs):
        b = imgs.shape[0]
        k_type, k_apply = jax.random.split(key)
        if self.random_noise:
            use_gauss = (jax.random.uniform(k_type, (b,))
                         < self.gaussian_poisson_ratio)
            g_out, g_meta = noise_ops.add_gaussian_noise(
                k_apply, imgs, self.gaussian_noise_sigma_range,
                self.gray_noise_probability)
            p_out, p_meta = noise_ops.add_poisson_noise(
                k_apply, imgs, self.poisson_noise_scale_range,
                self.gray_noise_probability)
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
            g_out, g_meta = noise_ops.add_gaussian_noise(
                k_apply, imgs, (gs, gs), gray_p)
            p_out, p_meta = noise_ops.add_poisson_noise(
                k_apply, imgs, (ps, ps), gray_p)
        sel = use_gauss[:, None, None, None]
        out = jnp.where(sel, g_out, p_out)
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
        return out, meta

    def __call__(self, image):
        arr, was_pil = to_float_array(image)
        self._key, sub = jax.random.split(self._key)
        out, meta = self.batch_apply(sub, jnp.asarray(arr)[None])
        import numpy as np
        host_meta = {k: float(np.asarray(v[0])) for k, v in meta.items()}
        return from_float_array(np.asarray(out[0]), was_pil), host_meta
