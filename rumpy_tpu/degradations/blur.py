"""Blur degradation ops (Real-ESRGAN and SRMD/IKC families).

Reference: rumpy/image_tools/blur/__init__.py. Kernel math lives in
rumpy_tpu.ops.blur_kernels (batched jnp); application in
rumpy_tpu.ops.blur (grouped depthwise conv).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.config.constants import blur_kernel_codes
from rumpy_tpu.degradations import pca as pca_mod
from rumpy_tpu.degradations.base import (DegradationOp, from_float_array,
                                         normalize, to_float_array)
from rumpy_tpu.ops import blur as blur_ops
from rumpy_tpu.ops import blur_kernels as bk
from rumpy_tpu.registry import register_tool


class _BlurBase(DegradationOp):
    """PCA / full-kernel / kernel-metadata request plumbing shared by blur
    systems (reference Blur base, blur/__init__.py:39-105)."""

    def __init__(self, kernel_size=21, request_full_kernels=False,
                 normalize_metadata=True, request_pca_kernels=False,
                 load_pca_matrix=None, pca_batch_len=30000, pca_length=10,
                 request_kernel_metadata=False, pca_seed=0):
        self.kernel_size = kernel_size
        self.request_full_kernels = request_full_kernels
        self.normalize_metadata = normalize_metadata
        self.request_pca_kernels = request_pca_kernels
        self.request_kernel_metadata = request_kernel_metadata
        self.pca_encoder: Optional[pca_mod.PCAEncoder] = None
        if request_pca_kernels:
            if load_pca_matrix:
                self.pca_encoder = pca_mod.read_pca_matrix(load_pca_matrix)
            else:
                self.pca_encoder = pca_mod.fit_kernel_pca(
                    self._pca_sample_fn(), batch_len=pca_batch_len,
                    k=pca_length, seed=pca_seed)

    def _pca_sample_fn(self):
        raise NotImplementedError

    def save_pca_matrix(self, location: str) -> None:
        import os
        if self.pca_encoder is not None:
            self.pca_encoder.save(
                os.path.join(location,
                             f"{type(self).__name__}_pca_matrix.npz"))

    def _kernel_extras(self, kernels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """full-kernel / PCA-kernel metadata for a (B, k, k) batch."""
        out: Dict[str, jnp.ndarray] = {}
        flat = kernels.reshape(kernels.shape[0], -1)
        if self.request_full_kernels:
            out["unmodified_blur_kernel"] = flat
        if self.pca_encoder is not None:
            out["blur_kernel"] = self.pca_encoder(flat)
        return out

    def _host_call(self, image, key):
        arr, was_pil = to_float_array(image)
        imgs = jnp.asarray(arr)[None]
        out, meta = self.batch_apply(key, imgs)
        out_img = from_float_array(np.asarray(out[0]), was_pil)
        host_meta = {}
        for k, v in meta.items():
            v = np.asarray(v[0])
            host_meta[k] = v.tolist() if v.ndim else float(v)
        return out_img, host_meta


@register_tool("realesrganblur")
class RealESRGANBlur(_BlurBase):
    """Seven-family Real-ESRGAN blur (blur/__init__.py:108-309)."""

    def __init__(self, kernel_range=("iso",), kernel_probabilities=None,
                 semi_random_selection=False, sigma_x_range=(0.6, 5),
                 sigma_y_range=(0.6, 5),
                 rotation_range=(-math.pi, math.pi), betag_range=(0.5, 8),
                 betap_range=(0.5, 8), noise_range=None,
                 random_selection=True, selected_kernel=None,
                 use_kernel_code=True, seed=0, **kwargs):
        if random_selection and semi_random_selection:
            raise RuntimeError("Both random and semi random modes cannot be "
                               "on simultaneously.")
        if not random_selection and selected_kernel is None:
            raise RuntimeError("Need to specify requested kernel if not "
                               "using random selection.")
        self.random_selection = random_selection
        self.selected_kernel = selected_kernel
        self.specific_params = {k: v for k, v in kwargs.items()
                                if k in ("sigma_x", "sigma_y", "rotation",
                                         "beta_g", "beta_p", "omega_c")}
        kr = (tuple(kernel_range) if kernel_range != "all"
              else bk.ALL_KERNEL_TYPES)
        if not random_selection:
            kr = (selected_kernel,)
        self.cfg = bk.BlurKernelConfig(
            kernel_size=kwargs.get("kernel_size", 21), kernel_range=kr,
            kernel_probabilities=tuple(kernel_probabilities)
            if kernel_probabilities else None,
            sigma_x_range=tuple(sigma_x_range),
            sigma_y_range=tuple(sigma_y_range),
            rotation_range=tuple(rotation_range),
            betag_range=tuple(betag_range), betap_range=tuple(betap_range),
            noise_range=tuple(noise_range) if noise_range else None)
        self.use_kernel_code = use_kernel_code
        self._key = jax.random.PRNGKey(seed)
        super().__init__(kernel_size=kwargs.get("kernel_size", 21),
                         **{k: v for k, v in kwargs.items()
                            if k in ("request_full_kernels",
                                     "normalize_metadata",
                                     "request_pca_kernels", "load_pca_matrix",
                                     "pca_batch_len", "pca_length",
                                     "request_kernel_metadata", "pca_seed")})

    def _pca_sample_fn(self):
        return lambda key, n: bk.sample_kernels(key, n, self.cfg)[0]

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"blur_type": "real_esrgan",
                "kernel_size": self.cfg.kernel_size,
                "kernel_type_range": list(self.cfg.kernel_range),
                "kernel_probabilities": self.cfg.kernel_probabilities,
                "sigma_x_range": list(self.cfg.sigma_x_range),
                "sigma_y_range": list(self.cfg.sigma_y_range),
                "rotation_range": list(self.cfg.rotation_range),
                "beta_g_range": list(self.cfg.betag_range),
                "beta_p_range": list(self.cfg.betap_range),
                "noise_range": self.cfg.noise_range}

    def batch_apply(self, key, imgs):
        b = imgs.shape[0]
        if self.random_selection or not self.specific_params:
            kernels, meta = bk.sample_kernels(key, b, self.cfg)
        else:
            # Fixed-parameter kernel (select_specific_kernel parity).
            p = self.specific_params
            ks = self.cfg.kernel_size
            sx = jnp.full((b,), p.get("sigma_x", 1.0))
            sy = jnp.full((b,), p.get("sigma_y", p.get("sigma_x", 1.0)))
            th = jnp.full((b,), p.get("rotation", 0.0))
            name = self.selected_kernel
            if name in ("iso", "aniso"):
                kernels = bk.gaussian_kernels(ks, sx, sy, th)
            elif name in ("generalized_iso", "generalized_aniso"):
                kernels = bk.generalized_gaussian_kernels(
                    ks, sx, sy, th, jnp.full((b,), p.get("beta_g", 1.0)))
            elif name in ("plateau_iso", "plateau_aniso"):
                kernels = bk.plateau_kernels(
                    ks, sx, sy, th, jnp.full((b,), p.get("beta_p", 1.0)))
            elif name == "sinc":
                kernels = bk.sinc_kernels(
                    ks, jnp.full((b,), p.get("omega_c", math.pi / 2)))
            else:
                raise RuntimeError(f"Blur type {name} not recognized")
            z = jnp.zeros((b,))
            meta = {"sigma_x": sx, "sigma_y": sy, "rotation": th,
                    "beta_g": jnp.full((b,), p.get("beta_g", 0.0)),
                    "beta_p": jnp.full((b,), p.get("beta_p", 0.0)),
                    "omega_c": jnp.full((b,), p.get("omega_c", 0.0)),
                    "kernel_type": jnp.full(
                        (b,), float(blur_kernel_codes[name])),
                    "kernel_size": jnp.full((b,), float(ks))}
        out = blur_ops.apply_kernels(imgs, kernels)
        meta_out: Dict[str, jnp.ndarray] = {}
        if self.request_kernel_metadata:
            meta_out = dict(meta)
            if self.normalize_metadata:
                # sinc rows carry masked-zero sigmas ("unset fields read
                # 0", reference __init__.py:206-209) — normalizing the
                # placeholder would turn 0 into (0-lo)/(hi-lo) < 0
                applies = meta["kernel_type"] != float(
                    blur_kernel_codes["sinc"])
                meta_out["sigma_x"] = jnp.where(
                    applies, normalize(meta["sigma_x"],
                                       *self.cfg.sigma_x_range), 0.0)
                meta_out["sigma_y"] = jnp.where(
                    applies, normalize(meta["sigma_y"],
                                       *self.cfg.sigma_y_range), 0.0)
        meta_out.update(self._kernel_extras(kernels))
        return out, meta_out

    def __call__(self, image):
        self._key, sub = jax.random.split(self._key)
        return self._host_call(image, sub)


@register_tool("srmdgaussianblur")
class SRMDGaussianBlur(_BlurBase):
    """SRMD/IKC iso/aniso Gaussian blur (blur/__init__.py:312-419)."""

    def __init__(self, random=False, sig=2.6, sig_min=0.2, sig_max=4.0,
                 rate_iso=1.0, scaling=3, seed=0, **kwargs):
        self.random = random
        self.sig = sig
        self.sig_min = sig_min
        self.sig_max = sig_max
        self.rate_iso = rate_iso
        self.scaling = scaling
        self._key = jax.random.PRNGKey(seed)
        super().__init__(kernel_size=kwargs.get("kernel_size", 21),
                         **{k: v for k, v in kwargs.items()
                            if k in ("request_full_kernels",
                                     "normalize_metadata",
                                     "request_pca_kernels", "load_pca_matrix",
                                     "pca_batch_len", "pca_length",
                                     "request_kernel_metadata", "pca_seed")})

    def _pca_sample_fn(self):
        return lambda key, n: bk.sample_srmd_kernels(
            key, n, self.kernel_size, self.sig, self.sig_min, self.sig_max,
            self.rate_iso, self.scaling, random=True)[0]

    def get_hyperparams(self) -> Dict[str, Any]:
        sig_params = ({"random": "True", "max_sigma": self.sig_max,
                       "min_sigma": self.sig_min} if self.random
                      else {"random": "False", "sigma": self.sig})
        return {**sig_params, "blur_type": "srmd",
                "kernel_size": self.kernel_size,
                "isotropic_probability": self.rate_iso,
                "anisotropic_scaling": self.scaling}

    def batch_apply(self, key, imgs):
        b = imgs.shape[0]
        kernels, meta = bk.sample_srmd_kernels(
            key, b, self.kernel_size, self.sig, self.sig_min, self.sig_max,
            self.rate_iso, self.scaling, random=self.random)
        out = blur_ops.apply_kernels(imgs, kernels)
        meta_out: Dict[str, jnp.ndarray] = {}
        if self.request_kernel_metadata:
            if self.rate_iso == 1.0:
                meta_out["isotropic_sigma"] = meta["isotropic_sigma"]
            else:
                meta_out = dict(meta)
        meta_out.update(self._kernel_extras(kernels))
        return out, meta_out

    def __call__(self, image):
        self._key, sub = jax.random.split(self._key)
        return self._host_call(image, sub)


@register_tool("bsrganblur")
class BSRGANBlur(SRMDGaussianBlur):
    """BSRGAN-style Gaussian blur — behaviorally the iso/aniso Gaussian
    family with BSRGAN's wider defaults (blur/__init__.py:422-500; the
    reference's scipy implementation draws from the same kernel space)."""

    def __init__(self, random=True, sig_min=0.2, sig_max=4.0, rate_iso=0.5,
                 scaling=3, **kwargs):
        super().__init__(random=random, sig_min=sig_min, sig_max=sig_max,
                         rate_iso=rate_iso, scaling=scaling, **kwargs)

    def get_hyperparams(self) -> Dict[str, Any]:
        p = super().get_hyperparams()
        p["blur_type"] = "bsrgan"
        return p
