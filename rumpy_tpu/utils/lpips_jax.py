"""LPIPS perceptual metric in JAX (AlexNet backbone).

Reference gates LPIPS on the `lpips` pip package (sr_tools/metrics.py:90-
102); this environment ships neither the package nor the pretrained
AlexNet/linear-head weights, so the implementation is complete but
construction requires a weights file (npz produced by
`convert_torch_lpips` from the official checkpoint).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by LPIPS ('scaling layer').
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_CFG: Tuple[Tuple[int, int, int, int], ...] = (
    # (features, kernel, stride, padding) — torchvision AlexNet exactly
    # (conv1 padding=2; flax SAME would pad/align differently at k=11 s=4
    # and shift every downstream tap)
    (64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
    (256, 3, 1, 1))


class AlexFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (f, k, s, p) in enumerate(ALEX_CFG):
            x = nn.Conv(f, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = nn.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), (2, 2))
        return taps


class LPIPS:
    """lpips(net='alex') equivalent: unit-normalized feature differences,
    1x1 linear heads, spatial mean, summed over taps."""

    def __init__(self, weights: Optional[str] = None):
        if weights is None:
            raise NotImplementedError(
                "LPIPS needs pretrained AlexNet + linear-head weights "
                "(npz; see convert_torch_lpips)")
        data = np.load(weights)
        self.backbone = AlexFeatures()
        params = {}
        self.lins = []
        for key in data.files:
            if key.startswith("lin"):
                self.lins.append(jnp.asarray(data[key]))
            else:
                layer, leaf = key.split("/")
                params.setdefault(layer, {})[leaf] = jnp.asarray(data[key])
        self.params = params

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a, b: (N, H, W, 3) in [0, 1]. Returns (N,) distances."""
        return self.distance(a, b)

    def distance(self, a, b, params=None, lins=None) -> jnp.ndarray:
        """Like __call__, but weights may be passed explicitly so jitted
        callers can feed them as arguments instead of trace constants."""
        params = self.params if params is None else params
        lins = self.lins if lins is None else lins
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        an = (a * 2 - 1 - shift) / scale
        bn = (b * 2 - 1 - shift) / scale
        fa = self.backbone.apply({"params": params}, an)
        fb = self.backbone.apply({"params": params}, bn)
        total = 0.0
        for ta, tb, lin in zip(fa, fb, lins):
            na = ta / (jnp.linalg.norm(ta, axis=-1, keepdims=True) + 1e-10)
            nb = tb / (jnp.linalg.norm(tb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            weighted = jnp.tensordot(diff, lin, axes=[[-1], [0]])
            total = total + jnp.mean(weighted, axis=(1, 2, 3))
        return total


def convert_torch_lpips(lpips_ckpt: str, alexnet_ckpt: str, out_npz: str):
    """Host-side converter from the official torch checkpoints."""
    import torch
    alex = torch.load(alexnet_ckpt, map_location="cpu")
    lins = torch.load(lpips_ckpt, map_location="cpu")
    out = {}
    conv_idx = 0
    for k, v in alex.items():
        if "features" in k and k.endswith("weight"):
            out[f"Conv_{conv_idx}/kernel"] = v.permute(2, 3, 1, 0).numpy()
            out[f"Conv_{conv_idx}/bias"] = alex[
                k.replace("weight", "bias")].numpy()
            conv_idx += 1
    for i in range(5):
        w = lins[f"lin{i}.model.1.weight"]
        out[f"lin{i}"] = w.squeeze().numpy().reshape(-1, 1)
    np.savez(out_npz, **out)
    return out_npz
