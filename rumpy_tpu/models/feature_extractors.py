"""Perceptual / recognition feature extractors.

Reference: rumpy/SISR/models/feature_extractors/ (VGGFace / VGG /
LightCNN + the perceptual_loss_mechanism factory, handlers.py:5-14).

The networks are defined in flax; their pretrained weights (VGG-16
ImageNet, VGGFace, LightCNN) are NOT shipped in this environment, so
construction is gated on a weights file (npz of the flax param tree; a
torch->npz converter is provided for the reference's checkpoints).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Features(nn.Module):
    """VGG-16 conv trunk returning activations at requested layer taps."""
    taps: Tuple[int, ...] = (22,)  # relu4_3 by default (torchvision idx)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outputs = []
        layer_idx = 0
        for spec in VGG16_CFG:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                layer_idx += 1
            else:
                x = nn.Conv(spec, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32)(x)
                layer_idx += 1
                x = nn.relu(x)
                layer_idx += 1
            if layer_idx - 1 in self.taps or layer_idx in self.taps:
                outputs.append(x)
        return outputs if len(outputs) > 1 else outputs[0]


VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

# torchvision-style layer names in execution order, used for tap selection
# (reference VGGNets.py:140-151 name table; 'conv5_4' == features[:35]).
VGG19_LAYER_NAMES = []
for _blk, _n in ((1, 2), (2, 2), (3, 4), (4, 4), (5, 4)):
    for _i in range(_n):
        VGG19_LAYER_NAMES += [f"conv{_blk}_{_i + 1}", f"relu{_blk}_{_i + 1}"]
    VGG19_LAYER_NAMES.append(f"pool{_blk}")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """VGG-19 conv trunk up to a named tap layer — the reference's
    perceptual-loss extractor (VGGNets.py:120-186: ``features[:35]`` ends
    at conv5_4 PRE-activation, ImageNet-normalized input). Only the layers
    up to the tap are constructed, so shallow taps stay cheap.

    Input is NHWC RGB in [0, 1]."""
    tap: str = "conv5_4"
    normalise_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # accept both 'conv5_4' and 'conv54' spellings like the reference
        names = VGG19_LAYER_NAMES
        wanted = [n for n in names
                  if n == self.tap or n.replace("_", "") == self.tap]
        if not wanted:
            raise KeyError(f"unknown VGG19 tap {self.tap!r} (expected one "
                           f"of {names})")
        stop = names.index(wanted[0])
        if self.normalise_input:
            x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        i = 0  # conv counter for CFG walk
        li = 0  # layer-name index
        for spec in VGG19_CFG:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                if li == stop:
                    return x
                li += 1
            else:
                x = nn.Conv(spec, (3, 3), dtype=self.dtype,
                            param_dtype=jnp.float32)(x)
                i += 1
                if li == stop:
                    return x
                li += 1
                x = nn.relu(x)
                if li == stop:
                    return x
                li += 1
        return x


class LightCNNFeatures(nn.Module):
    """LightCNN-9 style extractor (max-feature-map activations)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def mfm(v):
            a, b = jnp.split(v, 2, axis=-1)
            return jnp.maximum(a, b)
        for feats, k, pool in [(96, 5, True), (192, 3, True),
                               (384, 3, True), (512, 3, False),
                               (256, 3, True)]:
            x = nn.Conv(feats * 2, (k, k), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = mfm(x)
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        return jnp.mean(x, axis=(1, 2))


class PerceptualExtractor:
    """Feature extractor with loaded pretrained weights."""

    def __init__(self, module: nn.Module, params):
        self.module = module
        self.params = params

    def __call__(self, images):
        return self.module.apply({"params": self.params}, images)

    @staticmethod
    def convert_torch_vgg16(torch_state_dict_path: str, out_npz: str):
        """Convert a torchvision VGG-16 state dict to our flax layout
        (host-side utility; torch-cpu is available in this image)."""
        import torch
        sd = torch.load(torch_state_dict_path, map_location="cpu")
        convs = [(k, v) for k, v in sd.items()
                 if k.startswith("features") and k.endswith("weight")]
        out = {}
        for i, (k, w) in enumerate(convs):
            bias = sd[k.replace("weight", "bias")]
            out[f"Conv_{i}/kernel"] = w.permute(2, 3, 1, 0).numpy()
            out[f"Conv_{i}/bias"] = bias.numpy()
        np.savez(out_npz, **out)
        return out_npz


def load_extractor_params(npz_path: str):
    """Load an extractor param tree from a flat 'Layer_i/leaf' npz."""
    data = np.load(npz_path)
    params = {}
    for key in data.files:
        layer, leaf = key.split("/")
        params.setdefault(layer, {})[leaf] = jnp.asarray(data[key])
    return params


def convert_torch_vgg19(torch_state_dict, out_npz: str):
    """Convert a torchvision-layout VGG-19 state dict ('features.N.weight')
    to our flax layout. Accepts a path or an in-memory state dict."""
    if isinstance(torch_state_dict, str):
        import torch
        torch_state_dict = torch.load(torch_state_dict, map_location="cpu")
    convs = sorted((int(k.split(".")[1]), k)
                   for k in torch_state_dict
                   if k.startswith("features") and k.endswith("weight"))
    out = {}
    for i, (_, k) in enumerate(convs):
        w = torch_state_dict[k]
        b = torch_state_dict[k.replace("weight", "bias")]
        out[f"Conv_{i}/kernel"] = np.asarray(w).transpose(2, 3, 1, 0)
        out[f"Conv_{i}/bias"] = np.asarray(b)
    np.savez(out_npz, **out)
    return out_npz


def perceptual_loss_mechanism(name: str = "vgg",
                              weights: Optional[str] = None,
                              taps: Sequence[int] = (22,),
                              tap: str = "conv5_4"):
    """Factory (feature_extractors/handlers.py:5-14). 'vgg' is the
    reference's VGG-19 p_loss extractor (VGGNets.py:120-186); requires
    pretrained weights, raises with instructions otherwise."""
    if weights is None:
        raise NotImplementedError(
            f"Perceptual extractor '{name}' needs pretrained weights: pass "
            "weights=<npz> (use convert_torch_vgg19 / "
            "PerceptualExtractor.convert_torch_vgg16 to convert a "
            "torchvision checkpoint)")
    if name == "vgg":
        module = VGG19Features(tap=tap)
    elif name == "vggface":
        module = VGG16Features(taps=tuple(taps))
    elif name == "lightcnn":
        module = LightCNNFeatures()
    else:
        raise KeyError(name)
    return PerceptualExtractor(module, load_extractor_params(weights))
