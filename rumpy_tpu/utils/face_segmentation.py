"""BiSeNet face parsing in flax — TPU port of the reference's segmentation
tool (rumpy/sr_tools/face_segmentation/{models,resnet,segmentation}.py,
which vendors the public zllrunning/face-parsing.PyTorch BiSeNet).

Architecture: ResNet-18 context path with attention-refinement modules and
a global-average shortcut; the spatial path is replaced by the res3b1
(stride-8) feature, fused by a feature-fusion module; three output heads
upsampled to input size with align_corners=True bilinear (models.py:242-255).

Inference-only (BatchNorm uses running statistics). Weights load from the
reference's .pth checkpoint via `convert_torch_bisenet`, or from an npz
produced by it.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') semantics: floor index map."""
    h, w = x.shape[1:3]
    H, W = out_hw
    iy = (jnp.arange(H) * h) // H
    ix = (jnp.arange(W) * w) // W
    return x[:, iy][:, :, ix]


def _bilinear_ac_resize(x: jnp.ndarray,
                        out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True): the output
    grid spans [0, in-1] inclusive (jax.image.resize implements only the
    align_corners=False convention)."""
    h, w = x.shape[1:3]
    H, W = out_hw
    ys = jnp.linspace(0.0, h - 1.0, H)
    xs = jnp.linspace(0.0, w - 1.0, W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ConvBNReLU(nn.Module):
    out_chan: int
    ks: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chan, (self.ks, self.ks),
                    strides=(self.stride, self.stride),
                    padding=((self.pad, self.pad), (self.pad, self.pad)),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=True, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    in_chan: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.out_chan, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        r = nn.relu(nn.BatchNorm(momentum=0.9, use_running_average=True,
                                 dtype=self.dtype, name="bn1")(r))
        r = nn.Conv(self.out_chan, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(r)
        r = nn.BatchNorm(momentum=0.9, use_running_average=True, dtype=self.dtype,
                         name="bn2")(r)
        short = x
        if self.in_chan != self.out_chan or self.stride != 1:
            short = nn.Conv(self.out_chan, (1, 1),
                            strides=(self.stride,) * 2, use_bias=False,
                            dtype=self.dtype, name="downsample_0")(x)
            short = nn.BatchNorm(momentum=0.9, use_running_average=True,
                                 dtype=self.dtype,
                                 name="downsample_1")(short)
        return nn.relu(short + r)


class Resnet18(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(momentum=0.9, use_running_average=True,
                                 dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        x = BasicBlock(64, 1, 64, self.dtype, name="layer1_0")(x)
        x = BasicBlock(64, 1, 64, self.dtype, name="layer1_1")(x)
        f8 = BasicBlock(128, 2, 64, self.dtype, name="layer2_0")(x)
        f8 = BasicBlock(128, 1, 128, self.dtype, name="layer2_1")(f8)
        f16 = BasicBlock(256, 2, 128, self.dtype, name="layer3_0")(f8)
        f16 = BasicBlock(256, 1, 256, self.dtype, name="layer3_1")(f16)
        f32 = BasicBlock(512, 2, 256, self.dtype, name="layer4_0")(f16)
        f32 = BasicBlock(512, 1, 512, self.dtype, name="layer4_1")(f32)
        return f8, f16, f32


class AttentionRefinementModule(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, dtype=self.dtype, name="conv")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_atten")(atten)
        atten = nn.BatchNorm(momentum=0.9, use_running_average=True, dtype=self.dtype,
                             name="bn_atten")(atten)
        return feat * nn.sigmoid(atten)


class ContextPath(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f8, f16, f32 = Resnet18(self.dtype, name="resnet")(x)
        h8, w8 = f8.shape[1:3]
        h16, w16 = f16.shape[1:3]
        h32, w32 = f32.shape[1:3]

        avg = jnp.mean(f32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, pad=0, dtype=self.dtype,
                         name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0], h32, w32, avg.shape[-1]))

        f32_arm = AttentionRefinementModule(128, self.dtype,
                                            name="arm32")(f32)
        f32_up = _nearest_resize(f32_arm + avg_up, (h16, w16))
        f32_up = ConvBNReLU(128, dtype=self.dtype,
                            name="conv_head32")(f32_up)

        f16_arm = AttentionRefinementModule(128, self.dtype,
                                            name="arm16")(f16)
        f16_up = _nearest_resize(f16_arm + f32_up, (h8, w8))
        f16_up = ConvBNReLU(128, dtype=self.dtype,
                            name="conv_head16")(f16_up)
        return f8, f16_up, f32_up


class FeatureFusionModule(nn.Module):
    out_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        feat = ConvBNReLU(self.out_chan, ks=1, pad=0, dtype=self.dtype,
                          name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1))
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(atten)
        return feat * nn.sigmoid(atten) + feat


class BiSeNetOutput(nn.Module):
    mid_chan: int
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv_out")(x)


class BiSeNet(nn.Module):
    n_classes: int = 19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        f_res8, f_cp8, f_cp16 = ContextPath(self.dtype, name="cp")(x)
        fuse = FeatureFusionModule(256, self.dtype,
                                   name="ffm")(f_res8, f_cp8)
        out = BiSeNetOutput(256, self.n_classes, self.dtype,
                            name="conv_out")(fuse)
        out16 = BiSeNetOutput(64, self.n_classes, self.dtype,
                              name="conv_out16")(f_cp8)
        out32 = BiSeNetOutput(64, self.n_classes, self.dtype,
                              name="conv_out32")(f_cp16)
        return (_bilinear_ac_resize(out, (H, W)),
                _bilinear_ac_resize(out16, (H, W)),
                _bilinear_ac_resize(out32, (H, W)))


# ---------------------------------------------------------------------------
# Weight conversion / loading
# ---------------------------------------------------------------------------

def convert_torch_bisenet(state_dict, out_npz: Optional[str] = None):
    """Map the reference BiSeNet .pth (torch names like
    'cp.resnet.layer1.0.conv1.weight') onto our flax tree. Returns
    {'params': ..., 'batch_stats': ...}; optionally writes a flat npz."""
    if isinstance(state_dict, str):
        import torch
        state_dict = torch.load(state_dict, map_location="cpu")
    params: dict = {}
    stats: dict = {}

    def put(root, path, leaf, val):
        node = root
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = val

    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        # merge numeric segments into the previous name (torch Sequential
        # children 'layer1.0' -> flax submodule 'layer1_0')
        path = []
        for p in parts[:-1]:
            if p.isdigit():
                path[-1] = f"{path[-1]}_{p}"
            else:
                path.append(p)
        arr = np.asarray(val)
        if leaf == "num_batches_tracked":
            continue
        if leaf == "weight" and arr.ndim == 4:
            put(params, path, "kernel", arr.transpose(2, 3, 1, 0))
        elif leaf == "weight":  # BatchNorm gamma
            put(params, path, "scale", arr)
        elif leaf == "bias":
            put(params, path, "bias", arr)
        elif leaf == "running_mean":
            put(stats, path, "mean", arr)
        elif leaf == "running_var":
            put(stats, path, "var", arr)
        else:
            raise KeyError(f"unexpected checkpoint leaf {key}")
    variables = {"params": params, "batch_stats": stats}
    if out_npz:
        flat = {}

        def walk(node, prefix):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, prefix + (k,))
                else:
                    flat["/".join(prefix + (k,))] = v

        walk(variables, ())
        np.savez(out_npz, **flat)
    return variables


def load_bisenet_npz(path: str):
    data = np.load(path)
    variables: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return variables


class BiSeNetSegmenter:
    """Face parser: BiSeNet at 512x512 with ImageNet normalization,
    argmax over the main head (reference segmentation.py:102-119).
    Weights: the reference's .pth or a converted npz."""

    def __init__(self, weights_path: Optional[str] = None,
                 n_classes: int = 19):
        if not weights_path:
            raise NotImplementedError(
                "Face segmentation needs a BiSeNet checkpoint "
                "(pass weights_path: the reference's .pth or a converted "
                "npz — see convert_torch_bisenet)")
        if weights_path.endswith(".npz"):
            self.variables = load_bisenet_npz(weights_path)
        else:
            self.variables = jax.tree_util.tree_map(
                jnp.asarray, convert_torch_bisenet(weights_path))
        self.module = BiSeNet(n_classes=n_classes)
        self._forward = jax.jit(
            lambda v, x: jnp.argmax(self.module.apply(v, x)[0], axis=-1))

    def parse(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) RGB uint8 or float [0,1] (any size; resized to
        512 internally like the reference). Returns (512, 512) int32
        class map."""
        from PIL import Image
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        im = Image.fromarray(image).resize((512, 512), Image.BILINEAR)
        x = np.asarray(im, np.float32) / 255.0
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        return np.asarray(self._forward(self.variables, x[None]))[0]


def colorize_parsing(parsing: np.ndarray) -> np.ndarray:
    """Class map -> RGB visualization (distinct hues per class; the
    reference uses a fixed 24-color table to the same end)."""
    import colorsys
    n = int(parsing.max()) + 1
    out = np.full(parsing.shape + (3,), 255, np.uint8)
    for c in range(1, n):
        rgb = colorsys.hsv_to_rgb(((c - 1) * 0.41) % 1.0, 0.85, 1.0)
        out[parsing == c] = [int(v * 255) for v in rgb]
    return out
