"""Standard degradation-regressor model family + MANet.

Reference surface: rumpy/regression/models/__init__.py:13-160
(SelectiveSoftmax, DegradationRegressor base with normalization schemes,
occupancy loss, multi-patch eval), standard_classifier_models/
architectures.py + handlers.py (BasicNet, torchvision ResNet18/50,
DenseNet169, EfficientNet-b3 re-headed as regressors) and
regression/models/manet/architectures.py (MAConv/MABlock U-shaped
per-pixel kernel estimator).

TPU-native notes: the torchvision backbones are re-implemented as flax
modules (NHWC, BatchNorm state carried in the train-state `extra`
pytree so the whole step stays one jitted program); adaptive average
pooling is a static reshape-mean because input sizes are static under
jit; MANet's replication pad-to-multiple-of-8 happens at trace time
with static shapes, and its final nearest-neighbour kernel-map spread
is a repeat (no interpolation kernel needed).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import TConv, TConvTranspose, TDense
import jax
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.registry import register_model


def selective_softmax(x: jnp.ndarray, softmax_range) -> jnp.ndarray:
    """Softmax over a feature slice, identity elsewhere
    (regression/models/__init__.py:13-24)."""
    a, b = softmax_range
    return jnp.concatenate(
        [x[:, :a], jax.nn.softmax(x[:, a:b], axis=1), x[:, b:]], axis=1)


def indicator_occupancy_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                             zero_thres: float = 1e-6) -> jnp.ndarray:
    """Count of positions whose above-threshold occupancy disagrees
    (loss_functions.py:6-19). Indicators carry no gradient — same as
    the reference's integer `torch.where` masks."""
    occ_gt = (gt > zero_thres).astype(jnp.float32)
    occ_pred = (pred > zero_thres).astype(jnp.float32)
    return jnp.sum(jnp.abs(occ_gt - occ_pred))


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d equivalent for static shapes: mean over the
    torch-style index bins floor(i*H/out)..ceil((i+1)*H/out)."""
    n, h, w, c = x.shape
    rows = [x[:, (i * h) // out:-(-(i + 1) * h // out), :, :].mean(axis=1)
            for i in range(out)]
    x = jnp.stack(rows, axis=1)  # (n, out, w, c)
    cols = [x[:, :, (j * w) // out:-(-(j + 1) * w // out), :].mean(axis=2)
            for j in range(out)]
    return jnp.stack(cols, axis=2)  # (n, out, out, c)


# ---------------------------------------------------------------------------
# Architectures
# ---------------------------------------------------------------------------


class BasicNet(nn.Module):
    """CIFAR-tutorial classifier head (standard_classifier_models/
    architectures.py:6-29): conv5-pool-conv5-pool, adaptive pool to 5,
    3 FC layers."""
    output_size: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TConv(6, (5, 5), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
        x = TConv(16, (5, 5), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.max_pool(nn.relu(x), (2, 2), strides=(2, 2))
        x = adaptive_avg_pool(x, 5)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(TDense(120, dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        x = nn.relu(TDense(84, dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        return TDense(self.output_size, dtype=self.dtype,
                        param_dtype=jnp.float32)(x).astype(jnp.float32)


class _ResBlock(nn.Module):
    filters: int
    strides: int = 1
    bottleneck: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                    dtype=jnp.float32)
        residual = x
        if self.bottleneck:
            y = TConv(self.filters, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            y = nn.relu(norm()(y))
            y = TConv(self.filters, (3, 3),
                        strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            y = nn.relu(norm()(y))
            y = TConv(self.filters * 4, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(y)
            y = norm()(y)
            out_ch = self.filters * 4
        else:
            y = TConv(self.filters, (3, 3),
                        strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            y = nn.relu(norm()(y))
            y = TConv(self.filters, (3, 3), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(y)
            y = norm()(y)
            out_ch = self.filters
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = TConv(out_ch, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-18/50 regressor head (torchvision models re-headed with
    num_classes=output_size, handlers.py:23-50)."""
    output_size: int = 10
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    width: int = 64
    add_softmax: bool = False
    softmax_range: Tuple[int, int] = (0, 441)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TConv(self.width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                 dtype=jnp.float32)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                x = _ResBlock(self.width * 2 ** i,
                              strides=2 if i > 0 and j == 0 else 1,
                              bottleneck=self.bottleneck,
                              dtype=self.dtype)(x, train=train)
        x = x.mean(axis=(1, 2))
        x = TDense(self.output_size, dtype=self.dtype,
                     param_dtype=jnp.float32)(x).astype(jnp.float32)
        if self.add_softmax:
            x = selective_softmax(x, self.softmax_range)
        return x


class DenseNet(nn.Module):
    """DenseNet-169-style regressor (handlers.py:85-102). BN-relu-conv
    dense blocks with 1x1+avgpool transitions; `add_softmax` appends a
    plain softmax head as in the reference."""
    output_size: int = 10
    block_config: Sequence[int] = (6, 12, 32, 32)
    growth_rate: int = 32
    init_features: int = 64
    add_softmax: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                    dtype=jnp.float32)
        x = TConv(self.init_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for bi, layers in enumerate(self.block_config):
            for _ in range(layers):
                y = nn.relu(norm()(x))
                y = TConv(4 * self.growth_rate, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32)(y)
                y = nn.relu(norm()(y))
                y = TConv(self.growth_rate, (3, 3), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32)(y)
                x = jnp.concatenate([x, y], axis=-1)
            if bi != len(self.block_config) - 1:
                x = nn.relu(norm()(x))
                x = TConv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(norm()(x)).mean(axis=(1, 2))
        x = TDense(self.output_size, dtype=self.dtype,
                     param_dtype=jnp.float32)(x).astype(jnp.float32)
        if self.add_softmax:
            x = jax.nn.softmax(x, axis=1)
        return x


class _MBConv(nn.Module):
    filters: int
    expand: int
    kernel: int
    strides: int
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                    dtype=jnp.float32)
        inp = x.shape[-1]
        y = x
        if self.expand != 1:
            y = TConv(inp * self.expand, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(y)
            y = nn.silu(norm()(y))
        y = TConv(y.shape[-1], (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    feature_group_count=y.shape[-1], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.silu(norm()(y))
        se = max(1, int(inp * self.se_ratio))
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.silu(TConv(se, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(s))
        s = nn.sigmoid(TConv(y.shape[-1], (1, 1), dtype=self.dtype,
                               param_dtype=jnp.float32)(s))
        y = y * s
        y = TConv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = norm()(y)
        if self.strides == 1 and inp == self.filters:
            y = y + x
        return y


class EfficientNet(nn.Module):
    """EfficientNet-style regressor (handlers.py:70-81 uses
    efficientnet_b3). Stage plan follows the B0 skeleton scaled by
    width/depth multipliers (B3: 1.2/1.4)."""
    output_size: int = 10
    width_mult: float = 1.2
    depth_mult: float = 1.4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def w(ch):  # round filters to multiple of 8
            ch = ch * self.width_mult
            return max(8, int(ch + 4) // 8 * 8)

        def d(n):
            return int(np.ceil(n * self.depth_mult))

        norm = lambda: nn.BatchNorm(momentum=0.9, use_running_average=not train,
                                    dtype=jnp.float32)
        x = TConv(w(32), (3, 3), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.silu(norm()(x))
        plan = [  # (expand, filters, repeats, strides, kernel)
            (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3)]
        for expand, filters, repeats, strides, kernel in plan:
            for r in range(d(repeats)):
                x = _MBConv(w(filters), expand, kernel,
                            strides if r == 0 else 1,
                            dtype=self.dtype)(x, train=train)
        x = TConv(w(1280), (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.silu(norm()(x)).mean(axis=(1, 2))
        return TDense(self.output_size, dtype=self.dtype,
                        param_dtype=jnp.float32)(x).astype(jnp.float32)


class MAConv(nn.Module):
    """Mutual Affine Convolution (manet/architectures.py:55-94): channel
    splits modulate each other with 1x1-conv scale/translation before
    their own conv."""
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    split: int = 2
    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_split, out_split = [], []
        for i in range(self.split):
            ins = (round(self.in_channels / self.split)
                   if i < self.split - 1
                   else self.in_channels - sum(in_split))
            outs = (round(self.out_channels / self.split)
                    if i < self.split - 1
                    else self.in_channels - sum(out_split))
            in_split.append(ins)
            out_split.append(outs)
        bounds = np.cumsum([0] + in_split)
        parts = [x[..., bounds[i]:bounds[i + 1]]
                 for i in range(self.split)]
        outputs = []
        for i in range(self.split):
            rest = jnp.concatenate(parts[:i] + parts[i + 1:], axis=-1)
            rest_ch = self.in_channels - in_split[i]
            h = TConv(max(1, rest_ch // self.reduction), (1, 1),
                        dtype=self.dtype, param_dtype=jnp.float32)(rest)
            h = nn.relu(h)
            h = TConv(in_split[i] * 2, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            scale, translation = jnp.split(h, 2, axis=-1)
            mod = parts[i] * nn.sigmoid(scale) + translation
            outputs.append(TConv(out_split[i],
                                   (self.kernel_size, self.kernel_size),
                                   dtype=self.dtype,
                                   param_dtype=jnp.float32)(mod))
        return jnp.concatenate(outputs, axis=-1)


class MABlock(nn.Module):
    """Residual block of two MAConvs (manet/architectures.py:97-110)."""
    channels: int = 64
    split: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = MAConv(self.channels, self.channels, split=self.split,
                   dtype=self.dtype)(x)
        y = nn.relu(y)
        y = MAConv(self.channels, self.channels, split=self.split,
                   dtype=self.dtype)(y)
        return x + y


class MANet(nn.Module):
    """Per-pixel blur-kernel estimator (manet/architectures.py:116-155):
    U-shape head/down/body/up/tail, softmax over kernel-size^2 channels,
    nearest-neighbour spread to HR resolution."""
    kernel_size: int = 21
    nc: Tuple[int, int] = (128, 256)
    nb: int = 1
    split: int = 2
    scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        pad_b = (-h) % 8
        pad_r = (-w) % 8
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)),
                    mode="edge")
        x1 = TConv(self.nc[0], (3, 3), dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        y = x1
        for _ in range(self.nb):
            y = MABlock(self.nc[0], self.split, dtype=self.dtype)(y)
        x2 = TConv(self.nc[1], (2, 2), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = x2
        for _ in range(self.nb):
            y = MABlock(self.nc[1], self.split, dtype=self.dtype)(y)
        y = TConvTranspose(self.nc[0], (2, 2), strides=(2, 2),
                             dtype=self.dtype,
                             param_dtype=jnp.float32)(y + x2)
        for _ in range(self.nb):
            y = MABlock(self.nc[0], self.split, dtype=self.dtype)(y)
        y = TConv(self.kernel_size ** 2, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32)(y + x1)
        y = y[:, :h, :w, :]
        y = jax.nn.softmax(y.astype(jnp.float32), axis=-1)
        # nearest-neighbour spread of the kernel map to HR size
        y = jnp.repeat(jnp.repeat(y, self.scale, axis=1), self.scale,
                       axis=2)
        return y


# ---------------------------------------------------------------------------
# Handlers
# ---------------------------------------------------------------------------


class StandardRegressorHandler(BaseHandler):
    """Shared handler for direct degradation regression
    (regression/models/__init__.py:27-160): target normalization
    schemes, optional occupancy loss, center-crop / multi-patch eval."""

    colorspace = "rgb"
    task = "regression"
    loss_type = "l1"

    def __init__(self, output_size=10, input_patch_num=1,
                 centercrop_patch_eval=True, crop_size=200,
                 normalization_scheme=None, normalization_params=None,
                 occupancy_loss=False, occ_weight=1.0, l1_weight=1.0,
                 patch_selection_strategy="random", **kwargs):
        self.output_size = output_size
        self.input_patch_num = input_patch_num
        self.centercrop_patch_eval = centercrop_patch_eval
        self.crop_size = crop_size
        self.normalization_scheme = normalization_scheme
        self.norm_params = {k: jnp.asarray(v, jnp.float32)
                            for k, v in (normalization_params or {}).items()}
        if normalization_scheme and not normalization_params:
            raise RuntimeError("Normalization parameters (mean, max etc.) "
                               "need to be specified if normalization is "
                               "required.")
        self.use_occ_loss = occupancy_loss
        if occupancy_loss and normalization_scheme:
            self.occ_thres = float(
                (1e-6 - (normalization_params or {}).get("mean", 0.0))
                / (normalization_params or {}).get("std", 1.0))
        else:
            self.occ_thres = 1e-6
        self.occ_weight = occ_weight
        self.l1_weight = l1_weight
        self.patch_selection_strategy = patch_selection_strategy
        super().__init__(**kwargs)

    def example_inputs(self, batch: int = 1, size: int = 32):
        ch = self.in_features * max(1, self.input_patch_num)
        return (jnp.zeros((batch, size, size, ch), jnp.float32),)

    def norm(self, y):
        if self.normalization_scheme == "zero_mean":
            return (y - self.norm_params["mean"]) / self.norm_params["std"]
        if self.normalization_scheme == "zero_to_one":
            return ((y - self.norm_params["minim"])
                    / (self.norm_params["maxim"] - self.norm_params["minim"]))
        return y

    def unnorm(self, y):
        if self.normalization_scheme == "zero_mean":
            return y * self.norm_params["std"] + self.norm_params["mean"]
        if self.normalization_scheme == "zero_to_one":
            return (y * (self.norm_params["maxim"]
                         - self.norm_params["minim"])
                    + self.norm_params["minim"])
        return y

    def init_state(self, seed=None):
        state = super().init_state(seed)
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        variables = self.module.init(rng, *self.example_inputs())
        extra = {"bstats": variables.get("batch_stats", {})}
        return state.replace(params=variables["params"],
                             opt_state=self.tx.init(variables["params"]),
                             extra=extra)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        variables = {"params": params}
        new_extra = extra
        bstats = (extra or {}).get("bstats")
        if bstats:
            variables["batch_stats"] = bstats
            if train:
                out, mut = self.module.apply(variables, batch["lr"],
                                             train=True,
                                             mutable=["batch_stats"])
                new_extra = dict(extra)
                new_extra["bstats"] = mut["batch_stats"]
            else:
                out = self.module.apply(variables, batch["lr"], train=False)
        else:
            out = self.module.apply(variables, batch["lr"], train=train)
        return out, {}, new_extra

    def compute_losses(self, pred, batch, aux):
        target = self.norm(batch["metadata"].astype(jnp.float32))
        target = target.reshape(pred.shape[0], -1)
        l1 = jnp.mean(jnp.abs(pred - target))
        if self.use_occ_loss:
            occ = indicator_occupancy_loss(pred, target, self.occ_thres)
            return {"train-loss": self.l1_weight * l1
                    + self.occ_weight * occ,
                    "l1-loss": l1, "occ-loss": occ}
        return {"train-loss": l1}

    def run_eval(self, state, batch):
        x = batch["lr"]
        if (self.centercrop_patch_eval and x.shape[1] > self.crop_size
                and x.shape[2] > self.crop_size):
            # center-crop large eval inputs (__init__.py:120-123)
            top = (x.shape[1] - self.crop_size) // 2
            left = (x.shape[2] - self.crop_size) // 2
            x = x[:, top:top + self.crop_size,
                  left:left + self.crop_size, :]
            batch = dict(batch, lr=x)
        elif not self.centercrop_patch_eval and self.input_patch_num > 1 \
                and x.shape[-1] == self.in_features:
            # stack multiple random patches on channels (:125-141)
            rng = np.random.default_rng(0)
            patches = []
            for _ in range(self.input_patch_num):
                top = int(rng.integers(0, max(1, x.shape[1]
                                              - self.crop_size + 1)))
                left = int(rng.integers(0, max(1, x.shape[2]
                                               - self.crop_size + 1)))
                patches.append(x[:, top:top + self.crop_size,
                                 left:left + self.crop_size, :])
            batch = dict(batch, lr=np.concatenate(patches, axis=-1))
        out = super().run_eval(state, batch)
        return self.unnorm(out)

    def run_embedding(self, state, images):
        """ContrastiveEval hook: a direct regressor's 'embedding' is its
        predicted degradation vector (the reference's regression eval
        clusters/inspects predictions the same way)."""
        return self.run_eval(state, {"lr": jnp.asarray(images)})


@register_model("basicnn")
class BasicNNHandler(StandardRegressorHandler):
    """standard_classifier_models/handlers.py:8-18."""

    def build_module(self, **kw):
        return BasicNet(output_size=self.output_size, dtype=self.dtype,
                        **kw)


@register_model("resnet")
class ResnetHandler(StandardRegressorHandler):
    """standard_classifier_models/handlers.py:21-50."""

    def __init__(self, model_type="resnet18", add_softmax=False, **kwargs):
        self.model_type = model_type
        self.add_softmax = add_softmax
        super().__init__(**kwargs)

    def build_module(self, **kw):
        if self.model_type == "resnet18":
            sizes, bottleneck = (2, 2, 2, 2), False
        elif self.model_type == "resnet50":
            sizes, bottleneck = (3, 4, 6, 3), True
        else:
            raise RuntimeError("Model Undefined.")
        return ResNet(output_size=self.output_size, stage_sizes=sizes,
                      bottleneck=bottleneck,
                      add_softmax=self.add_softmax, dtype=self.dtype,
                      **kw)


@register_model("efficientnet")
class EfficientnetHandler(StandardRegressorHandler):
    """standard_classifier_models/handlers.py:70-81 (b3 multipliers)."""

    def build_module(self, **kw):
        return EfficientNet(output_size=self.output_size,
                            dtype=self.dtype, **kw)


@register_model("densenet")
class DensenetHandler(StandardRegressorHandler):
    """standard_classifier_models/handlers.py:84-102."""

    def __init__(self, add_softmax=False, **kwargs):
        self.add_softmax = add_softmax
        super().__init__(**kwargs)

    def build_module(self, **kw):
        return DenseNet(output_size=self.output_size,
                        add_softmax=self.add_softmax, dtype=self.dtype,
                        **kw)


@register_model("manet")
class ManetHandler(StandardRegressorHandler):
    """Per-pixel kernel predictor (manet/handlers.py:9-40). With
    `invariant_kernel`, the (N, k^2) kernel target is spread over the
    HR map before the L1 loss."""

    def __init__(self, kernel_size=21, sr_scale=4,
                 invariant_kernel=False, **kwargs):
        self.kernel_size = kernel_size
        self.sr_scale = sr_scale
        self.invariant_kernel = invariant_kernel
        kwargs.setdefault("centercrop_patch_eval", False)
        super().__init__(**kwargs)

    def build_module(self, **kw):
        return MANet(kernel_size=self.kernel_size, scale=self.sr_scale,
                     dtype=self.dtype, **kw)

    def compute_losses(self, pred, batch, aux):
        target = batch["metadata"].astype(jnp.float32)
        if self.invariant_kernel and target.ndim == 2:
            target = jnp.broadcast_to(
                target[:, None, None, :], pred.shape)
        return {"train-loss": jnp.mean(jnp.abs(pred - target))}

    def run_eval(self, state, batch):
        return BaseHandler.run_eval(self, state, batch)
