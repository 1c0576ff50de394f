"""Advanced SISR family: EDSR, RCAN, SRMD, EDSRMD, HAN, ELAN.

Reference: rumpy/SISR/models/advanced/{architectures,handlers}.py. Defaults
mirror the reference handlers (EDSR: 64 feats / 16 blocks / res_scale 0.1;
RCAN: 10 groups x 20 RCAB, reduction 16; no MeanShift in either — the
reference dropped it from this variant). All modules are NHWC flax.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.models.common import (CALayer, Conv, RCAB, ResBlock, Upsampler,
                                     pixel_shuffle)
from rumpy_tpu.registry import register_model


class EDSR(nn.Module):
    scale: int = 4
    in_features: int = 3
    out_features: int = 3
    net_features: int = 64
    num_blocks: int = 16
    res_scale: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.net_features, 3, dtype=self.dtype)(x)
        res = x
        for _ in range(self.num_blocks):
            res = ResBlock(self.net_features, 3, res_scale=self.res_scale,
                           dtype=self.dtype)(res)
        res = Conv(self.net_features, 3, dtype=self.dtype)(res)
        x = x + res
        x = Upsampler(self.scale, self.net_features, dtype=self.dtype)(x)
        return Conv(self.out_features, 3, dtype=self.dtype)(x)


class ResidualGroup(nn.Module):
    features: int
    n_resblocks: int = 20
    reduction: int = 16
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for _ in range(self.n_resblocks):
            res = RCAB(self.features, self.reduction, self.res_scale,
                       dtype=self.dtype)(res)
        res = Conv(self.features, 3, dtype=self.dtype)(res)
        return x + res


class RCAN(nn.Module):
    scale: int = 4
    in_feats: int = 3
    out_feats: int = 3
    n_feats: int = 64
    n_resgroups: int = 10
    n_resblocks: int = 20
    reduction: int = 16
    res_scale: float = 1.0
    remat: bool = False  # rematerialize each residual group in backward
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        # jax.checkpoint per residual group: stores only group boundaries
        # during forward and recomputes block activations in backward —
        # trades ~1/3 more FLOPs for ~n_resblocks x less activation HBM,
        # unlocking batches past the spill point.
        group_cls = nn.remat(ResidualGroup) if self.remat else ResidualGroup
        for _ in range(self.n_resgroups):
            res = group_cls(self.n_feats, self.n_resblocks,
                            self.reduction, self.res_scale,
                            dtype=self.dtype)(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(self.out_feats, 3, dtype=self.dtype)(res)


class SRMD(nn.Module):
    """SRMD: LR image channel-concatenated with degradation maps
    (reference arch at advanced/architectures.py:403-447: 12 conv3x3 + BN
    layers at 128 feats, pixel-shuffle tail; in_nc = 3 + PCA dims)."""
    scale: int = 4
    in_nc: int = 18
    out_nc: int = 3
    nc: int = 128
    nb: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.nc, 3, dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.nb - 2):
            x = Conv(self.nc, 3, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = Conv(self.out_nc * self.scale ** 2, 3, dtype=self.dtype)(x)
        return pixel_shuffle(x, self.scale)


@register_model("edsr")
class EDSRHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, num_features=64, num_blocks=16, res_scale=0.1, **kwargs):
        super().__init__(num_features=num_features, num_blocks=num_blocks,
                         res_scale=res_scale, **kwargs)

    def build_module(self, num_features, num_blocks, res_scale):
        return EDSR(scale=self.scale, in_features=self.in_features,
                    net_features=num_features, num_blocks=num_blocks,
                    res_scale=res_scale, dtype=self.dtype)


class _MetadataMapMixin:
    """Shared SRMD-style metadata handling (reference EDSRMD/SRMD are
    QModels, advanced/handlers.py:137-196): key-driven metadata sizing,
    CSV-column selection, and vector->per-pixel-map tiling concatenated
    with the LR input."""
    uses_metadata = True

    def _init_metadata(self, metadata, metadata_bypass_len, num_metadata):
        from rumpy_tpu.models.attention_manipulators import (
            compute_num_metadata)
        if metadata is not None:
            self.metadata_keys = list(metadata)
            self.num_metadata = compute_num_metadata(self.metadata_keys,
                                                     metadata_bypass_len)
        else:
            self.metadata_keys = None
            self.num_metadata = metadata_bypass_len or num_metadata

    def select_metadata(self, metadata, keys=None):
        from rumpy_tpu.models.attention_manipulators import (
            select_metadata_columns)
        return select_metadata_columns(metadata, keys, self.metadata_keys)

    def handler_metadata(self):
        return {"metadata_keys_used_in_training": self.metadata_keys,
                "num_metadata": self.num_metadata}

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size,
                           self.in_features + self.num_metadata),
                          jnp.float32),)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        lr = batch["lr"]
        meta = batch.get("metadata")
        if meta is None:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        n, h, w, _ = lr.shape
        maps = jnp.broadcast_to(meta[:, None, None, :],
                                (n, h, w, meta.shape[-1]))
        x = jnp.concatenate([lr, maps.astype(lr.dtype)], axis=-1)
        sr = self.module.apply({"params": params}, x)
        return sr, {}, extra


@register_model("edsrmd")
class EDSRMDHandler(_MetadataMapMixin, BaseHandler):
    """SRMD-style EDSR: degradation-metadata vector tiled to per-pixel
    maps and channel-concatenated with the LR input (reference
    advanced/handlers.py:137-164 `EDSRMDHandler`)."""
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, metadata=None, metadata_bypass_len=None,
                 num_metadata=15, num_features=64, num_blocks=16,
                 res_scale=0.1, **kwargs):
        self._init_metadata(metadata, metadata_bypass_len, num_metadata)
        super().__init__(num_features=num_features, num_blocks=num_blocks,
                         res_scale=res_scale, **kwargs)

    def build_module(self, num_features, num_blocks, res_scale):
        return EDSR(scale=self.scale,
                    in_features=self.in_features + self.num_metadata,
                    net_features=num_features, num_blocks=num_blocks,
                    res_scale=res_scale, dtype=self.dtype)


@register_model("rcan")
class RCANHandler(BaseHandler):
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, n_resblocks=20, n_resgroups=10, n_feats=64,
                 reduction=16, res_scale=1.0, remat=False, **kwargs):
        super().__init__(n_resblocks=n_resblocks, n_resgroups=n_resgroups,
                         n_feats=n_feats, reduction=reduction,
                         res_scale=res_scale, remat=remat, **kwargs)

    def build_module(self, n_resblocks, n_resgroups, n_feats, reduction,
                     res_scale, remat=False):
        return RCAN(scale=self.scale, in_feats=self.in_features,
                    n_feats=n_feats, n_resgroups=n_resgroups,
                    n_resblocks=n_resblocks, reduction=reduction,
                    res_scale=res_scale, remat=remat, dtype=self.dtype)


@register_model("srmd")
class SRMDHandler(_MetadataMapMixin, BaseHandler):
    """SRMD consumes LR + per-pixel degradation maps; the data pipeline
    supplies `metadata` as a (N, M) vector tiled to (N, h, w, M) here."""
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "unmodified"

    def __init__(self, metadata=None, metadata_bypass_len=None,
                 num_metadata=15, nc=128, nb=12, **kwargs):
        self._init_metadata(metadata, metadata_bypass_len, num_metadata)
        super().__init__(nc=nc, nb=nb, **kwargs)

    def build_module(self, nc, nb):
        return SRMD(scale=self.scale, in_nc=self.in_features + self.num_metadata,
                    nc=nc, nb=nb, dtype=self.dtype)
