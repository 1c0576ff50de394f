"""SFTMD family — SR conditioned on per-pixel degradation maps via
spatial feature transform, with selectable SFT layer types.

Reference: rumpy/SISR/models/SFTMD_variants/architectures.py:9-290.
SFT types: 'standard' (sigmoid-scale + shift from concat(fea, para)),
'concat' (single conv on the concat), 'weak' (plain multiply), 'split'
(parallel feature/conditioned paths), 'none'.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, pixel_shuffle
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import ParaCALayer, QModelHandler
from rumpy_tpu.registry import register_model


class StandardSft(nn.Module):
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, para):
        cat = jnp.concatenate([fea, para.astype(fea.dtype)], axis=-1)
        mul = Conv(32, 3, dtype=self.dtype)(cat)
        mul = nn.leaky_relu(mul, 0.2)
        mul = nn.sigmoid(Conv(self.nf, 3, dtype=self.dtype)(mul))
        add = Conv(32, 3, dtype=self.dtype)(cat)
        add = nn.leaky_relu(add, 0.2)
        add = Conv(self.nf, 3, dtype=self.dtype)(add)
        return fea * mul + add


class ConcatSft(nn.Module):
    nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, para):
        return Conv(self.nf, 3, dtype=self.dtype)(
            jnp.concatenate([fea, para.astype(fea.dtype)], axis=-1))


class WeakSft(nn.Module):
    @nn.compact
    def __call__(self, fea, para):
        return fea * para.astype(fea.dtype)


class SplitSft(nn.Module):
    nf: int = 64
    split: str = "22"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, para):
        cat = jnp.concatenate([fea, para.astype(fea.dtype)], axis=-1)
        n_f, n_q = int(self.split[0]), int(self.split[1])
        f = fea
        for _ in range(n_f):
            f = nn.relu(Conv(self.nf, 3, dtype=self.dtype)(f))
        q = cat
        for _ in range(n_q):
            q = nn.relu(Conv(self.nf, 3, dtype=self.dtype)(q))
        if n_q == 0:
            return f
        if n_f == 0:
            return q
        return f + q


def sft_layer(sft_type: str, nf: int, split: str = "22", dtype=jnp.float32):
    if sft_type == "standard":
        return StandardSft(nf, dtype=dtype)
    if sft_type == "concat":
        return ConcatSft(nf, dtype=dtype)
    if sft_type == "weak":
        return WeakSft()
    if sft_type == "split":
        return SplitSft(nf, split, dtype=dtype)
    if sft_type == "none":
        return None
    raise ValueError(f"Unknown SFT type {sft_type}")


class SFTResidualBlock(nn.Module):
    nf: int = 64
    para: int = 10
    sft_type: str = "standard"
    split: str = "22"
    q_injection: bool = False
    q_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea, para_maps, metadata=None):
        s1 = sft_layer(self.sft_type, self.nf, self.split, self.dtype)
        s2 = sft_layer(self.sft_type, self.nf, self.split, self.dtype)
        h = fea if s1 is None else s1(fea, para_maps)
        h = nn.relu(h)
        if self.q_injection and metadata is not None:
            h = ParaCALayer(self.nf, self.para, nonlinearity=True,
                            num_layers=self.q_layers,
                            dtype=self.dtype)(h, metadata)
        h = Conv(self.nf, 3, dtype=self.dtype)(h)
        h = h if s2 is None else s2(h, para_maps)
        h = nn.relu(h)
        if self.q_injection and metadata is not None:
            h = ParaCALayer(self.nf, self.para, nonlinearity=True,
                            num_layers=self.q_layers,
                            dtype=self.dtype)(h, metadata)
        h = Conv(self.nf, 3, dtype=self.dtype)(h)
        return fea + h


class SFTMD(nn.Module):
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 3
    num_features: int = 64
    num_blocks: int = 16
    input_para: int = 10
    sft_type: str = "standard"
    split: str = "22"
    q_injection: bool = False
    q_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        """metadata: (N, P) vector — tiled to maps internally."""
        n, h, w, _ = x.shape
        para_maps = jnp.broadcast_to(metadata[:, None, None, :],
                                     (n, h, w, metadata.shape[-1]))
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        fea = lrelu(Conv(self.num_features, 3, dtype=self.dtype)(x))
        fea = lrelu(Conv(self.num_features, 3, dtype=self.dtype)(fea))
        fea_bef = Conv(self.num_features, 3, dtype=self.dtype)(fea)
        fea_in = fea_bef
        for _ in range(self.num_blocks):
            fea_in = SFTResidualBlock(self.num_features, self.input_para,
                                      self.sft_type, self.split,
                                      self.q_injection, self.q_layers,
                                      dtype=self.dtype)(fea_in, para_maps,
                                                        metadata)
        fea_add = fea_in + fea_bef
        final_sft = sft_layer(self.sft_type, self.num_features, self.split,
                              self.dtype)
        fea_fin = fea_add if final_sft is None else final_sft(fea_add,
                                                              para_maps)
        if self.q_injection:
            fea_fin = ParaCALayer(self.num_features, self.input_para,
                                  nonlinearity=True,
                                  num_layers=self.q_layers,
                                  dtype=self.dtype)(fea_fin, metadata)
        fea = Conv(self.num_features, 3, dtype=self.dtype)(fea_fin)
        if self.scale == 4:
            for _ in range(2):
                fea = Conv(self.num_features * 4, 3, dtype=self.dtype)(fea)
                fea = nn.leaky_relu(pixel_shuffle(fea, 2), 0.2)
        else:
            fea = Conv(self.num_features * self.scale ** 2, 3,
                       dtype=self.dtype)(fea)
            fea = nn.leaky_relu(pixel_shuffle(fea, self.scale), 0.2)
        out = TConv(self.out_nc, (9, 9), padding=4, dtype=self.dtype,
                      param_dtype=jnp.float32)(fea)
        return jnp.clip(out, 0.0, 1.0)


@register_model("sftmd")
class SFTMDHandler(QModelHandler):
    """SFTMD (SFTMD_variants/handlers.py:5): metadata defaults to the
    10-component PCA blur kernel."""

    def __init__(self, num_features=64, num_blocks=16, sft_type="standard",
                 split="22", q_injection=False, metadata=None, **kwargs):
        if metadata is None:
            metadata = ["blur_kernel"]
        super().__init__(metadata=metadata, num_features=num_features,
                         num_blocks=num_blocks, sft_type=sft_type,
                         split=split, q_injection=q_injection, **kwargs)

    def build_module(self, **kw):
        return SFTMD(scale=self.scale, in_nc=self.in_features,
                     input_para=self.num_metadata, dtype=self.dtype, **kw)
