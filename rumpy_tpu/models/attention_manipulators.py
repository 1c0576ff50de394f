"""Meta-attention family ("Best of Both Worlds" injection mechanism).

Reference: rumpy/SISR/models/attention_manipulators/ — the QModel handler
base computes the metadata vector size (with fixed expansions for
contrastive encodings / PCA blur kernels), assembles per-example metadata
vectors by key selection, and threads them into Q-architectures:

  * ParaCALayer — the meta-attention module (q_layer.py:5-52): FC stack
    over the metadata vector -> sigmoid -> channel gate;
  * QCALayer — channel attention fused with metadata in 6 styles
    (architectures.py:41-150);
  * QRCAB / QResidualGroup / QRCAN (architectures.py:154-461) with
    selective_meta_blocks and num_q_layers_inner_residual wiring;
  * QEDSR (architectures.py:497-551) with ParamResBlock;
  * SFT modulation (scale/shift from tiled metadata maps) for
    SFT/SRMD-style injection.

NHWC flax; metadata rides as a (N, M) vector, broadcast to (N,1,1,M)
inside the attention modules so every op is a 1x1 conv the MXU eats.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, Upsampler
import jax.numpy as jnp
import numpy as np

from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.registry import register_model

# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class ParaCALayer(nn.Module):
    """Meta-attention: metadata vector -> staged FC stack -> sigmoid ->
    channel-wise gate on the feature map."""
    network_channels: int
    num_metadata: int
    nonlinearity: bool = True
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attributes):
        # attributes: (N, M). Layer sizing mirrors q_layer.py:26-37.
        y = attributes[:, None, None, :].astype(self.dtype)
        multiplier = self.num_layers
        for _ in range(self.num_layers):
            if self.num_metadata > 15:
                out_ch = ((self.network_channels - self.num_metadata)
                          // multiplier + self.num_metadata)
            else:
                out_ch = self.network_channels // multiplier
            y = TConv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            if self.nonlinearity and multiplier != 1:
                y = nn.relu(y)
            multiplier -= 1
        y = nn.sigmoid(y)
        self.sow("intermediates", "attention", y)
        return x * y


class ResPipesCALayer(nn.Module):
    """Multi-pipe meta-attention (q_layer.py:55-113): `num_pipes` parallel
    1x1-conv stacks of increasing depth run the metadata from M up to
    network_channels; pipes are concatenated (or summed) into the final
    sigmoid attention vector."""
    network_channels: int
    num_metadata: int
    nonlinearity: bool = True
    num_layers: Any = 2
    num_pipes: int = 3
    combine_pipes: str = "concat"
    dtype: Any = jnp.float32

    def _pipe_sizes(self, i):
        if isinstance(self.num_layers, (list, tuple)):
            n = self.num_layers[i]
        else:
            n = self.num_layers + i
        start, stop = self.num_metadata, self.network_channels
        diff = (stop - start) / n
        return [int(diff * j + start) for j in range(n + 1)]

    @nn.compact
    def __call__(self, x, attributes):
        y_in = attributes[:, None, None, :].astype(self.dtype)
        outs = []
        for i in range(self.num_pipes):
            sizes = self._pipe_sizes(i)
            y = y_in
            for out_ch in sizes[1:]:
                y = TConv(out_ch, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(y)
                if self.nonlinearity:
                    y = nn.relu(y)
            outs.append(y)
        if self.combine_pipes == "add":
            combined = sum(outs)
        else:
            combined = jnp.concatenate(outs, axis=-1)
        y = TConv(self.network_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(combined)
        y = nn.sigmoid(y)
        self.sow("intermediates", "attention", y)
        return x * y


class ResPipesSplitCALayer(nn.Module):
    """Split-pipe meta-attention (q_layer.py:126-215): pipe 0 maps the
    metadata up to network_channels, a `split_percent` slice is kept
    and the remainder feeds the next pipe; kept slices concat into the
    attention vector."""
    network_channels: int
    num_metadata: int
    nonlinearity: bool = True
    num_layers: Any = 2
    num_pipes: int = 3
    split_percent: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attributes):
        split_f = int(self.network_channels * self.split_percent)
        rem_f = self.network_channels - split_f
        y = attributes[:, None, None, :].astype(self.dtype)
        kept = []
        carry = y
        for i in range(self.num_pipes):
            if isinstance(self.num_layers, (list, tuple)):
                n = self.num_layers[i]
            else:
                n = self.num_layers + i
            start = self.num_metadata if i == 0 else rem_f
            stop = split_f if i == self.num_pipes - 1 \
                else self.network_channels
            diff = (stop - start) / n
            sizes = [int(diff * j + start) for j in range(n + 1)]
            h = carry
            for out_ch in sizes[1:]:
                h = TConv(out_ch, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(h)
                if self.nonlinearity:
                    h = nn.relu(h)
            if i == self.num_pipes - 1:
                kept.append(h)
            else:
                kept.append(h[..., :split_f])
                carry = h[..., split_f:]
        combined = jnp.concatenate(kept, axis=-1)
        att = TConv(self.network_channels, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(combined)
        att = nn.sigmoid(att)
        self.sow("intermediates", "attention", att)
        return x * att


class DGFMBLayer(nn.Module):
    """Degradation-Guided Feature Modulation Block (dgfmb_layer.py:5-92):
    global-avg-pooled features concat a (reduced) degradation encoding,
    staged 1x1 stack -> sigmoid -> residual channel gate."""
    num_channels: int = 64
    degradation_full_dim: int = 256
    degradation_reduced_dim: int = 64
    num_layers: Any = 2
    use_reduction: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, encoding):
        red_dim = (self.degradation_reduced_dim if self.use_reduction
                   else self.degradation_full_dim)
        gap = features.mean(axis=(1, 2), keepdims=True)
        enc = encoding[:, None, None, :].astype(features.dtype) \
            if encoding.ndim == 2 else encoding
        if self.use_reduction:
            enc = TConv(red_dim, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32)(enc)
        y = jnp.concatenate([gap, enc], axis=-1)
        combined = self.num_channels + red_dim
        if isinstance(self.num_layers, (list, tuple)):
            sizes = list(self.num_layers) + [self.num_channels]
        else:
            sizes = []
            multiplier = self.num_layers
            for _ in range(self.num_layers):
                if combined > 15:
                    sizes.append((self.num_channels - combined)
                                 // multiplier + combined)
                else:
                    sizes.append(self.num_channels // multiplier)
                multiplier -= 1
        for out_ch in sizes:
            y = TConv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
        att = nn.sigmoid(y)
        self.sow("intermediates", "attention", att)
        return features * att + features


class PALayer(nn.Module):
    """Pixel attention: per-pixel sigmoid gate."""
    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = TConv(self.channel // 8, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.relu(y)
        y = TConv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(y)
        return x * nn.sigmoid(y)


class SFTLayer(nn.Module):
    """Spatial feature transform: scale/shift conditioned on metadata maps
    (SFTMD-style; metadata tiled to (N,H,W,M))."""
    nf: int
    para: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, meta_maps):
        cond = jnp.concatenate([x, meta_maps.astype(x.dtype)], axis=-1)
        scale = TConv(self.nf, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(nn.leaky_relu(
                            TConv(self.nf, (1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32)(cond), 0.1))
        shift = TConv(self.nf, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(nn.leaky_relu(
                            TConv(self.nf, (1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32)(cond), 0.1))
        return x * (scale + 1.0) + shift


class QCALayer(nn.Module):
    """Channel attention with metadata fusion, 6 styles
    (architectures.py:41-150)."""
    channel: int
    style: str = "modulate"
    reduction: int = 16
    num_metadata: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attributes):
        conv = lambda ch: TConv(ch, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32)
        red = max(1, self.channel // self.reduction)
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        attrs = (attributes[:, None, None, :].astype(y.dtype)
                 if attributes is not None else None)
        style = self.style
        if style == "standard":
            y = conv(red)(y)
            y = nn.relu(y)
            y = nn.sigmoid(conv(self.channel)(y))
        elif style == "modulate":
            y = conv(red)(y)
            y = nn.relu(y)
            y = nn.sigmoid(conv(self.channel)(y))
            y = y * attrs
        elif style == "max_concat":
            y = conv(red)(jnp.concatenate([y, attrs], -1))
            y = nn.relu(y)
            y = nn.sigmoid(conv(self.channel)(y))
        elif style == "softmax":
            # reference: same sigmoid-terminated stack as max_concat,
            # with Softmax applied ON TOP (architectures.py:76-89)
            y = conv(red)(jnp.concatenate([y, attrs], -1))
            y = nn.relu(y)
            y = nn.sigmoid(conv(self.channel)(y))
            y = nn.softmax(y, axis=-1)
        elif style == "mini_concat":
            # reference: pre_concat conv, then ReLU over the CONCAT of
            # (reduced features, metadata) — negative metadata entries
            # are clipped before the final conv (architectures.py:83-88)
            y = conv(red)(y)
            y = nn.relu(jnp.concatenate([y, attrs], -1))
            y = nn.sigmoid(conv(self.channel)(y))
        elif style == "extended_attention":
            for out_ch in (self.channel // 2, self.channel // 4, red):
                y = conv(out_ch)(jnp.concatenate([y, attrs], -1))
                y = nn.relu(y)
            y = nn.sigmoid(conv(self.channel)(y))
        else:
            raise NotImplementedError(style)
        self.sow("intermediates", "attention", y)
        return x * y


class QRCAB(nn.Module):
    features: int
    reduction: int = 16
    style: str = "modulate"
    res_scale: float = 1.0
    q_layer: bool = False
    pa: bool = False
    sft_layer: bool = False
    num_metadata: int = 1
    num_layers_in_q_layer: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, meta_maps=None):
        res = Conv(self.features, 3, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = Conv(self.features, 3, dtype=self.dtype)(res)
        res = QCALayer(self.features, self.style, self.reduction,
                       self.num_metadata, dtype=self.dtype)(res, metadata)
        if self.pa:
            res = PALayer(self.features, dtype=self.dtype)(res)
        if self.q_layer:
            res = ParaCALayer(self.features, self.num_metadata,
                              nonlinearity=True,
                              num_layers=self.num_layers_in_q_layer,
                              dtype=self.dtype)(res, metadata)
        if self.sft_layer and meta_maps is not None:
            res = SFTLayer(self.features, self.num_metadata,
                           dtype=self.dtype)(res, meta_maps)
        return x + res


class QResidualGroup(nn.Module):
    features: int
    n_resblocks: int = 20
    reduction: int = 16
    style: str = "modulate"
    res_scale: float = 1.0
    q_layer: bool = False
    pa: bool = False
    sft_layer: bool = False
    num_q_layers: Optional[int] = None
    num_metadata: int = 1
    num_layers_in_q_layer: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, meta_maps=None):
        res = x
        for i in range(self.n_resblocks):
            q_in = self.q_layer and (self.num_q_layers is None
                                     or i < self.num_q_layers)
            res = QRCAB(self.features, self.reduction, self.style,
                        self.res_scale, q_layer=q_in, pa=self.pa,
                        sft_layer=self.sft_layer,
                        num_metadata=self.num_metadata,
                        num_layers_in_q_layer=self.num_layers_in_q_layer,
                        dtype=self.dtype)(res, metadata, meta_maps)
        res = Conv(self.features, 3, dtype=self.dtype)(res)
        return x + res


class QRCAN(nn.Module):
    scale: int = 4
    in_feats: int = 3
    out_feats: int = 3
    n_feats: int = 64
    n_resgroups: int = 10
    n_resblocks: int = 20
    reduction: int = 16
    res_scale: float = 1.0
    style: str = "modulate"
    num_metadata: int = 1
    include_q_layer: bool = False
    include_pixel_attention: bool = False
    include_sft_layer: bool = False
    selective_meta_blocks: Optional[Tuple[bool, ...]] = None
    num_q_layers_inner_residual: Optional[int] = None
    num_layers_in_q_layer: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, meta_maps=None):
        x = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        for g in range(self.n_resgroups):
            active = (self.selective_meta_blocks is None
                      or self.selective_meta_blocks[g])
            res = QResidualGroup(
                self.n_feats, self.n_resblocks, self.reduction, self.style,
                self.res_scale,
                q_layer=self.include_q_layer and active,
                pa=self.include_pixel_attention,
                sft_layer=self.include_sft_layer and active,
                num_q_layers=self.num_q_layers_inner_residual,
                num_metadata=self.num_metadata,
                num_layers_in_q_layer=self.num_layers_in_q_layer,
                dtype=self.dtype)(res, metadata, meta_maps)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        res = res + x
        res = Upsampler(self.scale, self.n_feats, dtype=self.dtype)(res)
        return Conv(self.out_feats, 3, dtype=self.dtype)(res)


class ParamResBlock(nn.Module):
    """EDSR ResBlock + optional ParaCALayer (architectures.py ParamResBlock)."""
    features: int
    input_para: int
    res_scale: float = 0.1
    add_q_layer: bool = True
    q_layer_nonlinearity: bool = False
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        res = Conv(self.features, 3, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = Conv(self.features, 3, dtype=self.dtype)(res)
        res = res * self.res_scale
        if self.add_q_layer:
            res = ParaCALayer(self.features, self.input_para,
                              nonlinearity=self.q_layer_nonlinearity,
                              num_layers=self.num_layers,
                              dtype=self.dtype)(res, metadata)
        return x + res


class QEDSR(nn.Module):
    scale: int = 4
    in_features: int = 3
    out_features: int = 3
    num_features: int = 64
    num_blocks: int = 16
    res_scale: float = 0.1
    input_para: int = 1
    q_layer_nonlinearity: bool = False
    selective_meta_blocks: Optional[Tuple[bool, ...]] = None
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata):
        x = Conv(self.num_features, 3, dtype=self.dtype)(x)
        res = x
        smb = self.selective_meta_blocks
        if smb == "front_only":
            smb = (True,) + (False,) * (self.num_blocks - 1)
        for i in range(self.num_blocks):
            add_q = smb is None or smb[i]
            res = ParamResBlock(self.num_features, self.input_para,
                                self.res_scale, add_q_layer=add_q,
                                q_layer_nonlinearity=self.q_layer_nonlinearity,
                                num_layers=self.num_layers,
                                dtype=self.dtype)(res, metadata)
        res = Conv(self.num_features, 3, dtype=self.dtype)(res)
        res = res + x
        res = Upsampler(self.scale, self.num_features, dtype=self.dtype)(res)
        return Conv(self.out_features, 3, dtype=self.dtype)(res)


# ---------------------------------------------------------------------------
# Handler base
# ---------------------------------------------------------------------------

# Fixed metadata-size expansions (attention_manipulators/__init__.py:30-51).
_EXPANSIONS = {
    "contrastive_encoding": 255,
    "contrastive_q": 255,
    "contrastive_encoding_tsne": 1,
    "contrastive_q_tsne": 1,
    "contrastive_encoding_pca": 10,
    "contrastive_q_pca": 7,
    "all": 39,  # all celeba attributes
}


def compute_num_metadata(metadata: Optional[Sequence[str]],
                         metadata_bypass_len: Optional[int] = None) -> int:
    if metadata_bypass_len:
        return metadata_bypass_len
    if metadata is None:
        return 1  # defaults to ['qpi']
    n = len(metadata)
    for key, extra in _EXPANSIONS.items():
        if key in metadata:
            n += extra
    if "blur_kernel" in metadata:
        n += 9  # 10-component PCA kernel occupies 10 slots (1 + 9)
    elif any("unmodified_blur_kernel" in m for m in metadata):
        n += 440  # full 21x21 kernel (441 slots)
    return n


def select_metadata_columns(metadata, keys, requested):
    """Mask a (B, K) metadata matrix down to the requested key list —
    generate_channels selection semantics (__init__.py:93-96): 'all' in
    the requested list selects EVERY column; otherwise a column is kept
    when its key matches a requested name exactly or as the suffix of a
    'step-op-name' CSV column. Shared by QModelHandler and the attribute
    GAN handlers so the two families cannot diverge."""
    if keys is None or requested is None or "all" in requested:
        return metadata
    mask = [any(k == m or k.endswith(f"-{m}") for m in requested)
            for k in keys]
    idx = np.nonzero(mask)[0]
    return metadata[:, idx]


class QModelHandler(BaseHandler):
    """Base for metadata-injection models (QModel parity,
    attention_manipulators/__init__.py:11-202)."""

    uses_metadata = True
    colorspace = "rgb"  # 'augmented_rgb' in the reference; rgb data path
    im_input = "unmodified"

    def __init__(self, metadata=None, metadata_bypass_len=None,
                 ignore_degradation_location=False, **kwargs):
        if metadata is None and metadata_bypass_len is None:
            metadata = ["qpi"]
        if metadata is not None and ignore_degradation_location:
            metadata = [m[2:] if m[0].isdigit() else m for m in metadata]
        self.metadata_keys = list(metadata) if metadata else None
        self.num_metadata = compute_num_metadata(metadata,
                                                 metadata_bypass_len)
        super().__init__(**kwargs)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features), jnp.float32),
                jnp.zeros((batch, self.num_metadata), jnp.float32))

    def select_metadata(self, metadata, keys=None):
        """Mask the full metadata matrix down to the requested keys
        (generate_channels selection, __init__.py:86-107). With no key list
        the matrix is assumed pre-selected."""
        return select_metadata_columns(metadata, keys, self.metadata_keys)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        meta = batch.get("metadata")
        if meta is None:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        meta = meta.astype(jnp.float32)
        sr = self.module.apply({"params": params}, batch["lr"], meta)
        return sr, {}, extra

    def handler_metadata(self):
        return {"metadata_keys_used_in_training": self.metadata_keys,
                "num_metadata": self.num_metadata}


@register_model("qrcan")
class QRCANHandler(QModelHandler):
    """QRCAN with selectable meta-attention wiring; `style='modulate'`
    additionally supports the gaussian scale_qpi modulation
    (handlers.py:59-79)."""

    def __init__(self, style="modulate", include_q_layer=True,
                 selective_meta_blocks=None,
                 num_q_layers_inner_residual=None, n_feats=64,
                 n_resgroups=10, n_resblocks=20, reduction=16,
                 include_pixel_attention=False, include_sft_layer=False,
                 clamp=False, min_mu=-0.2, max_mu=0.8, **kwargs):
        self.style = style
        self.clamp = clamp
        self.min_mu = min_mu
        self.max_mu = max_mu
        super().__init__(
            style=style, include_q_layer=include_q_layer,
            selective_meta_blocks=tuple(selective_meta_blocks)
            if selective_meta_blocks else None,
            num_q_layers_inner_residual=num_q_layers_inner_residual,
            n_feats=n_feats, n_resgroups=n_resgroups,
            n_resblocks=n_resblocks, reduction=reduction,
            include_pixel_attention=include_pixel_attention,
            include_sft_layer=include_sft_layer, **kwargs)

    def build_module(self, **kw):
        # modulate-style expands a scalar qpi into an n_feats gaussian
        # profile (scale_qpi), so the module sees n_feats metadata slots.
        eff_meta = (kw["n_feats"] if (self.style == "modulate"
                                      and self.num_metadata == 1)
                    else self.num_metadata)
        return QRCAN(scale=self.scale, in_feats=self.in_features,
                     num_metadata=eff_meta, dtype=self.dtype, **kw)

    def example_inputs(self, batch: int = 1, size: int = 16):
        m = self.module.num_metadata
        args = [jnp.zeros((batch, size, size, self.in_features), jnp.float32),
                jnp.zeros((batch, m), jnp.float32)]
        if self.module.include_sft_layer:
            args.append(jnp.zeros((batch, size, size, m), jnp.float32))
        return tuple(args)

    def scale_qpi(self, qpi):
        """Gaussian channel profile centered by the (normalized) qpi
        (handlers.py:62-75): metadata becomes an n_feats-length gaussian."""
        n_feats = self.module.n_feats
        base = jnp.linspace(0.0, 1.0, n_feats)
        mu = qpi * (self.max_mu - self.min_mu) + self.min_mu
        sig = 0.2
        g = (1 / (jnp.sqrt(2 * jnp.pi) * sig)) * jnp.exp(
            -((base[None, :] - mu) ** 2) / (2 * sig ** 2))
        if self.clamp:
            g = jnp.clip(g, 0.0, 1.0)
        return g

    def apply(self, params, batch, train=False, rng=None, extra=None):
        meta = batch.get("metadata")
        if meta is None:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        meta = meta.astype(jnp.float32)
        if self.style == "modulate" and meta.shape[-1] == 1:
            meta = self.scale_qpi(meta)
        meta_maps = None
        if self.module.include_sft_layer:
            n, h, w, _ = batch["lr"].shape
            meta_maps = jnp.broadcast_to(meta[:, None, None, :],
                                         (n, h, w, meta.shape[-1]))
        sr = self.module.apply({"params": params}, batch["lr"], meta,
                               meta_maps)
        return sr, {}, extra


@register_model("qedsr")
class QEDSRHandler(QModelHandler):
    def __init__(self, num_features=64, num_blocks=16, res_scale=0.1,
                 selective_meta_blocks=None, q_layer_nonlinearity=False,
                 **kwargs):
        super().__init__(
            num_features=num_features, num_blocks=num_blocks,
            res_scale=res_scale,
            selective_meta_blocks=(tuple(selective_meta_blocks)
                                   if isinstance(selective_meta_blocks,
                                                 (list, tuple))
                                   else selective_meta_blocks),
            q_layer_nonlinearity=q_layer_nonlinearity, **kwargs)

    def build_module(self, **kw):
        return QEDSR(scale=self.scale, in_features=self.in_features,
                     input_para=self.num_metadata, dtype=self.dtype, **kw)
