"""Metabed: truncated-EDSR testbed for comparing metadata-insertion
mechanisms.

Reference: rumpy/SISR/models/attention_manipulators/mini_model.py
(MetaResBlock :11-94, MetadataEncoder/Decoder :97-160, Metabed
:163-283) and handlers.py:380-614 (MetaBedHandler with the metadata
autoencoder pretrain phases, MetabedESRGANHandler GAN variant).

TPU-native notes: every meta-block type ('q-layer', res-pipe variants,
SFT, da-layer, dgfmb-layer) is a flax submodule selected at build time,
so the whole forward stays one traced program; the autoencoder pretrain
phases switch loss weights with `set_epoch` + re-jit rather than
mutating requires_grad — freezing is expressed by stop_gradient around
the frozen submodule outputs (functionally identical to zeroed grads).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn

from rumpy_tpu.models.common import Conv, TConv, Upsampler
import jax
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import (
    DGFMBLayer, ParaCALayer, QModelHandler, ResPipesCALayer,
    ResPipesSplitCALayer, SFTLayer)
from rumpy_tpu.models.gan_models import BaseGANHandler
from rumpy_tpu.registry import register_model


class MetaResBlock(nn.Module):
    """EDSR-style res block with optional metadata modulation
    (mini_model.py:11-60)."""
    n_feats: int
    n_params: int
    meta_type: Optional[str] = None
    num_meta_layers: Any = 2
    num_pipes: int = 3
    combine_pipes: str = "concat"
    split_percent: float = 0.25
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata, meta_maps=None):
        res = Conv(self.n_feats, 3, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = Conv(self.n_feats, 3, dtype=self.dtype)(res)
        res = res * self.res_scale
        if self.meta_type == "q-layer":
            res = ParaCALayer(self.n_feats, self.n_params,
                              nonlinearity=True,
                              num_layers=self.num_meta_layers,
                              dtype=self.dtype)(res, metadata)
        elif self.meta_type == "res-pipe-q-layer":
            res = ResPipesCALayer(self.n_feats, self.n_params,
                                  nonlinearity=True,
                                  num_layers=self.num_meta_layers,
                                  num_pipes=self.num_pipes,
                                  combine_pipes=self.combine_pipes,
                                  dtype=self.dtype)(res, metadata)
        elif self.meta_type == "res-pipe-split-q-layer":
            res = ResPipesSplitCALayer(self.n_feats, self.n_params,
                                       nonlinearity=True,
                                       num_layers=self.num_meta_layers,
                                       num_pipes=self.num_pipes,
                                       split_percent=self.split_percent,
                                       dtype=self.dtype)(res, metadata)
        elif self.meta_type == "SFT":
            maps = meta_maps
            if maps is None:
                n, h, w, _ = res.shape
                maps = jnp.broadcast_to(
                    metadata[:, None, None, :].astype(res.dtype),
                    (n, h, w, metadata.shape[-1]))
            res = SFTLayer(self.n_feats, self.n_params,
                           dtype=self.dtype)(res, maps)
        elif self.meta_type == "da-layer":
            from rumpy_tpu.models.dasr import DAConv
            res = DAConv(self.n_feats, 3, dtype=self.dtype)(res, metadata)
        elif self.meta_type == "dgfmb-layer":
            res = DGFMBLayer(num_channels=self.n_feats,
                             degradation_full_dim=self.n_params,
                             num_layers=self.num_meta_layers,
                             dtype=self.dtype)(res, metadata)
        return x + res


class MetadataEncoder(nn.Module):
    """Metadata -> bottleneck vector (mini_model.py:97-126); 1x1 conv
    stack over a (N,1,1,M) layout."""
    input_para: int = 1
    num_bottleneck_nodes: int = 16
    encoder_layers_sizes: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, metadata):
        y = metadata[:, None, None, :].astype(self.dtype) \
            if metadata.ndim == 2 else metadata
        sizes = list(self.encoder_layers_sizes or [36, 24])
        for out_ch in sizes + [self.num_bottleneck_nodes]:
            y = TConv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            y = nn.relu(y)
        return y[:, 0, 0, :].astype(jnp.float32)


class MetadataDecoder(nn.Module):
    """Bottleneck vector -> reconstructed metadata (mini_model.py:129-160)."""
    output_para: int = 1
    num_bottleneck_nodes: int = 16
    decoder_layers_sizes: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc):
        y = enc[:, None, None, :].astype(self.dtype) \
            if enc.ndim == 2 else enc
        sizes = list(self.decoder_layers_sizes or [24, 36])
        for out_ch in sizes + [self.output_para]:
            y = TConv(out_ch, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(y)
            y = nn.relu(y)
        return y[:, 0, 0, :].astype(jnp.float32)


class Metabed(nn.Module):
    """Truncated EDSR with per-block metadata hooks (mini_model.py:163-268)."""
    scale: int = 4
    in_features: int = 3
    out_features: int = 3
    num_features: int = 64
    input_para: int = 1
    meta_block: Optional[str] = None
    num_meta_layers: Any = 2
    num_pipes: int = 3
    combine_pipes: str = "concat"
    split_percent: float = 0.25
    num_blocks: int = 8
    res_scale: float = 0.1
    selective_meta_blocks: Optional[Tuple[bool, ...]] = None
    use_encoder: bool = False
    num_bottleneck_nodes: int = 16
    encoder_layers_sizes: Optional[Tuple[int, ...]] = None
    decoder_layers_sizes: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    def setup(self):
        meta_size = self.input_para
        if self.use_encoder:
            self.meta_enc = MetadataEncoder(
                input_para=self.input_para,
                num_bottleneck_nodes=self.num_bottleneck_nodes,
                encoder_layers_sizes=self.encoder_layers_sizes,
                dtype=self.dtype)
            self.meta_dec = MetadataDecoder(
                output_para=self.input_para,
                num_bottleneck_nodes=self.num_bottleneck_nodes,
                decoder_layers_sizes=self.decoder_layers_sizes,
                dtype=self.dtype)
            meta_size = self.num_bottleneck_nodes
        self.head = Conv(self.num_features, 3, dtype=self.dtype)
        blocks = []
        for index in range(self.num_blocks):
            if self.selective_meta_blocks is None:
                mb = self.meta_block
            else:
                mb = (self.meta_block
                      if self.selective_meta_blocks[index] else None)
            blocks.append(MetaResBlock(
                self.num_features, meta_size, meta_type=mb,
                num_meta_layers=self.num_meta_layers,
                num_pipes=self.num_pipes,
                combine_pipes=self.combine_pipes,
                split_percent=self.split_percent,
                res_scale=self.res_scale, dtype=self.dtype))
        self.blocks = blocks
        self.final_body = Conv(self.num_features, 3, dtype=self.dtype)
        self.upsampler = Upsampler(self.scale, self.num_features,
                                   dtype=self.dtype)
        self.tail_conv = Conv(self.out_features, 3, dtype=self.dtype)

    def encode_metadata(self, metadata):
        return self.meta_enc(metadata)

    def decode_metadata(self, enc):
        return self.meta_dec(enc)

    def __call__(self, x, metadata=None, encoded=False):
        if metadata is not None and self.use_encoder and not encoded:
            metadata = self.meta_enc(metadata)
            # touch the decoder so init creates its params (the AE loss
            # path applies it via method=decode_metadata)
            self.meta_dec(metadata)
        x = self.head(x)
        res = x
        for block in self.blocks:
            res = block(res, metadata)
        res = self.final_body(res)
        res = res + x
        return self.tail_conv(self.upsampler(res))


@register_model("metabed")
class MetaBedHandler(QModelHandler):
    """Miniature EDSR for metadata-mechanism experiments
    (handlers.py:380-545). With `use_encoder`, a metadata autoencoder
    trains alongside: loss = L1(sr) + mult * L1(decoded, metadata),
    where mult = encoder_loss_scaling during the first
    `encoder_pretrain_epochs` and 0 after (phases switched via
    set_epoch + re-jit)."""

    loss_type = "l1"

    def __init__(self, num_blocks=8, num_features=64, res_scale=0.1,
                 meta_block=None, use_encoder=False,
                 encoder_pretrain_epochs=None, encoder_loss_scaling=5.0,
                 freeze_encoder_after_pretrain=False,
                 freeze_decoder_after_pretrain=True,
                 selective_meta_blocks=None, **kwargs):
        self.meta_block = meta_block
        self.no_metadata = meta_block is None
        self.use_encoder = use_encoder
        self.encoder_pretrain_epochs = encoder_pretrain_epochs
        self.encoder_loss_scaling = encoder_loss_scaling
        self.freeze_encoder_after_pretrain = freeze_encoder_after_pretrain
        self.freeze_decoder_after_pretrain = freeze_decoder_after_pretrain
        self.curr_epoch = 0
        smb = (tuple(selective_meta_blocks)
               if selective_meta_blocks is not None else None)
        super().__init__(num_blocks=num_blocks, num_features=num_features,
                         res_scale=res_scale,
                         selective_meta_blocks=smb, **kwargs)

    def build_module(self, **kw):
        return Metabed(scale=self.scale, in_features=self.in_features,
                       input_para=self.num_metadata,
                       meta_block=self.meta_block,
                       use_encoder=self.use_encoder, dtype=self.dtype,
                       **kw)

    def set_epoch(self, epoch: int) -> None:
        prev_phase = self._in_pretrain()
        self.curr_epoch = epoch
        if self._in_pretrain() != prev_phase:
            self._rejit()  # phase flip changes the traced loss

    def _in_pretrain(self) -> bool:
        return (self.encoder_pretrain_epochs is not None
                and self.curr_epoch < self.encoder_pretrain_epochs)

    def apply(self, params, batch, train=False, rng=None, extra=None):
        meta = batch.get("metadata")
        if meta is not None:
            meta = meta.astype(jnp.float32)
        elif not self.no_metadata:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        if not self.use_encoder:
            sr = self.module.apply({"params": params}, batch["lr"], meta)
            return sr, {}, extra
        enc = self.module.apply({"params": params}, meta,
                                method=Metabed.encode_metadata)
        post = (not self._in_pretrain()
                and self.encoder_pretrain_epochs is not None)
        if post and self.freeze_encoder_after_pretrain:
            enc = jax.lax.stop_gradient(enc)
        dec_in = enc
        if post and self.freeze_decoder_after_pretrain:
            dec_in = jax.lax.stop_gradient(enc)
        decoded = self.module.apply({"params": params}, dec_in,
                                    method=Metabed.decode_metadata)
        if post and self.freeze_decoder_after_pretrain:
            decoded = jax.lax.stop_gradient(decoded)
        sr = self.module.apply({"params": params}, batch["lr"], enc,
                               encoded=True)
        ae = jnp.mean(jnp.abs(decoded - meta))
        return sr, {"l1-loss-ae": ae}, extra

    def compute_losses(self, sr, batch, aux):
        l1 = jnp.mean(jnp.abs(sr - batch["hr"]))
        if not self.use_encoder:
            return {"train-loss": l1}
        mult = self.encoder_loss_scaling if self._in_pretrain() else 0.0
        scaled = mult * aux["l1-loss-ae"]
        return {"train-loss": l1 + scaled, "l1-loss": l1,
                "l1-loss-ae": aux["l1-loss-ae"],
                "scaled-l1-loss-ae": scaled}


@register_model("metabedesrgan")
class MetabedESRGANHandler(BaseGANHandler):
    """Metabed generator under the ESRGAN GAN recipe
    (handlers.py:548-614): reuses the shared GAN machinery (L1 pretrain
    phase, relativistic adversarial phase, VGG-128 discriminator) with
    the metadata-conditioned Metabed as generator."""

    gan_mode = "relativistic"
    uses_metadata = True

    def __init__(self, metadata=None, metadata_bypass_len=None,
                 num_blocks=8, num_features=64, res_scale=0.1,
                 meta_block=None, selective_meta_blocks=None, **kwargs):
        from rumpy_tpu.models.attention_manipulators import \
            compute_num_metadata
        if metadata is None and metadata_bypass_len is None:
            metadata = ["qpi"]
        self.metadata_keys = list(metadata) if metadata else None
        self.num_metadata = compute_num_metadata(metadata,
                                                 metadata_bypass_len)
        self.meta_block = meta_block
        self.no_metadata = meta_block is None
        smb = (tuple(selective_meta_blocks)
               if selective_meta_blocks is not None else None)
        kwargs.pop("nf", None), kwargs.pop("nb", None), \
            kwargs.pop("gc", None)
        super().__init__(num_blocks=num_blocks,
                         num_features=num_features, res_scale=res_scale,
                         selective_meta_blocks=smb, **kwargs)

    def build_module(self, nf=None, nb=None, gc=None, **kw):
        return Metabed(scale=self.scale, in_features=self.in_features,
                       input_para=self.num_metadata,
                       meta_block=self.meta_block, dtype=self.dtype,
                       **kw)

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, self.in_features),
                          jnp.float32),
                jnp.zeros((batch, self.num_metadata), jnp.float32))

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gp = params["generator"] if "generator" in params else params
        meta = batch.get("metadata")
        meta = meta.astype(jnp.float32) if meta is not None else None
        if meta is None and not self.no_metadata:
            raise RuntimeError("Metadata needs to be specified for this "
                               "network to run properly.")
        sr = self.module.apply({"params": gp}, batch["lr"], meta)
        return sr, {}, extra

    def handler_metadata(self):
        return {"metadata_keys_used_in_training": self.metadata_keys,
                "num_metadata": self.num_metadata}

    def select_metadata(self, metadata, keys=None):
        from rumpy_tpu.models.attention_manipulators import (
            select_metadata_columns)
        return select_metadata_columns(metadata, keys, self.metadata_keys)
