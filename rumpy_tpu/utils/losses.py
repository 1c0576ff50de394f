"""Loss functions.

Mirror of rumpy/sr_tools/loss_functions.py: SupConLoss (HobbitLong
implementation semantics, :41-130), perceptual-loss mechanism (gated on
pretrained VGG weights, :22-38), occupancy loss.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def supcon_loss(features: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                temperature: float = 0.07, base_temperature: float = 0.07,
                contrast_mode: str = "all") -> jnp.ndarray:
    """Supervised contrastive loss.

    :param features: (N, V, D) L2-normalized, V views per example.
    :param labels: (N,) int labels; None => SimCLR (positives = other views
        of the same example).
    """
    n, v, d = features.shape
    # contrast order: view-major, i.e. torch.cat(torch.unbind(f, 1), 0)
    flat = jnp.concatenate(jnp.split(features, v, axis=1),
                           axis=0).reshape(n * v, d)

    if labels is None:
        mask = jnp.eye(n)
    else:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)

    # contrast_mode 'one' anchors only on the first view
    # (loss_functions.py:91-99); 'all' anchors on every view
    if contrast_mode == "one":
        anchor = flat[:n]
        anchor_count = 1
    elif contrast_mode == "all":
        anchor = flat
        anchor_count = v
    else:
        raise ValueError(f"Unknown contrast_mode {contrast_mode!r}")
    contrast_count = v
    mask = jnp.tile(mask, (anchor_count, contrast_count))

    logits = jnp.matmul(anchor, flat.T,
                        precision=jax.lax.Precision.HIGHEST) / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1,
                                                       keepdims=True))
    # mask out self-contrast
    logits_mask = 1.0 - jnp.eye(n * v)[:n * anchor_count]
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(exp_logits.sum(axis=1, keepdims=True) + 1e-12)
    mask_sum = jnp.maximum(mask.sum(axis=1), 1e-12)
    mean_log_prob_pos = (mask * log_prob).sum(axis=1) / mask_sum
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return loss.mean()


def occupancy_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   occupancy_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked L1 — only scored where the occupancy mask is set."""
    diff = jnp.abs(pred - target) * occupancy_mask
    return diff.sum() / jnp.maximum(occupancy_mask.sum(), 1.0)


class PerceptualMechanism:
    """VGG-feature perceptual loss (reference loss_functions.py:22-38):
    ``lambda_pixel * L1(sr, y) + lambda_per * L1(vgg(sr), vgg(y))`` with
    the reference's VGG-19 p_loss extractor (conv5_4 tap, ImageNet
    normalization). Weights come from a converted torchvision checkpoint
    (models/feature_extractors.py::convert_torch_vgg19); construction is
    gated on them, like the reference is gated on a torchvision download.

    Inputs are NHWC RGB float [0, 1]; the whole call is jittable."""

    def __init__(self, weights_path: Optional[str] = None,
                 lambda_pixel: float = 1.0, lambda_per: float = 0.01,
                 vgg_layer: str = "conv5_4"):
        if weights_path is None:
            raise NotImplementedError(
                "Perceptual loss needs pretrained VGG weights; pass a "
                "weights npz path (convert_torch_vgg19)")
        from rumpy_tpu.models.feature_extractors import (VGG19Features,
                                                         load_extractor_params)
        self.lambda_pixel = lambda_pixel
        self.lambda_per = lambda_per
        self.module = VGG19Features(tap=vgg_layer)
        self.params = load_extractor_params(weights_path)

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply({"params": self.params}, images)

    def __call__(self, sr: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        gen_features = self.features(sr)
        real_features = jax.lax.stop_gradient(self.features(y))
        vgg_loss = jnp.mean(jnp.abs(gen_features - real_features))
        pixel_loss = jnp.mean(jnp.abs(sr - y))
        return self.lambda_pixel * pixel_loss + self.lambda_per * vgg_loss
