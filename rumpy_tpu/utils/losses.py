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
    # anchor order: view-major, i.e. torch.cat(torch.unbind(f, 1), 0)
    flat = jnp.concatenate(jnp.split(features, v, axis=1),
                           axis=0).reshape(n * v, d)

    if labels is None:
        mask = jnp.eye(n)
    else:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)

    anchor_count = contrast_count = v
    mask = jnp.tile(mask, (anchor_count, contrast_count))

    logits = jnp.matmul(flat, flat.T,
                        precision=jax.lax.Precision.HIGHEST) / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1,
                                                       keepdims=True))
    # mask out self-contrast
    logits_mask = 1.0 - jnp.eye(n * v)
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
    """VGG-feature perceptual loss (loss_functions.py:22-38). Requires
    pretrained VGG weights which are not shipped in this image; gate."""

    def __init__(self, weights_path: Optional[str] = None,
                 pixel_weight: float = 1.0, vgg_weight: float = 1.0):
        if weights_path is None:
            raise NotImplementedError(
                "Perceptual loss needs pretrained VGG weights; pass a "
                "weights npz path")
        raise NotImplementedError("VGG weight loading not yet implemented")
