"""SimCLR-style colour distortion, on-device and batched.

Reference: rumpy/image_tools/image_manipulation/image_functions.py:364-371
— torchvision `ColorJitter(0.8s, 0.8s, 0.8s, 0.2s)` wrapped in
`RandomApply(p=0.8)` followed by `RandomGrayscale(p=0.2)`, applied
per-image on CPU workers. Here the same distribution is drawn from a PRNG
key and applied to the whole (N, H, W, C) batch in one jitted program
(vmap over per-image factors + a lax.switch over the jitter-op
permutation, matching torchvision's random op order)."""

from __future__ import annotations

from functools import partial
from itertools import permutations

import jax
import jax.numpy as jnp

_GRAY_W = jnp.array([0.2989, 0.587, 0.114], jnp.float32)
_PERMS = jnp.array(list(permutations(range(4))), jnp.int32)  # (24, 4)


def _gray(img):
    g = jnp.tensordot(img, _GRAY_W, axes=[[-1], [0]])
    return g[..., None]


def _brightness(img, f):
    return jnp.clip(img * f, 0.0, 1.0)


def _contrast(img, f):
    mean = jnp.mean(_gray(img))
    return jnp.clip(f * img + (1.0 - f) * mean, 0.0, 1.0)


def _saturation(img, f):
    return jnp.clip(f * img + (1.0 - f) * _gray(img), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _hue(img, shift):
    h, s, v = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    return _hsv_to_rgb((h + shift) % 1.0, s, v)


def _distort_one(img, factors, perm_idx, apply_jitter, apply_gray):
    """factors: (4,) = [brightness, contrast, saturation, hue_shift]."""

    def step(i, im):
        op = _PERMS[perm_idx, i]
        return jax.lax.switch(
            op,
            [lambda x: _brightness(x, factors[0]),
             lambda x: _contrast(x, factors[1]),
             lambda x: _saturation(x, factors[2]),
             lambda x: _hue(x, factors[3])],
            im)

    jittered = jax.lax.fori_loop(0, 4, step, img)
    out = jnp.where(apply_jitter, jittered, img)
    grayed = jnp.broadcast_to(_gray(out), out.shape)
    return jnp.where(apply_gray, grayed, out)


@partial(jax.jit, static_argnames=("dist_strength",))
def colour_distortion(key, images: jnp.ndarray,
                      dist_strength: float = 1.0) -> jnp.ndarray:
    """images: (N, H, W, 3) float [0, 1]. Per-image independent draws —
    contrastive views fed separately get different distortions, the
    property SimCLR relies on."""
    n = images.shape[0]
    b = 0.8 * dist_strength
    hmax = 0.2 * dist_strength
    k = jax.random.split(key, 5)
    factors = jnp.stack([
        jax.random.uniform(k[0], (n,), minval=max(0.0, 1 - b), maxval=1 + b),
        jax.random.uniform(k[1], (n,), minval=max(0.0, 1 - b), maxval=1 + b),
        jax.random.uniform(k[2], (n,), minval=max(0.0, 1 - b), maxval=1 + b),
        jax.random.uniform(k[3], (n,), minval=-hmax, maxval=hmax),
    ], axis=1)
    u = jax.random.uniform(k[4], (n, 3))
    perm_idx = (u[:, 0] * 24).astype(jnp.int32)
    apply_jitter = u[:, 1] < 0.8
    apply_gray = u[:, 2] < 0.2
    return jax.vmap(_distort_one)(images.astype(jnp.float32), factors,
                                  perm_idx, apply_jitter, apply_gray)
