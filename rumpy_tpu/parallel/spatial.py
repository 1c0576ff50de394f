"""Spatial (H-axis) sharding for giant-image SR — halo exchange over ICI.

The reference bounds memory on large images with recursive single-device
tiling (SAN forward_chop, advanced/handlers.py:85-134). On a TPU mesh we
can do better: shard the image's height across devices and exchange
"halo" rows with mesh neighbors via `jax.lax.ppermute` so each shard has
the receptive-field context it needs — the convolutional analog of
ring-attention's neighbor exchange (SURVEY.md §5). Collectives ride ICI;
the host never sees intermediate tiles.

Two entry points:

- `halo_exchange(x, halo, axis_name)` — inside `shard_map`: pull `halo`
  rows from the previous/next shard (reflect-padding at the global
  edges), returning the strip extended by 2*halo rows.
- `spatial_sharded_forward(forward, image, scale, mesh, halo)` — run an
  (N,H,W,C)->(N,sH,sW,C) conv forward over an image H-sharded across the
  mesh's devices. Contract: when `halo` covers the network's
  receptive-field radius the result equals
  `crop(forward(reflect_pad(image, halo)))` — interior shard seams are
  bit-exact; the global top/bottom edge sees reflected context instead
  of the network's own boundary padding (the zero-pad state of inner
  conv layers at a true boundary is not representable as input rows).
  For very deep nets pick `halo` as an accuracy/VMEM trade-off like
  forward_chop's `shave`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int,
                  axis_name: str = "data") -> jnp.ndarray:
    """Extend an H-sharded strip with `halo` rows from each neighbor.

    Must be called inside `shard_map` over `axis_name`. `x` is this
    shard's (N, h, W, C) strip. Edge shards reflect-pad instead of
    receiving (zeros from the non-participating ppermute edge are
    replaced).
    """
    n_shards = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:, :halo]       # rows my *next* neighbor needs
    bottom_rows = x[:, -halo:]   # rows my *previous* neighbor needs

    # shift bottoms downward: shard i receives shard i-1's bottom rows
    from_prev = jax.lax.ppermute(
        bottom_rows, axis_name,
        [(i, i + 1) for i in range(n_shards - 1)])
    # shift tops upward: shard i receives shard i+1's top rows
    from_next = jax.lax.ppermute(
        top_rows, axis_name,
        [(i + 1, i) for i in range(n_shards - 1)])

    # global edges: reflect own rows (matches jnp.pad mode='reflect')
    reflect_top = x[:, 1:halo + 1][:, ::-1]
    reflect_bottom = x[:, -halo - 1:-1][:, ::-1]
    from_prev = jnp.where(idx == 0, reflect_top, from_prev)
    from_next = jnp.where(idx == n_shards - 1, reflect_bottom, from_next)

    return jnp.concatenate([from_prev, x, from_next], axis=1)


def spatial_sharded_forward(forward: Callable, image: jnp.ndarray,
                            scale: int, mesh: Mesh, halo: int = 10,
                            axis_name: str = "data") -> jnp.ndarray:
    """SR a giant image with its height sharded across the mesh.

    :param forward: jit-able (N, h, W, C) -> (N, s*h, s*W, C) network.
    :param image: (N, H, W, C); H is padded up to a multiple of the
        shard count (reflect) and cropped back after.
    :param halo: context rows exchanged with neighbors; exact when
        >= the network's receptive-field radius.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis_name]
    n, h, w, c = image.shape
    pad_h = (-h) % n_dev
    if pad_h:
        image = jnp.pad(image, ((0, 0), (0, pad_h), (0, 0), (0, 0)),
                        mode="reflect")

    def per_shard(strip):
        ext = halo_exchange(strip, halo, axis_name)
        out = forward(ext)
        return out[:, halo * scale:-halo * scale]

    spec = P(None, axis_name, None, None)
    fn = shard_map(per_shard, mesh=mesh, in_specs=(spec,),
                   out_specs=spec)
    image = jax.device_put(image, NamedSharding(mesh, spec))
    out = jax.jit(fn)(image)
    if pad_h:
        out = out[:, :h * scale]
    return out
