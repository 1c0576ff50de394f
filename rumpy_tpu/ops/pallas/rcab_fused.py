"""VMEM-resident fused RCAB forward (VERDICT r3 item 8 experiment).

One RCAN residual channel-attention block (advanced/architectures.py
RCAB: conv3x3 -> ReLU -> conv3x3 -> CA(GAP -> 1x1 reduce -> ReLU -> 1x1
expand -> sigmoid -> scale) -> +x) computed entirely in VMEM per batch
image: the input tile is read from HBM once and the output written once,
where XLA's fusion schedule moves the intermediate activations through
HBM between the two convs and the CA scale (measured 249 GB/step vs the
~84 GB conv-I/O minimum, BASELINE.md roofline).

Convs are expressed as 9 shifted (H*W, C) @ (C, C) matmuls accumulated
in f32 — the same N=64 MXU packing XLA's conv tiling achieves, so any
throughput delta isolates the HBM-traffic effect rather than a matmul
trick. Forward-only: the backward would need a custom VJP storing the
CA gate and both pre-activations (or recomputing them), which is the
engineering cost the BASELINE.md analysis weighs this measurement
against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rcab_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 wd_ref, bd_ref, wu_ref, bu_ref, out_ref, xp_ref):
    h = x_ref.shape[1]
    w = x_ref.shape[2]
    c = x_ref.shape[3]
    hw = h * w

    # zero-padded copy of the tile (SAME conv halo) lives in VMEM scratch
    xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
    xp_ref[1:h + 1, 1:w + 1, :] = x_ref[0]

    def conv3x3(src, wref, bref):
        acc = jnp.zeros((hw, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = src[dy:dy + h, dx:dx + w, :].reshape(hw, c)
                acc += jnp.dot(tap, wref[dy * 3 + dx],
                               preferred_element_type=jnp.float32)
        return acc + bref[:].astype(jnp.float32)[None, :]

    # conv1 + ReLU (stays in VMEM)
    h1 = jnp.maximum(conv3x3(xp_ref, w1_ref, b1_ref), 0.0)
    xp_ref[1:h + 1, 1:w + 1, :] = h1.astype(x_ref.dtype).reshape(h, w, c)

    # conv2
    h2 = conv3x3(xp_ref, w2_ref, b2_ref)

    # channel attention: GAP -> 1x1 reduce -> ReLU -> 1x1 expand -> sigmoid
    gap = jnp.mean(h2, axis=0, keepdims=True)  # (1, C) f32
    d = jnp.maximum(
        jnp.dot(gap, wd_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + bd_ref[:].astype(jnp.float32)[None, :], 0.0)
    u = jax.nn.sigmoid(
        jnp.dot(d, wu_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + bu_ref[:].astype(jnp.float32)[None, :])  # (1, C)

    y = h2 * u + x_ref[0].reshape(hw, c).astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype).reshape(h, w, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rcab_fused(x, w1, b1, w2, b2, wd, bd, wu, bu, interpret=False):
    """Fused RCAB forward.

    Args:
      x: (N, H, W, C) activation tile (bf16 or f32).
      w1, w2: (9, C, C) 3x3 conv kernels laid out tap-major
        (HWIO kernel k -> k.reshape(9, C, C)).
      b1, b2: (C,) biases.
      wd: (C, C//r) CA reduce weights, bd: (C//r,).
      wu: (C//r, C) CA expand weights, bu: (C,).
    Returns (N, H, W, C) block output, same dtype as x.
    """
    n, h, w, c = x.shape
    grid = (n,)
    tile = (1, h, w, c)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _rcab_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(tile, lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            full(wd.shape), full(bd.shape), full(wu.shape), full(bu.shape),
        ],
        out_specs=pl.BlockSpec(tile, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        interpret=interpret,
    )(x, w1, b1, w2, b2, wd, bd, wu, bu)


def rcab_reference(x, w1, b1, w2, b2, wd, bd, wu, bu):
    """The same block in plain XLA ops (what RCAN's flax RCAB lowers to):
    the baseline the fused kernel is measured against."""
    dt = x.dtype
    k1 = w1.reshape(3, 3, x.shape[-1], x.shape[-1])
    k2 = w2.reshape(3, 3, x.shape[-1], x.shape[-1])
    h1 = jax.lax.conv_general_dilated(
        x, k1.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(dt)
    h2 = jax.lax.conv_general_dilated(
        h1, k2.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    gap = jnp.mean(h2, axis=(1, 2), keepdims=True)
    d = jnp.maximum(jnp.einsum("nhwc,cr->nhwr", gap,
                               wd.astype(jnp.float32)) + bd, 0.0)
    u = jax.nn.sigmoid(jnp.einsum("nhwr,rc->nhwc", d,
                                  wu.astype(jnp.float32)) + bu)
    return (h2 * u + x.astype(jnp.float32)).astype(dt)
