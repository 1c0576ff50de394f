"""Torch -> flax weight conversion.

Purpose (SURVEY.md §7 hard part 6): validate architecture parity against
the reference's torch models / Zenodo checkpoints without retraining. The
zoo's sequential networks register parameters in the same order in both
frameworks, so conversion is an order-zip with layout transposes:

  * Conv2d weight OIHW -> HWIO; bias as-is;
  * Linear weight (out, in) -> (in, out);
  * BatchNorm (weight, bias, running_mean, running_var) -> (scale, bias)
    params + batch_stats.

`convert_by_order` pairs the torch state dict's tensors with the flax
tree's leaves in traversal order, asserting shape compatibility at every
step — a mismatch fails loudly rather than silently misassigning.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree, prefix=()):
    out: List[Tuple[Tuple[str, ...], Any]] = []
    if isinstance(tree, dict):
        # Insertion order == creation order for eagerly-initialized flax
        # trees; trees that crossed a jax.jit boundary come back
        # key-SORTED, which at the leaf level puts 'bias' before
        # 'kernel'/'scale'. Canonicalize those two known leaf layouts so
        # both orderings convert identically (module-level order is then
        # the caller's concern: explicit sort==call-order names).
        keys = list(tree.keys())
        if set(keys) == {"kernel", "bias"}:
            keys = ["kernel", "bias"]
        elif set(keys) == {"scale", "bias"}:
            keys = ["scale", "bias"]
        for k in keys:
            out.extend(_flatten_with_paths(tree[k], prefix + (k,)))
    else:
        out.append((prefix, tree))
    return out


def _torch_to_numpy(t):
    # .numpy() SHARES memory with the live tensor, and jnp.asarray on the
    # CPU backend can be zero-copy for aligned arrays — without the copy,
    # a later in-place torch update (e.g. optimizer.step()) would mutate
    # the "converted" flax parameters behind JAX's back.
    return t.detach().cpu().numpy().copy()


def convert_by_order(torch_state: "Dict[str, Any]", flax_params):
    """Zip torch parameters into the flax tree by registration order."""
    # group torch entries: convs/linears contribute (kernel, bias)
    torch_items = [(k, v) for k, v in torch_state.items()
                   if "running_" not in k and "num_batches" not in k]
    flax_leaves = _flatten_with_paths(flax_params)

    new_leaves = {}
    ti = 0
    for path, leaf in flax_leaves:
        if ti >= len(torch_items):
            raise ValueError(f"ran out of torch params at {path}")
        name, tensor = torch_items[ti]
        arr = _torch_to_numpy(tensor)
        leaf_shape = tuple(leaf.shape)
        if arr.ndim == 5:  # conv3d OIDHW -> DHWIO
            conv = arr.transpose(2, 3, 4, 1, 0)
            if conv.shape != leaf_shape:
                raise ValueError(
                    f"shape mismatch at {path}: torch {name} {conv.shape} "
                    f"vs flax {leaf_shape}")
            new_leaves[path] = conv
        elif arr.ndim == 4:  # conv OIHW -> HWIO
            conv = arr.transpose(2, 3, 1, 0)
            if conv.shape != leaf_shape:
                raise ValueError(
                    f"shape mismatch at {path}: torch {name} {conv.shape} "
                    f"vs flax {leaf_shape}")
            new_leaves[path] = conv
        elif arr.ndim == 2:  # linear (out, in) -> (in, out)
            lin = arr.T
            if lin.shape != leaf_shape:
                raise ValueError(
                    f"shape mismatch at {path}: torch {name} {lin.shape} "
                    f"vs flax {leaf_shape}")
            new_leaves[path] = lin
        else:
            if arr.shape != leaf_shape:
                raise ValueError(
                    f"shape mismatch at {path}: torch {name} {arr.shape} "
                    f"vs flax {leaf_shape}")
            new_leaves[path] = arr
        ti += 1
    if ti != len(torch_items):
        raise ValueError(f"{len(torch_items) - ti} torch params unused")

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return jax.numpy.asarray(new_leaves[prefix])

    return rebuild(flax_params)


def load_reference_checkpoint(torch_ckpt_path: str, handler, state):
    """Load a reference `train_model_N` torch checkpoint into a handler's
    train state (network weights only)."""
    import torch
    payload = torch.load(torch_ckpt_path, map_location="cpu")
    net_state = payload.get("network", payload)
    params = convert_by_order(net_state, state.params)
    return state.replace(params=params)
