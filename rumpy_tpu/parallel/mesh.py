"""Device mesh & sharding layer — the framework's communication backend.

The reference has effectively no distributed backend (single-host
``nn.DataParallel`` replicate/scatter/gather, SURVEY.md §2.1). Here
parallelism is first-class and TPU-native:

  * a named ``jax.sharding.Mesh`` over all local devices (``data`` axis;
    optional ``model`` axis for spatially/channel-sharded giant-image work);
  * batches sharded over ``data``; params replicated; ``jit`` inserts the
    gradient all-reduce over ICI automatically from the shardings;
  * cross-host pods extend the same mesh over DCN via
    ``jax.distributed.initialize`` — no code changes in the train step.

All helpers degrade gracefully to single-device (mesh of 1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.lru_cache(maxsize=8)
def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices=None) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devs.size // n_model
    devs = devs[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard leading (batch) dim over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch (pytree of arrays) sharded over `data`."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape["data"]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data-parallel size {n}")
    return global_batch // n
