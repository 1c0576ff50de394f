"""Batched SR serving: shape bucketing + mesh-sharded inference.

The reference serves single images through the GUI's Flask wrapper
(GUI/deep_fir_server.py). This module is the production path for TPU
deployment:

- requests of arbitrary sizes are reflect-padded into a small set of
  shape buckets so XLA compiles one program per bucket (no per-shape
  recompiles in steady state);
- requests are micro-batched up to `max_batch` and, when a mesh is
  supplied, the batch is sharded across its `data` axis so one replica
  set serves the whole pod slice;
- outputs are cropped back to each request's true size.

The predictor is model-agnostic: it wraps any handler's `run_eval`
(metadata-conditioned models pass their vectors alongside).
"""

from __future__ import annotations

import math
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(size: int, multiple: int) -> int:
    return int(math.ceil(size / multiple) * multiple)


class BatchedPredictor:
    """Micro-batching, shape-bucketing inference wrapper.

    :param handler: a model handler (`run_eval(state, batch)`).
    :param state: its TrainState (params + extra).
    :param mesh: optional `jax.sharding.Mesh`; batches shard over
        its `data` axis (padded up to a multiple of the axis size).
    :param pad_multiple: spatial bucket granularity.
    :param max_batch: micro-batch cap per device program.
    """

    def __init__(self, handler, state, mesh=None, pad_multiple: int = 32,
                 max_batch: int = 8):
        self.handler = handler
        self.state = state
        self.mesh = mesh
        self.pad_multiple = pad_multiple
        self.max_batch = max_batch
        self.scale = getattr(handler, "scale", 1)
        self._lock = threading.Lock()

    # -- single/batch API ---------------------------------------------------

    def predict(self, images: Sequence[np.ndarray],
                metadata: Optional[Sequence[np.ndarray]] = None
                ) -> List[np.ndarray]:
        """SR a list of HWC float images (various sizes). Returns a list
        of HWC outputs at `scale`x the input size."""
        # sort by BUCKETED shape so same-bucket requests are consecutive
        # (raw-shape order can interleave buckets and split micro-batches)
        order = sorted(range(len(images)),
                       key=lambda i: (_bucket(images[i].shape[0],
                                              self.pad_multiple),
                                      _bucket(images[i].shape[1],
                                              self.pad_multiple)))
        results: List[Optional[np.ndarray]] = [None] * len(images)
        i = 0
        while i < len(order):
            # group same-bucket requests into one micro-batch
            idx0 = order[i]
            bh = _bucket(images[idx0].shape[0], self.pad_multiple)
            bw = _bucket(images[idx0].shape[1], self.pad_multiple)
            group = []
            while (i < len(order) and len(group) < self.max_batch):
                j = order[i]
                if (_bucket(images[j].shape[0], self.pad_multiple) != bh or
                        _bucket(images[j].shape[1], self.pad_multiple) != bw):
                    break
                group.append(j)
                i += 1
            outs = self._run_bucket(
                [images[j] for j in group],
                [metadata[j] for j in group] if metadata else None,
                bh, bw)
            for j, out in zip(group, outs):
                results[j] = out
        return results  # type: ignore[return-value]

    # -- internals ----------------------------------------------------------

    def _run_bucket(self, imgs: List[np.ndarray],
                    metas: Optional[List[np.ndarray]],
                    bh: int, bw: int) -> List[np.ndarray]:
        n = len(imgs)
        c = imgs[0].shape[-1]
        batch_n = n
        if self.mesh is not None:
            d = self.mesh.shape["data"]
            batch_n = int(math.ceil(n / d) * d)
        x = np.zeros((batch_n, bh, bw, c), np.float32)
        for k, im in enumerate(imgs):
            h, w = im.shape[:2]
            ph, pw = bh - h, bw - w
            x[k] = np.pad(im.astype(np.float32),
                          ((0, ph), (0, pw), (0, 0)), mode="reflect")
        batch: Dict[str, Any] = {"lr": x}
        if metas is not None:
            m = np.stack([np.asarray(mm, np.float32).ravel()
                          for mm in metas])
            if batch_n > n:
                m = np.concatenate(
                    [m, np.repeat(m[-1:], batch_n - n, 0)], axis=0)
            batch["metadata"] = m
        if self.mesh is not None:
            from rumpy_tpu.parallel import mesh as mesh_mod
            batch = mesh_mod.shard_batch(self.mesh, batch)
        with self._lock:
            sr = np.asarray(self.handler.run_eval(self.state, batch))
        s = self.scale
        outs = []
        for k, im in enumerate(imgs):
            h, w = im.shape[:2]
            outs.append(sr[k, :h * s, :w * s])
        return outs
