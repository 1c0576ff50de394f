"""Checkpoint store.

Mirrors the reference's contract (SURVEY.md §5 "Checkpoint / resume",
base_architecture.py:231-423): one file per epoch named
``saved_models/train_model_<epoch>`` containing network weights + optimizer
/ scheduler state + step counters + model name/epoch + handler extras
(e.g. metadata_keys for Q-models, discriminator state for GANs), with
``best | last`` selection driven by ``result_outputs/summary.csv`` and the
metric-direction table. ``minimal=True`` strips optimizer state
(base_interface.py:236-261).

Storage is msgpack via flax.serialization (host-side, process-0 only in
multi-host runs). Structures are restored onto caller-provided templates so
optax NamedTuple opt-states round-trip exactly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from rumpy_tpu.config.constants import metric_best_val

CKPT_PREFIX = "train_model_"


def _to_host(tree):
    # Start EVERY leaf's device->host copy before gathering any of them:
    # np.asarray per leaf is a blocking round-trip each, and a train-state
    # pytree has hundreds of leaves — over a remote-TPU link the serial
    # version turns one checkpoint save into minutes of drip transfers.
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for x in leaves:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in leaves])


# Keys holding JSON-able metadata (strings/dicts) rather than array pytrees;
# flax's msgpack codec only handles ndarray leaves.
_META_KEYS = ("model_name", "model_epoch", "handler_metadata")


def save_checkpoint(path: str, payload: Dict[str, Any],
                    minimal: bool = False) -> None:
    import json
    if jax.process_index() != 0:
        # Multi-host pods: every host holds (addressable shards of) the
        # same replicated state; only the coordinator writes to disk.
        return
    payload = dict(payload)
    if minimal:
        payload.pop("optimizer", None)
    meta = {k: payload.pop(k) for k in list(payload)
            if k in _META_KEYS or isinstance(payload[k], (str, type(None)))}
    state = serialization.to_state_dict(_to_host(payload))
    blob = {"arrays": state, "meta_json": json.dumps(meta).encode()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob, in_place=True))


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Load a checkpoint. With a template, typed structures (optax states,
    flax params) are restored in place of raw dicts."""
    import json
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    raw = blob["arrays"]
    meta = json.loads(bytes(blob["meta_json"]).decode())
    if template is not None:
        # restrict the template to keys the checkpoint actually holds —
        # a minimal=True save stripped 'optimizer', and from_state_dict
        # would otherwise raise on the key mismatch before the caller's
        # skip_optimizer_load could take effect
        arr_template = {k: v for k, v in template.items()
                        if k not in meta and k in raw}
        restored = serialization.from_state_dict(arr_template, raw)
        raw = {**{k: v for k, v in raw.items() if k not in arr_template},
               **restored}
    raw = dict(raw)
    raw.update(meta)
    return raw


def checkpoint_path(model_save_dir: str, epoch: int) -> str:
    return os.path.join(model_save_dir, f"{CKPT_PREFIX}{epoch}")


def available_epochs(model_save_dir: str):
    if not os.path.isdir(model_save_dir):
        return []
    eps = []
    for fname in os.listdir(model_save_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", fname)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def resolve_packaged(path_or_name: str) -> str:
    """Resolve a checkpoint directory OR a packaged pretrained-network
    name. Bare names resolve against rumpy_tpu/pretrained/<name>/
    saved_models — the analog of the reference's in-repo
    regression/pretrained_networks/ lookup (training_handler.py:92-118).
    Raises when neither location holds checkpoints (fail loud rather
    than silently training from scratch)."""
    if available_epochs(path_or_name):
        return path_or_name
    packaged = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pretrained", path_or_name, "saved_models")
    if available_epochs(packaged):
        return packaged
    raise RuntimeError(
        f"The warm start model '{path_or_name}' is not available (no "
        f"checkpoints there, and no packaged network at {packaged}).")


def select_epoch(model_save_dir: str, which, summary_csv: Optional[str] = None,
                 metric: str = "val-PSNR",
                 fallback: Optional[str] = None) -> int:
    """Resolve 'best' | 'last' | int to a concrete epoch number
    (base_interface.py:86-108 semantics).

    'best' requires a readable summary.csv with a known metric column; an
    ambiguous 'best' raises (the reference errors here too) unless the
    caller passes an explicit ``fallback`` selector (e.g. 'last')."""
    if isinstance(which, int):
        return which
    if isinstance(which, str) and which.lstrip("-").isdigit():
        return int(which)  # CLI flags arrive as strings
    eps = available_epochs(model_save_dir)
    if not eps:
        raise FileNotFoundError(f"No checkpoints in {model_save_dir}")
    if which == "last":
        return eps[-1]
    if which == "best":
        if summary_csv is None or not os.path.isfile(summary_csv):
            if fallback is not None:
                return select_epoch(model_save_dir, fallback)
            raise FileNotFoundError(
                f"'best' epoch requested but no summary.csv found at "
                f"{summary_csv!r}; pass fallback='last' to accept the "
                f"latest checkpoint instead")
        import pandas as pd
        df = pd.read_csv(summary_csv)
        if metric not in df.columns:
            # Fall back to any known metric present; if none, 'best' is
            # ambiguous — refuse rather than silently pick an epoch.
            present = [m for m in metric_best_val if m in df.columns]
            if not present:
                if fallback is not None:
                    return select_epoch(model_save_dir, fallback)
                raise ValueError(
                    f"'best' epoch requested but {summary_csv} has no "
                    f"known metric column (looked for {metric!r} and "
                    f"{sorted(metric_best_val)}); pass fallback='last' "
                    f"to accept the latest checkpoint")
            metric = present[0]
        if "epoch" in df.columns and df["epoch"].duplicated().any():
            # A stats file holding rows from an aborted earlier run makes
            # 'best' ill-defined; keep the last row per epoch index (the
            # same supersession rule the trainer applies when truncating
            # stats on resume, trainer.py) so selection stays well-posed.
            df = df.drop_duplicates(
                subset="epoch", keep="last").reset_index(drop=True)
        direction = metric_best_val.get(metric, "max")
        col = df[metric]
        idx = int(col.idxmax() if direction == "max" else col.idxmin())
        epoch = int(df["epoch"].iloc[idx]) if "epoch" in df.columns else idx
        # Snap to an existing checkpoint (clean_models may have pruned).
        return min(eps, key=lambda e: abs(e - epoch))
    raise ValueError(f"Unknown epoch selector {which!r}")
