"""Training statistics: summary.csv append, loaders, loss plots.

Contract mirrors rumpy/sr_tools/stats.py: one row per epoch appended to
``result_outputs/summary.csv`` (new metric columns zero-backfilled for
earlier epochs), pandas loader, and a ``loss_plots.pdf`` with one subplot
per metric.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def save_statistics(log_dir: str, stats: Dict[str, float],
                    filename: str = "summary.csv") -> str:
    """Append one epoch row; align columns with any existing file,
    zero-backfilling metrics that appear mid-training
    (stats.py:66-83 + base_handler.py:353-404 backfill behavior)."""
    path = os.path.join(log_dir, filename)
    import jax
    if jax.process_index() != 0:
        # Multi-host: only the coordinator appends to summary.csv.
        return path
    os.makedirs(log_dir, exist_ok=True)
    row = pd.DataFrame([stats])
    if os.path.isfile(path):
        df = pd.read_csv(path)
        df = pd.concat([df, row], ignore_index=True)
        df = df.fillna(0.0)
    else:
        df = row
    df.to_csv(path, index=False)
    return path


def load_statistics(log_dir: str, filename: str = "summary.csv",
                    config: str = "pd") -> pd.DataFrame:
    path = os.path.join(log_dir, filename)
    df = pd.read_csv(path)
    if config == "dict":
        return {c: df[c].tolist() for c in df.columns}
    return df


def truncate_statistics(log_dir: str, epoch: int,
                        filename: str = "summary.csv") -> None:
    """Drop rows past `epoch` on resume/branch (base_handler.py:320-324)."""
    path = os.path.join(log_dir, filename)
    if not os.path.isfile(path):
        return
    df = pd.read_csv(path)
    if "epoch" in df.columns:
        df = df[df["epoch"] <= epoch]
    else:
        df = df.iloc[: epoch + 1]
    df.to_csv(path, index=False)


def plot_stats(log_dir: str, stats: Optional[pd.DataFrame] = None,
               filename: str = "loss_plots.pdf") -> Optional[str]:
    """One subplot per metric column vs epoch (stats.py:11-35)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if stats is None:
        stats = load_statistics(log_dir)
    cols = [c for c in stats.columns if c != "epoch"]
    if not cols:
        return None
    n = len(cols)
    ncols = min(3, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.5 * nrows),
                             squeeze=False)
    x = stats["epoch"] if "epoch" in stats.columns else np.arange(len(stats))
    for i, c in enumerate(cols):
        ax = axes[i // ncols][i % ncols]
        ax.plot(x, stats[c])
        ax.set_title(c)
        ax.set_xlabel("epoch")
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    out = os.path.join(log_dir, filename)
    fig.savefig(out)
    plt.close(fig)
    return out
