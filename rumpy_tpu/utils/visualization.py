"""Image saving & comparison collages.

Mirror of rumpy/sr_tools/visualization.py: `safe_image_save` clamps,
converts Y/YCbCr to RGB and writes uint8 PNGs; `interpret_sisr_images`
writes a per-image comparison collage (PDF) with metric captions.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from rumpy_tpu.utils.color import ycbcr_to_rgb


def to_uint8_rgb(img: np.ndarray, colorspace: str = "rgb") -> np.ndarray:
    """(H, W, C) float [0,1] -> uint8 RGB. ycbcr input is converted
    (visualization.py:31-62 semantics: clip then scale)."""
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    if colorspace == "ycbcr" and img.shape[-1] == 3:
        img = np.asarray(ycbcr_to_rgb(img, im_type="jpg"))
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    # TRUNCATION, not rounding: the reference's safe_image_save does
    # np.clip(im * 255).astype(uint8) (visualization.py:31-62), and the
    # degradation layer's from_float_array documents the same ToPILImage
    # truncation — saved PNGs must bit-match
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def safe_image_save(img: np.ndarray, out_dir: str, name: str,
                    colorspace: str = "rgb") -> str:
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    u8 = to_uint8_rgb(img, colorspace)
    path = os.path.join(out_dir, name if name.lower().endswith(".png")
                        else name + ".png")
    Image.fromarray(u8).save(path)
    return path


def interpret_sisr_images(images: Dict[str, np.ndarray], out_path: str,
                          captions: Optional[Dict[str, str]] = None,
                          ncols: int = 3) -> str:
    """Comparison collage: one panel per (model) image with caption
    (visualization.py:79-194)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(images)
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4 * ncols, 4 * nrows), squeeze=False)
    for i, (name, img) in enumerate(images.items()):
        ax = axes[i // ncols][i % ncols]
        ax.imshow(to_uint8_rgb(img))
        title = name
        if captions and name in captions:
            title += f"\n{captions[name]}"
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def compare_training_curves(experiment_dirs: Dict[str, str], out_path: str,
                            metric: str = "val-PSNR") -> str:
    """Overlay one metric's per-epoch curve from several experiments'
    summary.csv files (visualization.py:195+ training-curve comparison)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rumpy_tpu.utils.stats import load_statistics

    fig, ax = plt.subplots(figsize=(8, 5))
    for label, log_dir in experiment_dirs.items():
        try:
            stats = load_statistics(log_dir)
        except FileNotFoundError:
            continue  # experiment without a summary.csv: skip its curve
        if stats is None or metric not in stats.columns:
            continue
        ax.plot(stats.index, stats[metric], label=label)
    ax.set_xlabel("Epoch")
    ax.set_ylabel(metric)
    ax.grid(True)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def crop_zoom_figure(images: Dict[str, np.ndarray], crop_box, out_path: str,
                     colorspace: str = "rgb") -> str:
    """Per-model panels with a highlighted crop region and a zoomed inset
    below it (the reference's crop-zoom comparison figures).

    :param crop_box: (top, left, height, width) in image coordinates.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    top, left, ch, cw = crop_box
    n = len(images)
    fig, axes = plt.subplots(2, n, figsize=(4 * n, 8), squeeze=False)
    for i, (name, img) in enumerate(images.items()):
        rgb = to_uint8_rgb(img, colorspace)
        ax = axes[0][i]
        ax.imshow(rgb)
        ax.add_patch(patches.Rectangle((left, top), cw, ch, linewidth=2,
                                       edgecolor="red", facecolor="none"))
        ax.set_title(name, fontsize=10)
        ax.axis("off")
        zoom = rgb[top:top + ch, left:left + cw]
        axz = axes[1][i]
        axz.imshow(zoom, interpolation="nearest")
        axz.axis("off")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
