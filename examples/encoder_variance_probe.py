"""Variance decomposition of a degradation-predictor embedding (round 5).

Diagnosis companion to encoder_probe.py for the four-arm BoBW ablation:
the q-layers consume E(x), so what matters for generalization is not just
whether E separates degradations (the grid probe) but how much of E's
variance tracks the DEGRADATION versus the image CONTENT. A
content-dominated embedding hands the generator a shortcut ID for each of
the 4 held-out training images — a memorization channel that accelerates
overfitting; a degradation-dominated one carries the signal the
meta-attention mechanism exists for (reference
contrastive_blind_sr.py:241-318 injects E(x) into every QRCAN q-layer).

Protocol: the encoder_probe.py discrete grid (12 degradation classes x 5
Set5 images x crops), embeddings L2-normalized (the contrastive train
objective operates on the unit sphere), then per-embedding-dim one-way
variance decomposition against each factor:

    R2_deg     = Var(E[emb | degradation class]) / Var(emb)
    R2_content = Var(E[emb | source image])      / Var(emb)

summed over dims (a multivariate correlation ratio, eta^2). Reported for
random init vs each packaged encoder.

Usage: python examples/encoder_variance_probe.py
       [--encoders supmoco_heldout_d256] [--platform cpu]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encoder_probe import (EVAL_HR, degrade_cell, grid_cells,  # noqa: E402
                           load_handler_and_state)


def build_probe_set_with_content(crop=48, crops_per_image=3, multiples=2,
                                 seed=0):
    """encoder_probe.build_probe_set, but keeping the source-image id:
    degrade_cell processes `files` in order, `multiples` copies each, so
    the content label is recoverable by position."""
    files = sorted(glob.glob(os.path.join(EVAL_HR, "*.png")))
    rng = np.random.default_rng(seed)
    xs, deg, content = [], [], []
    for label, (s, n, q) in enumerate(grid_cells()):
        imgs = degrade_cell(files, s, n, q, seed=1000 + 7 * label,
                            multiples=multiples)
        for pos, im in enumerate(imgs):
            src = pos // multiples  # pipeline emits each file x multiples
            h, w = im.shape[:2]
            for _ in range(crops_per_image):
                y = int(rng.integers(0, max(1, h - crop + 1)))
                x = int(rng.integers(0, max(1, w - crop + 1)))
                c = im[y:y + crop, x:x + crop]
                if c.shape[:2] == (crop, crop):
                    xs.append(c)
                    deg.append(label)
                    content.append(src)
    return (np.stack(xs), np.asarray(deg, np.int32),
            np.asarray(content, np.int32))


def eta_squared(embs, labels):
    """Multivariate correlation ratio: between-group / total variance,
    summed over embedding dims."""
    mu = embs.mean(0)
    total = ((embs - mu) ** 2).sum()
    between = 0.0
    for g in np.unique(labels):
        sel = embs[labels == g]
        between += len(sel) * ((sel.mean(0) - mu) ** 2).sum()
    return float(between / total)


def embed(handler, state, xs, batch=64):
    out = []
    for i in range(0, len(xs), batch):
        out.append(np.asarray(handler.run_embedding(state, xs[i:i + batch])))
    e = np.concatenate(out)
    return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="*", default=None)
    ap.add_argument("--crop", type=int, default=48)
    ap.add_argument("--crops-per-image", type=int, default=3)
    ap.add_argument("--multiples", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform and args.platform != "default":
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    pkgs = args.encoders
    if pkgs is None:
        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "rumpy_tpu", "pretrained")
        pkgs = sorted(os.listdir(root)) if os.path.isdir(root) else []

    xs, deg, content = build_probe_set_with_content(
        crop=args.crop, crops_per_image=args.crops_per_image,
        multiples=args.multiples, seed=args.seed)
    print(f"probe set: {len(xs)} crops, {len(np.unique(deg))} degradation "
          f"classes x {len(np.unique(content))} source images")

    rows = []
    handler, state = load_handler_and_state(None, seed=args.seed)
    rows.append(("random-init", embed(handler, state, xs)))
    for pkg in pkgs:
        handler, state = load_handler_and_state(pkg)
        rows.append((pkg, embed(handler, state, xs)))

    print(f"\n{'encoder':<28} {'R2_degradation':>14} {'R2_content':>11} "
          f"{'deg/content':>12}")
    for name, e in rows:
        r_deg = eta_squared(e, deg)
        r_con = eta_squared(e, content)
        ratio = r_deg / max(r_con, 1e-9)
        print(f"{name:<28} {r_deg:>14.3f} {r_con:>11.3f} {ratio:>12.2f}")


if __name__ == "__main__":
    main()
