"""Discrete-grid probe of a degradation-predictor encoder (round 4).

Why this exists: the in-training clustering curve (predictor_pretrain_
run.py) scores silhouette/Davies-Bouldin over the reference's mixed-radix
metadata classes (contrastive_labelling.partition_metadata — 2016
possible classes for the full chain) on a 30-point Set5 eval set, where
nearly every point is its own singleton class; silhouette > 0 is
structurally unreachable under that protocol no matter how good the
encoder is. This probe measures the encoder on a WELL-POSED clustering
task instead, mirroring the degradation-sweep protocol of the DASR paper
the reference builds on (reference regression/evaluation/eval_hub.py:222+
clusters embeddings colored by degradation group):

  * a fixed discrete grid of degradation levels — every cell one class:
    blur sigma x noise sigma x JPEG quality (12 classes by default);
  * each cell degrades all 5 Set5 HR images (multiples x crops per
    image), so classes share image CONTENT and differ only in the
    degradation — exactly what the encoder is supposed to separate;
  * silhouette / Davies-Bouldin / Calinski-Harabasz over those labels,
    for a random-init encoder vs each packaged pretrained one.

"The pretrain learned something" = the packaged encoder separates the
grid dramatically better than random init. Results go to BASELINE.md.

Usage:  python examples/encoder_probe.py [--encoders supmoco_heldout_d256 ...]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_HR = "/root/reference/Data/example_data/Set5/hr"

# (blur sigma, gaussian noise sigma, JPEG quality) — one class per cell.
BLUR_SIGMAS = (0.8, 2.2, 3.6)
NOISE_SIGMAS = (5.0, 25.0)
JPEG_QUALITIES = (30, 90)


def grid_cells():
    cells = []
    for s in BLUR_SIGMAS:
        for n in NOISE_SIGMAS:
            for q in JPEG_QUALITIES:
                cells.append((s, n, q))
    return cells


def degrade_cell(files, sigma, noise, quality, seed, multiples=2):
    """Degrade every HR file with PINNED parameters (iso blur at `sigma`,
    gaussian noise at `noise`, JPEG at `quality`) -> list of LR arrays."""
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    pipe = ImagePipeline(
        [["realesrganblur", "b"], ["downsample", "d"],
         ["realesrgannoise", "n"], ["jpegcompress", "c"]],
        deg_configs={
            "b": {"kernel_range": ["iso"], "kernel_size": 21,
                  "sigma_x_range": [sigma, sigma],
                  "sigma_y_range": [sigma, sigma]},
            "d": {"scale": 4},
            "n": {"gaussian_noise_sigma_range": [noise, noise],
                  "gaussian_poisson_ratio": 1.0,
                  "gray_noise_probability": 0.0},
            "c": {"quality": int(quality), "random_compression": False},
        },
        seed=seed, scale=4)
    imgs, _, _ = pipe.run_pipeline(image_files=files, save_to_dir=None,
                                   progress_bar_off=True,
                                   multiples=multiples)
    if not isinstance(imgs, list):
        imgs = [imgs]
    out = []
    for im in imgs:
        a = np.asarray(im)
        if a.dtype.kind in "ui":
            a = a.astype(np.float32) / 255.0
        out.append(np.clip(a.astype(np.float32), 0.0, 1.0))
    return out


def crops(img, size, count, rng):
    h, w = img.shape[:2]
    for _ in range(count):
        y = int(rng.integers(0, max(1, h - size + 1)))
        x = int(rng.integers(0, max(1, w - size + 1)))
        yield img[y:y + size, x:x + size]


def build_probe_set(crop=48, crops_per_image=3, multiples=2, seed=0):
    files = sorted(glob.glob(os.path.join(EVAL_HR, "*.png")))
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for label, (s, n, q) in enumerate(grid_cells()):
        for im in degrade_cell(files, s, n, q, seed=1000 + 7 * label,
                               multiples=multiples):
            for c in crops(im, crop, crops_per_image, rng):
                if c.shape[:2] == (crop, crop):
                    xs.append(c)
                    ys.append(label)
    return np.stack(xs), np.asarray(ys, np.int32)


def load_handler_and_state(pkg=None, seed=0):
    """pkg=None -> random-init SupMoCo with the packaged default params
    (dim 256, K 8192); else load the packaged checkpoint by bare name."""
    from rumpy_tpu.config.loader import load_config
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils import checkpoint as ckpt
    if pkg is None:
        handler = get_model("supmoco")(dim=256, K=8192)
        return handler, handler.init_state(seed=seed)
    d = ckpt.resolve_packaged(pkg)
    cfg_path = os.path.join(os.path.dirname(d), "pretrained_config.toml")
    internal = {}
    name = "supmoco"
    if os.path.exists(cfg_path):
        exp_cfg = load_config(cfg_path)
        model_cfg = exp_cfg.get("model") or {}
        internal = dict(model_cfg.get("internal_params") or {})
        name = model_cfg.get("name") or name
    handler = get_model(name)(**internal)
    state, _ = handler.load_model(d, "last", skip_optimizer_load=True)
    return handler, state


def score(handler, state, xs, ys, batch=64):
    from rumpy_tpu.evaluation.contrastive_eval import ContrastiveEval
    embs = []
    for i in range(0, len(xs), batch):
        embs.append(np.asarray(
            handler.run_embedding(state, xs[i:i + batch])))
    return ContrastiveEval.clustering_scores(np.concatenate(embs), ys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="*", default=None,
                    help="packaged encoder names (default: every package "
                         "under rumpy_tpu/pretrained/)")
    ap.add_argument("--crop", type=int, default=48)
    ap.add_argument("--crops-per-image", type=int, default=3)
    ap.add_argument("--multiples", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu",
                    help="JAX backend (cpu default: the probe embeds "
                         "~360 crops once; tunnel compile would dominate)")
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

    xs, ys = build_probe_set(crop=args.crop,
                             crops_per_image=args.crops_per_image,
                             multiples=args.multiples, seed=args.seed)
    print(f"probe set: {len(xs)} crops, {len(np.unique(ys))} classes "
          f"({len(xs) // len(np.unique(ys))} per class)")

    rows = []
    handler, state = load_handler_and_state(None, seed=args.seed)
    rows.append(("random-init", score(handler, state, xs, ys)))
    for pkg in pkgs:
        handler, state = load_handler_and_state(pkg)
        rows.append((pkg, score(handler, state, xs, ys)))

    print(f"\n{'encoder':<28} {'silhouette':>10} {'davies-bouldin':>15} "
          f"{'calinski-harabasz':>18}")
    for name, s in rows:
        print(f"{name:<28} {s['silhouette']:>10.3f} "
              f"{s['davies_bouldin']:>15.3f} "
              f"{s['calinski_harabasz']:>18.1f}")


if __name__ == "__main__":
    main()
