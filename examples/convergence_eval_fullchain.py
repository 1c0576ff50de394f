"""Matched-distribution evaluation of the config-#4 convergence run.

`convergence_run.py --pipeline fullchain` trains blind RCAN on the full
blur -> downsample -> noise -> jpeg chain but validates per-epoch on the
reference's *shipped* Set5 blind set, which was generated with random
blur only — so that val column scores the model against a distribution
it never trains on (its denoise/deblock prior costs PSNR on clean-blur
inputs). This script completes the demonstration on the *matched*
distribution: it degrades the same Set5 HR images with the run's own
pipeline (host path, fresh seed => degradation draws the model never
saw), then evaluates a ladder of the run's saved epochs — plus the
always-computed bicubic reference — through the production `eval_sisr`
CLI, all from one process so per-shape compiles are paid once.

Run it on the CPU backend (the 5 eval shapes would each cost minutes of
remote compile over the TPU tunnel):

    JAX_PLATFORMS=cpu python examples/convergence_eval_fullchain.py \
        [--epochs 0,9,19,29,39] [--workdir /tmp/rumpy_convergence]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_run import EVAL_HR, PIPELINES  # noqa: E402


def generate_eval_set(workdir: str, seed: int) -> str:
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    out = os.path.join(workdir, f"eval_fullchain_s{seed}")
    marker = os.path.join(out, "degradation_metadata.csv")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        spec = PIPELINES["fullchain"]
        pipe = ImagePipeline(spec["pipeline"],
                             deg_configs=spec["deg_configs"],
                             seed=seed, scale=4)
        files = sorted(glob.glob(os.path.join(EVAL_HR, "*.png")))
        pipe.run_pipeline(image_files=files, save_to_dir=out,
                          progress_bar_off=True)
        print(f"generated {len(files)} full-chain blind LR images in {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", default="0,9,19,29,39")
    ap.add_argument("--experiment", default="convergence_rcan")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--workdir", default="/tmp/rumpy_convergence")
    args = ap.parse_args()
    epochs = [int(e) for e in args.epochs.split(",")]

    lr_dir = generate_eval_set(args.workdir, args.seed)

    from click.testing import CliRunner

    from rumpy_tpu.cli.eval_sisr import main as eval_main
    from rumpy_tpu.config.loader import dump_toml

    out_loc = os.path.join(args.workdir, "eval_fullchain_results")
    cfg = {
        "model_loc": os.path.join(args.workdir, "Results"),
        "out_loc": out_loc,
        "scale": 4,
        "metrics": ["PSNR"],
        "save_im": False,
        "no_image_comparison": True,
        "data": {"lr_dir": lr_dir, "hr_dir": EVAL_HR},
        "models": [{"experiment": args.experiment, "epoch": e,
                    "label": f"ep{e}"} for e in epochs],
    }
    p = os.path.join(args.workdir, "eval_fullchain.toml")
    dump_toml(cfg, p)
    r = CliRunner().invoke(eval_main, ["--config", p],
                           catch_exceptions=False)
    print(r.output[-2000:])
    assert r.exit_code == 0

    import pandas as pd
    df = pd.read_csv(os.path.join(out_loc, "individual_metrics.csv"),
                     header=[0, 1], index_col=0)
    psnr_col = [c for c in df.columns.get_level_values(1).unique()
                if "PSNR" in c][0]
    bic = df[("bicubic", psnr_col)].mean()
    print("\nmean Y-PSNR on the MATCHED full-chain blind Set5 set "
          f"(seed {args.seed}, unseen draws):")
    print(f"  bicubic x4: {bic:.3f} dB")
    for e in epochs:
        v = df[(f"ep{e}", psnr_col)].mean()
        tag = "BEATS bicubic" if v > bic else "below bicubic"
        print(f"  epoch {e:3d}: {v:.3f} dB  ({tag}, {v - bic:+.3f})")


if __name__ == "__main__":
    main()
