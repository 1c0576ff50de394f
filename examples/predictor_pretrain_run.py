"""Train a contrastive degradation predictor on the chip and package it.

Counterpart of the reference's packaged pretrained encoders
(regression/pretrained_networks/, consumed by warm_start_setup
training_handler.py:92-118): trains SupMoCo on real HR images with the
fused on-device blur->downsample->noise->JPEG degradation chain (the
config #4/#5 distribution), through the REAL `train_sisr` CLI with
task_type=regression — epoch loop, per-epoch clustering scores,
summary.csv, the whole production path — then packages the resulting
checkpoint under rumpy_tpu/pretrained/<name>/ where
`training.warm_start = "<name>"` resolves it by bare name, exactly like
the reference.

"Converges" = contrastive train-loss falls and the eval-set embedding
clustering scores (silhouette up, Davies-Bouldin down) improve over
random init. Results are recorded in BASELINE.md.

Usage:  python examples/predictor_pretrain_run.py [--epochs 40]
        [--package supmoco_fullchain_d256] [--workdir /tmp/rumpy_predictor]
"""

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence_run import EVAL_HR, PIPELINES, stage_data  # noqa: E402


def generate_eval_set(workdir: str, seed: int,
                      pipeline: str = "fullchain") -> str:
    """Offline-degrade Set5 HR with the training chain (held-out seed) so
    the eval set carries the degradation-metadata CSV the class labelling
    needs for clustering scores."""
    import jax

    from rumpy_tpu.degradations.pipeline import ImagePipeline
    out = os.path.join(workdir, f"eval_clustering_{pipeline}_s{seed}")
    marker = os.path.join(out, "degradation_metadata.csv")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        spec = PIPELINES[pipeline]
        files = sorted(glob.glob(os.path.join(EVAL_HR, "*.png")))
        # Pin datagen to the coexisting CPU backend: under the default
        # (remote-TPU) platform each of the 5 distinct Set5 shapes would
        # cost minutes of tunnel compile PER OP for a 30-image one-off.
        with jax.default_device(jax.devices("cpu")[0]):
            pipe = ImagePipeline(spec["pipeline"],
                                 deg_configs=spec["deg_configs"],
                                 seed=seed, scale=4)
            # several degraded copies per image -> enough points to cluster
            pipe.run_pipeline(image_files=files, save_to_dir=out,
                              multiples=6, progress_bar_off=True)
        print(f"generated clustering eval set in {out}")
    return out


def write_config(workdir: str, hr_dir: str, eval_dir: str,
                 epochs: int, batch: int, model: str = "supmoco",
                 milestones=None, crop: int = 64,
                 pipeline: str = "fullchain") -> str:
    from rumpy_tpu.config.loader import dump_toml
    spec = PIPELINES[pipeline]
    internal = {"dim": 256, "K": 8192, "lr": 1e-3}
    if milestones:
        internal["scheduler"] = "multi_step_lr"
        internal["scheduler_params"] = {"milestones": list(milestones),
                                        "gamma": 0.5}
    cfg = {
        "experiment": f"{model}_pretrain",
        "experiment_save_loc": os.path.join(workdir, "Results"),
        "data": {
            "task_type": "regression",
            "scale": 4,
            "crop": crop,
            # crop_count derives from the handler's positives_per_class
            # default (SupMoCo: 4 -> 5 crops per image)
            "dataloader_threads": 2,
            "training_sets": {"data_1": {"hr_dir": hr_dir}},
            "eval_sets": {"data_1": {"lr_dir": eval_dir,
                                     "metadata_file": "on_site"}},
            "online_degradations": spec,
        },
        "model": {
            "name": model,
            "internal_params": internal,
        },
        "training": {
            "num_epochs": epochs,
            "batch_size": batch,
            "seed": 0,
        },
    }
    path = os.path.join(workdir, "config.toml")
    dump_toml(cfg, path)
    return path


def package(workdir: str, name: str, model: str = "supmoco",
            epoch="last") -> str:
    """Mirror warm_start_setup's copyfiles contract: config + summary.csv
    + one saved_models checkpoint ('last' | 'best' | int, e.g. the epoch
    a clustering probe picked), re-saved minimal (no optimizer)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp = os.path.join(workdir, "Results", f"{model}_pretrain")
    dst = os.path.join(repo, "rumpy_tpu", "pretrained", name)
    os.makedirs(os.path.join(dst, "saved_models"), exist_ok=True)
    os.makedirs(os.path.join(dst, "result_outputs"), exist_ok=True)

    from rumpy_tpu.config.loader import load_config
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils import checkpoint as ckpt
    # model params come from the experiment's own config copy so the
    # packaging template can never drift from what was trained
    exp_cfg = load_config(glob.glob(os.path.join(exp, "*.toml"))[0])
    internal = dict((exp_cfg.get("model") or {}).get("internal_params")
                    or {})
    handler = get_model((exp_cfg.get("model") or {}).get("name")
                        or "supmoco")(**internal)
    src_models = os.path.join(exp, "saved_models")
    epoch = ckpt.select_epoch(src_models, epoch)
    state, _ = handler.load_model(src_models, epoch, skip_optimizer_load=True)
    handler.save_model(state, os.path.join(dst, "saved_models"), epoch,
                       minimal=True)
    shutil.copy2(os.path.join(exp, "result_outputs", "summary.csv"),
                 os.path.join(dst, "result_outputs", "summary.csv"))
    for f in os.listdir(exp):
        if f.endswith(".toml"):
            shutil.copy2(os.path.join(exp, f),
                         os.path.join(dst, "pretrained_config.toml"))
            break
    print(f"packaged epoch {epoch} -> {dst}")
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--copies", type=int, default=120)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--package", default=None,
                    help="package the trained net under this name")
    ap.add_argument("--package-epoch", default="last",
                    help="which epoch to package: last | best | int "
                         "(e.g. the epoch encoder_probe.py ranked top)")
    ap.add_argument("--package-only", action="store_true",
                    help="skip training; just (re)package --package-epoch "
                         "from an existing --workdir run")
    ap.add_argument("--model", default="supmoco",
                    choices=("supmoco", "weakcon", "moco"))
    ap.add_argument("--milestones", default=None,
                    help="comma-separated optimizer-step milestones for a "
                         "gamma=0.5 multi_step_lr schedule")
    ap.add_argument("--pipeline", choices=sorted(PIPELINES),
                    default="fullchain",
                    help="degradation distribution the encoder trains "
                         "against (matched = the SRMD-blur-only chain the "
                         "shipped Set5 blind set was generated with)")
    ap.add_argument("--crop", type=int, default=64,
                    help="LR crop size fed to the encoder (the 1-core box "
                         "is conv-bound; 48 cuts epoch wall ~2x)")
    ap.add_argument("--platform", choices=("default", "cpu"),
                    default="default",
                    help="cpu = pin the CPU backend IN-PYTHON (the env "
                         "var alone does not stop the axon plugin from "
                         "dialing a possibly-hung tunnel)")
    ap.add_argument("--holdout", action="store_true",
                    help="exclude Set5 from the TRAINING pool so the "
                         "encoder stays clean for held-out SR studies "
                         "(clustering eval on Set5 remains eval-only)")
    ap.add_argument("--resume", default=None,
                    help="int | best | last — resume a prior run in the "
                         "same workdir (forwards continue_from_epoch)")
    ap.add_argument("--workdir", default="/tmp/rumpy_predictor")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.package_only:
        if not args.package:
            ap.error("--package-only requires --package")
        package(args.workdir, args.package, model=args.model,
                epoch=args.package_epoch)
        return

    os.makedirs(args.workdir, exist_ok=True)
    hr_dir = stage_data(args.workdir, args.copies, holdout=args.holdout)
    eval_dir = generate_eval_set(args.workdir, seed=2024,
                                 pipeline=args.pipeline)
    milestones = ([int(m) for m in args.milestones.split(",")]
                  if args.milestones else None)
    cfg = write_config(args.workdir, hr_dir, eval_dir, args.epochs,
                       args.batch, model=args.model, milestones=milestones,
                       crop=args.crop, pipeline=args.pipeline)

    from click.testing import CliRunner

    from rumpy_tpu.cli.train_sisr import main as train_main
    cli_args = ["--parameters", cfg]
    if args.resume:
        cli_args += ["--continue_from_epoch", args.resume]
    r = CliRunner().invoke(train_main, cli_args,
                           catch_exceptions=False)
    print(r.output[-3000:])
    assert r.exit_code == 0

    import pandas as pd
    summary = os.path.join(args.workdir, "Results",
                           f"{args.model}_pretrain",
                           "result_outputs", "summary.csv")
    df = pd.read_csv(summary)
    cols = [c for c in df.columns
            if c in ("epoch", "train-loss") or "silhouette" in c
            or "davies" in c]
    print("\n" + df[cols].to_string(index=False))

    if args.package:
        package(args.workdir, args.package, model=args.model,
                epoch=args.package_epoch)


if __name__ == "__main__":
    main()
