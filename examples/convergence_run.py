"""Real-data convergence demonstration on the chip (VERDICT r2 item 2).

Trains the flagship blind pipeline (BASELINE.json config #4: RCAN x4 +
fused on-device degradation; --bobw switches to config #5's
ContrastiveBlindQRCAN) for a few hundred optimizer steps on the real HR
images shipped with the reference (Set5 HR + BSD/DIV2K examples from
automated_testing), through the REAL `train_sisr` CLI — epoch loop,
summary.csv, samples, the whole production path — and validates per
epoch on the reference's shipped Set5 blind LR set (lr_random_blur +
its degradation_metadata.csv).

Prints the per-epoch val Y-PSNR curve and the bicubic reference PSNR on
the same blind set; "converges" = val-PSNR rises above bicubic and keeps
improving. Results are recorded in BASELINE.md.

Usage:  python examples/convergence_run.py [--epochs 40] [--bobw]
        [--workdir /tmp/rumpy_convergence]
"""

import argparse
import copy
import glob
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HR_SOURCES = [
    "/root/reference/Data/example_data/Set5/hr",
    "/root/reference/automated_testing/image_tools_tests/hr_examples",
    "/root/reference/automated_testing/sisr_tests/eval_dataset/hr",
]
# Held-out variant (VERDICT r3 item 1): Set5 is the VAL set, so a clean
# convergence number must not train on it — only the reference's other
# shipped real photos (4 unique; 12003/8143 appear in both dirs and
# dedupe by basename during staging).
HR_SOURCES_HELDOUT = HR_SOURCES[1:]
EVAL_LR = "/root/reference/Data/example_data/Set5/lr_random_blur"
EVAL_HR = "/root/reference/Data/example_data/Set5/hr"


def stage_data(workdir: str, copies: int, holdout: bool = False) -> str:
    """Copy the real HR images `copies` times so an epoch is long enough
    to make several optimizer steps at batch 16."""
    hr_dir = os.path.join(workdir, "hr_heldout" if holdout else "hr")
    os.makedirs(hr_dir, exist_ok=True)
    n = 0
    seen = set()
    for src in (HR_SOURCES_HELDOUT if holdout else HR_SOURCES):
        for f in sorted(glob.glob(os.path.join(src, "*.png"))):
            base = os.path.splitext(os.path.basename(f))[0]
            if base in seen:
                continue
            seen.add(base)
            for c in range(copies):
                dst = os.path.join(hr_dir, f"{base}_c{c}.png")
                if not os.path.exists(dst):
                    shutil.copy(f, dst)
                n += 1
    print(f"staged {n} HR items ({len(seen)} unique) in {hr_dir}")
    return hr_dir


# The reference's shipped Set5 blind set (lr_random_blur) carries ONLY a
# 10-component PCA blur-kernel column + its pca_matrix.pth — i.e. it was
# generated with random Gaussian blur + bicubic downsample, no noise or
# compression. "matched" trains on that same distribution so the val
# column on the shipped set is apples-to-apples; "fullchain" is the
# BASELINE.json config #4 chain (its matched eval set is produced by
# examples/convergence_eval_fullchain.py instead).
PIPELINES = {
    "fullchain": {
        "pipeline": [["realesrganblur", "b"], ["downsample", "d"],
                     ["realesrgannoise", "n"], ["jpegcompress", "c"]],
        "deg_configs": {
            "b": {"kernel_range": [
                "iso", "aniso", "generalized_iso", "generalized_aniso",
                "plateau_iso", "plateau_aniso", "sinc"],
                "kernel_size": 21, "request_kernel_metadata": True},
            "d": {"scale": 4},
            "n": {"gaussian_noise_sigma_range": [1, 30]},
            "c": {"quality": 60, "random_compression": True},
        },
    },
    "matched": {
        "pipeline": [["srmdgaussianblur", "b"], ["downsample", "d"]],
        "deg_configs": {
            "b": {"random": True, "sig_min": 0.2, "sig_max": 4.0,
                  "rate_iso": 0.5, "kernel_size": 21,
                  "request_kernel_metadata": True},
            "d": {"scale": 4},
        },
    },
}


def write_config(workdir: str, hr_dir: str, epochs: int,
                 bobw: bool, smoke: bool = False,
                 pipeline: str = "fullchain", batch: int = 16,
                 milestones=None, encoder: str = None,
                 dan: bool = False, ikc: bool = False,
                 finetune_encoder: bool = False,
                 holdout: bool = False, seed: int = 0,
                 aug: bool = False, aug_strength: float = 1.0) -> str:
    from rumpy_tpu.config.loader import dump_toml
    if dan:
        # third blind-SR family: DAN v1's estimator/restorer alternation,
        # trained against a 10-dim PCA blur-kernel encoding (the same
        # encoding SCHEME the shipped Set5 lr_random_blur set carries;
        # the basis is fit fresh from this pipeline's kernel sampler —
        # eval never consumes the metadata, so basis identity is moot)
        model = {
            "name": "dan",
            "internal_params": {
                "scale": 4, "lr": 2e-4, "mode": "v1", "nf": 64, "nb": 40,
                "loop": 4, "input_para": 10, "dtype": "bf16",
            },
        }
    elif ikc:
        # fourth blind-SR family: IKC's SFTMD pretrain -> predictor +
        # corrector alternation, against the same 10-dim PCA kernel code
        model = {
            "name": "ikc",
            "internal_params": {
                "scale": 4, "lr": 2e-4, "num_features": 64,
                "num_blocks": 16, "code_length": 10,
                "sftmd_pretrain_epochs": max(1, epochs // 3),
                "correction_steps": 7, "dtype": "bf16",
            },
        }
    else:
        model = {
            "name": "contrastiveblindqrcan" if bobw else "rcan",
            "internal_params": {
                "scale": 4, "lr": 2e-4, "n_feats": 64, "n_resgroups": 10,
                "n_resblocks": 20, "dtype": "bf16",
            },
        }
    if milestones:
        model["internal_params"]["scheduler"] = "multi_step_lr"
        model["internal_params"]["scheduler_params"] = {
            "milestones": list(milestones), "gamma": 0.5}
    if smoke:  # tiny net: validates the harness plumbing, not convergence
        if dan:
            model["internal_params"].update(nf=16, nb=2, loop=2,
                                            dtype="f32")
        elif ikc:
            model["internal_params"].update(num_features=16, num_blocks=2,
                                            correction_steps=2,
                                            sftmd_pretrain_epochs=1,
                                            dtype="f32")
        else:
            model["internal_params"].update(
                n_feats=16, n_resgroups=2, n_resblocks=2, dtype="f32")
    if bobw:
        if encoder:
            # the reference's headline workflow (config #5 proper):
            # contrastive pretrain -> freeze encoder -> train generator,
            # warm-starting from a packaged pretrained network by bare
            # name (parity of pre_trained_encoder_weights)
            model["internal_params"]["pre_trained_encoder_weights"] = encoder
            if finetune_encoder:
                # ablation arm (d): warm-load the encoder but keep it in
                # the gradient tree so the L1 loss finetunes it
                model["internal_params"]["encoder_freeze_mode"] = "none"
        else:
            # frozen random-init DASR encoder feeding QRCAN (the Zenodo
            # predictor checkpoints are not in this image; the
            # demonstration is that the JOINT pipeline trains)
            model["internal_params"]["block_encoder_loading"] = True
    exp = ("convergence_dan" if dan
           else "convergence_ikc" if ikc
           else "convergence_bobw" if bobw else "convergence_rcan")
    if bobw and encoder:
        exp += "_ft" if finetune_encoder else "_warm"
    if pipeline != "fullchain":
        exp += f"_{pipeline}"
    if holdout:
        exp += "_heldout"
    if aug:
        exp += "_aug"
    if seed:
        exp += f"_s{seed}"
    online = copy.deepcopy(PIPELINES[pipeline])
    if dan or ikc:
        # DAN's kernel loss and IKC's predictor/corrector target the
        # PCA-encoded blur kernel; request it from the blur op instead of
        # the scalar sigma metadata
        bcfg = online["deg_configs"]["b"]
        bcfg.pop("request_kernel_metadata", None)
        bcfg["request_pca_kernels"] = True
        bcfg["pca_length"] = 10
    cfg = {
        "experiment": exp,
        "experiment_save_loc": os.path.join(workdir, "Results"),
        "model": model,
        "data": {
            "scale": 4,
            "crop": 48,
            "dataloader_threads": 2,
            # --aug (VERDICT r4 item 4): stretch the tiny held-out pool
            # with the framework's own augmentation — random flip/rot
            # (data_handler.py:570-587 analog) plus the SimCLR colour
            # jitter the reference exposes for contrastive crops
            # (image_functions.py:364-371), applied photometrically
            # aligned to the HR before online degradation.
            **({"augmentations": True} if aug else {}),
            "training_sets": {"data_1": {
                "hr_dir": hr_dir,
                **({"use_random_colour_distort": True,
                    "colour_distortion_strength": aug_strength}
                   if aug else {})}},
            "eval_sets": {"data_1": {"lr_dir": EVAL_LR, "hr_dir": EVAL_HR,
                                     "metadata_file": "on_site"}},
            "online_degradations": online,
            **({"metadata": ["blur_kernel"]} if (dan or ikc) else {}),
        },
        "training": {
            "num_epochs": epochs,
            "batch_size": batch,
            "seed": seed,
            "metrics": ["PSNR"],
        },
    }
    path = os.path.join(workdir, "config.toml")
    dump_toml(cfg, path)
    return path


def bicubic_baseline() -> float:
    """Mean Y-PSNR of PIL-parity bicubic x4 on the blind eval set.
    Runs on the CPU backend: each distinct image shape would otherwise
    cost minutes of remote compile over the tunnel."""
    import jax

    from PIL import Image

    from rumpy_tpu.ops import resize as resize_ops
    from rumpy_tpu.utils.color import rgb_to_ycbcr
    from rumpy_tpu.utils.metrics import psnr
    vals = []
    with jax.default_device(jax.devices("cpu")[0]):
        for f in sorted(os.listdir(EVAL_LR)):
            if not f.endswith(".png"):
                continue
            lr = np.asarray(Image.open(
                os.path.join(EVAL_LR, f)).convert("RGB"))
            hr = np.asarray(Image.open(
                os.path.join(EVAL_HR, f)).convert("RGB"),
                np.float32) / 255.0
            bic = np.asarray(resize_ops.pil_resize(
                lr, (lr.shape[0] * 4, lr.shape[1] * 4))
            ).astype(np.float32) / 255.0
            hr = hr[:bic.shape[0], :bic.shape[1]]
            by = np.asarray(rgb_to_ycbcr(np.clip(bic, 0, 1), y_only=True,
                                         im_type="jpg"))
            hy = np.asarray(rgb_to_ycbcr(np.clip(hr, 0, 1), y_only=True,
                                         im_type="jpg"))
            vals.append(float(psnr(by, hy, 1.0)))
    return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--copies", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pipeline", choices=sorted(PIPELINES),
                    default="fullchain")
    ap.add_argument("--milestones", default=None,
                    help="comma-separated optimizer-step milestones for a "
                         "gamma=0.5 multi_step_lr schedule")
    ap.add_argument("--bobw", action="store_true")
    ap.add_argument("--dan", action="store_true")
    ap.add_argument("--ikc", action="store_true")
    ap.add_argument("--encoder", default=None,
                    help="packaged pretrained network name (e.g. "
                         "supmoco_fullchain_d256) to warm-start the "
                         "frozen BoBW encoder from")
    ap.add_argument("--finetune-encoder", action="store_true",
                    help="with --bobw --encoder: keep the warm-loaded "
                         "encoder trainable (ablation arm d)")
    ap.add_argument("--holdout", action="store_true",
                    help="exclude Set5 from the TRAINING pool so the "
                         "shipped Set5 blind val set is truly held out")
    ap.add_argument("--aug", action="store_true",
                    help="random flip/rot + SimCLR colour distortion on "
                         "the training crops (stretches the tiny "
                         "held-out pool)")
    ap.add_argument("--aug-strength", type=float, default=1.0,
                    help="colour_distortion_strength with --aug")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="pin the JAX backend in-Python (e.g. cpu) — the "
                         "axon site hook overrides the env var at "
                         "interpreter startup, so smokes must pin here")
    ap.add_argument("--resume", default=None,
                    help="int | best | last — resume a prior run in the "
                         "same workdir (forwards continue_from_epoch)")
    ap.add_argument("--workdir", default="/tmp/rumpy_convergence")
    args = ap.parse_args()
    if sum([args.dan, args.ikc, args.bobw]) > 1:
        ap.error("--dan / --ikc / --bobw are mutually exclusive")
    if args.encoder and not args.bobw:
        ap.error("--encoder requires --bobw")
    if args.finetune_encoder and not (args.bobw and args.encoder):
        ap.error("--finetune-encoder requires --bobw and --encoder")
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.workdir, exist_ok=True)
    hr_dir = stage_data(args.workdir, args.copies, holdout=args.holdout)
    milestones = ([int(m) for m in args.milestones.split(",")]
                  if args.milestones else None)
    cfg = write_config(args.workdir, hr_dir, args.epochs, args.bobw,
                       smoke=args.smoke, pipeline=args.pipeline,
                       batch=args.batch, milestones=milestones,
                       encoder=args.encoder, dan=args.dan, ikc=args.ikc,
                       finetune_encoder=args.finetune_encoder,
                       holdout=args.holdout, seed=args.seed,
                       aug=args.aug, aug_strength=args.aug_strength)

    bic = bicubic_baseline()
    print(f"bicubic x4 Y-PSNR on the blind Set5 eval set: {bic:.3f} dB")

    from click.testing import CliRunner

    from rumpy_tpu.cli.train_sisr import main as train_main
    cli_args = ["--parameters", cfg]
    if args.resume:
        cli_args += ["--continue_from_epoch", args.resume]
    r = CliRunner().invoke(train_main, cli_args, catch_exceptions=False)
    print(r.output[-3000:])
    assert r.exit_code == 0

    import pandas as pd
    exp = ("convergence_dan" if args.dan
           else "convergence_ikc" if args.ikc
           else "convergence_bobw" if args.bobw else "convergence_rcan")
    if args.bobw and args.encoder:
        exp += "_ft" if args.finetune_encoder else "_warm"
    if args.pipeline != "fullchain":
        exp += f"_{args.pipeline}"
    if args.holdout:
        exp += "_heldout"
    if args.aug:
        exp += "_aug"
    if args.seed:
        exp += f"_s{args.seed}"
    summary = os.path.join(args.workdir, "Results", exp, "result_outputs",
                           "summary.csv")
    df = pd.read_csv(summary)
    col = [c for c in df.columns if c.startswith("val-") and "PSNR" in c][0]
    print("\nepoch, train-loss, val-PSNR")
    for _, row in df.iterrows():
        print(f"{int(row['epoch']):4d}  {row.get('train-loss', float('nan')):.5f}  "
              f"{row[col]:.3f}")
    best = df[col].max()
    print(f"\nbicubic: {bic:.3f} dB | best val-PSNR: {best:.3f} dB "
          f"({'BEATS' if best > bic else 'below'} bicubic, "
          f"last {df[col].iloc[-1]:.3f})")


if __name__ == "__main__":
    main()
