"""eval_sisr CLI.

Mirror of rumpy/shared_framework/net_eval.py:19-132: TOML config (and/or
CLI options) specifying model bundles, dataset location, metrics and
output dir; builds EvalHub and runs full_image_protocol.

Config schema:
  [data]            lr_dir / hr_dir / metadata_file / scale ...
  [[models]]        experiment = "...", epoch = "best"|"last"|N, label = ...
  out_loc, model_loc, metrics = ["PSNR", "SSIM"], save_im, gallery ...
"""

from __future__ import annotations

import click

from rumpy_tpu.config.loader import load_config, merge_overrides
from rumpy_tpu.evaluation.eval_hub import EvalHub


@click.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True),
              help="TOML eval config.")
@click.option("--out_loc", default=None, type=click.Path())
@click.option("--model_loc", default=None, type=click.Path())
@click.option("--scale", default=None, type=int)
@click.option("--save_im/--no-save_im", default=None)
@click.option("--gallery/--no-gallery", default=None)
@click.option("--time_models/--no-time_models", default=None)
def main(config, out_loc, model_loc, scale, save_im, gallery, time_models):
    cfg = load_config(config)
    cfg = merge_overrides(cfg, {k: v for k, v in {
        "out_loc": out_loc, "model_loc": model_loc, "scale": scale,
        "save_im": save_im, "gallery": gallery,
        "time_models": time_models}.items() if v is not None})

    models = cfg.get("models") or []
    # accept both [[models]] tables and the reference net_eval style of
    # plain experiment-name lists with a parallel load_epochs list
    if models and not isinstance(models[0], dict):
        epochs = list(cfg.get("load_epochs") or [])
        models = [{"experiment": name,
                   "epoch": epochs[i] if i < len(epochs) else "best"}
                  for i, name in enumerate(models)]
    hub = EvalHub(
        models=[dict(m) for m in models],
        model_loc=cfg["model_loc"],
        data_cfg=dict(cfg.get("data") or {}),
        out_loc=cfg["out_loc"],
        scale=cfg.get("scale") or 4,
        metrics=list(cfg.get("metrics") or ["PSNR", "SSIM"]),
        save_im=bool(cfg.get("save_im")),
        gallery=bool(cfg.get("gallery")),
        lanczos_upsample=bool(cfg.get("lanczos_upsample")),
        time_models=bool(cfg.get("time_models")),
        lpips_weights=cfg.get("lpips_weights"),
        fr_gallery=cfg.get("fr_gallery"),
        fr_extractor=cfg.get("fr_extractor") or "lightcnn",
        fr_extractor_weights=cfg.get("fr_extractor_weights"))
    df = hub.full_image_protocol()
    click.echo(df.mean(axis=0).to_string())


if __name__ == "__main__":
    main()
