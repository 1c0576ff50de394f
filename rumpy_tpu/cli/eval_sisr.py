"""eval_sisr CLI.

Mirror of rumpy/shared_framework/net_eval.py:19-132: TOML config and/or
CLI options specifying model bundles, dataset location, metrics and
output dir; builds EvalHub and runs full_image_protocol. As in the
reference, every behavioral option is reachable as a flag (the TOML file
is optional); flags override config-file values.

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
@click.option("--config", "-c", default=None, type=click.Path(exists=True),
              help="TOML eval config (optional; flags also fully specify "
                   "a run).")
@click.option("--out_loc", default=None, type=click.Path())
@click.option("--model_loc", default=None, type=click.Path())
@click.option("--scale", default=None, type=int)
@click.option("--hr_dir", default=None, help="HR image directory.")
@click.option("--lr_dir", default=None, help="LR image directory.")
@click.option("--metadata_file", default=None,
              help="Degradation-metadata CSV ('on_site' resolves to "
                   "<lr_dir>/degradation_metadata.csv).")
@click.option("--dataset_name", default=None,
              help="Named dataset (uses its eval split).")
@click.option("--data_split", default=None,
              help="Split name within --dataset_name.")
@click.option("--group_select", multiple=True, type=int,
              help="Keep only _qN group tags (repeatable).")
@click.option("--qpi_selection", type=(float, float), default=None,
              help="Keep images whose QPI falls in this range.")
@click.option("--ignore_degradation_location", is_flag=True,
              help="Strip positional '0-' prefixes from metadata keys.")
@click.option("--recursive", is_flag=True,
              help="Recurse into LR subdirectories.")
@click.option("--model_and_epoch", "-me", multiple=True, nargs=2,
              help="Model experiment + epoch (best|last|N); repeatable.")
@click.option("--metrics", "-m", multiple=True,
              help="Metrics to compute (PSNR SSIM LPIPS FR_rank).")
@click.option("--save_im/--no-save_im", default=None)
@click.option("--gallery/--no-gallery", default=None,
              help="Write per-image comparison collages.")
@click.option("--no_image_comparison", is_flag=True, default=None)
@click.option("--lanczos_upsample", is_flag=True, default=None)
@click.option("--time_models/--no-time_models", default=None)
@click.option("--lpips_weights", default=None, type=click.Path())
@click.option("--fr_gallery", default=None, type=click.Path(),
              help="Face-rec gallery: dir of <id>.png or a features npz.")
@click.option("--fr_extractor", default=None)
@click.option("--fr_extractor_weights", default=None, type=click.Path())
@click.option("--pad_to_bucket", default=None, type=int,
              help="Bounded-compile eval: zero-pad model inputs up to the "
                   "next multiple of N px (output cropped back before "
                   "metrics) so arbitrary-shape folders compile a bounded "
                   "number of programs instead of one per shape.")
def main(config, out_loc, model_loc, scale, hr_dir, lr_dir, metadata_file,
         dataset_name, data_split, group_select, qpi_selection,
         ignore_degradation_location, recursive, model_and_epoch, metrics,
         save_im, gallery, no_image_comparison, lanczos_upsample,
         time_models, lpips_weights, fr_gallery, fr_extractor,
         fr_extractor_weights, pad_to_bucket):
    cfg = load_config(config) if config else {}
    # every boolean option is tri-state (default=None): unset flags stay
    # None and never clobber a config-file value, while an explicit
    # --no-save_im (False) still overrides it
    cfg = merge_overrides(cfg, {k: v for k, v in {
        "out_loc": out_loc, "model_loc": model_loc, "scale": scale,
        "save_im": save_im, "gallery": gallery,
        "time_models": time_models,
        "no_image_comparison": no_image_comparison,
        "lanczos_upsample": lanczos_upsample,
        "lpips_weights": lpips_weights, "fr_gallery": fr_gallery,
        "fr_extractor": fr_extractor,
        "fr_extractor_weights": fr_extractor_weights,
        "pad_to_bucket": pad_to_bucket}.items()
        if v is not None})

    data = dict(cfg.get("data") or {})
    for key, val in (("hr_dir", hr_dir), ("lr_dir", lr_dir),
                     ("metadata_file", metadata_file),
                     ("dataset", dataset_name), ("split", data_split),
                     ("qpi_selection", qpi_selection)):
        if val is not None:
            data[key] = val
    if group_select:
        data["group_select"] = list(group_select)
    if ignore_degradation_location:
        data["ignore_degradation_location"] = True
    if recursive:
        data["recursive_search"] = True

    models = list(cfg.get("models") or [])
    # accept both [[models]] tables and the reference net_eval style of
    # plain experiment-name lists with a parallel load_epochs list
    if models and not isinstance(models[0], dict):
        epochs = list(cfg.get("load_epochs") or [])
        models = [{"experiment": name,
                   "epoch": epochs[i] if i < len(epochs) else "best"}
                  for i, name in enumerate(models)]
    for name, epoch in model_and_epoch:
        models.append({"experiment": name,
                       "epoch": int(epoch) if epoch.isdigit() else epoch})
    if not models:
        raise click.ClickException(
            "No models specified: pass -me EXPERIMENT EPOCH or a config "
            "with a [[models]] table")
    if not cfg.get("model_loc") or not cfg.get("out_loc"):
        raise click.ClickException("model_loc and out_loc are required")

    hub = EvalHub(
        models=[dict(m) for m in models],
        model_loc=cfg["model_loc"],
        data_cfg=data,
        out_loc=cfg["out_loc"],
        scale=cfg.get("scale") or 4,
        metrics=list(metrics) or list(cfg.get("metrics")
                                      or ["PSNR", "SSIM"]),
        save_im=bool(cfg.get("save_im")),
        gallery=bool(cfg.get("gallery")),
        lanczos_upsample=bool(cfg.get("lanczos_upsample")),
        time_models=bool(cfg.get("time_models")),
        no_image_comparison=bool(cfg.get("no_image_comparison")),
        lpips_weights=cfg.get("lpips_weights"),
        fr_gallery=cfg.get("fr_gallery"),
        fr_extractor=cfg.get("fr_extractor") or "lightcnn",
        fr_extractor_weights=cfg.get("fr_extractor_weights"),
        pad_to_bucket=cfg.get("pad_to_bucket"))
    df = hub.full_image_protocol()
    click.echo(df.mean(axis=0).to_string())


if __name__ == "__main__":
    main()
