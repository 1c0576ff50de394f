"""Model-curation CLIs: model_report / extract_best_model / clean_models /
images_to_video.

Mirror of rumpy/sr_tools/helper_functions.py:237-456: report experiments
and their best metrics; export a deployable best-model folder; prune
checkpoints keeping best-1/best/best+1/last.
"""

from __future__ import annotations

import os
import shutil

import click
import pandas as pd

from rumpy_tpu.config.constants import metric_best_val
from rumpy_tpu.utils.checkpoint import (available_epochs, checkpoint_path,
                                        select_epoch)


def _experiments(results_loc):
    for name in sorted(os.listdir(results_loc)):
        exp = os.path.join(results_loc, name)
        if os.path.isdir(os.path.join(exp, "saved_models")):
            yield name, exp


def _best_epoch(exp_dir, metric="val-PSNR"):
    models = os.path.join(exp_dir, "saved_models")
    summary = os.path.join(exp_dir, "result_outputs", "summary.csv")
    return select_epoch(models, "best", summary, metric)


@click.command()
@click.option("--results_loc", "-r", required=True, type=click.Path(exists=True))
@click.option("--metric", default="val-PSNR")
def model_report(results_loc, metric):
    """Summarize every experiment: epochs present, best epoch, best value."""
    rows = []
    for name, exp in _experiments(results_loc):
        eps = available_epochs(os.path.join(exp, "saved_models"))
        summary = os.path.join(exp, "result_outputs", "summary.csv")
        best_val = None
        best_ep = None
        if os.path.isfile(summary):
            df = pd.read_csv(summary)
            if metric in df.columns:
                direction = metric_best_val.get(metric, "max")
                idx = (df[metric].idxmax() if direction == "max"
                       else df[metric].idxmin())
                best_val = df[metric].iloc[idx]
                best_ep = (int(df["epoch"].iloc[idx])
                           if "epoch" in df.columns else int(idx))
        rows.append({"experiment": name, "checkpoints": len(eps),
                     "last_epoch": eps[-1] if eps else None,
                     "best_epoch": best_ep, f"best_{metric}": best_val})
    report = pd.DataFrame(rows)
    click.echo(report.to_string(index=False))
    report.to_csv(os.path.join(results_loc, "model_report.csv"), index=False)


@click.command()
@click.option("--base_folder", "-b", required=True, type=click.Path(exists=True))
@click.option("--output", "-o", required=True, type=click.Path())
@click.option("--metric", default="val-PSNR")
def extract_best_model(base_folder, output, metric):
    """Export config + best checkpoint as a deployable folder
    (helper_functions.py:325-353)."""
    best = _best_epoch(base_folder, metric)
    os.makedirs(os.path.join(output, "saved_models"), exist_ok=True)
    shutil.copy(checkpoint_path(os.path.join(base_folder, "saved_models"),
                                best),
                checkpoint_path(os.path.join(output, "saved_models"), best))
    for aux in ["config.toml"]:
        src = os.path.join(base_folder, aux)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(output, aux))
    summary = os.path.join(base_folder, "result_outputs", "summary.csv")
    if os.path.isfile(summary):
        os.makedirs(os.path.join(output, "result_outputs"), exist_ok=True)
        shutil.copy(summary,
                    os.path.join(output, "result_outputs", "summary.csv"))
    click.echo(f"extracted epoch {best} -> {output}")


@click.command()
@click.option("--results_loc", "-r", required=True, type=click.Path(exists=True))
@click.option("--metric", default="val-PSNR")
@click.option("--dry_run/--no-dry_run", default=False)
def clean_models(results_loc, metric, dry_run):
    """Prune checkpoints keeping best-1/best/best+1/last
    (helper_functions.py:356-408)."""
    for name, exp in _experiments(results_loc):
        models = os.path.join(exp, "saved_models")
        eps = available_epochs(models)
        if not eps:
            continue
        try:
            best = _best_epoch(exp, metric)
        except (FileNotFoundError, ValueError) as e:
            # one unreadable/metricless experiment must not abort the
            # whole pruning run — skip it (it keeps all its epochs)
            click.echo(f"skipping {name}: {e}")
            continue
        keep = {best - 1, best, best + 1, eps[-1]}
        drop = [e for e in eps if e not in keep]
        for e in drop:
            path = checkpoint_path(models, e)
            click.echo(f"{'would remove' if dry_run else 'removing'} {path}")
            if not dry_run:
                os.remove(path)


@click.command()
@click.option("--input_dir", "-i", required=True, type=click.Path(exists=True))
@click.option("--output", "-o", required=True, type=click.Path())
@click.option("--fps", default=25)
def images_to_video(input_dir, output, fps):
    """Stitch a folder of frames into a video (requires ffmpeg)."""
    import shutil as _sh
    import subprocess
    ffmpeg = _sh.which("ffmpeg")
    if not ffmpeg:
        raise click.ClickException("ffmpeg not found on PATH")
    subprocess.run([ffmpeg, "-y", "-framerate", str(fps), "-pattern_type",
                    "glob", "-i", os.path.join(input_dir, "*.png"),
                    "-c:v", "libx264", "-pix_fmt", "yuv420p", output],
                   check=True)
    click.echo(f"wrote {output}")
