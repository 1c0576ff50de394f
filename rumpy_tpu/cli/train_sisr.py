"""train_sisr CLI.

Mirror of rumpy/shared_framework/net_train.py:24-97: loads a TOML config,
merges CLI overrides, converts unset keys to None-defaulting dicts, routes
SISR vs regression (contrastive predictor) training by data.task_type,
copies the config into the experiment dir (versioned as
config_from_epoch_N.toml on resume), and runs the experiment.
"""

from __future__ import annotations

import os
import shutil

import click

from rumpy_tpu.config.loader import load_config, merge_overrides, dump_toml


@click.command()
@click.option("--parameters", "-p", required=True,
              type=click.Path(exists=True),
              help="TOML config file for the experiment.")
@click.option("--experiment", default=None, help="Experiment name override.")
@click.option("--num_epochs", default=None, type=int)
@click.option("--batch_size", default=None, type=int)
@click.option("--seed", default=None, type=int)
@click.option("--continue_from_epoch", default=None,
              help="int | best | last — resume point.")
@click.option("--experiment_save_loc", default=None,
              type=click.Path())
def main(parameters, experiment, num_epochs, batch_size, seed,
         continue_from_epoch, experiment_save_loc):
    cfg = load_config(parameters)
    overrides = {"experiment": experiment,
                 "experiment_save_loc": experiment_save_loc}
    t_over = {"num_epochs": num_epochs, "batch_size": batch_size,
              "seed": seed}
    if continue_from_epoch is not None:
        try:
            t_over["continue_from_epoch"] = int(continue_from_epoch)
        except ValueError:
            t_over["continue_from_epoch"] = continue_from_epoch
    overrides["training"] = {k: v for k, v in t_over.items()
                             if v is not None}
    cfg = merge_overrides(cfg, {k: v for k, v in overrides.items()
                                if v is not None and v != {}})

    task = (cfg.get("data") or {}).get("task_type") or "sisr"
    if task == "regression":
        from rumpy_tpu.training.regression_trainer import \
            RegressionTrainingHandler as Handler
    else:
        from rumpy_tpu.training.trainer import TrainingHandler as Handler

    handler = Handler(cfg)

    # config copy into experiment dir (net_train.py:84-92)
    base = handler.model.base_folder
    if base and not cfg.get("no_directories"):
        resume = (cfg.get("training") or {}).get("continue_from_epoch")
        name = ("config.toml" if resume is None
                else f"config_from_epoch_{handler.model.model_epoch - 1}.toml")
        dump_toml(cfg, os.path.join(base, name))
        handler.model.save_metadata()

    handler.run_experiment()


if __name__ == "__main__":
    main()
