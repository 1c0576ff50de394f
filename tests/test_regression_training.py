"""End-to-end regression (degradation-predictor) training: degraded
dataset with metadata CSV -> SupMoCo/WeakCon training via the regression
trainer + train_sisr CLI routing (task_type='regression')."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from rumpy_tpu.config.loader import dump_toml, to_none_dict


@pytest.fixture(scope="module")
def degraded_dataset(tmp_path_factory):
    """Real blur+noise+compress degraded images + metadata CSV."""
    tmp = tmp_path_factory.mktemp("regdata")
    hr_dir = tmp / "hr"
    os.makedirs(hr_dir)
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)
                        ).save(hr_dir / f"im{i}.png")
    from rumpy_tpu.degradations.pipeline import pipeline_prep_and_run
    out = str(tmp / "lr")
    pipeline_prep_and_run({
        "pipeline": [["realesrganblur", "b"], ["downsample", "d"],
                     ["realesrgannoise", "n"], ["randomcompress", "c"]],
        "deg_configs": {
            "b": {"kernel_range": ["iso", "aniso"], "kernel_size": 9,
                  "request_kernel_metadata": True},
            "d": {"scale": 2},
            "n": {"gaussian_noise_sigma_range": (1, 30),
                  "gray_noise_probability": 0.4},
            "c": {"jm_params": {"random_compression": True},
                  "jpeg_params": {"random_compression": True}}},
        "seed": 1, "source_dir": str(hr_dir), "output_dir": out})
    return out


def _config(tmp_path, lr_dir, model_name, internal):
    return to_none_dict({
        "experiment": f"{model_name}_exp",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"task_type": "regression", "scale": 2, "crop": 16,
                 "dataloader_threads": 1,
                 "training_sets": {"data_1": {
                     "lr_dir": lr_dir,
                     "metadata_file": os.path.join(
                         lr_dir, "degradation_metadata.csv")}},
                 "eval_sets": {"data_1": {
                     "lr_dir": lr_dir, "crop": 16,
                     "metadata_file": os.path.join(
                         lr_dir, "degradation_metadata.csv")}}},
        "model": {"name": model_name, "internal_params": internal},
        "training": {"num_epochs": 1, "batch_size": 2, "seed": 0},
    })


def test_supmoco_regression_training(tmp_path, degraded_dataset):
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    cfg = _config(tmp_path, degraded_dataset, "supmoco",
                  {"K": 8, "positives_per_class": 2, "dim": 64})
    h = RegressionTrainingHandler(cfg, verbose=False)
    assert h._num_classes > 0
    stats = h.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])
    exp = tmp_path / "Results" / "supmoco_exp"
    assert (exp / "saved_models" / "train_model_0").is_file()
    # embedding dumps written by contrastive eval
    enc = exp / "result_outputs" / "encodings_epoch_0.npz"
    assert enc.is_file()
    data = np.load(enc)
    assert data["embeddings"].shape[1] == 256


def test_weakcon_regression_training(tmp_path, degraded_dataset):
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    cfg = _config(tmp_path, degraded_dataset, "weakcon",
                  {"K": 8, "positives_per_class": 1, "dim": 64})
    h = RegressionTrainingHandler(cfg, verbose=False)
    stats = h.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])


def test_supmoco_online_degradation_training(tmp_path):
    """Online mode: HR-only training set; contrastive views are degraded
    ON DEVICE with shared per-image kernels (reference ran the pipeline
    per-crop inside DataLoader workers, data_handler.py:498-504)."""
    import os
    from PIL import Image
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    hr_dir = tmp_path / "hr"
    os.makedirs(hr_dir)
    rng = np.random.default_rng(3)
    for i in range(4):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                        ).save(hr_dir / f"im{i}.png")
    cfg = to_none_dict({
        "experiment": "supmoco_online",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"task_type": "regression", "scale": 2, "crop": 16,
                 "dataloader_threads": 1,
                 "online_degradations": {
                     "pipeline": [["realesrganblur", "b"],
                                  ["downsample", "d"],
                                  ["realesrgannoise", "n"]],
                     "deg_configs": {
                         "b": {"kernel_range": ["iso", "aniso"],
                               "kernel_size": 9},
                         "d": {"scale": 2},
                         "n": {"gaussian_noise_sigma_range": (1, 30)}}},
                 "training_sets": {"data_1": {"hr_dir": str(hr_dir)}}},
        "model": {"name": "supmoco", "internal_params":
                  {"K": 8, "positives_per_class": 2, "dim": 64}},
        "training": {"num_epochs": 1, "batch_size": 2, "seed": 0},
    })
    h = RegressionTrainingHandler(cfg, verbose=False)
    assert h._num_classes > 0  # labelling keys enumerated from pipeline
    stats = h.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])


def test_cli_routes_regression(tmp_path, degraded_dataset):
    from click.testing import CliRunner
    from rumpy_tpu.cli.train_sisr import main
    cfg = _config(tmp_path, degraded_dataset, "moco", {"K": 8, "dim": 32})
    path = tmp_path / "cfg.toml"
    dump_toml(cfg, str(path))
    r = CliRunner().invoke(main, ["--parameters", str(path)])
    assert r.exit_code == 0, r.output + repr(r.exception)


def test_positives_default_derived_from_handler(tmp_path, degraded_dataset):
    """A config that omits positives_per_class must build crop_count from
    the HANDLER's own signature default (SupMoCo: 4), not a hardcoded 1 —
    the mismatch crashed SupMoCo's (n, positives, dim) key reshape on the
    first training batch."""
    cfg = _config(tmp_path, degraded_dataset, "supmoco",
                  {"K": 8, "dim": 32})
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    h = RegressionTrainingHandler(cfg, verbose=False)
    assert h._positives == 4  # SupMoCoHandler's positives_per_class default
    stats = h.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])

    # WeakCon declares only vector_size in ITS __init__ and inherits
    # positives_per_class from SupMoCo — the default must be found via
    # the MRO, not the leaf signature (a leaf-only lookup built 2-crop
    # batches that crashed the (n, positives, dim) key reshape)
    cfg_w = _config(tmp_path, degraded_dataset, "weakcon",
                    {"K": 8, "dim": 32})
    cfg_w["experiment"] = "weakcon_positives"
    h_w = RegressionTrainingHandler(cfg_w, verbose=False)
    assert h_w._positives == 4
    stats = h_w.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])


def test_warm_start_unknown_name_fails_loud(tmp_path, degraded_dataset):
    """Bare warm_start names resolve against rumpy_tpu/pretrained/<name>
    (reference warm_start_setup semantics, training_handler.py:92-118);
    an unknown name must raise, not silently train from scratch."""
    cfg = _config(tmp_path, degraded_dataset, "moco", {"K": 8, "dim": 32})
    cfg["training"]["warm_start"] = "no_such_packaged_net"
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    with pytest.raises(RuntimeError, match="not available"):
        RegressionTrainingHandler(cfg, verbose=False)
