"""Bounded-compile eval mode (VERDICT r3 item 6 / SURVEY §7 hard part 2):
pad-to-bucket eval must (a) reproduce the unpadded path's metrics on the
real Set5 blind set within the framework's 0.01 dB parity budget, and
(b) bound the number of compiled programs for a mixed-shape folder.

Bucket padding is zeros (not reflect): zeros best mimic the implicit
zero padding each conv applies at the true image border (measured
|dPSNR| ~0.004 dB vs ~0.009 reflect/edge on 24/12-px pads,
interface.py net_run_and_process docstring)."""

import os

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner
from PIL import Image

from rumpy_tpu.config.loader import dump_toml

SET5_LR = "/root/reference/Data/example_data/Set5/lr_random_blur"
SET5_HR = "/root/reference/Data/example_data/Set5/hr"


def _train_tiny_x4(tmp_path, rng, name="bucket_exp"):
    """One-epoch tiny x4 EDSR experiment the EvalHub can load."""
    from rumpy_tpu.cli.train_sisr import main as train_main
    from rumpy_tpu.ops import resize
    hr_dir = tmp_path / "train_hr"
    os.makedirs(hr_dir, exist_ok=True)
    for i in range(2):
        hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"t{i}.png")
    cfg = {
        "experiment": name,
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"scale": 4, "crop": 8, "dataloader_threads": 1,
                 "training_sets": {"data_1": {"hr_dir": str(hr_dir)}},
                 "online_degradations": {
                     "pipeline": [["downsample", "d"]],
                     "deg_configs": {"d": {"scale": 4}}}},
        "model": {"name": "edsr",
                  "internal_params": {"scale": 4, "num_features": 8,
                                      "num_blocks": 1}},
        "training": {"num_epochs": 1, "batch_size": 1, "seed": 0},
    }
    p = tmp_path / "train.toml"
    dump_toml(cfg, str(p))
    r = CliRunner().invoke(train_main, ["--parameters", str(p)])
    assert r.exit_code == 0, r.output + repr(r.exception)
    return str(tmp_path / "Results")


def _run_eval(tmp_path, model_loc, data_cfg, out_name, pad_to_bucket=None):
    from rumpy_tpu.evaluation.eval_hub import EvalHub
    hub = EvalHub(models=[{"experiment": "bucket_exp", "epoch": "last",
                           "label": "net"}],
                  model_loc=model_loc, data_cfg=dict(data_cfg),
                  out_loc=str(tmp_path / out_name), scale=4,
                  metrics=["PSNR", "SSIM"], pad_to_bucket=pad_to_bucket)
    hub.full_image_protocol()
    return pd.read_csv(tmp_path / out_name / "individual_metrics.csv",
                       header=[0, 1], index_col=0), hub


@pytest.mark.slow
def test_bucket_eval_metric_parity_set5(tmp_path, rng):
    """Golden: bucketed vs unpadded eval on the 5 real Set5 blind images
    (5 distinct shapes) — per-image PSNR within 0.01 dB, SSIM within
    1e-3, bicubic reference columns bit-identical (never padded)."""
    model_loc = _train_tiny_x4(tmp_path, rng)
    data_cfg = {"lr_dir": SET5_LR, "hr_dir": SET5_HR}
    plain, _ = _run_eval(tmp_path, model_loc, data_cfg, "plain")
    bucket, hub = _run_eval(tmp_path, model_loc, data_cfg, "bucket",
                            pad_to_bucket=64)
    assert hub.pad_to_bucket == 64
    assert len(plain) == len(bucket) == 5
    d_psnr = (plain[("net", "PSNR")] - bucket[("net", "PSNR")]).abs()
    d_ssim = (plain[("net", "SSIM")] - bucket[("net", "SSIM")]).abs()
    print("\nbucket-vs-plain |dPSNR| per image:\n", d_psnr.to_string())
    assert d_psnr.max() < 0.01, d_psnr.to_string()
    assert d_ssim.max() < 1e-3, d_ssim.to_string()
    # references are computed on the raw LR, never padded
    pd.testing.assert_series_equal(plain[("bicubic", "PSNR")],
                                   bucket[("bicubic", "PSNR")])


def test_bucket_eval_bounds_compiles(tmp_path, rng):
    """A 3-shape folder under bucket 32 compiles exactly ONE program per
    model (all shapes land in the same 32x32 bucket); the unpadded path
    compiles three."""
    from rumpy_tpu.ops import resize
    model_loc = _train_tiny_x4(tmp_path, rng)
    lr_dir = tmp_path / "multi_lr"
    hr_dir = tmp_path / "multi_hr"
    os.makedirs(lr_dir)
    os.makedirs(hr_dir)
    for i, (h, w) in enumerate([(16, 16), (20, 24), (28, 12)]):
        hr = (rng.random((h * 4, w * 4, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"m{i}.png")
        lr = np.asarray(resize.pil_resize(hr, (h, w)))
        Image.fromarray(lr).save(lr_dir / f"m{i}.png")
    data_cfg = {"lr_dir": str(lr_dir), "hr_dir": str(hr_dir)}

    df, hub = _run_eval(tmp_path, model_loc, data_cfg, "bucket3",
                        pad_to_bucket=32)
    handler = hub.models["net"].model
    n_bucket = handler._eval_step._cache_size()
    assert len(df) == 3
    assert n_bucket == 1, f"expected 1 compiled program, got {n_bucket}"

    df, hub = _run_eval(tmp_path, model_loc, data_cfg, "plain3")
    handler = hub.models["net"].model
    assert handler._eval_step._cache_size() == 3
