"""colour_distortion (SimCLR jitter) + predefined-entropy-patch CSV
ingestion (VERDICT r1 item 6)."""

import os

import jax
import numpy as np
import pytest


def test_hsv_round_trip(rng):
    from rumpy_tpu.ops.color_aug import _hsv_to_rgb, _rgb_to_hsv
    img = rng.random((8, 8, 3)).astype(np.float32)
    h, s, v = _rgb_to_hsv(img)
    back = np.asarray(_hsv_to_rgb(h, s, v))
    np.testing.assert_allclose(back, img, atol=1e-5)


def test_jitter_component_formulas(rng):
    """Each jitter op matches the torchvision blend formulas
    (adjust_brightness/contrast/saturation)."""
    from rumpy_tpu.ops.color_aug import (_brightness, _contrast, _gray,
                                         _saturation)
    img = rng.random((6, 5, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_brightness(img, 0.5)),
                               np.clip(img * 0.5, 0, 1), atol=1e-6)
    gray = (0.2989 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]
    np.testing.assert_allclose(np.asarray(_gray(img)), gray, atol=1e-5)
    c = 1.3
    np.testing.assert_allclose(
        np.asarray(_contrast(img, c)),
        np.clip(c * img + (1 - c) * gray.mean(), 0, 1), atol=1e-5)
    s = 0.4
    np.testing.assert_allclose(
        np.asarray(_saturation(img, s)),
        np.clip(s * img + (1 - s) * gray, 0, 1), atol=1e-5)


def test_colour_distortion_batch(rng):
    from rumpy_tpu.ops.color_aug import colour_distortion
    imgs = rng.random((16, 12, 12, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out = np.asarray(colour_distortion(key, imgs))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # deterministic per key; different keys give different draws
    out2 = np.asarray(colour_distortion(key, imgs))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(colour_distortion(jax.random.PRNGKey(1), imgs))
    assert np.abs(out - out3).max() > 1e-3
    # per-image independence: at least two images get visibly different
    # treatment (some unchanged/grayscaled, some jittered)
    deltas = np.abs(out - imgs).reshape(16, -1).max(axis=1)
    assert deltas.max() > 0.05


def test_colour_distortion_zero_strength(rng):
    """dist_strength=0: jitter is the identity, so every output is the
    input or its grayscale (RandomGrayscale p=0.2 still applies)."""
    from rumpy_tpu.ops.color_aug import colour_distortion
    imgs = rng.random((32, 8, 8, 3)).astype(np.float32)
    out = np.asarray(colour_distortion(jax.random.PRNGKey(2), imgs,
                                       dist_strength=0.0))
    gray = (0.2989 * imgs[..., 0] + 0.587 * imgs[..., 1]
            + 0.114 * imgs[..., 2])[..., None]
    gray3 = np.broadcast_to(gray, imgs.shape)
    n_id = n_gray = 0
    for i in range(32):
        if np.allclose(out[i], imgs[i], atol=1e-5):
            n_id += 1
        elif np.allclose(out[i], gray3[i], atol=1e-5):
            n_gray += 1
        else:
            raise AssertionError(f"image {i} neither identity nor gray")
    assert n_gray >= 1 and n_id >= 16


def test_predefined_patch_csv_round_trip(tmp_path, rng):
    """Reference ClassifierImages predefined-entropy-patch CSV format
    (data_handler.py:762-777): per-image corner lists keyed by stringified
    tuples, column 'high_entropy_patches_left_corner'."""
    from PIL import Image

    from rumpy_tpu.data.datasets import SuperResImages
    lr_dir = tmp_path / "lr"
    os.makedirs(lr_dir)
    # image whose pixel value encodes its (row, col) position
    arr = np.zeros((40, 40, 3), np.uint8)
    arr[..., 0] = np.arange(40)[:, None]
    arr[..., 1] = np.arange(40)[None, :]
    Image.fromarray(arr).save(lr_dir / "im0.png")

    csv = tmp_path / "patches.csv"
    csv.write_text(
        ",high_entropy_patches_left_corner\n"
        "\"('im0.png', 'x')\",\"[(4, 6), (20, 10)]\"\n")

    ds = SuperResImages(lr_dir=str(lr_dir), scale=1, crop=8, crop_count=2,
                        predefined_patch_location=str(csv))
    item = ds[0]
    crops = item["lr"]
    assert crops.shape == (2, 8, 8, 3)
    # crop 0 starts at (4, 6); crop 1 at (20, 10) — check encoded coords
    assert int(round(crops[0, 0, 0, 0] * 255)) == 4
    assert int(round(crops[0, 0, 0, 1] * 255)) == 6
    assert int(round(crops[1, 0, 0, 0] * 255)) == 20
    assert int(round(crops[1, 0, 0, 1] * 255)) == 10

    # single-crop path uses the same per-image corners
    ds1 = SuperResImages(lr_dir=str(lr_dir), scale=1, crop=8,
                         predefined_patch_location=str(csv))
    one = ds1[0]["lr"]
    assert int(round(one[0, 0, 0] * 255)) == 4
    assert int(round(one[0, 0, 1] * 255)) == 6


def test_regression_trainer_colour_distort_flag(tmp_path, rng):
    """colour_distort in [data] routes contrastive views through the
    jitter with per-view independent draws."""
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    from PIL import Image

    hr_dir = tmp_path / "hr"
    os.makedirs(hr_dir)
    for i in range(2):
        Image.fromarray((rng.random((64, 64, 3)) * 255
                         ).astype(np.uint8)).save(hr_dir / f"im{i}.png")
    cfg = {
        "experiment": "cd_exp",
        "no_directories": True,
        "data": {
            "task_type": "regression", "scale": 2, "crop": 16,
            "dataloader_threads": 1, "colour_distort": True,
            "online_degradations": {
                "pipeline": [["realesrganblur", "b"], ["downsample", "d"]],
                "deg_configs": {
                    "b": {"kernel_range": ["iso"], "kernel_size": 9},
                    "d": {"scale": 2}}},
            "training_sets": {"data_1": {"hr_dir": str(hr_dir)}},
        },
        "model": {"name": "moco",
                  "internal_params": {"dim": 8, "K": 16,
                                      "positives_per_class": 1}},
        "training": {"num_epochs": 1, "batch_size": 2, "seed": 0},
    }
    handler = RegressionTrainingHandler(cfg)
    assert handler._colour_distort
    batch = next(iter(handler.train_data))
    out = handler._degrade_views(batch, epoch=0, step=0)
    views = out["lr"]
    assert views.shape[1] == 2
    assert views.min() >= 0.0 and views.max() <= 1.0
    # the two views of an image share the degradation draw but get
    # different colour jitters, so they are not identical
    assert np.abs(views[:, 0] - views[:, 1]).max() > 1e-4
