"""End-to-end training tests: dataset -> loader -> trainer -> stats/ckpts,
including online on-device degradations and resume/branching."""

import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from rumpy_tpu.config.loader import to_none_dict
from rumpy_tpu.data.datasets import SuperResImages
from rumpy_tpu.data.loader import DataLoader
from rumpy_tpu.training.trainer import TrainingHandler


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    os.makedirs(hr_dir)
    os.makedirs(lr_dir)
    from rumpy_tpu.ops import resize
    for i in range(4):
        hr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"im{i}.png")
        lr = np.asarray(resize.pil_resize(hr, (24, 24)))
        Image.fromarray(lr).save(lr_dir / f"im{i}.png")
    return str(lr_dir), str(hr_dir)


def test_dataset_pairs(tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2, crop=8,
                        augmentations=True)
    assert len(ds) == 4
    item = ds[0]
    assert item["lr"].shape == (8, 8, 3)
    assert item["hr"].shape == (16, 16, 3)
    assert item["lr"].dtype == np.float32


def test_dataset_interp_ycbcr(tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                        input="interp", colorspace="ycbcr")
    item = ds[0]
    assert item["lr"].shape == (48, 48, 1)  # pre-interpolated, Y-only
    assert item["hr"].shape == (48, 48, 1)


def test_loader_batches(tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2, crop=8)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["lr"].shape == (2, 8, 8, 3)
    assert len(batches[0]["tag"]) == 2


def _config(tmp_path, lr_dir, hr_dir, **training_extra):
    return to_none_dict({
        "experiment": "test_exp",
        "experiment_save_loc": str(tmp_path / "results"),
        "data": {
            "scale": 2, "crop": 8, "dataloader_threads": 2,
            "training_sets": {"data_1": {"lr_dir": lr_dir, "hr_dir": hr_dir}},
            "eval_sets": {"data_1": {"lr_dir": lr_dir, "hr_dir": hr_dir}},
        },
        "model": {"name": "edsr",
                  "internal_params": {"scale": 2, "num_features": 8,
                                      "num_blocks": 1}},
        "training": {"num_epochs": 2, "batch_size": 2, "seed": 1,
                     **training_extra},
    })


def test_full_training_run(tmp_path, tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    handler = TrainingHandler(_config(tmp_path, lr_dir, hr_dir),
                              verbose=False)
    stats = handler.run_experiment()
    assert 0 in stats and 1 in stats
    assert "train-loss" in stats[0]
    assert "val-PSNR" in stats[0]
    exp = tmp_path / "results" / "test_exp"
    assert (exp / "config.toml").is_file()
    assert (exp / "saved_models" / "train_model_0").is_file()
    assert (exp / "saved_models" / "train_model_1").is_file()
    summary = pd.read_csv(exp / "result_outputs" / "summary.csv")
    assert len(summary) == 2
    assert "val-PSNR" in summary.columns


def test_resume_branches(tmp_path, tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    TrainingHandler(_config(tmp_path, lr_dir, hr_dir),
                    verbose=False).run_experiment()
    cfg = _config(tmp_path, lr_dir, hr_dir, continue_from_epoch=0,
                  num_epochs=2)
    cfg["training"]["num_epochs"] = 2
    h2 = TrainingHandler(cfg, verbose=False)
    # resuming from epoch 0 (non-final) must fork a branch dir
    assert "branch_epoch_0" in h2.model.base_folder
    h2.run_experiment()
    assert os.path.isfile(os.path.join(h2.model.model_save_dir,
                                       "train_model_1"))


def test_online_degradation_training(tmp_path, tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    cfg = _config(tmp_path, lr_dir, hr_dir)
    cfg["data"]["training_sets"]["data_1"] = to_none_dict(
        {"hr_dir": hr_dir, "online_degradations": True})
    cfg["data"]["online_degradations"] = to_none_dict({
        "pipeline": [["realesrganblur", "b"], ["downsample", "d"],
                     ["jpegcompress", "j"]],
        "deg_configs": {"b": {"kernel_range": ["iso"], "kernel_size": 9,
                              "request_kernel_metadata": True},
                        "d": {"scale": 2},
                        "j": {"quality": 80, "random_compression": True}},
    })
    cfg["training"]["num_epochs"] = 1
    handler = TrainingHandler(cfg, verbose=False)
    assert handler.online_pipeline is not None
    stats = handler.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])


def test_early_stopping(tmp_path, tiny_dataset):
    lr_dir, hr_dir = tiny_dataset
    cfg = _config(tmp_path, lr_dir, hr_dir,
                  early_stopping_patience=1)
    cfg["training"]["num_epochs"] = 50
    cfg["training"]["lr"] = 0.0  # no learning => immediate plateau
    cfg["model"]["internal_params"]["lr"] = 0.0
    handler = TrainingHandler(cfg, verbose=False)
    stats = handler.run_experiment()
    assert len(stats) <= 3  # stopped long before 50


def test_celeba_attribute_merge(tmp_path, rng):
    """Celeba facial attributes prepend the metadata vector
    (data_handler.py:20-58, :141-146)."""
    from PIL import Image
    from rumpy_tpu.data.datasets import SuperResImages

    lr_d = tmp_path / "lr"
    hr_d = tmp_path / "hr"
    lr_d.mkdir(), hr_d.mkdir()
    for i in range(3):
        arr = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(hr_d / f"{i:06d}.png")
        Image.fromarray(arr[::2, ::2]).save(lr_d / f"{i:06d}.png")
    # list_attr_celeba.txt format: count line, header line, rows
    attr = tmp_path / "list_attr_celeba.txt"
    attr.write_text(
        "3\nMale Young Smiling\n"
        "000000.jpg 1 -1 1\n"
        "000001.jpg -1 1 -1\n"
        "000002.jpg 1 1 1\n")
    ds = SuperResImages(lr_dir=str(lr_d), hr_dir=str(hr_d), scale=2,
                        attributes_loc=str(attr),
                        data_attributes=["gender", "age"])
    assert ds.metadata_keys[:2] == ["celeba-gender", "celeba-age"]
    item = ds[0]
    assert item["metadata"][:2].tolist() == [1.0, 0.0]  # Male=1, Young=-1->0
    item2 = ds[1]
    assert item2["metadata"][:2].tolist() == [0.0, 1.0]

    # amplification mode: -1 -> -2, 1 -> 2
    ds2 = SuperResImages(lr_dir=str(lr_d), hr_dir=str(hr_d), scale=2,
                         attributes_loc=str(attr),
                         data_attributes=["gender"],
                         attribute_amplification=True)
    assert ds2[0]["metadata"][0] == 2.0
    assert ds2[1]["metadata"][0] == -2.0


def test_empty_train_loader_raises(tmp_path, tiny_dataset):
    """A batch_size larger than the dataset (with drop_last) must fail
    loudly, not silently NaN every epoch."""
    import pytest
    lr_dir, hr_dir = tiny_dataset
    cfg = {
        "experiment": "empty_loader", "no_directories": True,
        "data": {"scale": 2,
                 "training_sets": {"data_1": {
                     "lr_dir": lr_dir, "hr_dir": hr_dir}}},
        "model": {"name": "srcnn",
                  "internal_params": {"scale": 2}},
        "training": {"num_epochs": 1, "batch_size": 512},
    }
    handler = TrainingHandler(cfg)
    with pytest.raises(RuntimeError, match="no batches"):
        handler.train(0)


def test_profile_steps_writes_trace(tmp_path, rng):
    """[training] profile_steps captures a jax.profiler trace into
    result_outputs/profile (SURVEY §5 tracing hook)."""
    import os

    from PIL import Image

    from rumpy_tpu.training.trainer import TrainingHandler
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    os.makedirs(hr_dir)
    os.makedirs(lr_dir)
    from rumpy_tpu.ops import resize
    for i in range(2):
        hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"im{i}.png")
        Image.fromarray(np.asarray(resize.pil_resize(hr, (16, 16)))).save(
            lr_dir / f"im{i}.png")
    cfg = {
        "experiment": "prof_exp",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"scale": 2, "crop": 8, "dataloader_threads": 1,
                 "training_sets": {"data_1": {"lr_dir": str(lr_dir),
                                              "hr_dir": str(hr_dir)}},
                 "eval_sets": {"data_1": {"lr_dir": str(lr_dir),
                                          "hr_dir": str(hr_dir)}}},
        "model": {"name": "edsr",
                  "internal_params": {"scale": 2, "num_features": 8,
                                      "num_blocks": 1}},
        "training": {"num_epochs": 1, "batch_size": 1,
                     "profile_steps": 1},
    }
    handler = TrainingHandler(cfg)
    handler.run_experiment()
    prof = tmp_path / "Results" / "prof_exp" / "result_outputs" / "profile"
    assert prof.is_dir()
    found = [f for _r, _d, fs in os.walk(prof) for f in fs]
    assert found, "profiler trace directory is empty"
    # sample saving landed too (first val image per epoch)
    samples = (tmp_path / "Results" / "prof_exp" / "result_outputs"
               / "samples")
    assert (samples / "epoch_0_sample.png").is_file()


def test_training_ycbcr_model_eval(tmp_path, rng):
    """Y-channel models (SRCNN/VDSR) through the full train+val loop:
    eval datasets stay RGB and the interface owns the YCbCr conversion +
    Cb/Cr reassembly — a Y-only eval dataset used to crash the val loop
    with a second rgb_to_ycbcr on 1-channel input."""
    import os
    from PIL import Image
    from rumpy_tpu.ops import resize
    from rumpy_tpu.training.trainer import TrainingHandler

    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    os.makedirs(hr_dir)
    os.makedirs(lr_dir)
    for i in range(2):
        hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"i{i}.png")
        Image.fromarray(np.asarray(resize.pil_resize(hr, (16, 16)))
                        ).save(lr_dir / f"i{i}.png")
    cfg = {
        "experiment": "ycbcr_eval",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"scale": 2, "crop": 8, "dataloader_threads": 1,
                 "training_sets": {"data_1": {"lr_dir": str(lr_dir),
                                              "hr_dir": str(hr_dir)}},
                 "eval_sets": {"data_1": {"lr_dir": str(lr_dir),
                                          "hr_dir": str(hr_dir)}}},
        "model": {"name": "srcnn", "internal_params": {"scale": 2}},
        "training": {"num_epochs": 1, "batch_size": 2,
                     "metrics": ["PSNR"]},
    }
    handler = TrainingHandler(cfg, use_mesh=False, verbose=False)
    stats = handler.run_experiment()
    row = stats[0]
    assert np.isfinite(row["val-PSNR"]) and row["val-PSNR"] > 5


def test_reference_dataset_config_vocabulary(tiny_dataset):
    """A RUMpy-style [data.training_sets.data_N] table (keys 'lr', 'hr',
    'random_augment', 'cutoff', 'degradation_metadata' — the reference's
    sample-config vocabulary, data_setup.py:85-156) builds loaders
    unchanged."""
    from rumpy_tpu.data.loader import sisr_data_setup
    lr_dir, hr_dir = tiny_dataset
    train, evalu = sisr_data_setup(
        {"training_sets": {"data_1": {
            "lr": lr_dir, "hr": hr_dir, "random_augment": True,
            "cutoff": 3, "degradation_metadata": None}},
         "eval_sets": {"data_1": {"lr": lr_dir, "hr": hr_dir}}},
        scale=2, batch_size=2, dataloader_threads=0, crop=8)
    assert len(train.dataset) == 3  # cutoff -> custom_split (0, 3)
    assert train.dataset.augmentations is True
    batch = next(iter(train))
    assert batch["lr"].shape == (2, 8, 8, 3)
    assert next(iter(evalu))["lr"].shape[0] == 1


def test_image_shortlist_and_augment_flags(tiny_dataset, tmp_path):
    """image_shortlist text file retains only the listed images
    (data_handler.py:429-438); use_hflip/use_vflip/use_rotation gate the
    augmentation draws; use_random_colour_distort jitters LR and HR with
    the SAME draws (image_augment_crop, data_handler.py:574-587)."""
    lr_dir, hr_dir = tiny_dataset
    shortlist = tmp_path / "keep.txt"
    shortlist.write_text(f"im1.png\n{os.path.join(lr_dir, 'im3.png')}\n")
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                        image_shortlist=str(shortlist))
    assert [os.path.basename(f) for f in ds.lr_files] == ["im1.png",
                                                          "im3.png"]

    # all flip/rot switches off -> augmentation is the identity
    ds_noaug = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                              augmentations=True, use_hflip=False,
                              use_vflip=False, use_rotation=False, seed=3)
    ds_plain = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                              seed=3)
    np.testing.assert_array_equal(ds_noaug[0]["lr"], ds_plain[0]["lr"])

    # colour distortion: photometric change, same draws for LR and HR
    ds_cd = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                           augmentations=True, use_hflip=False,
                           use_vflip=False, use_rotation=False,
                           use_random_colour_distort=True, seed=3)
    item = ds_cd[0]
    plain = ds_plain[0]
    assert not np.allclose(item["lr"], plain["lr"])
    assert item["lr"].shape == plain["lr"].shape
    # the LR is a PIL-bicubic downsample of HR; after identical
    # photometric jitter the downsample relation roughly persists —
    # check both moved in the same direction per channel
    d_lr = item["lr"].mean(axis=(0, 1)) - plain["lr"].mean(axis=(0, 1))
    d_hr = item["hr"].mean(axis=(0, 1)) - plain["hr"].mean(axis=(0, 1))
    assert np.all(np.sign(np.round(d_lr, 3)) == np.sign(np.round(d_hr, 3)))

    # non-rgb colorspace rejects the distortion flag loudly
    with pytest.raises(ValueError):
        SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                       colorspace="ycbcr", augmentations=True,
                       use_random_colour_distort=True)


def test_epoch_cutoff_and_relative_num_epochs(tmp_path, tiny_dataset):
    """Reference epoch semantics (base_handler.py:150-152, :333):
    num_epochs counts epochs FROM the resume point; epoch_cutoff is the
    absolute total including previously-run epochs. batch_size is also
    accepted under [data], where the reference's sample configs put it."""
    lr_dir, hr_dir = tiny_dataset
    cfg = _config(tmp_path, lr_dir, hr_dir)
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["batch_size"] = None
    cfg["data"]["batch_size"] = 2  # [data] placement
    h = TrainingHandler(cfg, verbose=False)
    assert h.batch_size == 2
    h.run_experiment()  # epoch 0

    # resume from last with num_epochs=1 -> ONE more epoch (epoch 1)
    cfg2 = _config(tmp_path, lr_dir, hr_dir, continue_from_epoch="last",
                   num_epochs=1)
    h2 = TrainingHandler(cfg2, verbose=False)
    stats = h2.run_experiment()
    assert sorted(stats) == [1]

    # epoch_cutoff=4 from epoch 2 -> epochs 2 and 3 only
    cfg3 = _config(tmp_path, lr_dir, hr_dir, continue_from_epoch="last",
                   epoch_cutoff=4)
    h3 = TrainingHandler(cfg3, verbose=False)
    stats = h3.run_experiment()
    assert sorted(stats) == [2, 3]


def test_reference_training_kwargs(tmp_path, tiny_dataset):
    """eval_frequency / save_samples / model_cleanup_frequency +
    cleanup_metric / early_stopping_metric / max_im_val — the reference
    BaseTrainingHandler kwarg vocabulary (base_handler.py:38-95)."""
    lr_dir, hr_dir = tiny_dataset
    cfg = _config(tmp_path, lr_dir, hr_dir, num_epochs=4,
                  eval_frequency=2, save_samples=False,
                  model_cleanup_frequency=4,
                  cleanup_metric="train-loss",
                  early_stopping_metric="val-PSNR")
    h = TrainingHandler(cfg, verbose=False)
    stats = h.run_experiment()
    # eval ran on epochs 0 and 2 only
    assert "val-PSNR" in stats[0] and "val-PSNR" in stats[2]
    assert "val-PSNR" not in stats[1] and "val-PSNR" not in stats[3]
    # sample saving disabled
    exp = tmp_path / "results" / "test_exp"
    assert not (exp / "result_outputs" / "samples").exists()
    # periodic cleanup fired at epoch 4 boundary: best-set by train-loss
    from rumpy_tpu.utils.checkpoint import available_epochs
    best = h._best_epoch_by("train-loss")
    kept = set(available_epochs(str(exp / "saved_models")))
    assert kept == {e for e in (best - 1, best, best + 1, 3)
                    if 0 <= e <= 3}


def test_data_level_options_blacklists_vsr_droplast(tmp_path, tiny_dataset):
    """Data-level reference options (data_setup.py:61-160): 'blacklists'
    dict of per-dataset CSV files (with an 'Images' column),
    'multi_frame_config' routing to VideoSequenceImages, and
    'drop_last_training_batch' overriding the TPU-default True."""
    from rumpy_tpu.data.datasets import VideoSequenceImages
    from rumpy_tpu.data.loader import sisr_data_setup
    lr_dir, hr_dir = tiny_dataset
    bl = tmp_path / "blacklist.csv"
    pd.DataFrame({"Images": ["im0.png"]}).to_csv(bl, index=False)
    train, _ = sisr_data_setup(
        {"training_sets": {"data_1": {
            "lr": lr_dir, "hr": hr_dir, "name": "div2k",
            "custom_split": (0, 4)}},
         "blacklists": {"div2k": str(bl)},
         "drop_last_training_batch": False},
        scale=2, batch_size=3, dataloader_threads=0, crop=8)
    assert len(train.dataset) == 3  # im0 blacklisted
    assert train.drop_last is False
    batches = list(train)
    assert sum(len(b["tag"]) for b in batches) == 3  # ragged last kept

    train_vsr, _ = sisr_data_setup(
        {"training_sets": {"data_1": {"lr": lr_dir, "hr": hr_dir}},
         "multi_frame_config": {"num_frames": 3}},
        scale=2, batch_size=1, dataloader_threads=0)
    assert isinstance(train_vsr.dataset, VideoSequenceImages)
    assert next(iter(train_vsr))["lr"].shape[-1] == 9  # 3 frames x RGB


def test_face_psnr_metric_during_training(tmp_path, tiny_dataset):
    """[training] metrics can include face_PSNR/true_face_PSNR: boundary
    boxes load from the eval set's HR dir (face_boundaries_0.csv) and the
    columns land in summary.csv — the reference wires its Metrics hub
    into training eval the same way (base_handler.py:162-177)."""
    lr_dir, hr_dir = tiny_dataset
    pd.DataFrame(
        {"top": [2, 2, 2, 2], "left": [2, 2, 2, 2],
         "height": [8, 8, 8, 8], "width": [8, 8, 8, 8]},
        index=[f"im{i}.png" for i in range(4)],
    ).to_csv(os.path.join(hr_dir, "face_boundaries_0.csv"))
    cfg = _config(tmp_path, lr_dir, hr_dir, num_epochs=1,
                  metrics=["PSNR", "face_PSNR", "true_face_PSNR"])
    h = TrainingHandler(cfg, verbose=False)
    stats = h.run_experiment()
    assert np.isfinite(stats[0]["val-face_PSNR"])
    assert np.isfinite(stats[0]["val-true_face_PSNR"])
    # the crop inside the box differs from the whole image score
    assert stats[0]["val-true_face_PSNR"] != stats[0]["val-PSNR"]


def test_loss_masking_semantics(rng):
    """loss_masking (reference base_architecture.py:24, :451-455,
    :475-478): with the flag set and a batch "mask", SR and HR are
    multiplied by the binary all-channels-non-black mask before the
    loss — fully-masked-out pixels stop contributing; a pixel with ANY
    zero channel in the mask counts as black (the reference's
    get_binary_masks quirk)."""
    from rumpy_tpu.registry import get_model
    kw = dict(scale=2, n_feats=8, n_resgroups=1, n_resblocks=1, seed=0)
    plain = get_model("rcan")(**kw)
    masked = get_model("rcan")(loss_masking=True, **kw)
    lr = rng.random((2, 8, 8, 3)).astype(np.float32)
    hr = rng.random((2, 16, 16, 3)).astype(np.float32)
    ones = np.ones((2, 16, 16, 3), np.float32)
    # (the jitted step donates its input state: use a fresh one per call)
    # identical when the mask keeps everything
    _, l_plain = plain.train_batch(plain.init_state(),
                                   {"lr": lr, "hr": hr})
    _, l_full = masked.train_batch(masked.init_state(),
                                   {"lr": lr, "hr": hr, "mask": ones})
    np.testing.assert_allclose(float(l_plain["train-loss"]),
                               float(l_full["train-loss"]), rtol=1e-6)
    # zero mask -> zero loss
    _, l_zero = masked.train_batch(
        masked.init_state(),
        {"lr": lr, "hr": hr, "mask": np.zeros_like(ones)})
    assert float(l_zero["train-loss"]) == 0.0
    # any-channel-zero pixel counts as black (reference quirk)
    partial = ones.copy()
    partial[..., 1] = 0.0
    _, l_part = masked.train_batch(masked.init_state(),
                                   {"lr": lr, "hr": hr, "mask": partial})
    assert float(l_part["train-loss"]) == 0.0
    # without the flag, the mask key is ignored
    _, l_ign = plain.train_batch(
        plain.init_state(),
        {"lr": lr, "hr": hr, "mask": np.zeros_like(ones)})
    assert float(l_ign["train-loss"]) > 0.0


def test_use_masks_trains_masked_end_to_end(tmp_path, tiny_dataset):
    """multi_frame_config.use_masks flows trainer -> model loss_masking
    (reference base_handler.py:110-123) and the uvtex mask reaches the
    train step through the VSR dataset; a missing mask file fails loudly
    instead of producing ragged batches."""
    lr_dir, hr_dir = tiny_dataset
    from rumpy_tpu.data.datasets import VideoSequenceImages
    with pytest.raises(FileNotFoundError, match="mask"):
        ds = VideoSequenceImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                                 num_frames=2, use_masks=True)
        ds[0]
    Image.fromarray(np.full((48, 48, 3), 255, np.uint8)).save(
        os.path.join(hr_dir, "uvtex_mask.png"))
    # note: the mask is listed as an HR image too in this layout; the
    # reference stores it alongside HR frames the same way
    cfg = to_none_dict({
        "experiment": "msk", "experiment_save_loc": str(tmp_path / "out"),
        "model": {"name": "rcan", "internal_params": {
            "scale": 2, "n_feats": 8, "n_resgroups": 1,
            "n_resblocks": 1, "in_features": 6}},  # 2 frames x RGB
        "data": {
            "scale": 2,
            "multi_frame_config": {"num_frames": 2, "use_masks": True},
            "training_sets": {"d": {"lr_dir": lr_dir, "hr_dir": hr_dir,
                                    "crop": 8}},
            "eval_sets": {"e": {"lr_dir": lr_dir, "hr_dir": hr_dir}},
            "batch_size": 2},
        "training": {"num_epochs": 1, "seed": 0, "metrics": ["PSNR"]},
    })
    th = TrainingHandler(cfg, use_mesh=False, verbose=False)
    assert th.model.model.loss_masking
    stats = th.run_experiment()
    assert np.isfinite(stats[0]["train-loss"])
    assert os.path.isfile(os.path.join(
        th.model.logs_dir, "summary.csv"))


def test_vsr_bundle_coherence_under_threads(tmp_path):
    """VSR frame bundles stay spatially coherent when fetched from
    concurrent loader threads: every frame of a window shares one crop/
    augmentation draw even while another thread fetches a different
    window (the shared-RNG swap is serialized + restored)."""
    from concurrent.futures import ThreadPoolExecutor
    from rumpy_tpu.data.datasets import VideoSequenceImages
    lr_dir = tmp_path / "lr"
    os.makedirs(lr_dir)
    # channel 0 encodes position, channel 1 the frame index: coherent
    # crops give identical channel-0 planes across a bundle's frames
    yy, xx = np.mgrid[0:40, 0:40]
    pos = ((yy * 40 + xx) % 251).astype(np.uint8)
    for i in range(8):
        im = np.stack([pos, np.full_like(pos, i * 30), pos], -1)
        Image.fromarray(im).save(lr_dir / f"f{i}.png")
    ds = VideoSequenceImages(lr_dir=str(lr_dir), scale=2, crop=8,
                             augmentations=True, num_frames=3, seed=0)

    def check(idx):
        bundle = ds[idx]["lr"]  # (8, 8, 9)
        for f in range(1, 3):
            np.testing.assert_array_equal(bundle[..., 0],
                                          bundle[..., 3 * f])
        return True

    with ThreadPoolExecutor(max_workers=4) as pool:
        assert all(pool.map(check, list(range(len(ds))) * 8))


def test_image_shortlist_sibling_tree_not_mangled(tiny_dataset, tmp_path):
    """Shortlist entries from a sibling tree whose path merely CONTAINS
    base_dir as a substring must not be relpath-mangled (the reference's
    `main_dir in pth` test, data_handler.py:432-433, silently dropped
    such images); absolute entries under base_dir and bare names both
    still match."""
    lr_dir, hr_dir = tiny_dataset
    sibling = lr_dir + "_extra"
    os.makedirs(sibling, exist_ok=True)
    shortlist = tmp_path / "keep2.txt"
    shortlist.write_text(
        f"{os.path.join(lr_dir, 'im0.png')}\n"       # abs under base
        f"{os.path.join(sibling, 'im2.png')}\n"      # sibling tree
        "im3.png\n")                                  # bare name
    ds = SuperResImages(lr_dir=lr_dir, hr_dir=hr_dir, scale=2,
                        image_shortlist=str(shortlist))
    names = [os.path.basename(f) for f in ds.lr_files]
    assert "im0.png" in names and "im3.png" in names
    # the sibling entry matches via basename (reference intent: keep the
    # named image), NOT via a mangled relative path
    assert "im2.png" in names


def test_one_cycle_degenerate_phase_rejected():
    """one_cycle_lr with pct_start*total_steps <= 1 (or >= total) would
    divide by zero and emit NaN learning rates; it must fail loudly."""
    from rumpy_tpu.models.base import build_schedule
    with pytest.raises(ValueError, match="one_cycle"):
        build_schedule(1e-4, "one_cycle_lr",
                       {"total_steps": 1000, "pct_start": 0.001})
    with pytest.raises(ValueError, match="one_cycle"):
        build_schedule(1e-4, "one_cycle_lr",
                       {"total_steps": 100, "pct_start": 1.0})
    # healthy settings still build
    s = build_schedule(1e-4, "one_cycle_lr",
                       {"total_steps": 100, "pct_start": 0.3})
    assert np.isfinite(float(s(0))) and np.isfinite(float(s(99)))


def test_resume_truncates_orphan_stats_rows(tmp_path, tiny_dataset):
    """A crash between the summary.csv row write and the (slower)
    checkpoint save leaves an orphan row for an epoch with no
    checkpoint; resuming from 'last' must drop it rather than append a
    duplicate epoch index."""
    import pandas as pd
    lr_dir, hr_dir = tiny_dataset
    h = TrainingHandler(_config(tmp_path, lr_dir, hr_dir), verbose=False)
    h.run_experiment()  # epochs 0,1 with checkpoints
    summary = os.path.join(h.model.logs_dir, "summary.csv")
    df = pd.read_csv(summary)
    orphan = df.iloc[[-1]].assign(epoch=2)  # row 2, no train_model_2
    pd.concat([df, orphan]).to_csv(summary, index=False)
    cfg = _config(tmp_path, lr_dir, hr_dir, continue_from_epoch="last")
    cfg["training"]["num_epochs"] = 1
    h2 = TrainingHandler(cfg, verbose=False)
    h2.run_experiment()  # re-runs epoch 2 from the epoch-1 checkpoint
    out = pd.read_csv(os.path.join(h2.model.logs_dir, "summary.csv"))
    assert list(out["epoch"]) == [0, 1, 2]
