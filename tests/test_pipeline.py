"""Degradation-pipeline tests: op registry, host CSV contract, fused
on-device path, metadata vectorization."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from PIL import Image

from rumpy_tpu.degradations import ImagePipeline, fused_degrade
from rumpy_tpu.registry import available_tools

PIPE = [["realesrganblur", "blur_cfg"], ["downsample", "down_cfg"],
        ["realesrgannoise", "noise_cfg"], ["jpegcompress", "jpeg_cfg"]]
CFGS = {
    "blur_cfg": {"kernel_range": ["iso", "aniso"], "kernel_size": 9,
                 "request_kernel_metadata": True},
    "down_cfg": {"scale": 2},
    "noise_cfg": {"gaussian_noise_sigma_range": (5, 10),
                  "gaussian_poisson_ratio": 1.0},
    "jpeg_cfg": {"quality": 80},
}


def test_tool_registry():
    tools = available_tools()
    for name in ["realesrganblur", "srmdgaussianblur", "bsrganblur",
                 "realesrgannoise", "jpegcompress", "jmcompress",
                 "randomcompress", "downsample", "upsample"]:
        assert name in tools, name


def test_host_pipeline_csv_contract(tmp_path, rng):
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    os.makedirs(out)
    for name in ["a.png", "b.png"]:
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(src / name)
    pipe = ImagePipeline(PIPE, deg_configs=CFGS, seed=1)
    pipe.run_pipeline(image_files=[str(src / "a.png"), str(src / "b.png")],
                      save_to_dir=str(out), progress_bar_off=True,
                      multiples=2)
    files = sorted(os.listdir(out))
    assert "a_q0.png" in files and "a_q1.png" in files
    assert "degradation_metadata.csv" in files
    assert "degradation_hyperparameters.csv" in files
    meta = pd.read_csv(out / "degradation_metadata.csv", index_col="image")
    assert len(meta) == 4
    assert "0-realesrganblur-sigma_x" in meta.columns
    assert "1-downsample-scale" in meta.columns
    assert "2-realesrgannoise-gaussian_noise_scale" in meta.columns
    assert "3-jpegcompress-quality" in meta.columns
    # LR output size = 32/2
    im = Image.open(out / "a_q0.png")
    assert im.size == (16, 16)
    hp = pd.read_csv(out / "degradation_hyperparameters.csv")
    assert set(hp["degradation"]) == {"realesrganblur", "downsample",
                                      "realesrgannoise", "jpegcompress"}


def test_fused_device_pipeline(jkey, rng):
    pipe = ImagePipeline(PIPE, deg_configs=CFGS)
    assert pipe.supports_fused()
    fn = fused_degrade(pipe)
    hr = jnp.asarray(rng.random((4, 32, 32, 3)).astype(np.float32))
    lr, meta_mat = fn(jkey, hr)
    assert lr.shape == (4, 16, 16, 3)
    keys = fn.metadata_keys(sample_shape=(4, 32, 32, 3))
    assert meta_mat.shape == (4, len(keys))
    assert "1-downsample-scale" in keys
    # jit twice -> no retrace errors, deterministic under same key
    lr2, meta2 = fn(jkey, hr)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr2))


def test_pca_kernel_metadata(jkey, rng):
    pipe = ImagePipeline(
        [["realesrganblur", "b"], ["downsample", "d"]],
        deg_configs={"b": {"kernel_range": ["iso"], "kernel_size": 9,
                           "request_pca_kernels": True, "pca_batch_len": 200,
                           "pca_length": 4},
                     "d": {"scale": 2}})
    fn = fused_degrade(pipe)
    hr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    lr, mat = fn(jkey, hr)
    keys = fn.metadata_keys((2, 16, 16, 3))
    assert keys.count("0-realesrganblur-blur_kernel") == 4
    assert mat.shape == (2, len(keys))


def test_packaged_pca_matrices(rng):
    """The two reference-shipped PCA matrices are packaged (converted to
    npz, transposed to (k, D)); encoding matches the reference's
    flat @ (D, k) matmul semantics (srmd_gaussian_blur.py:297-313)."""
    import os
    from rumpy_tpu.degradations.pca import read_pca_matrix
    enc = read_pca_matrix("standard")
    assert enc.components == 10 and enc.matrix.shape == (10, 441)
    flat = rng.random((3, 441)).astype(np.float32)
    out = np.asarray(enc(jnp.asarray(flat)))
    assert out.shape == (3, 10)
    ext = read_pca_matrix("extended")
    assert ext.components == 100

    ref = ("/root/reference/rumpy/shared_framework/configuration/"
           "standard_blur_10_component_pca_matrix.pth")
    if os.path.isfile(ref):
        import torch
        m = torch.load(ref, map_location="cpu",
                       weights_only=False).float().numpy()  # (441, 10)
        np.testing.assert_allclose(out, flat @ m, rtol=1e-5, atol=1e-5)
        # the .pth loader applies the same transpose
        enc2 = read_pca_matrix(ref)
        np.testing.assert_allclose(np.asarray(enc2(jnp.asarray(flat))),
                                   out, rtol=1e-6)


def test_jm_fallback_monotonic(rng):
    from rumpy_tpu.degradations.compression import JMCompress
    img = Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    errs = []
    for qpi in (20, 45):
        op = JMCompress(qpi=qpi, normalize_metadata=False)
        out, meta = op(img)
        assert meta["qpi"] == qpi
        errs.append(np.mean((np.asarray(out).astype(float)
                             - np.asarray(img).astype(float)) ** 2))
    assert errs[1] > errs[0]


def test_srmd_blur_host(rng):
    from rumpy_tpu.degradations.blur import SRMDGaussianBlur
    op = SRMDGaussianBlur(random=True, rate_iso=1.0,
                          request_kernel_metadata=True)
    img = Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8))
    out, meta = op(img)
    assert out.size == img.size
    assert "isotropic_sigma" in meta and 0.2 <= meta["isotropic_sigma"] <= 4.0


def test_random_compress_dual_columns(rng):
    from rumpy_tpu.degradations.compression import RandomCompress
    op = RandomCompress(jm_params={"qpi": 30}, jpeg_params={"quality": 60})
    img = Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8))
    np.random.seed(0)
    _, meta = op(img)
    assert set(meta) == {"jm_qpi", "jpeg_quality"}
    assert (meta["jm_qpi"] == 0) != (meta["jpeg_quality"] == 0)


def test_run_pipeline_multi_image_metadata(tmp_path, rng):
    """meta_vals must contain one row per image, not just the last one."""
    import numpy as np
    from PIL import Image
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    src = tmp_path / "src"
    src.mkdir()
    for n in ("a", "b", "c"):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(
            np.uint8)).save(src / f"{n}.png")
    pipe = ImagePipeline([["jpegcompress", "j"]],
                         deg_configs={"j": {"quality": 60,
                                            "random_compression": True,
                                            "compression_range": [20, 80]}})
    files = sorted(str(p) for p in src.iterdir())
    _, vals, keys = pipe.run_pipeline(image_files=files)
    assert vals.shape == (3, len(keys))
    # random qualities: rows must not all be identical
    assert len({tuple(r) for r in np.asarray(vals)}) > 1


def test_run_pipeline_ndarray_input_saves(tmp_path, rng):
    import numpy as np
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    pipe = ImagePipeline([["jpegcompress", "j"]],
                         deg_configs={"j": {"quality": 60}})
    out = tmp_path / "out"
    out.mkdir()
    arr = (rng.random((16, 16, 3))).astype(np.float32)
    pipe.run_pipeline(images=[arr], save_to_dir=str(out))
    assert (out / "temp_name_0.png").is_file()


def test_even_blur_kernel_size_rejected():
    import pytest
    from rumpy_tpu.ops.blur_kernels import BlurKernelConfig
    with pytest.raises(ValueError, match="odd"):
        BlurKernelConfig(kernel_size=20)


def test_sinc_rows_keep_zero_sigma_under_normalization(rng):
    """Masked-zero sigma placeholders on sinc rows stay 0 after
    normalization (reference 'unset fields read 0' contract)."""
    import jax
    import numpy as np
    from rumpy_tpu.config.constants import blur_kernel_codes
    from rumpy_tpu.registry import get_tool
    op = get_tool("realesrganblur")(
        kernel_range=["iso", "sinc"], kernel_size=9,
        request_kernel_metadata=True, normalize_metadata=True)
    _, meta = op.batch_apply(jax.random.PRNGKey(0),
                             np.zeros((64, 16, 16, 3), np.float32))
    kt = np.asarray(meta["kernel_type"])
    sx = np.asarray(meta["sigma_x"])
    sinc = kt == float(blur_kernel_codes["sinc"])
    assert sinc.any() and (~sinc).any()
    assert np.all(sx[sinc] == 0.0)
    assert np.all(sx[~sinc] >= 0.0)


def test_dataset_uvtex_masks(tmp_path, rng):
    """HR loss masks (reference data_handler.py:228-229, :545-556,
    :698-714): mask_data dir of per-image masks, center-cropped to the
    aligned HR size, crop-synchronized with the HR patch, carried by
    both SuperResImages and the VSR frame bundles."""
    import numpy as np
    from PIL import Image

    from rumpy_tpu.data.datasets import SuperResImages, VideoSequenceImages
    hr_dir, lr_dir, mask_dir = (tmp_path / "hr", tmp_path / "lr",
                                tmp_path / "masks")
    for d in (hr_dir, lr_dir, mask_dir):
        d.mkdir()
    for i in range(3):
        hr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"f{i}.png")
        Image.fromarray(hr[::2, ::2]).save(lr_dir / f"f{i}.png")
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[:16] = 255
        Image.fromarray(mask).save(mask_dir / f"f{i}.png")

    ds = SuperResImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir), scale=2,
                        mask_data=str(mask_dir))
    item = ds[0]
    assert item["mask"].shape == item["hr"].shape
    assert item["mask"].max() == 1.0 and item["mask"].min() == 0.0

    ds_crop = SuperResImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir),
                             scale=2, crop=8, mask_data=str(mask_dir),
                             seed=5)
    item = ds_crop[1]
    assert item["mask"].shape == (16, 16, 3)

    vsr = VideoSequenceImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir),
                              scale=2, num_frames=3,
                              mask_data=str(mask_dir))
    item = vsr[0]
    assert item["lr"].shape[-1] == 9
    assert item["mask"].shape == item["hr"].shape

    # use_masks=True shorthand (data_handler.py:676-680): reads the
    # fixed-name 'uvtex_mask.png' from the HR directory
    uv = np.zeros((32, 32, 3), np.uint8)
    uv[:, :16] = 255
    Image.fromarray(uv).save(hr_dir / "uvtex_mask.png")
    # the mask file itself must not be picked up as an HR frame
    vsr_uv = VideoSequenceImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir),
                                 scale=2, num_frames=3, use_masks=True)
    item = vsr_uv[0]
    assert item["mask"].shape == item["hr"].shape
    np.testing.assert_array_equal(np.unique(item["mask"]), [0.0, 1.0])

    # masks SMALLER than the HR frame come back zero-padded and centered
    # (PIL .crop out-of-bounds semantics, the reference's center_crop)
    small_dir = tmp_path / "small_masks"
    small_dir.mkdir()
    for i in range(3):
        Image.fromarray(np.full((16, 16, 3), 255, np.uint8)).save(
            small_dir / f"f{i}.png")
    ds_small = SuperResImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir),
                              scale=2, mask_data=str(small_dir))
    m = ds_small[0]["mask"]
    assert m.shape == ds_small[0]["hr"].shape == (32, 32, 3)
    assert m[8:24, 8:24].min() == 1.0  # centered payload
    assert m[:8].max() == 0.0 and m[24:].max() == 0.0  # zero pad


def test_online_degradation_pads_undersized_images(tmp_path, rng):
    """Images smaller than crop*scale reflect-pad up to the patch size in
    online-degradation mode so batch shapes stay static."""
    import numpy as np
    from PIL import Image

    from rumpy_tpu.data.datasets import SuperResImages
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    Image.fromarray((rng.random((20, 14, 3)) * 255).astype(np.uint8)).save(
        hr_dir / "small.png")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        hr_dir / "big.png")
    ds = SuperResImages(hr_dir=str(hr_dir), scale=2, crop=16,
                        online_degradations=True)
    shapes = {ds[i]["hr"].shape for i in range(len(ds))}
    assert shapes == {(32, 32, 3)}
