"""Golden tests for the on-device degradation ops against independent
numpy/scipy implementations of the reference formulas
(rumpy/image_tools/blur/real_esrgan_blur.py, noise/real_esrgan_noise.py,
compression_utils.py)."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special
from PIL import Image

from rumpy_tpu.ops import blur, blur_kernels, jpeg, noise
from rumpy_tpu.ops.special import j1


def ref_gaussian_kernel(ksize, sx, sy, theta):
    ax = np.arange(-ksize // 2 + 1.0, ksize // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    grid = np.stack([xx, yy], -1)
    d = np.array([[sx ** 2, 0], [0, sy ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    sigma = u @ d @ u.T
    inv = np.linalg.inv(sigma)
    k = np.exp(-0.5 * np.sum((grid @ inv) * grid, 2))
    return k / k.sum()


def ref_sinc_kernel(ksize, cutoff):
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.fromfunction(
            lambda x, y: cutoff * scipy.special.j1(cutoff * np.sqrt(
                (x - (ksize - 1) / 2) ** 2 + (y - (ksize - 1) / 2) ** 2)) / (
                2 * np.pi * np.sqrt((x - (ksize - 1) / 2) ** 2
                                    + (y - (ksize - 1) / 2) ** 2)),
            [ksize, ksize])
    k[(ksize - 1) // 2, (ksize - 1) // 2] = cutoff ** 2 / (4 * np.pi)
    return k / k.sum()


def test_bessel_j1_matches_scipy():
    x = np.linspace(-30, 30, 1001)
    got = np.asarray(j1(x))
    want = scipy.special.j1(x)
    np.testing.assert_allclose(got, want, atol=5e-6)  # float32 eval


@pytest.mark.parametrize("sx,sy,theta", [(2.0, 2.0, 0.0), (1.0, 4.0, 0.7),
                                         (0.6, 5.0, -1.2)])
def test_gaussian_kernels_match_reference(sx, sy, theta):
    got = np.asarray(blur_kernels.gaussian_kernels(
        21, jnp.array([sx]), jnp.array([sy]), jnp.array([theta])))[0]
    want = ref_gaussian_kernel(21, sx, sy, theta)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("beta", [0.6, 1.0, 3.5])
def test_generalized_gaussian_beta1_is_gaussian(beta):
    g = np.asarray(blur_kernels.generalized_gaussian_kernels(
        13, jnp.array([2.0]), jnp.array([3.0]), jnp.array([0.3]),
        jnp.array([beta])))[0]
    assert abs(g.sum() - 1.0) < 1e-5
    if beta == 1.0:
        want = ref_gaussian_kernel(13, 2.0, 3.0, 0.3)
        np.testing.assert_allclose(g, want, atol=1e-5)


@pytest.mark.parametrize("cutoff", [np.pi / 3, 2.0, np.pi])
def test_sinc_kernels_match_reference(cutoff):
    got = np.asarray(blur_kernels.sinc_kernels(21, jnp.array([cutoff])))[0]
    want = ref_sinc_kernel(21, cutoff)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_kernels_batch(jkey):
    cfg = blur_kernels.BlurKernelConfig(
        kernel_size=21, kernel_range="all",
        kernel_probabilities=None, noise_range=None)
    kernels, meta = blur_kernels.sample_kernels(jkey, 16, cfg)
    kernels = np.asarray(kernels)
    assert kernels.shape == (16, 21, 21)
    np.testing.assert_allclose(kernels.sum((1, 2)), 1.0, atol=1e-4)
    assert set(meta) >= {"sigma_x", "sigma_y", "rotation", "beta_g",
                         "beta_p", "omega_c", "kernel_type", "kernel_size"}
    codes = np.asarray(meta["kernel_type"])
    assert codes.min() >= 0 and codes.max() <= 6
    # iso draws must have sigma_y == sigma_x, sinc draws sigma_x == 0.
    sx, sy = np.asarray(meta["sigma_x"]), np.asarray(meta["sigma_y"])
    iso = codes == 0
    np.testing.assert_allclose(sx[iso], sy[iso])
    assert (sx[codes == 6] == 0).all()


def test_blur_matches_scipy(rng):
    from scipy.ndimage import correlate
    img = rng.random((2, 24, 24, 3)).astype(np.float32)
    k1 = ref_gaussian_kernel(9, 2.0, 2.0, 0.0).astype(np.float32)
    k2 = ref_gaussian_kernel(9, 1.0, 3.0, 0.5).astype(np.float32)
    out = np.asarray(blur.apply_kernels(img, jnp.stack([jnp.asarray(k1),
                                                        jnp.asarray(k2)])))
    for b, k in [(0, k1), (1, k2)]:
        for c in range(3):
            # scipy 'mirror' == torch/np 'reflect' (edge-excluding)
            want = correlate(img[b, :, :, c], k, mode="mirror")
            np.testing.assert_allclose(out[b, :, :, c], want, atol=1e-4)


def test_gaussian_noise_stats(jkey):
    img = jnp.full((4, 32, 32, 3), 0.5)
    out, meta = noise.add_gaussian_noise(jkey, img, sigma_range=(10.0, 10.0),
                                         gray_prob=0.0)
    resid = np.asarray(out - img)
    assert abs(resid.std() - 10 / 255) < 0.002
    assert np.asarray(meta["gaussian_noise_scale"]).shape == (4,)


def test_gray_noise_is_channel_correlated(jkey):
    img = jnp.full((2, 16, 16, 3), 0.5)
    out, _ = noise.add_gaussian_noise(jkey, img, sigma_range=(20.0, 20.0),
                                      gray_prob=1.0)
    resid = np.asarray(out - img)
    np.testing.assert_allclose(resid[..., 0], resid[..., 1], atol=1e-6)


def test_poisson_noise_runs(jkey, rng):
    img = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    out, meta = noise.add_poisson_noise(jkey, img, scale_range=(1.0, 1.0))
    assert out.shape == img.shape
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1
    assert not np.allclose(np.asarray(out), np.asarray(img))


def _pil_jpeg(img_u8, quality):
    buf = io.BytesIO()
    Image.fromarray(img_u8).save(buf, "JPEG", quality=int(quality),
                                 subsampling=0)
    buf.seek(0)
    return np.asarray(Image.open(buf))


def test_jpeg_close_to_libjpeg(rng):
    # Structured image; our float-DCT codec should land close to libjpeg.
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([(xx * 8) % 256, (yy * 8) % 256,
                    ((xx + yy) * 4) % 256], -1).astype(np.uint8)
    for q in (30, 80):
        ref = _pil_jpeg(img, q).astype(np.float32)
        got = np.asarray(jpeg.jpeg_compress(
            jnp.asarray(img[None], jnp.float32) / 255.0,
            jnp.array([float(q)])))[0] * 255.0
        err = np.abs(ref - got).mean()
        assert err < 6.0, f"q={q}: mean |diff| vs libjpeg = {err}"


def test_jpeg_quality_monotonic(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    errs = []
    for q in (10, 50, 90):
        out = jpeg.jpeg_compress(img, jnp.array([float(q)]))
        errs.append(float(jnp.mean((out - img) ** 2)))
    assert errs[0] > errs[1] > errs[2]


def test_h264_qpi_monotonic(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    errs = []
    for qp in (20, 35, 50):
        out = jpeg.h264_intra_compress(img, jnp.array([float(qp)]))
        errs.append(float(jnp.mean((out - img) ** 2)))
    assert errs[0] < errs[1] < errs[2]


def test_noise_image_pca_metadata(rng):
    """request_noise_image_pca (reference noise/__init__.py:23-28, :74-101,
    :191-195): the scaled pre-clip noise field is center-cropped and
    PCA-encoded into metadata['pca_noise']."""
    from PIL import Image

    from rumpy_tpu.degradations.noise import RealESRGANNoise
    op = RealESRGANNoise(request_noise_image_pca=True, pca_batch_len=40,
                         noise_image_pca_length=8, pca_patch_size=16, seed=3)
    im = Image.fromarray((rng.random((24, 20, 3)) * 255).astype(np.uint8))
    _, meta = op(im)
    assert len(meta["pca_noise"]) == 8
    assert np.all(np.isfinite(meta["pca_noise"]))
    # default path emits no pca column
    _, meta2 = RealESRGANNoise(seed=3)(im)
    assert "pca_noise" not in meta2
    # odd pca_batch_len must not break the basis fit (row count derives
    # from the generated samples, 2*(pca_batch_len//2))
    op_odd = RealESRGANNoise(request_noise_image_pca=True,
                             pca_batch_len=41, noise_image_pca_length=8,
                             pca_patch_size=16, seed=4)
    _, meta3 = op_odd(im)
    assert len(meta3["pca_noise"]) == 8


def _fake_jm_dir(tmp_path):
    """A mock JM install: lencod.exe copies the input YUV to ReconFile
    verbatim (identity codec), exercising the real drive path (YUV 4:2:0
    serialization, command assembly, recon parsing) hermetically."""
    import stat
    d = tmp_path / "jm"
    d.mkdir()
    (d / "encoder_baseline.cfg").write_text("# mock cfg\n")
    exe = d / "lencod.exe"
    exe.write_text(
        "#!/usr/bin/env python3\n"
        "import shutil, sys\n"
        "args = dict(a.split('=', 1) for a in sys.argv if '=' in a)\n"
        "shutil.copy(args['InputFile'], args['ReconFile'])\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return str(d)


def test_jm_binary_hook_drive_path(tmp_path, rng):
    """RUMPY_TPU_JM_BIN hook (compression.py:119-166): with a binary
    present JMCompress shells out instead of using the native codec; an
    identity mock proves the YUV round-trip is lossless up to 4:2:0
    chroma subsampling and the metadata contract is unchanged."""
    from PIL import Image

    from rumpy_tpu.degradations.compression import JMCompress
    src = "/root/reference/automated_testing/sisr_tests/eval_dataset/hr"
    name = sorted(os.listdir(src))[0]
    im = Image.open(os.path.join(src, name)).convert("RGB").crop(
        (0, 0, 26, 24))
    arr = np.asarray(im)
    op = JMCompress(qpi=28, jm_bin=_fake_jm_dir(tmp_path),
                    normalize_metadata=False)
    out, meta = op(im)
    assert meta == {"qpi": 28}
    got = np.asarray(out)
    # identity codec => Y plane survives the YCbCr round trip to ~1 LSB;
    # chroma is 2x2-subsampled so RGB only roughly matches
    y_in = np.asarray(im.convert("YCbCr"))[..., 0].astype(np.int16)
    y_out = np.asarray(out.convert("YCbCr"))[..., 0].astype(np.int16)
    assert np.abs(y_in - y_out).max() <= 2  # double YCbCr<->RGB rounding
    assert got.shape == arr.shape
    # metadata identical to the native path's contract
    _, native_meta = JMCompress(qpi=28, normalize_metadata=False)(im)
    assert sorted(native_meta) == sorted(meta)


@pytest.mark.skipif(
    not (os.environ.get("RUMPY_TPU_JM_BIN")
         and os.path.exists(os.path.join(
             os.environ.get("RUMPY_TPU_JM_BIN", ""), "lencod.exe"))),
    reason="real JM binary not installed (set RUMPY_TPU_JM_BIN)")
def test_jm_binary_hook_real_binary(rng):
    """Where a real JM lencod.exe exists, the bit-exact path is live:
    output must differ from input (actual compression) and metadata must
    carry the configured qpi."""
    from PIL import Image

    from rumpy_tpu.degradations.compression import JMCompress
    im = Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8))
    op = JMCompress(qpi=40, normalize_metadata=False)
    out, meta = op(im)
    assert meta == {"qpi": 40}
    assert np.asarray(out).shape == (32, 32, 3)
    assert not np.array_equal(np.asarray(out), np.asarray(im))
