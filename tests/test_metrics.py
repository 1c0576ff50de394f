"""Golden tests for PSNR/SSIM.

SSIM is checked against an independent reference implementation built on
scipy.ndimage.gaussian_filter with the exact skimage.structural_similarity
parameterization the reference uses (gaussian_weights=True, sigma=1.5,
use_sample_covariance=False — rumpy/sr_tools/metrics.py:123-149)."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from rumpy_tpu.utils import metrics


def ref_ssim(x, y, data_range=1.0, sigma=1.5, truncate=3.5, K1=0.01, K2=0.03):
    filt = lambda a: gaussian_filter(a, sigma=sigma, truncate=truncate,
                                     mode="reflect")
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    r = int(truncate * sigma + 0.5)
    return S[r:-r, r:-r].mean()


def test_psnr_formula(rng):
    a = rng.random((16, 16)).astype(np.float32)
    b = rng.random((16, 16)).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    expected = 20 * np.log10(1.0 / np.sqrt(mse))
    assert abs(float(metrics.psnr(a, b, 1.0)) - expected) < 1e-4


def test_psnr_identical_returns_100():
    a = np.ones((8, 8), np.float32) * 0.5
    assert float(metrics.psnr(a, a, 1.0)) == 100.0


@pytest.mark.parametrize("shape", [(48, 48), (33, 57)])
def test_ssim_matches_scipy_reference(rng, shape):
    x = rng.random(shape).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, shape), 0, 1).astype(np.float32)
    got = float(metrics.ssim_single(x, y, 1.0))
    want = ref_ssim(x, y, 1.0)
    assert abs(got - want) < 1e-4, (got, want)


def test_ssim_multichannel_is_channel_mean(rng):
    x = rng.random((32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    got = float(metrics.ssim(x, y))
    want = np.mean([ref_ssim(x[..., c], y[..., c]) for c in range(3)])
    assert abs(got - want) < 1e-4


def test_ssim_255_range(rng):
    x = (rng.random((40, 40)) * 255).astype(np.float32)
    y = np.clip(x + rng.normal(0, 10, x.shape), 0, 255).astype(np.float32)
    got = float(metrics.ssim_single(x, y, 255.0))
    want = ref_ssim(x, y, 255.0)
    assert abs(got - want) < 1e-4


def test_metrics_hub_batch(rng):
    a = rng.random((2, 24, 24, 1)).astype(np.float32)
    b = rng.random((2, 24, 24, 1)).astype(np.float32)
    hub = metrics.Metrics(["PSNR", "SSIM"])
    out = hub.run_metrics(a, b, max_value=1.0, key_prefix="rcan")
    assert len(out["rcan-PSNR"]) == 2
    assert len(out["rcan-SSIM"]) == 2


def test_lpips_gated():
    with pytest.raises(NotImplementedError):
        metrics.Metrics(["LPIPS"])


# ---------------------------------------------------------------------------
# Face-boundary PSNR (reference metrics.py:78-88, :151-203)
# ---------------------------------------------------------------------------

def _boundary_fixture(tmp_path, rng):
    import pandas as pd
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    pd.DataFrame(
        {"top": [4, 2, -1], "left": [6, 3, 2], "height": [10, 8, 4],
         "width": [12, 6, 4]},
        index=["face_a.png", "face_b.png", "face_bad.png"],
    ).to_csv(hr_dir / "face_boundaries_0.csv")
    a = rng.random((2, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    return str(hr_dir), a, b


def test_boundary_csv_load_drops_negatives(tmp_path, rng):
    hr_dir, _, _ = _boundary_fixture(tmp_path, rng)
    data = metrics.load_boundary_data(hr_dir)
    assert set(data) == {"face_a.png", "face_b.png"}
    assert data["face_a.png"]["top"] == 4


def test_true_face_psnr_equals_crop_psnr(tmp_path, rng):
    hr_dir, a, b = _boundary_fixture(tmp_path, rng)
    data = metrics.load_boundary_data(hr_dir)
    vals = metrics.true_face_psnr(a, b, ["face_a", "unknown"], data, 1.0)
    want0 = float(metrics.psnr(a[0, 4:14, 6:18, 0], b[0, 4:14, 6:18, 0], 1.0))
    want1 = float(metrics.psnr(a[1, :, :, 0], b[1, :, :, 0], 1.0))
    assert abs(vals[0] - want0) < 1e-5
    assert abs(vals[1] - want1) < 1e-5


def test_face_psnr_masks_outside_box(tmp_path, rng):
    hr_dir, a, b = _boundary_fixture(tmp_path, rng)
    data = metrics.load_boundary_data(hr_dir)
    vals = metrics.face_psnr(a, b, ["face_a"], data, 1.0)
    mask = np.zeros((32, 32), np.float32)
    mask[4:14, 6:18] = 1.0
    want = float(metrics.psnr(a[0, :, :, 0] * mask, b[0, :, :, 0] * mask, 1.0))
    assert abs(vals[0] - want) < 1e-5
    # the masked variant scores HIGHER than the crop: zeros agree exactly
    crop = metrics.true_face_psnr(a, b, ["face_a"], data, 1.0)
    assert vals[0] > crop[0]


def test_boundary_lookup_non_png_extensions(tmp_path, rng):
    """The reference hardcodes `name + '.png'` in the boundary lookup
    (metrics.py:161); datasets whose CSV is indexed by .jpg names must
    still hit the box instead of silently scoring whole images."""
    import pandas as pd
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    pd.DataFrame(
        {"top": [4], "left": [6], "height": [10], "width": [12]},
        index=["face_a.jpg"],
    ).to_csv(hr_dir / "face_boundaries_0.csv")
    a = rng.random((1, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    data = metrics.load_boundary_data(str(hr_dir))
    vals = metrics.true_face_psnr(a, b, ["face_a"], data, 1.0)
    want = float(metrics.psnr(a[0, 4:14, 6:18, 0], b[0, 4:14, 6:18, 0], 1.0))
    assert abs(vals[0] - want) < 1e-5


def test_metrics_hub_face_psnr(tmp_path, rng):
    hr_dir, a, b = _boundary_fixture(tmp_path, rng)
    hub = metrics.Metrics(["PSNR", "face_PSNR", "true_face_PSNR"],
                          hr_data_loc=hr_dir)
    out = hub.run_metrics(a, b, max_value=1.0, key_prefix="m",
                          probe_names=["face_a", "face_b"])
    assert len(out["m-face_PSNR"]) == 2
    assert len(out["m-true_face_PSNR"]) == 2
    with pytest.raises(ValueError):
        hub.run_metrics(a, b, max_value=1.0)


def test_metrics_hub_face_psnr_requires_hr_loc():
    with pytest.raises(KeyError):
        metrics.Metrics(["face_PSNR"])
