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
