"""Golden tests: rumpy_tpu.ops.resize vs Pillow itself.

PSNR parity with the reference (BASELINE.md) requires LR generation that is
bit-level-close to PIL.Image.resize; these tests enforce ≥99.9% exact pixel
matches and |diff| ≤ 1 on the rest, across filters and scale factors.
"""

import numpy as np
import pytest
from PIL import Image

from rumpy_tpu.ops import resize

PIL_FILTERS = {
    "bicubic": Image.BICUBIC,
    "bilinear": Image.BILINEAR,
    "lanczos": Image.LANCZOS,
    "box": Image.BOX,
    "hamming": Image.HAMMING,
}


def _compare(img_u8, out_size, filter):
    pil = Image.fromarray(img_u8)
    ref = np.asarray(pil.resize((out_size[1], out_size[0]),
                                resample=PIL_FILTERS[filter]))
    got = np.asarray(resize.pil_resize(img_u8, out_size, filter=filter))
    diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
    exact = np.mean(diff == 0)
    return exact, diff.max()


@pytest.mark.parametrize("filter", ["bicubic", "bilinear", "lanczos", "box"])
@pytest.mark.parametrize("scale", [2, 3, 4])
def test_downscale_matches_pil(rng, filter, scale):
    img = (rng.random((96, 120, 3)) * 255).astype(np.uint8)
    exact, maxdiff = _compare(img, (96 // scale, 120 // scale), filter)
    assert exact > 0.999, f"only {exact:.4%} exact"
    assert maxdiff <= 1


@pytest.mark.parametrize("filter", ["bicubic", "bilinear"])
@pytest.mark.parametrize("scale", [2, 4])
def test_upscale_matches_pil(rng, filter, scale):
    img = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
    exact, maxdiff = _compare(img, (24 * scale, 30 * scale), filter)
    assert exact > 0.999
    assert maxdiff <= 1


def test_natural_image_bicubic_psnr_parity():
    # Structured (non-noise) content: gradients + texture, the realistic case.
    yy, xx = np.mgrid[0:64, 0:80]
    img = np.stack([
        (128 + 100 * np.sin(xx / 5.0) * np.cos(yy / 7.0)),
        (xx * 255 / 80.0),
        ((xx + yy) % 256),
    ], axis=-1).astype(np.uint8)
    exact, maxdiff = _compare(img, (16, 20), "bicubic")
    assert exact > 0.999
    assert maxdiff <= 1


def test_batched_resize(rng):
    imgs = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    out = np.asarray(resize.pil_resize(imgs, (8, 8)))
    assert out.shape == (4, 8, 8, 3)
    single = np.asarray(resize.pil_resize(imgs[0], (8, 8)))
    np.testing.assert_array_equal(out[0], single)


def test_resize_float_close_to_pil(rng):
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((10, 10), Image.BICUBIC))
    got = np.asarray(resize.resize_float(img.astype(np.float32), (10, 10)))
    assert np.abs(ref - got).max() <= 1.0  # float path skips uint8 rounding
