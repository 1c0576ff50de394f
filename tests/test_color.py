"""Golden tests for BT.601 color conversion against the reference formulas
(rumpy/image_tools/image_manipulation/image_functions.py:72-132),
re-derived independently here in numpy."""

import numpy as np
import pytest

from rumpy_tpu.utils import color


def ref_rgb_to_ycbcr(img_chw, y_only, max_val, im_type):
    r, g, b = img_chw[0], img_chw[1], img_chw[2]
    if im_type == "jpg":
        bias_c = 128.0 * (max_val / 255)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = bias_c + (-0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = bias_c + (0.5 * r - 0.418688 * g - 0.081312 * b)
    else:
        bias_y = 16.0 * (max_val / 255)
        bias_c = 128.0 * (max_val / 255)
        y = bias_y + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
        cb = bias_c + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
        cr = bias_c + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    if y_only:
        return y[None]
    return np.stack([y, cb, cr])


def ref_ycbcr_to_rgb(img_chw, max_val, im_type):
    y, cb, cr = img_chw[0], img_chw[1], img_chw[2]
    if im_type == "jpg":
        bias = 128.0 * (max_val / 255)
        r = y + 1.402 * cr - 1.402 * bias
        g = y - 0.344136 * cb - 0.714136 * cr + (0.714136 + 0.344136) * bias
        b = y + 1.772 * cb - 1.772 * bias
    else:
        r = 298.082 * y / 256. + 408.583 * cr / 256. - 222.921 * (max_val / 255)
        g = (298.082 * y / 256. - 100.291 * cb / 256. - 208.120 * cr / 256.
             + 135.576 * (max_val / 255))
        b = 298.082 * y / 256. + 516.412 * cb / 256. - 276.836 * (max_val / 255)
    return np.stack([r, g, b])


@pytest.mark.parametrize("im_type", ["jpg", "png"])
@pytest.mark.parametrize("max_val", [1.0, 255.0])
def test_rgb_to_ycbcr_matches_reference(rng, im_type, max_val):
    img = rng.random((3, 8, 9)).astype(np.float32) * max_val
    ref = ref_rgb_to_ycbcr(img, False, max_val, im_type)
    got = np.asarray(color.ycbcr_convert(img, y_only=False, max_val=max_val,
                                         im_type=im_type, input="rgb"))
    np.testing.assert_allclose(got, ref, atol=2e-4 * max_val)


@pytest.mark.parametrize("im_type", ["jpg", "png"])
def test_y_only(rng, im_type):
    img = rng.random((3, 8, 9)).astype(np.float32)
    ref = ref_rgb_to_ycbcr(img, True, 1.0, im_type)
    got = np.asarray(color.ycbcr_convert(img, y_only=True, im_type=im_type))
    assert got.shape == (1, 8, 9)
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("im_type", ["jpg", "png"])
def test_roundtrip(rng, im_type):
    img = rng.random((3, 8, 9)).astype(np.float32)
    ycc = color.ycbcr_convert(img, y_only=False, im_type=im_type, input="rgb")
    back = np.asarray(color.ycbcr_convert(np.asarray(ycc), im_type=im_type,
                                          input="ycbcr"))
    tol = 2e-3 if im_type == "png" else 2e-4  # png studio-swing constants are rounded
    np.testing.assert_allclose(back, img, atol=tol)


@pytest.mark.parametrize("im_type", ["jpg", "png"])
def test_inverse_matches_reference(rng, im_type):
    ycc = rng.random((3, 8, 9)).astype(np.float32)
    ref = ref_ycbcr_to_rgb(ycc, 1.0, im_type)
    got = np.asarray(color.ycbcr_convert(ycc, im_type=im_type, input="ycbcr"))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_channel_last_api(rng):
    img = rng.random((2, 8, 9, 3)).astype(np.float32)
    out = np.asarray(color.rgb_to_ycbcr(img, im_type="jpg"))
    assert out.shape == (2, 8, 9, 3)
    ref = ref_rgb_to_ycbcr(img[0].transpose(2, 0, 1), False, 1.0, "jpg")
    np.testing.assert_allclose(out[0].transpose(2, 0, 1), ref, atol=2e-4)
