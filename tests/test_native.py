"""Native C++ library tests (compiled on demand via g++)."""

import numpy as np
import pytest
from PIL import Image

from rumpy_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


@pytest.mark.parametrize("filter,pf", [("bicubic", Image.BICUBIC),
                                       ("bilinear", Image.BILINEAR)])
@pytest.mark.parametrize("size", [(24, 30), (192, 240), (37, 53)])
def test_native_resize_bit_exact_vs_pillow(rng, filter, pf, size):
    img = (rng.random((96, 120, 3)) * 255).astype(np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((size[1], size[0]), pf))
    got = native.pil_resize(img, size, filter)
    np.testing.assert_array_equal(ref, got)


def test_native_h264_monotonic(rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    errs = [np.mean((native.h264_intra(img, qp).astype(float)
                     - img.astype(float)) ** 2) for qp in (20, 35, 50)]
    assert errs[0] < errs[1] < errs[2]


def test_native_h264_low_qp_near_lossless():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([(yy * 8) % 256, (xx * 8) % 256,
                    ((xx + yy) * 4) % 256], -1).astype(np.uint8)
    out = native.h264_intra(img, 0)
    # chroma subsampling bounds exactness; luma should be near-perfect
    assert np.mean(np.abs(out.astype(float) - img.astype(float))) < 12


def test_native_entropy_patch(rng):
    flat = np.zeros((64, 64), np.uint8)
    flat[8:40, 30:62] = (rng.random((32, 32)) * 255).astype(np.uint8)
    y, x = native.entropy_patch(flat, region=5, crop_size=16)
    assert 0 <= y <= 40 and 20 <= x <= 48


def test_jmcompress_uses_native(rng):
    from rumpy_tpu.degradations.compression import JMCompress
    img = Image.fromarray((rng.random((33, 47, 3)) * 255
                           ).astype(np.uint8))
    op = JMCompress(qpi=30, normalize_metadata=False)
    out, meta = op(img)
    assert out.size == img.size
    assert meta["qpi"] == 30
