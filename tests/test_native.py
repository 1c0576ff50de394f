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


def test_native_h264_rate_distortion_curve():
    """The codec is the real H.264 intra toolchain (4x4 intra prediction,
    integer transform, spec quant tables, deblocking): its QP->PSNR curve
    on a natural image must show the characteristic ~0.5 dB/QP slope from
    the 6-QP-per-qstep-doubling design, inside all-intra H.264 ranges."""
    import glob
    from PIL import Image
    from rumpy_tpu import native
    p = sorted(glob.glob(
        "/root/reference/Data/example_data/Set5/hr/baby*"))[0]
    img = np.asarray(Image.open(p).convert("RGB"))[:128, :128]

    def psnr(qp):
        out = native.h264_intra(img, qp)
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse)

    p20, p32, p44 = psnr(20), psnr(32), psnr(44)
    assert p20 > p32 > p44
    assert 35 < p20 < 50, p20
    assert 28 < p32 < 40, p32
    assert 22 < p44 < 33, p44
    # qstep doubles every 6 QP -> roughly 6 dB per 12 QP in the linear
    # region (generous band)
    assert 3.0 < p20 - p32 < 10.0, (p20, p32)
    assert 3.0 < p32 - p44 < 10.0, (p32, p44)


def test_native_h264_flat_regions_stay_uniform():
    """Intra prediction reconstructs a flat frame as a flat frame: the
    first block's DC lands on the quantizer grid (bounded by half the
    effective DC step, 32 pixel units at QP40 -> error <= 16) and every
    later block predicts it exactly, so there is no block-to-block
    variation — the signature distinguishing real intra prediction from
    a blockwise-JPEG approximation."""
    from rumpy_tpu import native
    img = np.full((64, 64, 3), 90, np.uint8)
    out = native.h264_intra(img, 40)
    assert np.abs(out.astype(int) - 90).max() <= 16
    for c in range(3):
        assert np.unique(out[..., c]).size == 1  # perfectly uniform
    # at QP0 the grid is fine enough to be lossless on flat content
    assert np.array_equal(native.h264_intra(img, 0), img)


def test_native_h264_i16_mode_selection_tracks_content_and_qp():
    """RD macroblock-mode decision (JM encoder_baseline.cfg semantics,
    RDOptimization=1): smooth gradients code as Intra_16x16, dense
    texture at low QP as Intra_4x4, and the I16 share rises with QP —
    the characteristic behavior of a real H.264 intra encoder that a
    min-SAD 4x4-only coder cannot reproduce."""
    from rumpy_tpu import native
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack([np.clip(60 + yy, 0, 255), np.clip(80 + xx // 2, 0, 255),
                       np.full_like(yy, 100)], -1).astype(np.uint8)
    rng_ = np.random.default_rng(0)
    tex = (rng_.random((64, 64, 3)) * 255).astype(np.uint8)

    _, st = native.h264_intra_stats(smooth, 40)
    assert st["n_mb"] == 16 and st["n_i16"] == 16  # all-I16 on smooth
    _, st = native.h264_intra_stats(tex, 10)
    assert st["n_i16"] == 0  # all-I4 on texture at fine quant
    _, lo = native.h264_intra_stats(tex, 20)
    _, hi = native.h264_intra_stats(tex, 45)
    assert hi["n_i16"] > lo["n_i16"]  # coarser quant -> more I16
    assert hi["nnz"] < lo["nnz"]  # and fewer coded coefficients


def test_native_h264_plane_mode_gradient_fidelity():
    """Intra_16x16 plane prediction (spec 8.3.3.4) models linear ramps:
    a gradient frame at QP40 must reconstruct with far less error than
    the quantizer step alone would allow for DC-only prediction."""
    from rumpy_tpu import native
    yy, xx = np.mgrid[0:64, 0:64]
    grad = np.stack([np.clip(60 + yy, 0, 255), np.clip(80 + xx // 2, 0, 255),
                     np.full_like(yy, 100)], -1).astype(np.uint8)
    out = native.h264_intra(grad, 40)
    mse = np.mean((out.astype(float) - grad.astype(float)) ** 2)
    assert mse < 25.0, mse


# ---------------------------------------------------------------------------
# Bitstream bit-exactness vs an independent third-party decoder
# ---------------------------------------------------------------------------

def _avdec_available():
    try:
        from avcodec_oracle import available
        return available()
    except Exception:
        return False


needs_avcodec = pytest.mark.skipif(
    not _avdec_available(),
    reason="system libavcodec (third-party H.264 decode oracle) unavailable")


def _roundtrip_bit_exact(img, qp):
    from avcodec_oracle import decode_h264
    from rumpy_tpu import native
    h, w, _ = img.shape
    rgb, bs, (y, cb, cr) = native.h264_intra_encode(img, qp)
    assert bs[:5] == b"\x00\x00\x00\x01\x67"  # Annex-B SPS first
    dy, dcb, dcr = decode_h264(bs, w, h)
    np.testing.assert_array_equal(y, dy)
    np.testing.assert_array_equal(cb, dcb)
    np.testing.assert_array_equal(cr, dcr)
    # the (recon_rgb, stats-path) output corresponds to the same recon
    np.testing.assert_array_equal(rgb, native.h264_intra(img, qp))
    return len(bs)


@needs_avcodec
@pytest.mark.parametrize("qp", [0, 8, 20, 32, 44, 51])
def test_native_h264_bitstream_bit_exact_natural(qp):
    """The emitted Annex-B stream (SPS+PPS+IDR, constrained baseline,
    CAVLC) decodes in libavcodec — an independent, conformance-tested
    H.264 implementation — to EXACTLY the encoder's own reconstruction,
    at every QP: entropy coding, macroblock syntax, intra prediction,
    transform/quant and the in-loop deblocking filter all match the
    spec bit-for-bit (the JM toolchain contract, reference
    jm_compress.py; SURVEY.md §2.4)."""
    import glob
    from PIL import Image
    p = sorted(glob.glob(
        "/root/reference/Data/example_data/Set5/hr/butterfly*"))[0]
    img = np.asarray(Image.open(p).convert("RGB"))[:96, :96]
    _roundtrip_bit_exact(img, qp)


@needs_avcodec
def test_native_h264_bitstream_bit_exact_stress(rng):
    """CAVLC corner-case stress: dense noise (suffix-length escalation,
    run_before zerosLeft>6, nC>=8 FLC coeff_token), extreme checkerboard
    at QP0 (level escape codes + clamp), and non-MB-multiple frames
    (SPS cropping + padded-edge prediction)."""
    tex = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    _roundtrip_bit_exact(tex, 10)
    ch = np.indices((48, 48)).sum(0) % 2
    extreme = np.stack([ch * 255, (1 - ch) * 255, ch * 255],
                       -1).astype(np.uint8)
    _roundtrip_bit_exact(extreme, 0)
    _roundtrip_bit_exact(tex[:34, :42], 28)
    _roundtrip_bit_exact(tex[:16, :16], 26)  # single macroblock


@needs_avcodec
def test_native_h264_bitstream_rate_tracks_qp():
    """Stream size falls monotonically with QP — the rate side of the
    RD trade-off the JM analog is meant to reproduce."""
    import glob
    from PIL import Image
    p = sorted(glob.glob(
        "/root/reference/Data/example_data/Set5/hr/bird*"))[0]
    img = np.asarray(Image.open(p).convert("RGB"))[:128, :128]
    sizes = [_roundtrip_bit_exact(img, qp) for qp in (10, 22, 34, 46)]
    assert sizes == sorted(sizes, reverse=True), sizes
