"""ctypes bindings for the native host library (native/rumpy_native.cpp).

Builds the shared library on first use if g++ is available (the compiled
.so is cached next to the source); callers must handle
:class:`NativeUnavailable` and fall back to the Python/JAX paths.

Components (see the .cpp header for the design rationale):
  * pil_resize  — bit-exact Pillow bicubic/bilinear (integer fixed point);
  * h264_intra  — real H.264 intra toolchain on YUV 4:2:0 (macroblock
    coding order, Intra_4x4 with all 9 modes + Intra_16x16 with the luma
    DC Hadamard, RD mode decision with JM's lambda and table-exact CAVLC
    rate, shared per-MB chroma mode, spec transform/quant tables, CAVLC
    entropy coding, in-loop deblocking) — the JM encoder_baseline.cfg
    IntraPeriod=1 path. h264_intra_encode additionally emits the real
    Annex-B .264 stream, decoder-verified bit-exact vs libavcodec;
  * entropy_patch — host entropy patch selection for dataloader workers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "rumpy_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "librumpy_native.so")


class NativeUnavailable(RuntimeError):
    pass


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) or (os.path.isfile(_SRC) and
                                   os.path.getmtime(_SRC)
                                   > os.path.getmtime(_SO)):
        if not os.path.isfile(_SRC):
            raise NativeUnavailable(f"missing {_SRC}")
        try:
            # compile to a process-unique temp path and rename atomically:
            # concurrent first-use (DataLoader workers, parallel tests)
            # must never CDLL a half-written .so
            tmp = f"{_SO}.{os.getpid()}.tmp"
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", tmp,
                            _SRC], check=True, capture_output=True)
            os.replace(tmp, _SO)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(f"native build failed: {e}")
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pil_resize_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + [u8p] + \
        [ctypes.c_int] * 3
    lib.h264_intra_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, u8p]
    lib.h264_intra_stats_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, u8p,
                                        ctypes.POINTER(ctypes.c_int64)]
    lib.h264_intra_encode_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, u8p, u8p, u8p,
                                         ctypes.c_int64]
    lib.h264_intra_encode_u8.restype = ctypes.c_int64
    lib.entropy_patch_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def pil_resize(img: np.ndarray, size: Tuple[int, int],
               filter: str = "bicubic") -> np.ndarray:
    """Bit-exact Pillow resize on host. img (H, W, C) uint8."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    oh, ow = size
    out = np.empty((oh, ow, c), np.uint8)
    fid = {"bicubic": 0, "bilinear": 1}[filter]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pil_resize_u8(img.ctypes.data_as(u8p), h, w, c,
                      out.ctypes.data_as(u8p), oh, ow, fid)
    return out


def h264_intra(rgb: np.ndarray, qp: int) -> np.ndarray:
    """H.264 intra compression round-trip. rgb (H, W, 3) uint8 with
    even dimensions (the JM constraint)."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    out = np.empty_like(rgb)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.h264_intra_u8(rgb.ctypes.data_as(u8p), h, w, int(qp),
                      out.ctypes.data_as(u8p))
    return out


def h264_intra_stats(rgb: np.ndarray, qp: int):
    """h264_intra + encoder decision statistics: returns
    (out, {"n_mb", "n_i16", "nnz"}) — macroblock count, Intra_16x16
    macroblock count, and luma nonzero quantized-coefficient count."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    out = np.empty_like(rgb)
    stats = (ctypes.c_int64 * 3)()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.h264_intra_stats_u8(rgb.ctypes.data_as(u8p), h, w, int(qp),
                            out.ctypes.data_as(u8p), stats)
    return out, {"n_mb": stats[0], "n_i16": stats[1], "nnz": stats[2]}


def h264_intra_encode(rgb: np.ndarray, qp: int):
    """H.264 intra compression with real bitstream emission: returns
    (recon_rgb, annexb_bytes, (Y, Cb, Cr)) where annexb_bytes is a
    decodable constrained-baseline .264 stream (SPS+PPS+IDR, CAVLC) and
    the YUV planes are the cropped decoder output for the stream —
    verified bit-exact against libavcodec in tests/test_native.py."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    out = np.empty_like(rgb)
    yuv = np.empty(h * w + 2 * (h // 2) * (w // 2), np.uint8)
    cap = h * w * 8 + 65536
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for _ in range(2):
        bs = np.empty(cap, np.uint8)
        n = lib.h264_intra_encode_u8(
            rgb.ctypes.data_as(u8p), h, w, int(qp),
            out.ctypes.data_as(u8p), yuv.ctypes.data_as(u8p),
            bs.ctypes.data_as(u8p), cap)
        if n >= 0:
            break
        cap = -n
    y = yuv[:h * w].reshape(h, w)
    cb = yuv[h * w:h * w + (h // 2) * (w // 2)].reshape(h // 2, w // 2)
    cr = yuv[h * w + (h // 2) * (w // 2):].reshape(h // 2, w // 2)
    return out, bs[:n].tobytes(), (y.copy(), cb.copy(), cr.copy())


def entropy_patch(gray_u8: np.ndarray, region: int = 10,
                  crop_size: int = 32) -> Tuple[int, int]:
    lib = _load()
    gray_u8 = np.ascontiguousarray(gray_u8, dtype=np.uint8)
    h, w = gray_u8.shape
    by = ctypes.c_int()
    bx = ctypes.c_int()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.entropy_patch_u8(gray_u8.ctypes.data_as(u8p), h, w, region,
                         crop_size, ctypes.byref(by), ctypes.byref(bx))
    return by.value, bx.value
