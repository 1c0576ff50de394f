"""Compression degradation ops.

Reference: rumpy/image_tools/compression/__init__.py. Three systems:

  * JPEGCompress — host path is bit-exact PIL/libjpeg (subsampling=0,
    matching compression_utils.py:16-21); device path is the on-device DCT
    codec (ops/jpeg.py). Metadata: quality, normalized by range.
  * JMCompress — the reference shells out to the JM H.264 binary
    (compression_utils.py:24-65). If a JM binary is configured
    (RUMPY_TPU_JM_BIN or jm_bin arg) the host path drives it with the same
    pure-intra settings; otherwise both paths use the H.264-intra DCT
    approximation (documented distribution shift, SURVEY.md §7.3). The
    `qpi` metadata contract (range 20-51, normalized 20-40 by default) is
    preserved either way.
  * RandomCompress — 50/50 JM-vs-JPEG per image with dual zero-filled
    metadata columns jm_qpi / jpeg_quality (compression/__init__.py:263-289).
"""

from __future__ import annotations

import io
import os
import subprocess
import tempfile
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rumpy_tpu.degradations.base import (DegradationOp, from_float_array,
                                         normalize, to_float_array)
from rumpy_tpu.ops import jpeg as jpeg_ops
from rumpy_tpu.registry import register_tool


def pil_jpeg_roundtrip(image: Image.Image, quality: int) -> Image.Image:
    buffer = io.BytesIO()
    image.save(buffer, "JPEG", subsampling=0, quality=int(quality))
    buffer.seek(0)
    out = Image.open(buffer)
    out.load()
    return out


@register_tool("jpegcompress")
class JPEGCompress(DegradationOp):
    def __init__(self, quality=50, compression_range=(20, 80),
                 random_compression=False, normalize_metadata=True, seed=0):
        self.quality = quality
        self.compression_range = tuple(compression_range)
        self.random_compression = random_compression
        self.normalize_metadata = normalize_metadata
        self._key = jax.random.PRNGKey(seed)

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"min_quality": self.compression_range[0],
                "max_quality": self.compression_range[1]}

    def _norm(self, q):
        return (normalize(q, *self.compression_range)
                if self.normalize_metadata else q)

    def __call__(self, image):
        if self.random_compression:
            quality = int(np.random.randint(self.compression_range[0],
                                            self.compression_range[1] + 1))
        else:
            quality = self.quality
        arr, was_pil = to_float_array(image)
        pil = image if was_pil else Image.fromarray(
            (arr * 255).astype(np.uint8))
        out = pil_jpeg_roundtrip(pil, quality)
        out = out if was_pil else np.asarray(out)
        return out, {"quality": self._norm(quality)}

    def batch_apply(self, key, imgs):
        b = imgs.shape[0]
        if self.random_compression:
            lo, hi = self.compression_range
            quality = jax.random.randint(key, (b,), lo, hi + 1).astype(jnp.float32)
        else:
            quality = jnp.full((b,), float(self.quality))
        out = jpeg_ops.jpeg_compress(imgs, quality)
        return out, {"quality": self._norm(quality)}


@register_tool("jmcompress")
class JMCompress(DegradationOp):
    def __init__(self, qpi=28, compression_range=(20, 40),
                 random_compression=False, verbose=False,
                 normalize_metadata=True, jm_bin=None, seed=0, **kwargs):
        if qpi > 51 or compression_range[1] > 51:
            raise RuntimeError("QPI cannot be larger than 51.")
        self.qpi = qpi
        self.compression_range = tuple(compression_range)
        self.random_compression = random_compression
        self.normalize_metadata = normalize_metadata
        self.verbose = verbose
        self.jm_bin = jm_bin or os.environ.get("RUMPY_TPU_JM_BIN")
        self._key = jax.random.PRNGKey(seed)
        self.temp_files: list = []

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"min_qpi": self.compression_range[0],
                "max_qpi": self.compression_range[1]}

    def _norm(self, q):
        return (normalize(q, *self.compression_range)
                if self.normalize_metadata else q)

    def _pick_qpi(self):
        if self.random_compression:
            return int(np.random.randint(self.compression_range[0],
                                         self.compression_range[1] + 1))
        return self.qpi

    def _jm_binary_compress(self, pil: Image.Image, qpi: int) -> Image.Image:
        """Drive the real JM lencod binary with pure-intra settings
        (NumberBFrames=0, IDRPeriod=1, IntraPeriod=1 — the reference's
        command assembly, compression/__init__.py:63-85)."""
        with tempfile.TemporaryDirectory() as td:
            yuv = os.path.join(td, "in.yuv")
            rec = os.path.join(td, "rec.yuv")
            h264 = os.path.join(td, "out.h264")
            w, h = pil.size
            if h % 2 or w % 2:
                # 4:2:0 needs even dims (the JM even-dimension constraint
                # the reference's downsampler enforces); crop the odd edge
                h -= h % 2
                w -= w % 2
                pil = pil.crop((0, 0, w, h))
            ycc = np.asarray(pil.convert("YCbCr"))
            # 4:2:0 planar as JM expects.
            y = ycc[..., 0]
            cb = ycc[::2, ::2, 1]
            cr = ycc[::2, ::2, 2]
            with open(yuv, "wb") as f:
                f.write(y.tobytes() + cb.tobytes() + cr.tobytes())
            cmd = (f"{self.jm_bin}/lencod.exe -d {self.jm_bin}/encoder_baseline.cfg "
                   f"-p InputFile={yuv} -p OutputFile={h264} -p ReconFile={rec} "
                   f"-p NumberBFrames=0 -p IDRPeriod=1 -p IntraPeriod=1 "
                   f"-p QPISlice={qpi} -p SourceHeight={h} -p SourceWidth={w} "
                   f"-p FramesToBeEncoded=1")
            subprocess.run(cmd.split(), check=True,
                           capture_output=not self.verbose)
            data = np.fromfile(rec, dtype=np.uint8)
            y2 = data[:h * w].reshape(h, w)
            cb2 = data[h * w:h * w + h * w // 4].reshape(h // 2, w // 2)
            cr2 = data[h * w + h * w // 4:h * w + h * w // 2].reshape(h // 2, w // 2)
            cb2 = np.repeat(np.repeat(cb2, 2, 0), 2, 1)[:h, :w]
            cr2 = np.repeat(np.repeat(cr2, 2, 0), 2, 1)[:h, :w]
            out = Image.fromarray(np.stack([y2, cb2, cr2], -1), "YCbCr")
            return out.convert("RGB")

    def __call__(self, image):
        qpi = self._pick_qpi()
        arr, was_pil = to_float_array(image)
        if self.jm_bin:
            pil = image if was_pil else Image.fromarray(
                (arr * 255).astype(np.uint8))
            out = self._jm_binary_compress(pil, qpi)
            out = out if was_pil else np.asarray(out)
            return out, {"qpi": self._norm(qpi)}
        # native C++ path: the real H.264 intra toolchain (prediction +
        # integer transform + deblocking on 4:2:0) — distribution-faithful
        # to JM's IntraPeriod=1 output, though not bit-exact (no entropy
        # coding / RD mode decision; see native/rumpy_native.cpp)
        u8 = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
        h, w = u8.shape[:2]
        try:
            from rumpy_tpu.native import NativeUnavailable, h264_intra
        except ImportError:
            NativeUnavailable = ImportError  # pragma: no cover
            h264_intra = None
        if h264_intra is not None:
            try:
                ev_h, ev_w = h - h % 2, w - w % 2
                comp = h264_intra(u8[:ev_h, :ev_w], qpi)
                u8 = u8.copy()
                u8[:ev_h, :ev_w] = comp
                return (Image.fromarray(u8) if was_pil else u8,
                        {"qpi": self._norm(qpi)})
            except NativeUnavailable:
                # no g++ / build failed: the documented fallback case —
                # fall through to the on-device DCT approximation. Any
                # OTHER failure is a real bug and must surface, not
                # silently degrade the dataset's fidelity.
                pass
        dev = jpeg_ops.h264_intra_compress(
            jnp.asarray(arr)[None], jnp.array([float(qpi)]))
        out = from_float_array(np.asarray(dev[0]), was_pil)
        return out, {"qpi": self._norm(qpi)}

    def call_with_tag(self, image, tag=""):
        # Worker-id temp-file tagging is unnecessary here (tempdirs are
        # unique per call); kept for API parity.
        return self(image)

    def batch_apply(self, key, imgs):
        b = imgs.shape[0]
        if self.random_compression:
            lo, hi = self.compression_range
            qpi = jax.random.randint(key, (b,), lo, hi + 1).astype(jnp.float32)
        else:
            qpi = jnp.full((b,), float(self.qpi))
        out = jpeg_ops.h264_intra_compress(imgs, qpi)
        return out, {"qpi": self._norm(qpi)}


@register_tool("randomcompress")
class RandomCompress(DegradationOp):
    def __init__(self, jm_params=None, jpeg_params=None, seed=0):
        self.jm_class = JMCompress(**(jm_params or {}))
        self.jpeg_class = JPEGCompress(**(jpeg_params or {}))
        self._key = jax.random.PRNGKey(seed)

    def get_hyperparams(self) -> Dict[str, Any]:
        return {"min_jpeg_quality": self.jpeg_class.compression_range[0],
                "max_jpeg_quality": self.jpeg_class.compression_range[1],
                "min_qpi": self.jm_class.compression_range[0],
                "max_qpi": self.jm_class.compression_range[1]}

    def __call__(self, image):
        if np.random.uniform() < 0.5:
            out, meta = self.jm_class(image)
            meta["jm_qpi"] = meta.pop("qpi")
        else:
            out, meta = self.jpeg_class(image)
            meta["jpeg_quality"] = meta.pop("quality")
        return out, {**{"jm_qpi": 0, "jpeg_quality": 0}, **meta}

    def batch_apply(self, key, imgs):
        k_sel, k_jm, k_jpeg = jax.random.split(key, 3)
        use_jm = jax.random.uniform(k_sel, (imgs.shape[0],)) < 0.5
        jm_out, jm_meta = self.jm_class.batch_apply(k_jm, imgs)
        jp_out, jp_meta = self.jpeg_class.batch_apply(k_jpeg, imgs)
        sel = use_jm[:, None, None, None]
        out = jnp.where(sel, jm_out, jp_out)
        return out, {"jm_qpi": jnp.where(use_jm, jm_meta["qpi"], 0.0),
                     "jpeg_quality": jnp.where(use_jm, 0.0,
                                               jp_meta["quality"])}


@register_tool("ffmpegcompress")
class FFMPEGCompress(JMCompress):
    """libx264 via ffmpeg with the reference's +3 qp shift
    (compression/__init__.py:177-259). Falls back to the on-device H.264
    approximation when no ffmpeg binary is present."""

    def __init__(self, qpi=28, shift_encoder_qp=False, qp_shift_value=3,
                 **kwargs):
        super().__init__(qpi=qpi, **kwargs)
        self.shift_encoder_qp = shift_encoder_qp
        self.qp_shift_value = qp_shift_value
        import shutil
        self.ffmpeg = shutil.which("ffmpeg")

    def __call__(self, image):
        qpi = self._pick_qpi()
        enc_qp = qpi + self.qp_shift_value if self.shift_encoder_qp else qpi
        arr, was_pil = to_float_array(image)
        if self.ffmpeg:
            pil = image if was_pil else Image.fromarray(
                (arr * 255).astype(np.uint8))
            out = self._ffmpeg_roundtrip(pil, enc_qp)
            out = out if was_pil else np.asarray(out)
        else:
            dev = jpeg_ops.h264_intra_compress(
                jnp.asarray(arr)[None], jnp.array([float(enc_qp)]))
            out = from_float_array(np.asarray(dev[0]), was_pil)
        return out, {"qpi": self._norm(qpi)}

    def _ffmpeg_roundtrip(self, pil: Image.Image, qp: int) -> Image.Image:
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.png")
            enc = os.path.join(td, "out.h264")
            dec = os.path.join(td, "dec.png")
            pil.save(src)
            subprocess.run(
                [self.ffmpeg, "-y", "-loglevel", "error", "-i", src,
                 "-vcodec", "libx264", "-profile:v", "baseline",
                 "-qp", str(qp), "-pix_fmt", "yuv420p", enc], check=True)
            subprocess.run([self.ffmpeg, "-y", "-loglevel", "error",
                            "-i", enc, dec], check=True)
            out = Image.open(dec)
            out.load()
            return out
