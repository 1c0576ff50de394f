"""Third-party H.264 decode oracle for bitstream bit-exactness tests.

Drives the system libavcodec (an independent, conformance-tested H.264
implementation) directly via ctypes — no ffmpeg binary or PyAV needed —
to decode Annex-B streams produced by native/rumpy_native.cpp and hand
back the raw YUV planes for comparison against the encoder's own
reconstruction.

Only the stable head of the AVPacket/AVFrame ABIs is touched:
AVPacket{buf,pts,dts,data,size,...} and AVFrame{data[8],linesize[8],
extended_data,width,height,nb_samples,format,...} have kept this layout
across every major libav* release; offsets are asserted against the
decoded geometry before use.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

AV_CODEC_ID_H264 = 27

_libs = None


def _load_libs():
    global _libs
    if _libs is None:
        names_c = ["libavcodec.so.59", "libavcodec.so.60",
                   "libavcodec.so.58", "libavcodec.so"]
        names_u = ["libavutil.so.57", "libavutil.so.58",
                   "libavutil.so.56", "libavutil.so"]
        avc = avu = None
        for n in names_c:
            try:
                avc = ctypes.CDLL(n)
                break
            except OSError:
                continue
        for n in names_u:
            try:
                avu = ctypes.CDLL(n)
                break
            except OSError:
                continue
        if avc is None or avu is None:
            raise OSError("libavcodec/libavutil not found")
        avc.avcodec_find_decoder.restype = ctypes.c_void_p
        avc.avcodec_alloc_context3.restype = ctypes.c_void_p
        avc.av_packet_alloc.restype = ctypes.c_void_p
        avu.av_frame_alloc.restype = ctypes.c_void_p
        _libs = (avc, avu)
    return _libs


def available() -> bool:
    try:
        avc, _ = _load_libs()
        return bool(avc.avcodec_find_decoder(AV_CODEC_ID_H264))
    except OSError:
        return False


def decode_h264(data: bytes, exp_w: int, exp_h: int):
    """Decode the first frame of an Annex-B H.264 stream; returns the
    (Y, Cb, Cr) uint8 planes (4:2:0). Asserts the decoded geometry and
    pixel format so a wrong-struct-offset read can never silently pass."""
    avc, avu = _load_libs()
    codec = avc.avcodec_find_decoder(AV_CODEC_ID_H264)
    assert codec, "no H.264 decoder in libavcodec"
    ctx = avc.avcodec_alloc_context3(ctypes.c_void_p(codec))
    assert ctx
    rc = avc.avcodec_open2(ctypes.c_void_p(ctx), ctypes.c_void_p(codec),
                           None)
    assert rc == 0, f"avcodec_open2: {rc}"
    pkt = avc.av_packet_alloc()
    rc = avc.av_new_packet(ctypes.c_void_p(pkt), len(data))
    assert rc == 0
    # AVPacket head: buf(8) pts(8) dts(8) data(8) size(4)
    data_ptr = ctypes.cast(pkt + 24,
                           ctypes.POINTER(ctypes.c_void_p)).contents.value
    ctypes.memmove(data_ptr, data, len(data))
    frame = avu.av_frame_alloc()
    rc = avc.avcodec_send_packet(ctypes.c_void_p(ctx), ctypes.c_void_p(pkt))
    assert rc == 0, f"send_packet: {rc} (decoder rejected the stream)"
    avc.avcodec_send_packet(ctypes.c_void_p(ctx), None)  # flush
    rc = avc.avcodec_receive_frame(ctypes.c_void_p(ctx),
                                   ctypes.c_void_p(frame))
    assert rc == 0, f"receive_frame: {rc} (no frame decoded)"
    # AVFrame head: data[8] @0, linesize[8] @64, extended_data @96,
    # width @104, height @108, nb_samples @112, format @116
    data_arr = ctypes.cast(frame, ctypes.POINTER(ctypes.c_void_p * 8)).contents
    ls = ctypes.cast(frame + 64, ctypes.POINTER(ctypes.c_int * 8)).contents
    width = ctypes.cast(frame + 104,
                        ctypes.POINTER(ctypes.c_int)).contents.value
    height = ctypes.cast(frame + 108,
                         ctypes.POINTER(ctypes.c_int)).contents.value
    fmt = ctypes.cast(frame + 116,
                      ctypes.POINTER(ctypes.c_int)).contents.value
    assert (width, height) == (exp_w, exp_h), \
        f"decoded {width}x{height}, expected {exp_w}x{exp_h}"
    assert fmt == 0, f"pix_fmt {fmt} != AV_PIX_FMT_YUV420P"
    planes = []
    for i, (ph, pw) in enumerate([(height, width), (height // 2, width // 2),
                                  (height // 2, width // 2)]):
        buf = (ctypes.c_uint8 * (ls[i] * ph)).from_address(data_arr[i])
        planes.append(
            np.frombuffer(buf, np.uint8).reshape(ph, ls[i])[:, :pw].copy())
    return planes
