"""System-libde265 binding (ctypes) — real HEVC keyframe decode.

Wild video is predominantly H.264/HEVC with entropy-coded residuals;
the engine's pure-Python H.264 path honestly decodes only the I_PCM
subset and refuses coded macroblocks (``h264codec``). HEVC is the one
coded-video family where REAL wild-sample decode is possible on this
image: ``libde265.so`` ships with the OS (probed present at
``/usr/lib/x86_64-linux-gnu/libde265.so.0.1.4``; no libavcodec or
libopenh264 exists here). This module loads the SYSTEM library behind
an import-try (the ``webpnative``/``heifnative`` convention): absent
library → loud ``NotImplementedError`` naming the lib and the
structural alternatives; present → genuine decode of Annex B HEVC
streams, feeding the same PPM/pHash chain AVI-MJPG and H.264 I_PCM
feed.

Oracle story: fixtures are **x265-encoded through libheif**
(``heifnative.heic_encode_rgb`` — encoder and decoder are independent
HEVC implementations), demuxed from the HEIC item payload into raw
Annex B, and must decode here to the same pixels libheif reports —
a two-implementation cross-check plus pinned decoded-frame digests
(HEVC reconstruction is exactly specified, so hashes are stable
across library versions).

API used (public de265.h, stable since 0.9): ``de265_new_decoder``,
``de265_push_data``, ``de265_flush_data``, ``de265_decode``,
``de265_get_next_picture``, ``de265_get_image_{width,height,plane}``,
``de265_release_next_picture``, ``de265_free_decoder``.

Bomb posture: input capped at ``MAX_INPUT_BYTES``; decoded frame
count capped at ``MAX_FRAMES``; out-of-range dimensions raise before
any plane copy.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

__all__ = ["libde265_available", "hevc_decode_frames",
           "hevc_frame_sampler"]

MAX_INPUT_BYTES = 256 << 20
MAX_FRAMES = 4096
_MAX_DIM = 16384

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("de265")
    if found:
        names.append(found)
    names += ["libde265.so.0", "libde265.so", "libde265.0.dylib",
              "libde265.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.de265_new_decoder.restype = ctypes.c_void_p
            lib.de265_new_decoder.argtypes = []
            lib.de265_push_data.restype = ctypes.c_int
            lib.de265_push_data.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_longlong, ctypes.c_void_p]
            lib.de265_flush_data.restype = ctypes.c_int
            lib.de265_flush_data.argtypes = [ctypes.c_void_p]
            lib.de265_decode.restype = ctypes.c_int
            lib.de265_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
            lib.de265_get_next_picture.restype = ctypes.c_void_p
            lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
            lib.de265_release_next_picture.restype = None
            lib.de265_release_next_picture.argtypes = [ctypes.c_void_p]
            lib.de265_get_image_width.restype = ctypes.c_int
            lib.de265_get_image_width.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int]
            lib.de265_get_image_height.restype = ctypes.c_int
            lib.de265_get_image_height.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_int]
            lib.de265_get_image_plane.restype = ctypes.POINTER(
                ctypes.c_uint8)
            lib.de265_get_image_plane.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
            lib.de265_free_decoder.restype = ctypes.c_int
            lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def libde265_available() -> bool:
    """True when the system libde265 loaded (availability gate — the
    ``webpnative`` convention)."""
    return _load() is not None


_REFUSAL = (
    "HEVC sample decode needs the system libde265, which is not "
    "available on this image. Structural alternatives that never "
    "decode: mp4codec.video_content_hash (packaging-invariant "
    "identity), mp4codec.mp4_info (metadata). On images with "
    "libde265 this path activates automatically."
)


def hevc_decode_frames(annexb: bytes,
                       max_frames: int = MAX_FRAMES) -> list[np.ndarray]:
    """Decode an Annex B HEVC stream to grayscale luma frames
    (``uint8 (h, w)`` each — the shape the pHash chain consumes;
    chroma is irrelevant to the perceptual signature). Raises
    ``NotImplementedError`` when libde265 is absent and ``ValueError``
    when the library reports a decode error or the stream yields no
    pictures."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(_REFUSAL)
    data = bytes(annexb)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError("HEVC stream exceeds the input size guard")
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise ValueError("libde265: decoder allocation failed")
    frames: list[np.ndarray] = []
    try:
        err = lib.de265_push_data(ctx, data, len(data), 0, None)
        if err != 0:
            raise ValueError(f"libde265: push_data error {err}")
        lib.de265_flush_data(ctx)
        more = ctypes.c_int(1)
        stride = ctypes.c_int(0)
        while more.value:
            err = lib.de265_decode(ctx, ctypes.byref(more))
            if err not in (0, 1):      # DE265_OK / waiting-for-input
                raise ValueError(f"libde265: decode error {err}")
            while True:
                img = lib.de265_get_next_picture(ctx)
                if not img:
                    break
                w = lib.de265_get_image_width(img, 0)
                h = lib.de265_get_image_height(img, 0)
                if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
                    raise ValueError(
                        f"libde265: out-of-range picture {w}x{h}")
                plane = lib.de265_get_image_plane(
                    img, 0, ctypes.byref(stride))
                if not plane:
                    raise ValueError("libde265: missing luma plane")
                buf = ctypes.cast(
                    plane, ctypes.POINTER(
                        ctypes.c_uint8 * (stride.value * h)))
                arr = np.frombuffer(
                    bytes(buf.contents),
                    dtype=np.uint8).reshape(h, stride.value)[:, :w]
                frames.append(arr.copy())
                if len(frames) >= max_frames:
                    more.value = 0
                    break
    finally:
        lib.de265_free_decoder(ctx)
    if not frames:
        raise ValueError("libde265: stream decoded to zero pictures")
    return frames


def hevc_encode_keyframes(frames_rgb, quality: int = 90) -> bytes:
    """TEST/FIXTURE encoder: a real Annex B HEVC stream of IDR
    keyframes, produced by routing each frame through the system
    libheif's **x265** encoder (``heifnative.heic_encode_rgb``) and
    demuxing the HEIC item payload (hvcC parameter sets + slice NALs)
    back to start-code form. Encoder (x265) and decoder (libde265)
    are independent HEVC implementations, so an encode→decode
    roundtrip here is a genuine two-implementation cross-check — the
    ``webpnative`` oracle pattern for coded video. All-intra by
    construction (each frame is an independent still-image encode);
    parameter sets repeat before every IDR, which Annex B permits and
    wild streams do."""
    from .heifnative import heic_encode_rgb, libheif_available
    from .mp4codec import _child, _config_nals
    if not libheif_available():
        raise NotImplementedError(
            "hevc_encode_keyframes needs the system libheif/x265 "
            "(fixture encoder only; decode needs only libde265)")
    out = bytearray()
    for frame in frames_rgb:
        heic = heic_encode_rgb(np.asarray(frame, dtype=np.uint8),
                               quality=quality)
        meta = _child(heic, 0, len(heic), b"meta")
        if meta is None:
            raise ValueError("libheif output without a meta box")
        iprp = _child(heic, meta[0] + 4, meta[1], b"iprp")  # FullBox
        ipco = iprp and _child(heic, iprp[0], iprp[1], b"ipco")
        hvcc = ipco and _child(heic, ipco[0], ipco[1], b"hvcC")
        mdat = _child(heic, 0, len(heic), b"mdat")
        if not hvcc or not mdat:
            raise ValueError("libheif output without hvcC/mdat")
        nals, lsize = _config_nals("hvcC", heic[hvcc[0]:hvcc[1]])
        for n in nals:
            out += b"\x00\x00\x00\x01" + n
        payload = heic[mdat[0]:mdat[1]]
        pos = 0
        while pos < len(payload):
            ln = int.from_bytes(payload[pos:pos + lsize], "big")
            pos += lsize
            out += b"\x00\x00\x00\x01" + payload[pos:pos + ln]
            pos += ln
    return bytes(out)


def hevc_frame_sampler(raw: bytes, num_frames: int) -> list[bytes]:
    """``num_frames`` evenly spaced decoded HEVC frames as PPM
    payloads — the ``sample_frames`` hook (mirrors
    ``h264_frame_sampler``): downstream ``decode_image`` / pHash
    consume them unchanged."""
    from .imagecodec import encode_ppm
    frames = hevc_decode_frames(raw)
    if num_frames < len(frames):
        # identical spacing to mjpeg/h264_frame_sampler: the same
        # footage in different containers must sample the SAME frame
        # indices, or cross-container pHash signatures diverge by
        # selection rather than content
        idx = np.linspace(0, len(frames) - 1,
                          num_frames).round().astype(int)
        frames = [frames[i] for i in idx]
    return [encode_ppm(np.repeat(y[:, :, None], 3, axis=2))
            for y in frames]
