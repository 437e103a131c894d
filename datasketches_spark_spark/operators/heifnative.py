"""System-libheif binding (ctypes) — HEIC decode AND encode.

HEIC (HEVC-in-HEIF, ISO/IEC 23008-12) is the iPhone camera format and
a steady share of crawled image bytes. This module loads the SYSTEM
libheif behind an import-try (the ``operators/webpnative.py`` /
``avifnative.py`` convention): absent library -> loud
``NotImplementedError``; present -> real decode and encode.

Unlike libavif, libheif's public API is entirely function-based —
every field access here goes through an exported getter/setter, so NO
struct layout is guessed. The one struct crossed by value,
``heif_error`` (code, subcode, message), is part of the documented
stable ABI. The one API this binding avoids is ``heif_context_write``
with a memory writer: its callback returns ``heif_error`` BY VALUE,
which ctypes cannot express in a callback, so encode writes through
``heif_context_write_to_file`` on a private temp file instead (encode
feeds fixtures/tests, not the hot path).

Oracle story, same as AVIF: this image's libheif pairs **x265 encode
with libde265 decode** (verified live via
``heif_have_{encoder,decoder}_for_format``) — an encode -> decode
roundtrip crosses two independent HEVC implementations — and HEVC
reconstruction is exactly specified, so committed fixture streams
carry pinned decoded-pixel hashes.

Bomb posture: input capped at ``MAX_INPUT_BYTES``; the image handle
reports dimensions BEFORE plane decode, and out-of-range dims raise
without decoding.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

__all__ = [
    "libheif_available",
    "heic_codec_support",
    "heic_decode_rgb",
    "heic_decode_rgba",
    "heic_encode_rgb",
]

MAX_INPUT_BYTES = 256 << 20
_MAX_DIM = 16384

# public enums (libheif/heif.h, stable): compression formats,
# colorspaces, chroma layouts, channel ids
_COMPRESSION_HEVC = 1
_COLORSPACE_RGB = 1
_CHROMA_INTERLEAVED_RGB = 10
_CHROMA_INTERLEAVED_RGBA = 11
_CHANNEL_INTERLEAVED = 10

_LIB = None
_TRIED = False


class _Err(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("heif")
    if found:
        names.append(found)
    names += ["libheif.so.1", "libheif.so", "libheif.dylib"]
    vp, i, sz = ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            for fn, res, args in (
                ("heif_context_alloc", vp, []),
                ("heif_context_free", None, [vp]),
                ("heif_image_create", _Err, [i, i, i, i, vp]),
                ("heif_image_release", None, [vp]),
                ("heif_image_add_plane", _Err, [vp, i, i, i, i]),
                ("heif_image_get_plane", vp,
                 [vp, i, ctypes.POINTER(i)]),
                ("heif_image_get_plane_readonly", vp,
                 [vp, i, ctypes.POINTER(i)]),
                ("heif_context_get_encoder_for_format", _Err,
                 [vp, i, vp]),
                ("heif_encoder_release", None, [vp]),
                ("heif_encoder_set_lossy_quality", _Err, [vp, i]),
                ("heif_context_encode_image", _Err,
                 [vp, vp, vp, vp, vp]),
                ("heif_context_write_to_file", _Err,
                 [vp, ctypes.c_char_p]),
                ("heif_context_read_from_memory_without_copy", _Err,
                 [vp, ctypes.c_char_p, sz, vp]),
                ("heif_context_get_primary_image_handle", _Err,
                 [vp, vp]),
                ("heif_image_handle_release", None, [vp]),
                ("heif_image_handle_get_width", i, [vp]),
                ("heif_image_handle_get_height", i, [vp]),
                ("heif_decode_image", _Err, [vp, vp, i, i, vp]),
                ("heif_have_decoder_for_format", i, [i]),
                ("heif_have_encoder_for_format", i, [i]),
                ("heif_get_version", ctypes.c_char_p, []),
            ):
                f = getattr(lib, fn)
                f.restype = res
                f.argtypes = args
            _LIB = lib
            return _LIB
        except (OSError, AttributeError):
            continue
    return None


def libheif_available() -> bool:
    lib = _load()
    return lib is not None and bool(
        lib.heif_have_decoder_for_format(_COMPRESSION_HEVC))


def _require():
    lib = _load()
    if lib is None or not lib.heif_have_decoder_for_format(
            _COMPRESSION_HEVC):
        raise NotImplementedError(
            "HEIC requires the system libheif with an HEVC decoder "
            "plugin (libde265), which was not found — install "
            "libheif/libde265 (the engine binds them via ctypes; see "
            "operators/heifnative.py)")
    return lib


def heic_codec_support() -> tuple[bool, bool]:
    """(can_decode, can_encode) for HEVC on this image — decode needs
    libde265, encode needs x265 behind libheif. Probes the raw
    library (NOT ``_require``, which demands the decoder): an
    encode-only build reports ``(False, True)`` instead of raising."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "HEIC support probe requires the system libheif, which "
            "was not found (see operators/heifnative.py)")
    return (bool(lib.heif_have_decoder_for_format(_COMPRESSION_HEVC)),
            bool(lib.heif_have_encoder_for_format(_COMPRESSION_HEVC)))


def _check(e: _Err, what: str) -> None:
    if e.code != 0:
        msg = (e.message or b"?").decode(errors="replace")
        raise ValueError(f"libheif {what} failed: {msg}")


def _decode(data: bytes, keep_alpha: bool) -> np.ndarray:
    lib = _require()
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(
            f"HEIC payload {len(data)} B exceeds the "
            f"{MAX_INPUT_BYTES} B bomb guard")
    ctx = lib.heif_context_alloc()
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "read")
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary handle")
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
            raise ValueError(f"HEIC dims {w}x{h} out of range")
        chroma = (_CHROMA_INTERLEAVED_RGBA if keep_alpha
                  else _CHROMA_INTERLEAVED_RGB)
        _check(lib.heif_decode_image(
            handle, ctypes.byref(img), _COLORSPACE_RGB, chroma, None),
            "decode")
        stride = ctypes.c_int()
        plane = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not plane:
            raise ValueError("libheif returned no interleaved plane")
        ch = 4 if keep_alpha else 3
        # one bulk copy, not h string_at calls: read through the last
        # row's pixels and stride-slice away any row padding
        s = stride.value
        buf = np.frombuffer(
            ctypes.string_at(plane, s * (h - 1) + w * ch), np.uint8)
        if s == w * ch:
            return buf.reshape(h, w, ch).copy()
        out = np.empty((h, w * ch), np.uint8)
        out[:] = np.lib.stride_tricks.as_strided(
            buf, shape=(h, w * ch), strides=(s, 1))
        return out.reshape(h, w, ch)
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def heic_decode_rgb(data: bytes) -> np.ndarray:
    """HEIC bytes -> ``(H, W, 3) uint8`` RGB."""
    return _decode(data, keep_alpha=False)


def heic_decode_rgba(data: bytes) -> np.ndarray:
    """HEIC bytes -> ``(H, W, 4) uint8`` RGBA."""
    return _decode(data, keep_alpha=True)


def heic_encode_rgb(img: np.ndarray, quality: int = 90) -> bytes:
    """``(H, W, 3) uint8`` RGB -> HEIC bytes (x265 behind libheif;
    raises ``NotImplementedError`` when no HEVC encoder plugin is
    present). Writes through a private temp file — see the module
    docstring for why the memory writer is off-limits to ctypes."""
    lib = _require()
    if not lib.heif_have_encoder_for_format(_COMPRESSION_HEVC):
        raise NotImplementedError(
            "HEIC encode requires an HEVC encoder plugin (x265) "
            "behind libheif, which was not found")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("heic_encode_rgb needs (H, W, 3) uint8")
    h, w = img.shape[:2]
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
        raise ValueError(f"HEIC encode dims {w}x{h} out of range")
    himg = ctypes.c_void_p()
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    handle = ctypes.c_void_p()
    try:
        _check(lib.heif_image_create(
            w, h, _COLORSPACE_RGB, _CHROMA_INTERLEAVED_RGB,
            ctypes.byref(himg)), "image create")
        _check(lib.heif_image_add_plane(
            himg, _CHANNEL_INTERLEAVED, w, h, 8), "add plane")
        stride = ctypes.c_int()
        plane = lib.heif_image_get_plane(
            himg, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        rows = img.reshape(h, w * 3)
        for y in range(h):
            ctypes.memmove(plane + y * stride.value,
                           rows[y].tobytes(), w * 3)
        _check(lib.heif_context_get_encoder_for_format(
            ctx, _COMPRESSION_HEVC, ctypes.byref(enc)), "get encoder")
        _check(lib.heif_encoder_set_lossy_quality(
            enc, int(quality)), "set quality")
        _check(lib.heif_context_encode_image(
            ctx, himg, enc, None, ctypes.byref(handle)), "encode")
        fd, path = tempfile.mkstemp(suffix=".heic")
        os.close(fd)
        try:
            _check(lib.heif_context_write_to_file(
                ctx, path.encode()), "write")
            with open(path, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(path)
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        if enc:
            lib.heif_encoder_release(enc)
        if himg:
            lib.heif_image_release(himg)
        lib.heif_context_free(ctx)
