"""System-libwebp binding (ctypes) — the lossy-VP8 decode path.

Lossy VP8 is the one image codec this engine does not re-implement in
numpy: a spec-correct keyframe decoder needs ~2,000 normative constants
from RFC 6386 (default coefficient probabilities, keyframe B-mode
probability tables, dequantization lookups) that cannot be re-derived —
only transcribed — so a from-scratch build would either embed a bulk
copy of the spec tables or silently decode wrong. Production pipelines
decode crawl WebP with libwebp anyway; this module loads the SYSTEM
library (no pip/apt — the shared object ships with the OS image) behind
an import-try, and ``webpcodec.decode_webp`` uses it for ``VP8 ``
chunks. Where the library is absent the codec keeps its honest refusal
with guidance (the round-10..12 convention for lossy VP8).

The binding doubles as a CROSS-VALIDATION oracle for the pure-numpy
VP8L codec (``tests/test_webp.py``): numpy-encoded lossless images must
decode identically in the real library, and library-encoded lossless
images must decode identically in the numpy decoder — the same
live-foreign-system pattern as the datasketches-java wire checks.

VP8 decoding is exactly specified: any compliant decoder produces
bit-identical pixels for the same stream, so committed lossy fixtures
carry pinned pixel hashes that are stable across libwebp versions.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

__all__ = [
    "libwebp_available",
    "webp_decode_rgb",
    "webp_decode_rgba",
    "webp_encode_rgb",
    "webp_encode_lossless_rgb",
]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("webp")
    if found:
        names.append(found)
    names += ["libwebp.so.7", "libwebp.so", "libwebp.7.dylib",
              "libwebp.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


def libwebp_available() -> bool:
    """True when a system libwebp loaded (checked once per process)."""
    return _load() is not None


def _decode(data: bytes, channels: int, fn_name: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found; lossy VP8 has no pure-numpy "
            "decoder (see operators/webpnative.py) — install libwebp or "
            "re-encode the asset losslessly (VP8L decodes natively)")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    fn = getattr(lib, fn_name)
    buf = fn(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise ValueError("libwebp: decode failed (corrupt WebP stream)")
    try:
        n = w.value * h.value * channels
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(buf, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, channels)


def webp_decode_rgb(data: bytes) -> np.ndarray:
    """Any WebP (lossy VP8 or lossless VP8L) -> (H, W, 3) uint8 RGB."""
    return _decode(bytes(data), 3, "WebPDecodeRGB")


def webp_decode_rgba(data: bytes) -> np.ndarray:
    """Any WebP -> (H, W, 4) uint8 RGBA."""
    return _decode(bytes(data), 4, "WebPDecodeRGBA")


def _encode(img: np.ndarray, fn, *args) -> bytes:
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found (see operators/webpnative.py)")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encoder expects (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = fn(img.tobytes(), w, h, 3 * w, *args, ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp: encode failed")
    try:
        data = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return data


def webp_encode_rgb(img: np.ndarray, quality: float = 75.0) -> bytes:
    """(H, W, 3) uint8 RGB -> lossy VP8 WebP at ``quality`` (0-100)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found (see operators/webpnative.py)")
    return _encode(img, lib.WebPEncodeRGB, ctypes.c_float(quality))


def webp_encode_lossless_rgb(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> lossless VP8L WebP (library encoder — the
    cross-validation counterpart of the numpy ``encode_webp_lossless``)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libwebp not found (see operators/webpnative.py)")
    return _encode(img, lib.WebPEncodeLosslessRGB)
