"""System-libavif binding (ctypes) — AVIF decode AND encode.

AVIF (AV1 Image File Format — AOM spec, ISO BMFF carriage) is the
modern crawl image format; production pipelines decode it with libavif
the same way they decode WebP with libwebp. This module loads the
SYSTEM library (no pip/apt — the shared object ships with the OS
image) behind an import-try, mirroring ``operators/webpnative.py``:
where the library is absent every entry point raises a loud
``NotImplementedError`` with guidance, never a silent wrong answer.

Two facts make this binding a genuine two-implementation oracle in
this container: Debian's libavif links **aom for encode and dav1d for
decode** (verified live by ``avifCodecName``), so an
``avif_encode_rgb -> avif_decode_rgb`` roundtrip crosses two
independent AV1 codebases; and AV1 reconstruction is exactly
specified, so committed fixture streams carry pinned decoded-pixel
hashes stable across decoder versions (the lossy-WebP gate pattern).

No struct layouts are assumed beyond libavif's documented stable
prefix (``avifImage``/``avifRGBImage`` begin ``width, height, depth``
— public avif.h, every release): the one field whose offset varies
across versions, the RGB pixel pointer, is DISCOVERED at call time by
diffing the zeroed struct buffer around ``avifRGBImageAllocatePixels``
and taking the changed 8-aligned word with pointer magnitude — the
library itself tells us where it put the allocation. rowBytes is the
u32 that follows it (cross-checked against width*4; mismatch raises).

Bomb posture: input payloads are capped (``MAX_INPUT_BYTES``) and
libavif's own default ``imageSizeLimit`` (16384 x 16384 in 0.11+)
bounds decoded dimensions before plane allocation; decoded dims are
re-checked after parse anyway.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np

__all__ = [
    "libavif_available",
    "avif_codec_names",
    "avif_decode_rgb",
    "avif_decode_rgba",
    "avif_encode_rgb",
]

MAX_INPUT_BYTES = 256 << 20
_MAX_DIM = 16384            # libavif default imageSizeLimit side
_RGBBUF = 512               # >> sizeof(avifRGBImage) in any release

_LIB = None
_TRIED = False

# avif.h enums (public, stable): pixel formats / add-image flags
_YUV444 = 1
_ADD_IMAGE_FLAG_SINGLE = 2


class _RWData(ctypes.Structure):
    # avifRWData: the one struct whose full layout IS stable/documented
    _fields_ = [("data", ctypes.c_void_p), ("size", ctypes.c_size_t)]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("avif")
    if found:
        names.append(found)
    names += ["libavif.so.16", "libavif.so.15", "libavif.so",
              "libavif.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            for fn, res, args in (
                ("avifImageCreate", ctypes.c_void_p,
                 [ctypes.c_uint32] * 3 + [ctypes.c_int]),
                ("avifImageCreateEmpty", ctypes.c_void_p, []),
                ("avifImageDestroy", None, [ctypes.c_void_p]),
                ("avifRGBImageSetDefaults", None,
                 [ctypes.c_void_p, ctypes.c_void_p]),
                ("avifRGBImageAllocatePixels", None, [ctypes.c_void_p]),
                ("avifRGBImageFreePixels", None, [ctypes.c_void_p]),
                ("avifImageRGBToYUV", ctypes.c_int,
                 [ctypes.c_void_p, ctypes.c_void_p]),
                ("avifImageYUVToRGB", ctypes.c_int,
                 [ctypes.c_void_p, ctypes.c_void_p]),
                ("avifEncoderCreate", ctypes.c_void_p, []),
                ("avifEncoderDestroy", None, [ctypes.c_void_p]),
                ("avifEncoderAddImage", ctypes.c_int,
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
                  ctypes.c_uint32]),
                ("avifEncoderFinish", ctypes.c_int,
                 [ctypes.c_void_p, ctypes.c_void_p]),
                ("avifDecoderCreate", ctypes.c_void_p, []),
                ("avifDecoderDestroy", None, [ctypes.c_void_p]),
                ("avifDecoderReadMemory", ctypes.c_int,
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
                  ctypes.c_size_t]),
                ("avifRWDataFree", None, [ctypes.c_void_p]),
                ("avifResultToString", ctypes.c_char_p,
                 [ctypes.c_int]),
                ("avifCodecName", ctypes.c_char_p,
                 [ctypes.c_int, ctypes.c_uint32]),
            ):
                f = getattr(lib, fn)
                f.restype = res
                f.argtypes = args
            _LIB = lib
            return _LIB
        except (OSError, AttributeError):
            continue
    return None


def libavif_available() -> bool:
    return _load() is not None


def _require():
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "AVIF requires the system libavif shared library, which "
            "was not found — install libavif (the engine binds it via "
            "ctypes; see operators/avifnative.py)")
    return lib


def avif_codec_names() -> tuple[str, str]:
    """(decoder, encoder) codec names libavif auto-selects — the
    two-independent-implementations fact the roundtrip tests rely on
    (dav1d / aom on the Debian build)."""
    lib = _require()
    dec = lib.avifCodecName(0, 1)      # CHOICE_AUTO, DECODE
    enc = lib.avifCodecName(0, 2)      # CHOICE_AUTO, ENCODE
    return (dec.decode() if dec else "none",
            enc.decode() if enc else "none")


def _check(lib, res: int, what: str) -> None:
    if res != 0:
        msg = lib.avifResultToString(res)
        raise ValueError(f"libavif {what} failed: "
                         f"{(msg or b'?').decode()}")


def _rgb_struct(lib, image_ptr):
    """Zeroed oversized avifRGBImage + defaults from the image. The
    stable prefix (width u32 @0, height u32 @4, depth u32 @8) is all
    we ever read by fixed offset."""
    buf = ctypes.create_string_buffer(_RGBBUF)
    lib.avifRGBImageSetDefaults(buf, image_ptr)
    return buf


def _alloc_pixels(lib, buf, width: int):
    """AllocatePixels + discover (pixels_ptr, rowBytes) by diffing the
    struct buffer: the library wrote a (pointer, rowBytes) pair, and
    the SIGNATURE we match is structural, not magnitude — a changed
    8-aligned word that is non-zero whose following u32 equals
    width*4 (the default-RGBA rowBytes the library itself computes).
    Matching on the rowBytes value rather than pointer size keeps the
    discovery correct on 32-bit platforms and low-address heaps; an
    ambiguous match (two candidates) or none means the layout
    assumption broke, so raise rather than read garbage."""
    before = bytes(buf.raw)
    lib.avifRGBImageAllocatePixels(buf)
    after = bytes(buf.raw)
    psz = ctypes.sizeof(ctypes.c_void_p)     # rowBytes sits at +psz
    pfmt = "<Q" if psz == 8 else "<I"
    hits = []
    for off in range(0, _RGBBUF - psz - 4, psz):
        if before[off:off + psz] == after[off:off + psz]:
            continue
        v = struct.unpack_from(pfmt, after, off)[0]
        rb = struct.unpack_from("<I", after, off + psz)[0]
        if v != 0 and rb == width * 4:
            hits.append((off, v, rb))
    if len(hits) != 1:
        raise ValueError(
            "libavif pixel pointer not identified after "
            f"AllocatePixels ({len(hits)} candidates — unexpected "
            "struct layout)")
    return hits[0][1], hits[0][2]


def _decode(data: bytes, keep_alpha: bool) -> np.ndarray:
    lib = _require()
    data = bytes(data)
    if len(data) > MAX_INPUT_BYTES:
        raise ValueError(
            f"AVIF payload {len(data)} B exceeds the "
            f"{MAX_INPUT_BYTES} B bomb guard")
    image = lib.avifImageCreateEmpty()
    dec = lib.avifDecoderCreate()
    rgb = None
    try:
        _check(lib, lib.avifDecoderReadMemory(dec, image, data,
                                              len(data)), "decode")
        w, h = struct.unpack_from("<II", ctypes.string_at(image, 8), 0)
        if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
            raise ValueError(f"decoded AVIF dims {w}x{h} out of range")
        rgb = _rgb_struct(lib, image)
        ptr, row_bytes = _alloc_pixels(lib, rgb, w)
        try:
            _check(lib, lib.avifImageYUVToRGB(image, rgb), "YUVToRGB")
            px = np.frombuffer(
                ctypes.string_at(ptr, row_bytes * h),
                np.uint8).reshape(h, w, 4)
            return px.copy() if keep_alpha else px[:, :, :3].copy()
        finally:
            lib.avifRGBImageFreePixels(rgb)
    finally:
        lib.avifDecoderDestroy(dec)
        lib.avifImageDestroy(image)


def avif_decode_rgb(data: bytes) -> np.ndarray:
    """AVIF bytes -> ``(H, W, 3) uint8`` RGB (alpha dropped)."""
    return _decode(data, keep_alpha=False)


def avif_decode_rgba(data: bytes) -> np.ndarray:
    """AVIF bytes -> ``(H, W, 4) uint8`` RGBA."""
    return _decode(data, keep_alpha=True)


def avif_encode_rgb(img: np.ndarray) -> bytes:
    """``(H, W, 3) uint8`` RGB -> AVIF bytes (YUV444, opaque alpha,
    the encoder's default quality/speed — libavif 0.11 exposes the
    quality knobs only as struct fields whose offsets this binding
    deliberately does not guess). Solid colors survive the lossy
    roundtrip within ~1 LSB; the tests pin that."""
    lib = _require()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("avif_encode_rgb needs (H, W, 3) uint8")
    h, w = img.shape[:2]
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
        raise ValueError(f"AVIF encode dims {w}x{h} out of range")
    image = lib.avifImageCreate(w, h, 8, _YUV444)
    enc = lib.avifEncoderCreate()
    out = _RWData()
    try:
        rgb = _rgb_struct(lib, image)
        ptr, _ = _alloc_pixels(lib, rgb, w)
        try:
            rgba = np.dstack(
                [img, np.full((h, w), 255, np.uint8)]).tobytes()
            ctypes.memmove(ptr, rgba, len(rgba))
            _check(lib, lib.avifImageRGBToYUV(image, rgb), "RGBToYUV")
        finally:
            lib.avifRGBImageFreePixels(rgb)
        _check(lib, lib.avifEncoderAddImage(
            enc, image, 1, _ADD_IMAGE_FLAG_SINGLE), "AddImage")
        _check(lib, lib.avifEncoderFinish(enc, ctypes.byref(out)),
               "Finish")
        return ctypes.string_at(out.data, out.size)
    finally:
        lib.avifRWDataFree(ctypes.byref(out))
        lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(image)
