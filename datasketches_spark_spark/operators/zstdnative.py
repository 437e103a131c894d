"""System-libzstd binding (ctypes) — ``Content-Encoding: zstd``.

RFC 8878 registers zstd as an HTTP content coding and real crawl
responses increasingly carry it; python 3.11 has no stdlib zstd, but
the OS image ships the reference implementation (``libzstd.so.1``) —
loaded behind an import-try, the same SYSTEM-library pattern as
``operators/webpnative.py`` (libwebp) and ``operators/brotlinative.py``
(libbrotli): no pip/apt, honest refusal with guidance where the shared
object is genuinely absent.

Decode is STREAMING (``ZSTD_decompressStream`` over bounded output
windows) so a decompression bomb hits the ``max_out`` guard instead of
materializing — a zstd frame can declare petabyte content in a
kilobyte. Truncated streams return their decoded prefix (the crawl-
capture leniency of ``http._inflate``); corrupt streams raise. The
one-shot encoder exists for fixtures/tests.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = [
    "zstd_available",
    "zstd_decode",
    "zstd_encode",
]

_LIB = None
_TRIED = False


class _InBuf(ctypes.Structure):
    _fields_ = [("src", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


class _OutBuf(ctypes.Structure):
    _fields_ = [("dst", ctypes.c_void_p), ("size", ctypes.c_size_t),
                ("pos", ctypes.c_size_t)]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    names = []
    found = ctypes.util.find_library("zstd")
    if found:
        names.append(found)
    names += ["libzstd.so.1", "libzstd.so", "libzstd.1.dylib",
              "libzstd.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.ZSTD_createDCtx.restype = ctypes.c_void_p
            lib.ZSTD_createDCtx.argtypes = []
            lib.ZSTD_freeDCtx.restype = ctypes.c_size_t
            lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
            lib.ZSTD_decompressStream.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_OutBuf),
                ctypes.POINTER(_InBuf)]
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def zstd_available() -> bool:
    """True when a system libzstd loaded (checked once per process)."""
    return _load() is not None


def zstd_decode(data: bytes, max_out: int = 256 << 20) -> bytes:
    """Decompress a zstd frame sequence (RFC 8878) via the system
    decoder. Streaming in 256 KiB output windows; total output beyond
    ``max_out`` raises ValueError (bomb guard). Truncated streams
    return the decoded prefix; corrupt streams raise ValueError
    (callers null the row). Raises NotImplementedError with guidance
    when no system libzstd exists."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libzstd not found; Content-Encoding: zstd needs "
            "the reference decoder (see operators/zstdnative.py) — "
            "install libzstd or filter zstd-encoded rows upstream")
    data = bytes(data)
    if not data:
        return b""
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise MemoryError("ZSTD_createDCtx failed")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        inb = _InBuf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        window = 256 << 10
        obuf = ctypes.create_string_buffer(window)
        out, total = [], 0
        frame_done = True
        while True:
            ob = _OutBuf(ctypes.cast(obuf, ctypes.c_void_p), window, 0)
            ret = lib.ZSTD_decompressStream(
                dctx, ctypes.byref(ob), ctypes.byref(inb))
            if lib.ZSTD_isError(ret):
                raise ValueError("zstd: corrupt stream")
            if ob.pos:
                out.append(obuf.raw[:ob.pos])
                total += ob.pos
                if total > max_out:
                    raise ValueError(
                        f"zstd output exceeds max_out={max_out} bytes "
                        "(decompression-bomb guard)")
            frame_done = ret == 0
            if inb.pos >= inb.size and ob.pos < window:
                # input exhausted and the decoder is not output-bound:
                # complete (ret==0) or truncated (keep the prefix —
                # the http._inflate leniency posture)
                return b"".join(out)
            if frame_done and inb.pos >= inb.size:
                return b"".join(out)
    finally:
        lib.ZSTD_freeDCtx(dctx)


def zstd_encode(data: bytes, level: int = 9) -> bytes:
    """One-shot zstd compression via the system library (fixture /
    oracle path — decode is the production direction)."""
    lib = _load()
    if lib is None:
        raise NotImplementedError(
            "system libzstd not found (see operators/zstdnative.py)")
    data = bytes(data)
    cap = int(lib.ZSTD_compressBound(len(data)))
    out = ctypes.create_string_buffer(cap)
    ret = lib.ZSTD_compress(out, cap, data, len(data), int(level))
    if lib.ZSTD_isError(ret):
        raise ValueError("zstd: encode failed")
    return out.raw[:ret]
