"""System-libbrotli binding (ctypes) — ``Content-Encoding: br``.

A meaningful share of real Common Crawl response records carry
``Content-Encoding: br``; without a brotli decoder they all null out of
the crawl decode chain (``functions/http.py``). Brotli (RFC 7932) is a
context-modeled entropy coder whose decode would be a multi-thousand-
line transcription job in numpy, but the OS image ships the reference
decoder (``libbrotlidec.so.1``) and encoder (``libbrotlienc.so.1``) —
this module loads them behind an import-try, the same SYSTEM-library
pattern as ``operators/webpnative.py`` (no pip/apt; honest refusal with
guidance where the shared object is genuinely absent).

Decode is STREAMING (``BrotliDecoderDecompressStream`` in bounded
output windows) so a decompression bomb hits the ``max_out`` guard
instead of materializing; truncated streams return their decoded
prefix, matching the gzip/deflate leniency of ``http._inflate``
(crawl captures routinely cut off mid-entity and the correct salvage
is the prefix, not nothing). The encoder is one-shot
(``BrotliEncoderCompress``) — it exists for fixtures/tests and the
roundtrip oracle, not a hot path.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = [
    "brotli_available",
    "brotli_encoder_available",
    "brotli_decode",
    "brotli_encode",
]

# BrotliDecoderResult (decode.h — public stable ABI)
_B_ERROR = 0
_B_SUCCESS = 1
_B_NEEDS_MORE_INPUT = 2
_B_NEEDS_MORE_OUTPUT = 3

_DEC = None
_DEC_TRIED = False
_ENC = None
_ENC_TRIED = False


def _load_dec():
    global _DEC, _DEC_TRIED
    if _DEC_TRIED:
        return _DEC
    _DEC_TRIED = True
    names = []
    found = ctypes.util.find_library("brotlidec")
    if found:
        names.append(found)
    names += ["libbrotlidec.so.1", "libbrotlidec.so",
              "libbrotlidec.1.dylib", "libbrotlidec.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t)]
            lib.BrotliDecoderDestroyInstance.restype = None
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            _DEC = lib
            break
        except (OSError, AttributeError):
            continue
    return _DEC


def _load_enc():
    global _ENC, _ENC_TRIED
    if _ENC_TRIED:
        return _ENC
    _ENC_TRIED = True
    names = []
    found = ctypes.util.find_library("brotlienc")
    if found:
        names.append(found)
    names += ["libbrotlienc.so.1", "libbrotlienc.so",
              "libbrotlienc.1.dylib", "libbrotlienc.dylib"]
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            lib.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
            lib.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
            lib.BrotliEncoderCompress.restype = ctypes.c_int
            lib.BrotliEncoderCompress.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_size_t, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
            _ENC = lib
            break
        except (OSError, AttributeError):
            continue
    return _ENC


def brotli_available() -> bool:
    """True when a system libbrotlidec loaded (checked once/process)."""
    return _load_dec() is not None


def brotli_encoder_available() -> bool:
    """True when a system libbrotlienc loaded (checked once/process)."""
    return _load_enc() is not None


def brotli_decode(data: bytes, max_out: int = 256 << 20) -> bytes:
    """Decompress a brotli stream (RFC 7932) via the system decoder.

    Streaming in 256 KiB output windows; total output beyond
    ``max_out`` raises ValueError (bomb guard — a malicious response
    can claim arbitrary expansion). Truncated streams return the
    decoded prefix; corrupt streams raise ValueError (callers null the
    row — loud, never silent garbage). Raises NotImplementedError with
    guidance when no system libbrotlidec exists.
    """
    lib = _load_dec()
    if lib is None:
        raise NotImplementedError(
            "system libbrotlidec not found; Content-Encoding: br needs "
            "the reference decoder (see operators/brotlinative.py) — "
            "install libbrotli or filter br-encoded rows upstream")
    data = bytes(data)
    if not data:
        return b""
    st = lib.BrotliDecoderCreateInstance(None, None, None)
    if not st:
        raise MemoryError("BrotliDecoderCreateInstance failed")
    try:
        buf_in = ctypes.create_string_buffer(data, len(data))
        next_in = ctypes.cast(buf_in, ctypes.POINTER(ctypes.c_uint8))
        avail_in = ctypes.c_size_t(len(data))
        window = 256 << 10
        obuf = ctypes.create_string_buffer(window)
        out, total = [], 0
        while True:
            next_out = ctypes.cast(obuf, ctypes.POINTER(ctypes.c_uint8))
            avail_out = ctypes.c_size_t(window)
            res = lib.BrotliDecoderDecompressStream(
                st, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            produced = window - avail_out.value
            if produced:
                out.append(obuf.raw[:produced])
                total += produced
                if total > max_out:
                    raise ValueError(
                        f"brotli output exceeds max_out={max_out} "
                        "bytes (decompression-bomb guard)")
            if res == _B_SUCCESS:
                return b"".join(out)
            if res == _B_NEEDS_MORE_OUTPUT:
                continue
            if res == _B_NEEDS_MORE_INPUT:
                # truncated capture: keep the decoded prefix (the
                # http._inflate leniency posture)
                return b"".join(out)
            raise ValueError("brotli: corrupt stream")
    finally:
        lib.BrotliDecoderDestroyInstance(st)


def brotli_encode(data: bytes, quality: int = 9, lgwin: int = 22) -> bytes:
    """One-shot brotli compression via the system encoder (fixture /
    oracle path — decode is the production direction)."""
    lib = _load_enc()
    if lib is None:
        raise NotImplementedError(
            "system libbrotlienc not found (see "
            "operators/brotlinative.py)")
    data = bytes(data)
    cap = int(lib.BrotliEncoderMaxCompressedSize(len(data))) or \
        (len(data) + 1024)
    out = ctypes.create_string_buffer(cap)
    size = ctypes.c_size_t(cap)
    # mode 0 = BROTLI_MODE_GENERIC
    ok = lib.BrotliEncoderCompress(int(quality), int(lgwin), 0,
                                   len(data), data,
                                   ctypes.byref(size), out)
    if not ok:
        raise ValueError("brotli: encode failed")
    return out.raw[:size.value]
