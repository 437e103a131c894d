"""Pure-Python/numpy PNG codec (RFC 2083 / ISO 15948).

PNG's entropy layer is DEFLATE, which the Python standard library ships
(`zlib`) — so unlike JPEG there is no entropy coder to build: a complete
decoder is chunk parsing + `zlib.decompress` + scanline unfiltering.

Scope:

* decode: greyscale (color type 0), truecolor (2), palette (3),
  grey+alpha (4), truecolor+alpha (6) at 8-bit depth; 16-bit for the
  non-palette types (scaled to 8-bit output — the decode_image
  contract is uint8; filters run byte-wise per the spec either way);
  1/2/4-bit greyscale and palette (packed scanlines bit-unpacked after
  byte-wise unfiltering, greyscale scaled to the full 8-bit range);
  Adam7 interlace (all 7 passes, each unfiltered independently and
  scattered into place); all five scanline filters
  (None/Sub/Up/Average/Paeth); tRNS palette transparency folded into an
  alpha channel. Every legal IHDR depth/color combination decodes.
* encode: 8-bit greyscale / RGB / RGBA, Up-filtered scanlines (good
  compression on natural images, trivially reversible), one IDAT.

Unfiltering cost: Up/None rows are whole-row numpy ops; Sub rows are a
per-residue-class ``cumsum`` (mod 256); only Average/Paeth rows walk
pixels in Python, and real encoders emit them a minority of the time.
Everything else (palette lookup, channel stacking) is vectorized.

No counterpart in the reference (no multimodal surface); closes the
PNG refusal in `imagecodec.py` the same way `jpegcodec.py` closed
JPEG's.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "encode_png_palette"]

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to ``(H, W) uint8`` grayscale or ``(H, W, C)
    uint8`` with C in {2 (grey+alpha), 3 (RGB), 4 (RGBA)}; every legal
    bit depth (1/2/4/8/16 — 16-bit scales to 8-bit output, sub-8-bit
    greyscale scales to the full range), interlaced or not. Raises
    ``ValueError`` for corrupt streams."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    try:
        while pos < len(data):
            (length,) = struct.unpack(">I", data[pos:pos + 4])
            ctype = data[pos + 4:pos + 8]
            chunk = data[pos + 8:pos + 8 + length]
            pos += 12 + length  # length + type + data + CRC
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", chunk)
                if depth not in (1, 2, 4, 8, 16):
                    raise ValueError(f"PNG: invalid bit depth {depth}")
                if depth == 16 and color == 3:
                    raise ValueError("PNG: 16-bit palette is invalid")
                if depth < 8 and color not in (0, 3):
                    raise ValueError(
                        f"PNG: {depth}-bit depth is only valid for "
                        "grayscale/palette color types")
                if color not in _CHANNELS:
                    raise ValueError(f"PNG: invalid color type {color}")
                if comp != 0 or filt != 0:
                    raise ValueError("PNG: unknown compression/filter")
                ihdr = (w, h, color, depth, interlace)
            elif ctype == b"PLTE":
                plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
            elif ctype == b"tRNS":
                trns = np.frombuffer(chunk, np.uint8)
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
    except struct.error as e:
        raise ValueError(f"PNG: truncated stream: {e}") from e
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    if not idat:
        raise ValueError("PNG: missing IDAT")
    w, h, color, depth, interlace = ihdr
    ch = _CHANNELS[color]
    bpsample = depth // 8
    bpp = ch * bpsample
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG: bad DEFLATE stream: {e}") from e
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if depth < 8:
        # filters operate on the packed BYTES with bpp=1 (RFC 2083 §6.2);
        # unpack to one sample per pixel after unfiltering
        if interlace == 0:
            stride = (w * depth + 7) // 8
            if len(raw) < h * (stride + 1):
                raise ValueError("PNG: scanline data truncated")
            packed = _unfilter(raw, h, stride, 1).reshape(h, stride)
            idx = _unpack_bits(packed, w, depth)
        else:
            idx = np.zeros((h, w), np.uint8)
            pos = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                stride = (pw * depth + 7) // 8
                need = ph * (stride + 1)
                if len(raw) - pos < need:
                    raise ValueError(
                        "PNG: interlaced scanline data truncated")
                sub = _unpack_bits(
                    _unfilter(raw[pos:pos + need], ph, stride, 1)
                    .reshape(ph, stride), pw, depth)
                pos += need
                rows = np.arange(y0, h, dy)[:ph]
                cols = np.arange(x0, w, dx)[:pw]
                idx[np.ix_(rows, cols)] = sub
        if color == 3:
            if plte is None:
                raise ValueError("PNG: palette image without PLTE")
            rgb = plte[idx]
            if trns is not None:
                alpha = np.full(256, 255, np.uint8)
                alpha[:len(trns)] = trns
                return np.dstack([rgb, alpha[idx]])
            return rgb
        # grayscale: scale to the full 8-bit range (255/85/17 for 1/2/4)
        return (idx * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if interlace == 0:
        stride = w * bpp
        if len(raw) < h * (stride + 1):
            raise ValueError("PNG: scanline data truncated")
        flat = _unfilter(raw, h, stride, bpp)
    else:
        flat = _deinterlace_adam7(raw, w, h, bpp)
    if depth == 16:
        # high byte = standard 16->8 downscale; keeps decode_image's
        # uint8 contract
        flat = flat.reshape(-1, 2)[:, 0].copy()
    img = flat.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ch == 1:
        return img[:, :, 0]
    return img


def _unpack_bits(rows: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(h, stride) packed scanline bytes -> (h, width) samples; leftmost
    pixel lives in the high-order bits (RFC 2083 §2.3)."""
    n = 8 // depth
    shifts = (np.arange(n - 1, -1, -1) * depth)[None, None, :]
    mask = (1 << depth) - 1
    expanded = (rows[:, :, None] >> shifts) & mask
    return expanded.reshape(rows.shape[0], -1)[:, :width].astype(np.uint8)


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (RFC 2083 §6). Returns (h*stride,)
    uint8."""
    buf = np.frombuffer(raw, np.uint8)
    out = np.zeros((h, stride), np.uint16)  # uint16 workspace, mod 256 math
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        ftype = int(buf[y * (stride + 1)])
        line = buf[y * (stride + 1) + 1:(y + 1) * (stride + 1)] \
            .astype(np.uint16)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-residue-class cumsum mod 256
            rec = line.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = np.empty(stride, np.uint16)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, np.uint16)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                rec[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(-1)


_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _deinterlace_adam7(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images scattered into the
    full raster (RFC 2083 §8.2); returns (h*w*bpp,) uint8."""
    out = np.zeros((h, w * bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * bpp
        need = ph * (stride + 1)
        if len(raw) - pos < need:
            raise ValueError("PNG: interlaced scanline data truncated")
        sub = _unfilter(raw[pos:pos + need], ph, stride, bpp)             .reshape(ph, pw, bpp)
        pos += need
        rows = np.arange(y0, h, dy)[:ph]
        cols = np.arange(x0, w, dx)[:pw]
        full = out.reshape(h, w, bpp)
        full[np.ix_(rows, cols)] = sub
    return out.reshape(-1)


def encode_png_palette(idx: np.ndarray, palette: np.ndarray,
                       depth: int = 8, level: int = 6) -> bytes:
    """Encode ``(H, W)`` palette indices plus an ``(N, 3) uint8`` palette
    to a color-type-3 PNG at depth 1/2/4/8 (packed big-endian-bit
    scanlines, None filter, one IDAT). Decodable by this module's
    :func:`decode_png` and any standard PNG library."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if depth not in (1, 2, 4, 8):
        raise ValueError("encode_png_palette: depth must be 1/2/4/8")
    if idx.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError(
            "encode_png_palette needs (H,W) indices and (N,3) palette")
    if len(palette) > (1 << depth) or int(idx.max(initial=0)) >= (1 << depth):
        raise ValueError(
            f"encode_png_palette: indices/palette exceed {depth}-bit range")
    h, w = idx.shape
    if depth == 8:
        packed = idx
    else:
        n = 8 // depth
        pw = -(-w // n) * n
        padded = np.zeros((h, pw), np.uint8)
        padded[:, :w] = idx
        shifts = (np.arange(n - 1, -1, -1) * depth)[None, None, :]
        packed = (padded.reshape(h, pw // n, n) << shifts) \
            .sum(axis=2).astype(np.uint8)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), packed], axis=1)
    raw = zlib.compress(scan.tobytes(), level)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body \
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode ``(H, W) uint8`` grayscale or ``(H, W, {3,4}) uint8``
    RGB/RGBA to PNG (8-bit, Up-filtered, one IDAT). Decodable by this
    module's :func:`decode_png` and any standard PNG library."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, arr = 0, img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, arr = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, arr = 6, img
    else:
        raise ValueError("encode_png needs (H,W), (H,W,3) or (H,W,4)")
    h, w, ch = arr.shape
    flat = arr.reshape(h, w * ch).astype(np.int16)
    up = flat.copy()
    up[1:] = (flat[1:] - flat[:-1]) % 256
    scan = np.concatenate(
        [np.full((h, 1), 2, np.uint8), up.astype(np.uint8)], axis=1)
    raw = zlib.compress(scan.tobytes(), level)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body \
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))
