"""Pure-numpy codecs for *uncompressed* image formats: PPM/PGM (Netpbm
``P6``/``P5``) and BMP (``BI_RGB``, 24/32-bit, ``BITMAPINFOHEADER``).

These give the multimodal suite one REAL decode -> transform -> encode
path end-to-end without native image libraries: the formats are plain
headers over raw pixel bytes, so numpy slicing is a complete decoder.
Baseline-sequential JPEG decodes through the pure-numpy
`jpegcodec` module, 8-bit PNG through `pngcodec`, and GIF through
`gifcodec` (round 8); the remaining compressed formats stay honestly
stubbed — ``decode_image`` raises ``NotImplementedError`` naming the
sniffed format for WebP/progressive-JPEG/16-bit-PNG payloads (inject a
real codec via the ``codec=`` hooks in ``operators.multimodal``).

No counterpart in the reference (it has no multimodal surface); this
backs the LLM-pipeline components the build plan adds beyond it.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_image",
    "decode_ppm",
    "encode_ppm",
    "decode_bmp",
    "encode_bmp",
    "resize_nearest",
    "image_features",
    "sniff_format",
]

_STUB_MAGICS = [
    (b"RIFF", "riff (webp/avi/wav container)"),
    (b"\x00\x00\x00", "mp4/iso-bmff"),
]


def sniff_format(data: bytes) -> str | None:
    """Best-effort container sniff from magic bytes; None = unknown."""
    if data[:2] in (b"P6", b"P5") and (len(data) > 2 and data[2:3].isspace()):
        return "ppm"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == b"GIF8":
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            return "avif"
        if brand in (b"mif1", b"msf1"):
            # format-agnostic HEIF structural brands: the codec hides
            # in the compatible-brands list
            return "avif" if b"avif" in data[12:32] else "heic"
        if brand in (b"heic", b"heix"):
            return "heic"
    for magic, name in _STUB_MAGICS:
        if data.startswith(magic):
            return name
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode a payload to an ``(H, W, C) uint8`` array (C=1 grayscale,
    C=3 RGB). Uncompressed formats decode here; compressed ones raise."""
    data = bytes(data)
    fmt = sniff_format(data)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg
        return decode_jpeg(data)
    if fmt == "png":
        from .pngcodec import decode_png
        return decode_png(data)
    if fmt == "gif":
        from .gifcodec import decode_gif
        return decode_gif(data)
    if fmt == "webp":
        from .webpcodec import decode_webp
        return decode_webp(data)
    if fmt == "tiff":
        from .tiffcodec import decode_tiff
        return decode_tiff(data)
    if fmt == "avif":
        from .avifnative import avif_decode_rgb
        return avif_decode_rgb(data)
    if fmt == "heic":
        from .heifnative import heic_decode_rgb
        return heic_decode_rgb(data)
    raise NotImplementedError(
        f"no built-in codec for format {fmt or 'unknown'!r}: "
        "PPM/PGM (P6/P5), BMP (BI_RGB), baseline+progressive JPEG, "
        "PNG (all legal depths), GIF, lossless WebP (VP8L) and "
        "baseline TIFF (none/LZW/PackBits) decode without native "
        "image libraries; AVIF/HEIC decode via the system "
        "libavif/libheif where present; inject a codec for other "
        "compressed formats")


# ------------------------------------------------------------ PPM / PGM

def _ppm_tokens(data: bytes, need: int) -> tuple[list[int], int]:
    """Read ``need`` whitespace-separated ASCII integers after the magic,
    skipping ``#`` comments; returns (values, offset_past_last_token)."""
    vals: list[int] = []
    i, n = 2, len(data)
    while len(vals) < need:
        while i < n and data[i:i + 1].isspace():
            i += 1
        if i < n and data[i:i + 1] == b"#":
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {magic!r}")
    (w, h, maxval), off = _ppm_tokens(data, 3)
    channels = 3 if magic == b"P6" else 1
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"bad PPM maxval {maxval}")
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    count = w * h * channels
    px = np.frombuffer(data, dtype=dt, count=count, offset=off)
    if px.size < count:
        raise ValueError("truncated PPM pixel data")
    img = px.astype(np.uint8) if maxval <= 255 else (
        (px.astype(np.float64) * 255.0 / maxval).round().astype(np.uint8))
    return img.reshape(h, w, channels)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode ``(H, W, 3)`` as P6 or ``(H, W, 1)``/``(H, W)`` as P5."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 3:
        magic = b"P6"
    elif c == 1:
        magic = b"P5"
    else:
        raise ValueError(f"PPM supports 1 or 3 channels, got {c}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ------------------------------------------------------------------ BMP

def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP file")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} unsupported (BI_RGB only)")
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp {bpp} unsupported (24/32 only)")
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    px = rows[:, :w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB, drop alpha


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode ``(H, W, 3)`` RGB as a 24-bit BI_RGB bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"BMP encoder expects 3 channels, got {c}")
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    file_size = 54 + len(pix)
    return (b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                          2835, 2835, 0, 0) + pix)


# ------------------------------------------------------- transforms

def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    ri = np.minimum(((np.arange(height) + 0.5) * h / height), h - 1) \
        .astype(np.intp)
    ci = np.minimum(((np.arange(width) + 0.5) * w / width), w - 1) \
        .astype(np.intp)
    return img[ri][:, ci]


def average_hash(img: np.ndarray, grid: int = 8) -> str:
    """Perceptual average-hash (aHash): integer luma -> ``grid``x``grid``
    block means -> threshold at the global mean -> bit string packed
    row-major MSB-first, returned as fixed-width lowercase hex.

    All arithmetic is integer (luma = (299r+587g+114b)//1000, means are
    floor divisions), so the hash is bit-reproducible on any platform.
    Visually identical images hash equal even when their bytes differ —
    the basis for near-dup detection over image corpora. When the image
    dimensions don't divide ``grid``, a nearest resample to
    (``grid``, ``grid``) runs first (same pure index math as
    :func:`resize_nearest`).
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    px = img.astype(np.int64)
    if c >= 3:
        gray = (px[:, :, 0] * 299 + px[:, :, 1] * 587
                + px[:, :, 2] * 114) // 1000
    else:
        gray = px[:, :, 0]
    if h % grid or w % grid:
        gray = resize_nearest(gray, grid, grid)
        bh = bw = 1
    else:
        bh, bw = h // grid, w // grid
    blocks = (gray.reshape(grid, bh, grid, bw).sum(axis=(1, 3))
              // (bh * bw))
    mean = int(blocks.sum()) // (grid * grid)
    bits = (blocks > mean).astype(np.uint64).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, f"0{grid * grid // 4}x")


def image_features(img: np.ndarray) -> dict:
    """Decoded-pixel features: dimensions + per-channel means (grayscale
    reports its single mean on all three channels)."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    means = img.mean(axis=(0, 1))
    r, g, b = (means[0], means[1], means[2]) if c >= 3 else (means[0],) * 3
    return {"width": int(w), "height": int(h), "channels": int(c),
            "mean_r": float(r), "mean_g": float(g), "mean_b": float(b)}
