"""Pure-Python PNG codec (operators/pngcodec.py): lossless roundtrips,
per-spec filter decoding, palette/transparency, refusals."""

import struct
import zlib

import numpy as np
import pytest

from datasketches_spark_spark.operators.pngcodec import (
    decode_png, encode_png)


def _chunk(ctype, payload):
    body = ctype + payload
    return struct.pack(">I", len(payload)) + body \
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def _gray_png(filters, rows, color=0):
    h, w = len(rows), len(rows[0])
    scan = b"".join(bytes([f]) + bytes(r) for f, r in zip(filters, rows))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))


def _ref_unfilter(filters, rows, bpp=1):
    """Per-spec scalar unfilter (RFC 2083 §6) to cross-check the
    vectorized decoder."""
    h, w = len(rows), len(rows[0])
    out = [[0] * w for _ in range(h)]
    for y in range(h):
        for i in range(w):
            x = rows[y][i]
            a = out[y][i - bpp] if i >= bpp else 0
            b = out[y - 1][i] if y > 0 else 0
            c = out[y - 1][i - bpp] if (y > 0 and i >= bpp) else 0
            f = filters[y]
            if f == 0:
                r = x
            elif f == 1:
                r = (x + a) & 0xFF
            elif f == 2:
                r = (x + b) & 0xFF
            elif f == 3:
                r = (x + ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                r = (x + pr) & 0xFF
            out[y][i] = r
    return np.array(out, np.uint8)


def test_lossless_roundtrips_all_shapes():
    rng = np.random.default_rng(3)
    for shape in [(8, 8), (13, 7), (20, 32, 3), (9, 5, 4), (1, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_png(encode_png(img))
        assert dec.shape == img.shape and np.array_equal(dec, img), shape


def test_all_five_filters_match_spec():
    rng = np.random.default_rng(5)
    filters = [0, 1, 2, 3, 4, 4, 3, 1, 2, 0]
    rows = [list(rng.integers(0, 256, 17)) for _ in filters]
    dec = decode_png(_gray_png(filters, rows))
    assert np.array_equal(dec, _ref_unfilter(filters, rows))


def test_palette_with_transparency():
    scan = b"".join(b"\x00" + bytes(r) for r in [[0, 1], [1, 0]])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
           + _chunk(b"tRNS", bytes([128]))
           + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))
    dec = decode_png(png)
    assert dec.shape == (2, 2, 4)
    assert list(dec[0, 0]) == [255, 0, 0, 128]
    assert list(dec[0, 1]) == [0, 255, 0, 255]


def test_16bit_decodes_scaled():
    """16-bit samples (big-endian) decode to their high bytes; filters
    run byte-wise with bpp doubled."""
    rng = np.random.default_rng(11)
    hi = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    lo = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    samples = np.dstack([hi, lo]).reshape(6, 10)  # interleave hi/lo
    scan = b"".join(  # Up filter per row
        b"\x02" + (((samples[y].astype(int)
                     - (samples[y - 1] if y else 0)) % 256)
                    .astype(np.uint8).tobytes())
        for y in range(6))
    ihdr = struct.pack(">IIBBBBB", 5, 6, 16, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), hi)


def test_adam7_interlace_decodes():
    """All 7 Adam7 passes, each None-filtered, reassemble to the
    original 9x10 grayscale image."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (9, 10), dtype=np.uint8)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + bytes(row)
    ihdr = struct.pack(">IIBBBBB", 10, 9, 8, 0, 0, 0, 1)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), img)


def test_refusals_by_name():
    ihdr_p16 = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_p16))
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="invalid bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_bad))
    ihdr_rgb4 = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="only valid for"):
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr_rgb4))


def _pack_bits(img, depth):
    """Pack (H, W) samples into big-endian-bit scanline bytes."""
    h, w = img.shape
    n = 8 // depth
    pw = -(-w // n) * n
    padded = np.zeros((h, pw), np.uint8)
    padded[:, :w] = img
    grouped = padded.reshape(h, pw // n, n)
    shifts = (np.arange(n - 1, -1, -1) * depth)[None, None, :]
    return (grouped << shifts).sum(axis=2).astype(np.uint8)


def _sub8_png(img, depth, color, plte=None, interlace=0, filters=None):
    h, w = img.shape
    raw = bytearray()
    passes = ([(0, 0, 1, 1)] if interlace == 0 else
              [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)])
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        packed = _pack_bits(sub, depth)
        for y, row in enumerate(packed):
            f = filters[y] if (filters and interlace == 0) else 0
            if f == 1:      # forward Sub on the packed bytes (bpp=1)
                enc = np.empty_like(row)
                enc[0] = row[0]
                enc[1:] = (row[1:].astype(int) - row[:-1].astype(int)) % 256
            elif f == 2:    # forward Up
                prevrow = packed[y - 1] if y else np.zeros_like(row)
                enc = ((row.astype(int) - prevrow.astype(int)) % 256) \
                    .astype(np.uint8)
            else:
                enc = row
            raw += bytes([f]) + bytes(enc)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(np.asarray(plte, np.uint8).ravel()))
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8_grayscale_decodes_scaled(depth):
    """1/2/4-bit grayscale: packed scanlines (width not a multiple of the
    pixels-per-byte count exercises the partial last byte) decode to
    full-range 8-bit, through None/Sub/Up filters on the packed bytes."""
    rng = np.random.default_rng(depth)
    img = rng.integers(0, 1 << depth, (7, 11), dtype=np.uint8)
    filters = [0, 1, 2, 1, 0, 2, 1]
    png = _sub8_png(img, depth, color=0, filters=filters)
    got = decode_png(png)
    scale = 255 // ((1 << depth) - 1)
    assert got.shape == (7, 11)
    assert np.array_equal(got, img * scale)


def test_4bit_palette_decodes():
    """The crawl-common case: GIF-era 4-bit palette images re-encoded as
    PNG. Indices map through PLTE to RGB."""
    rng = np.random.default_rng(44)
    img = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    got = decode_png(_sub8_png(img, 4, color=3, plte=plte))
    assert got.shape == (9, 13, 3)
    assert np.array_equal(got, plte[img])


def test_1bit_interlaced_grayscale():
    """Adam7 + 1-bit packing: each pass packs its own scanlines."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 2, (10, 9), dtype=np.uint8)
    got = decode_png(_sub8_png(img, 1, color=0, interlace=1))
    assert np.array_equal(got, img * 255)


def test_corrupt_raises_valueerror():
    with pytest.raises(ValueError):
        decode_png(b"\x00" * 16)
    good = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[:30])


def test_decode_image_dispatches_png():
    from datasketches_spark_spark.operators import decode_image
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)
