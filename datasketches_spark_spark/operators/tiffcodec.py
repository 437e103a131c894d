"""Baseline TIFF codec, pure numpy — scans/archives in a crawl corpus.

Implements the TIFF 6.0 baseline subset that covers the overwhelming
share of real-world TIFFs (decoder):

* both byte orders (``II``/``MM``), classic 32-bit offsets;
* first IFD, strip-based images (tiles refuse honestly);
* compression 1 (none), 5 (LZW, with the spec's EARLY code-width
  change and horizontal-differencing predictor 2) and 32773 (PackBits);
* photometric 0/1 (grayscale, MinIsWhite inverted to intensity),
  2 (RGB/RGBA chunky) and 3 (palette, 16-bit colormap scaled);
* 8 or 16 bits per sample (16-bit scales to 8-bit output — the PNG
  codec's convention — with the predictor applied at sample width),
  planar configuration 1 (chunky).

Encoder: uncompressed chunky grayscale/RGB, little-endian, strip per
image (the interchange form every TIFF reader accepts).

Validated live against the SYSTEM libtiff both ways
(``tests/test_tiff.py`` via ``operators/tiffnative.py``): numpy-encoded
files read back identically through ``TIFFReadRGBAImage``, and
libtiff-written LZW/PackBits/predictor files decode identically here —
the same cross-validation pattern as the VP8L/libwebp and
datasketches-java checks. No reference counterpart
(maropu/datasketches-spark has no media path); extension component.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_tiff", "tiff_info", "decode_tiff", "encode_tiff"]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}

# baseline tags
_T_WIDTH, _T_HEIGHT, _T_BITS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP = 262, 273, 277, 278
_T_STRIP_CNT, _T_PLANAR, _T_PREDICTOR, _T_COLORMAP = 279, 284, 317, 320
_T_TILE_W = 322


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, order: str):
    try:
        return _read_ifd_unchecked(data, order)
    except struct.error as e:
        raise ValueError(f"TIFF: truncated header/IFD ({e})") from None


def _read_ifd_unchecked(data: bytes, order: str):
    (off,) = struct.unpack(order + "I", data[4:8])
    if off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of bounds")
    (n,) = struct.unpack(order + "H", data[off:off + 2])
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(order + "HHI", data[e:e + 8])
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = data[e + 8:e + 8 + size]
        else:
            (voff,) = struct.unpack(order + "I", data[e + 8:e + 12])
            raw = data[voff:voff + size]
        if typ in (3,):      # SHORT
            vals = struct.unpack(order + f"{cnt}H", raw)
        elif typ in (4,):    # LONG
            vals = struct.unpack(order + f"{cnt}I", raw)
        elif typ in (1, 6, 7):
            vals = tuple(raw)
        elif typ == 5:       # RATIONAL
            nums = struct.unpack(order + f"{2 * cnt}I", raw)
            vals = tuple(nums[2 * j] / max(nums[2 * j + 1], 1)
                         for j in range(cnt))
        else:
            vals = (raw,)
        tags[tag] = vals
    return tags


def _order(data: bytes) -> str:
    if data[:2] == b"II":
        return "<"
    if data[:2] == b"MM":
        return ">"
    raise ValueError("not a TIFF (missing II/MM byte-order mark)")


def tiff_info(data: bytes) -> dict:
    """Header/IFD summary without decoding pixel data."""
    data = bytes(data)
    order = _order(data)
    t = _read_ifd(data, order)
    return {
        "byte_order": "little" if order == "<" else "big",
        "width": t.get(_T_WIDTH, (0,))[0],
        "height": t.get(_T_HEIGHT, (0,))[0],
        "bits_per_sample": tuple(t.get(_T_BITS, (1,))),
        "samples_per_pixel": t.get(_T_SPP, (1,))[0],
        "compression": t.get(_T_COMP, (1,))[0],
        "photometric": t.get(_T_PHOTO, (1,))[0],
        "n_strips": len(t.get(_T_STRIP_OFF, ())),
        "predictor": t.get(_T_PREDICTOR, (1,))[0],
        "tiled": _T_TILE_W in t,
    }


# ----------------------------------------------------------- decompressors

def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        b = src[i]
        i += 1
        if b < 128:                      # literal run of b+1 bytes
            out += src[i:i + b + 1]
            i += b + 1
        elif b > 128:                    # repeat next byte 257-b times
            out += src[i:i + 1] * (257 - b)
            i += 1
        # 128 = noop
    if len(out) < expected:
        raise ValueError("TIFF: PackBits strip shorter than expected")
    return bytes(out[:expected])


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, Clear=256, EOI=257,
    and the spec's EARLY code-width change (width grows one code
    sooner than the table-full point — TIFF 6.0 section 13)."""
    out = bytearray()
    bitpos = 0
    nbits = len(src) * 8
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal width, table, prev
        width = 9
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = None

    reset()
    while bitpos + width <= nbits and len(out) < expected:
        byte0 = bitpos >> 3
        chunk = src[byte0:byte0 + 4]
        val = int.from_bytes(chunk.ljust(4, b"\x00"), "big")
        code = (val >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: corrupt LZW stream (code gap)")
        out += entry
        prev = entry
        # early change: width grows when the NEXT added code would not
        # fit, evaluated one code early (len(table) == 2^width - 1)
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF: LZW strip shorter than expected")
    return bytes(out[:expected])


# ------------------------------------------------------------------ decode

def decode_tiff(data: bytes) -> np.ndarray:
    """Decode to ``(H, W) uint8`` grayscale or ``(H, W, 3|4) uint8``.

    Grayscale photometric 0 (MinIsWhite) inverts to intensity, matching
    ``TIFFReadRGBAImage``. Baseline subset only — tiles, planar=2,
    non-8-bit depths and other compressions refuse with guidance."""
    data = bytes(data)
    order = _order(data)
    t = _read_ifd(data, order)
    if _T_TILE_W in t:
        raise NotImplementedError(
            "TIFF: tiled layout not supported (baseline strips only)")
    w = t[_T_WIDTH][0]
    h = t[_T_HEIGHT][0]
    spp = t.get(_T_SPP, (1,))[0]
    bits = t.get(_T_BITS, (8,) * spp)
    comp = t.get(_T_COMP, (1,))[0]
    photo = t.get(_T_PHOTO, (1,))[0]
    planar = t.get(_T_PLANAR, (1,))[0]
    predictor = t.get(_T_PREDICTOR, (1,))[0]
    if planar != 1:
        raise NotImplementedError("TIFF: planar configuration 2 "
                                  "(separate planes) not supported")
    bps = bits[0]
    if any(b != bps for b in bits) or bps not in (8, 16):
        raise NotImplementedError(
            f"TIFF: only uniform 8/16 bits/sample supported (got {bits})")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF: compression {comp} not supported (baseline: none, "
            "LZW, PackBits)")
    offs = t.get(_T_STRIP_OFF)
    cnts = t.get(_T_STRIP_CNT)
    if not offs or not cnts:
        raise ValueError("TIFF: missing strip offsets/byte counts")
    rps = t.get(_T_ROWS_PER_STRIP, (h,))[0] or h
    row_bytes = w * spp * (bps // 8)
    raw = bytearray()
    rows_left = h
    for off, cnt in zip(offs, cnts):
        strip = data[off:off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF: strip out of bounds")
        need = min(rps, rows_left) * row_bytes
        if comp == 1:
            if len(strip) < need:
                raise ValueError("TIFF: uncompressed strip too short")
            raw += strip[:need]
        elif comp == 32773:
            raw += _unpackbits(strip, need)
        else:
            raw += _lzw_decode(strip, need)
        rows_left -= min(rps, rows_left)
    if bps == 16:
        # PNG-convention output: 16-bit samples scale to 8-bit (high
        # byte), AFTER the predictor runs at the 16-bit sample width
        wide = np.frombuffer(bytes(raw), dtype=order + "u2") \
            .reshape(h, w, spp)
        if predictor == 2:
            wide = np.cumsum(wide.astype(np.uint32),
                             axis=1).astype(np.uint16)
        elif predictor != 1:
            raise NotImplementedError(f"TIFF: predictor {predictor}")
        img = (wide >> 8).astype(np.uint8)
    else:
        img = np.frombuffer(bytes(raw), dtype=np.uint8) \
            .reshape(h, w, spp)
        if predictor == 2:
            img = np.cumsum(img.astype(np.uint32), axis=1).astype(
                np.uint8).reshape(h, w, spp)
        elif predictor != 1:
            raise NotImplementedError(f"TIFF: predictor {predictor}")
    if photo == 3:
        cmap = t.get(_T_COLORMAP)
        if not cmap:
            raise ValueError("TIFF: palette image without colormap")
        n = len(cmap) // 3
        pal = (np.asarray(cmap, np.uint32).reshape(3, n).T >> 8) \
            .astype(np.uint8)
        return pal[img[:, :, 0]]
    if photo == 0:  # MinIsWhite -> invert to intensity
        img = 255 - img
    if spp == 1:
        return img[:, :, 0]
    return img


# ------------------------------------------------------------------ encode

def encode_tiff(img: np.ndarray) -> bytes:
    """``(H, W[, 1|3]) uint8`` -> uncompressed little-endian baseline
    TIFF (chunky, one strip row-group, photometric 1/2)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encoder expects (H, W) or (H, W, 1|3) uint8")
    h, w, spp = img.shape
    photo = 1 if spp == 1 else 2
    pixels = img.tobytes()
    entries = [
        (_T_WIDTH, 4, 1, w),
        (_T_HEIGHT, 4, 1, h),
        (_T_BITS, 3, spp, None),       # may need external value block
        (_T_COMP, 3, 1, 1),
        (_T_PHOTO, 3, 1, photo),
        (_T_STRIP_OFF, 4, 1, None),    # patched below
        (_T_SPP, 3, 1, spp),
        (_T_ROWS_PER_STRIP, 4, 1, h),
        (_T_STRIP_CNT, 4, 1, len(pixels)),
        (_T_PLANAR, 3, 1, 1),
    ]
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    bits_vals = struct.pack(f"<{spp}H", *([8] * spp))
    extra = b""
    if spp * 2 > 4:
        bits_off = data_off
        extra = bits_vals
        data_off += len(bits_vals)
    pix_off = data_off
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if tag == _T_BITS:
            if spp * 2 > 4:
                out += struct.pack("<HHII", tag, typ, cnt, bits_off)
            else:
                out += struct.pack("<HHI", tag, typ, cnt) \
                    + bits_vals.ljust(4, b"\x00")
        elif tag == _T_STRIP_OFF:
            out += struct.pack("<HHII", tag, typ, cnt, pix_off)
        elif typ == 3:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += pixels
    return bytes(out)
