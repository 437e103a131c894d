"""Pure-Python GIF codec (GIF87a/GIF89a).

GIF's entropy layer is variable-width LZW — small enough to implement
directly, so like PNG (`pngcodec.py`) this needs no native library: a
complete decoder is block parsing + LZW + palette lookup.

Scope:

* decode: GIF87a/GIF89a, global and local color tables, interlaced
  images (4-pass row reorder), Graphic Control Extension transparency
  (folded into an alpha channel), multi-frame files (``frame=`` selects;
  frames are decoded independently against the logical screen — full
  disposal compositing is out of scope and refused only when a frame
  actually needs it, i.e. when it does not cover the logical screen).
* encode: single-frame GIF89a with a 256-entry palette built from the
  image's distinct colors (refuses >256 distinct colors — that is what
  the FORMAT cannot hold; quantization is a modeling choice that does
  not belong in a codec), real LZW compression.

No counterpart in the reference (no multimodal surface); closes the
GIF refusal in `imagecodec.py` alongside `jpegcodec.py`/`pngcodec.py`.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "gif_frame_count"]


# ------------------------------------------------------------------- LZW

def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF variable-width LZW decode to `expected` index bytes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block payload
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    table: list[bytes] = []

    def reset_table():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev = None
    reset_table()
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF: corrupt LZW stream (code out of range)")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("GIF: LZW stream ended before the frame filled")
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF variable-width LZW encode."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    curbits = 0

    def emit(code, width):
        nonlocal cur, curbits
        cur |= code << curbits
        curbits += width
        while curbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            curbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if curbits:
        out.append(cur & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- decode

def _parse_blocks(data: bytes):
    """Yield (kind, payload) per block: 'gce' dicts and 'image' dicts."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    gce = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            payload = bytearray()
            while data[pos] != 0:
                size = data[pos]
                payload += data[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                flags, _delay, transp = struct.unpack(
                    "<BHB", bytes(payload[:4]))
                gce = {"transparent": transp if flags & 1 else None,
                       "disposal": (flags >> 2) & 7}
        elif b == 0x2C:  # image descriptor
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10])
            pos += 10
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1
            yield {"screen": (w, h), "rect": (left, top, iw, ih),
                   "interlaced": bool(ipacked & 0x40),
                   "palette": lct if lct is not None else gct,
                   "min_code": min_code, "lzw": bytes(lzw), "gce": gce}
            gce = None
        else:
            raise ValueError(f"GIF: unknown block 0x{b:02x}")


def gif_frame_count(data: bytes) -> int:
    """Number of image frames in the file."""
    try:
        return sum(1 for _ in _parse_blocks(bytes(data)))
    except (struct.error, IndexError) as e:
        raise ValueError(f"GIF: truncated or corrupt stream: {e}") from e


def decode_gif(data: bytes, frame: int = 0) -> np.ndarray:
    """Decode one GIF frame to ``(H, W, 3) uint8`` RGB, or ``(H, W, 4)``
    RGBA when the frame declares a transparent index. Frames that do not
    cover the logical screen (animation deltas needing disposal
    compositing) are refused by name."""
    data = bytes(data)
    try:
        frames = list(_parse_blocks(data))
    except (struct.error, IndexError) as e:
        raise ValueError(f"GIF: truncated or corrupt stream: {e}") from e
    if not frames:
        raise ValueError("GIF: no image data")
    if not (0 <= frame < len(frames)):
        raise ValueError(f"GIF: frame {frame} out of range "
                         f"({len(frames)} frames)")
    fr = frames[frame]
    w, h = fr["screen"]
    left, top, iw, ih = fr["rect"]
    if (left, top, iw, ih) != (0, 0, w, h):
        raise NotImplementedError(
            "GIF: frame is an animation delta (does not cover the "
            "logical screen); disposal compositing not supported")
    if fr["palette"] is None:
        raise ValueError("GIF: frame has no color table")
    idx = np.frombuffer(
        _lzw_decode(fr["min_code"], fr["lzw"], iw * ih), np.uint8)
    idx = idx.reshape(ih, iw)
    if fr["interlaced"]:
        out = np.empty_like(idx)
        rows = (list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2)))
        out[rows] = idx
        idx = out
    pal = fr["palette"]
    if int(idx.max()) >= len(pal):
        raise ValueError("GIF: pixel index outside color table")
    rgb = pal[idx]
    gce = fr["gce"]
    if gce and gce["transparent"] is not None:
        alpha = np.where(idx == gce["transparent"], 0, 255) \
            .astype(np.uint8)
        return np.dstack([rgb, alpha])
    return rgb


# ----------------------------------------------------------------- encode

def encode_gif(img: np.ndarray) -> bytes:
    """Encode ``(H, W, 3) uint8`` RGB (or ``(H, W) uint8`` grayscale) to
    a single-frame GIF89a. The palette is the image's distinct colors;
    more than 256 distinct colors is refused (the format's limit —
    quantize upstream if needed)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif needs (H,W) or (H,W,3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF: {len(colors)} distinct colors exceed the format's "
            "256-color table; quantize upstream")
    bits = max(1, int(len(colors) - 1).bit_length())
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), np.uint8)
    pal[:len(colors)] = colors
    min_code = max(2, bits)
    lzw = _lzw_encode(min_code, bytes(inverse.astype(np.uint8)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # descriptor
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
