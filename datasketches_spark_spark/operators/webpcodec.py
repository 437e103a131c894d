"""Pure-Python/numpy WebP codec — VP8L (lossless) decode, plus a
minimal literal-mode VP8L encoder for self-contained roundtrips.

WebP's lossless stream (VP8L, RFC 9649 §3) is canonical-prefix-coded
LZ77 over ARGB pixels with four optional reversible transforms — no
DCT, no arithmetic coding — so, like PNG/GIF/FLAC, it is small enough
to implement directly and decode is bit-exact by construction.

Scope:

* decode: the full VP8L feature set — LSB-first bitstream; simple and
  code-length-coded canonical prefix codes (incl. repeat codes 16/17/18
  and the max_symbol form); color cache; meta-prefix (Huffman image)
  groups; LZ77 backward references with the 120-entry 2D distance map;
  all four transforms inverted in reverse order: PREDICTOR (all 14
  modes), COLOR, SUBTRACT_GREEN, COLOR_INDEXING (incl. sub-byte pixel
  packing for palettes <= 16 colors). Output ``(H, W, 3) uint8`` RGB or
  ``(H, W, 4)`` RGBA when any alpha < 255.
* Lossy VP8 (and the VP8X/ANIM container forms wrapping it) refuses by
  name — it needs the full VP8 intra predictor + bool-coder stack.
* encode: literal-mode VP8L (no transforms, no LZ77 refs, fixed
  complete prefix codes) — a valid stream any standard WebP decoder
  reads; exists so tests can roundtrip without native libraries.

No counterpart in the reference (no multimodal surface); closes the
WebP refusal in ``imagecodec.py`` the way jpeg/png/gif closed theirs.


Lossy VP8 decode stays an honest refusal for the same
VERIFIABILITY reason as MP3 sample decode (see
``mp3codec.py``): its coefficient-token trees and default
probability tables are large normative constants with no
reference codec in this container to validate against.
"""

from __future__ import annotations

import functools as _functools
import struct

import numpy as np

__all__ = ["decode_webp", "encode_webp_lossless", "is_webp", "webp_info"]


def is_webp(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WEBP")


def webp_info(data: bytes) -> dict:
    """Container metadata: format ('VP8L'/'VP8 '/'VP8X'), width, height
    (VP8L only — lossy dimensions live in the VP8 frame header)."""
    data = bytes(data)
    if not is_webp(data):
        raise ValueError("not a WebP (RIFF/WEBP signature missing)")
    pos = 12
    while pos + 8 <= len(data):
        fcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fcc == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            if not payload or payload[0] != 0x2F:
                raise ValueError("WebP: bad VP8L signature byte")
            bits = _Bits(payload, 8)
            w = bits.read(14) + 1
            h = bits.read(14) + 1
            return {"format": "VP8L", "width": w, "height": h}
        if fcc in (b"VP8 ", b"VP8X"):
            return {"format": fcc.decode().strip(), "width": None,
                    "height": None}
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no image chunk found")


class _Bits:
    """LSB-first bit reader (VP8L bit order — opposite of JPEG/FLAC)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("WebP: truncated VP8L stream")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "little")
        chunk >>= self.pos - first * 8
        self.pos = end
        return chunk & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Next ``n`` bits WITHOUT advancing, zero-padded past the end
        (the table-based prefix reader advances by the decoded code's
        real length and checks the bound itself)."""
        first = self.pos >> 3
        last = min((self.pos + n + 7) >> 3, len(self.data))
        chunk = int.from_bytes(self.data[first:last], "little")
        chunk >>= self.pos - first * 8
        return chunk & ((1 << n) - 1)


# ------------------------------------------------------------ prefix codes

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]


_BITREV16 = np.array([int(f"{i:016b}"[::-1], 2) for i in range(1 << 8)],
                     np.uint16)  # bit-reverse of i<<8 as a 16-bit value


class _Prefix:
    """Canonical prefix code decoded via a flat ``2^max_len``-entry
    lookup table: one ``peek`` + one table read per symbol instead of a
    bit-by-bit tree walk (r18 — the walk was ~70% of a small-image
    decode). Completeness is enforced at build time, so every peeked
    value maps to exactly one symbol; truncation is detected by the
    post-advance bound check, matching the walker's behavior."""

    __slots__ = ("single", "max_len", "lut")

    def __init__(self, lengths):
        lengths = np.asarray(lengths, np.int32)
        used = np.nonzero(lengths)[0]
        self.single = None
        if len(used) == 0:
            raise ValueError("WebP: empty prefix code")
        if len(used) == 1:
            self.single = int(used[0])
            return
        # canonical assignment (RFC 1951 style, bit-reversed per length
        # because VP8L reads bits LSB-first but assigns codes MSB-first)
        max_len = int(lengths.max())
        bl_count = np.bincount(lengths, minlength=max_len + 1)
        bl_count[0] = 0
        code = 0
        next_code = np.zeros(max_len + 1, np.int64)
        for ln in range(1, max_len + 1):
            code = (code + int(bl_count[ln - 1])) << 1
            next_code[ln] = code
        total = sum(int(bl_count[ln]) << (max_len - ln)
                    for ln in range(1, max_len + 1))
        if total != (1 << max_len):
            raise ValueError("WebP: prefix code is not complete")
        # vectorized canonical codes: symbols sorted by (length, symbol)
        # get consecutive codes within each length
        lens_a = lengths[used].astype(np.int64)
        order = np.argsort(lens_a, kind="stable")  # used asc already
        syms_a = used[order]
        lens_a = lens_a[order]
        # rank within each length run
        starts = np.r_[0, np.flatnonzero(np.diff(lens_a)) + 1]
        rank = np.arange(len(lens_a)) - np.repeat(
            starts, np.diff(np.r_[starts, len(lens_a)]))
        codes_a = next_code[lens_a] + rank
        # LSB-first table index = bit-reversed code (low `ln` bits):
        # reverse as a 16-bit value via the byte table, shift down
        rev16 = (_BITREV16[codes_a & 0xFF].astype(np.int64)
                 | (_BITREV16[(codes_a >> 8) & 0xFF].astype(np.int64)
                    >> 8))
        rev = rev16 >> (16 - lens_a)
        self.max_len = max_len
        lut_sym = np.empty(1 << max_len, np.int32)
        lut_len = np.empty(1 << max_len, np.int32)
        for ln in np.unique(lens_a):
            m = lens_a == ln
            pad = int(max_len - ln)
            fill = np.arange(1 << pad, dtype=np.int64) << int(ln)
            idx = (rev[m][:, None] | fill[None, :]).ravel()
            lut_sym[idx] = np.repeat(syms_a[m], 1 << pad)
            lut_len[idx] = int(ln)
        # plain Python list: scalar lookups are ~4x faster than numpy
        # element access in the per-symbol read loop
        self.lut = list(zip(lut_sym.tolist(), lut_len.tolist()))

    def read(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        sym, ln = self.lut[bits.peek(self.max_len)]
        bits.pos += ln
        if bits.pos > len(bits.data) * 8:
            raise ValueError("WebP: truncated VP8L stream")
        return sym


def _make_prefix(lengths) -> _Prefix:
    """LRU-memoized ``_Prefix`` build: the decode table is a pure
    function of the code-length vector, and real batches (and the
    fixture payloads) repeat the same handful of codes across many
    images — reuse the built table instead of rebuilding per image
    (r18). Bounded cache; keyed on the raw length bytes."""
    lengths = np.ascontiguousarray(lengths, np.int32)
    key = lengths.tobytes()
    hit = _PREFIX_CACHE.get(key)
    if hit is not None:
        return hit
    p = _Prefix(lengths)
    if len(_PREFIX_CACHE) >= 64:
        _PREFIX_CACHE.pop(next(iter(_PREFIX_CACHE)))
    _PREFIX_CACHE[key] = p
    return p


_PREFIX_CACHE: dict = {}


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    if bits.read(1):  # simple code
        n = bits.read(1) + 1
        first_8 = bits.read(1)
        s0 = bits.read(8 if first_8 else 1)
        lengths = np.zeros(alphabet_size, np.int32)
        if n == 2:
            s1 = bits.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size:
                raise ValueError("WebP: simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            if s0 >= alphabet_size:
                raise ValueError("WebP: simple-code symbol out of range")
            lengths[s0] = 1
        return _make_prefix(lengths)
    # code-length-coded
    num_codes = bits.read(4) + 4
    cl_lengths = np.zeros(19, np.int32)
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = bits.read(3)
    cl_code = _make_prefix(cl_lengths)
    max_symbol = alphabet_size
    if bits.read(1):  # use length / max_symbol
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("WebP: max_symbol exceeds alphabet")
    lengths = np.zeros(alphabet_size, np.int32)
    if cl_code.single is not None and cl_code.single < 16:
        # single-length cl code, no repeat symbols possible: the loop
        # below reads ZERO bits per entry and writes `single` into
        # every slot — emit the whole vector at once (r18; this was
        # 256 no-op reads per flat channel code)
        lengths[:min(alphabet_size, max_symbol)] = cl_code.single
        return _make_prefix(lengths)
    prev = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        cl = cl_code.read(bits)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + bits.read(2)
            lengths[sym:sym + rep] = prev
            sym += rep
        elif cl == 17:
            sym += 3 + bits.read(3)
        else:  # 18
            sym += 11 + bits.read(7)
    return _make_prefix(lengths)


# --------------------------------------------------------------- LZ77 bits

def _lz77_value(bits: _Bits, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


def _dist_map() -> list[tuple[int, int]]:
    """The 120-entry (dx, dy) close-neighborhood map (RFC 9649
    §3.6.2.3). Derived from the table's ordering rule — squared distance
    ascending, then dy descending, then dx descending — which reproduces
    the spec's listed prefix ((0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),
    (1,2),(-1,2),(2,1),(-2,1),...) exactly."""
    pts = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            pts.append((dx * dx + dy * dy, -dy, -dx))
    pts.sort()
    return [(-p[2], -p[1]) for p in pts[:120]]


_DIST_MAP = _dist_map()


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return max(d, 1)


# ------------------------------------------------------ entropy-coded image

_GREEN_BASE = 256 + 24


def _read_entropy_image(bits: _Bits, w: int, h: int,
                        allow_meta: bool) -> np.ndarray:
    """Decode one spatially-coded image (the main image or a transform
    subimage) to an (h, w, 4) uint8 ARGB array."""
    huffman_img = None
    hbits = 0
    if allow_meta and bits.read(1):  # meta prefix codes
        hbits = bits.read(3) + 2
        hw = (w + (1 << hbits) - 1) >> hbits
        hh = (h + (1 << hbits) - 1) >> hbits
        huffman_img = _read_entropy_image(bits, hw, hh, False)
    cache_bits = 0
    if bits.read(1):
        cache_bits = bits.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("WebP: invalid color cache size")
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None

    if huffman_img is None:
        n_groups = 1
        group_of = None
    else:
        # group index lives in (red << 8) | green of the huffman image
        gi = (huffman_img[:, :, 1].astype(np.int32) << 8) \
            | huffman_img[:, :, 2].astype(np.int32)
        n_groups = int(gi.max()) + 1
        group_of = gi

    groups = []
    green_size = _GREEN_BASE + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        g = _read_prefix_code(bits, green_size)
        r = _read_prefix_code(bits, 256)
        b = _read_prefix_code(bits, 256)
        a = _read_prefix_code(bits, 256)
        d = _read_prefix_code(bits, 40)
        groups.append((g, r, b, a, d))

    out = np.zeros(h * w, np.uint32)  # packed ARGB
    pos = 0
    total = h * w
    while pos < total:
        if group_of is not None:
            y, x = divmod(pos, w)
            g_idx = int(group_of[y >> hbits, x >> hbits])
            cg, cr, cb, ca, cd = groups[g_idx]
        else:
            cg, cr, cb, ca, cd = groups[0]
        sym = cg.read(bits)
        if sym < 256:  # literal
            red = cr.read(bits)
            blue = cb.read(bits)
            alpha = ca.read(bits)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[((px * 0x1E35A7BD) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
            pos += 1
        elif sym < _GREEN_BASE:  # backward reference
            length = _lz77_value(bits, sym - 256)
            dcode = cd.read(bits)
            dist = _plane_dist(_lz77_value(bits, dcode), w)
            if dist > pos or pos + length > total:
                raise ValueError("WebP: LZ77 reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[((px * 0x1E35A7BD) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:  # color cache
            if cache is None:
                raise ValueError("WebP: cache symbol without color cache")
            out[pos] = cache[sym - _GREEN_BASE]
            pos += 1

    argb = out.reshape(h, w)
    img = np.empty((h, w, 4), np.uint8)
    img[:, :, 0] = (argb >> 24) & 0xFF   # A
    img[:, :, 1] = (argb >> 16) & 0xFF   # R
    img[:, :, 2] = (argb >> 8) & 0xFF    # G
    img[:, :, 3] = argb & 0xFF           # B
    return img


# ------------------------------------------------------------- transforms

def _inv_subtract_green(img: np.ndarray) -> None:
    g = img[:, :, 2].astype(np.uint16)
    img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)


def _cdelta(t: int, c: int) -> int:
    """Signed color-transform delta: (int8(t) * int8(c)) >> 5
    (arithmetic shift, RFC 9649 §3.5.2)."""
    ti = t - 256 if t >= 128 else t
    ci = c - 256 if c >= 128 else c
    return (ti * ci) >> 5


def _inv_color_transform(img: np.ndarray, sub: np.ndarray,
                         tbits: int) -> None:
    """Invert the color transform. Transform-element channel map (the
    libwebp ColorCodeToMultipliers layout): blue = green_to_red,
    green = green_to_blue, red = red_to_blue. Inverse order: red first
    (from green), then blue (from green and the NEW red)."""
    h, w = img.shape[:2]
    for y in range(h):
        srow = sub[y >> tbits]
        for x in range(w):
            el = srow[x >> tbits]
            g2r = int(el[3])   # blue channel of the element
            g2b = int(el[2])   # green channel
            r2b = int(el[1])   # red channel
            g = int(img[y, x, 2])
            red = (int(img[y, x, 1]) + _cdelta(g2r, g)) & 0xFF
            blue = (int(img[y, x, 3]) + _cdelta(g2b, g)
                    + _cdelta(r2b, red)) & 0xFF
            img[y, x, 1] = red
            img[y, x, 3] = blue


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _inv_predictor(img: np.ndarray, sub: np.ndarray, pbits: int) -> None:
    """Invert the predictor transform in scan order (each pixel needs its
    already-reconstructed neighbors; RFC 9649 §3.5.1). Edge rules: (0,0)
    predicts 0xFF000000; the rest of row 0 predicts L; column 0 predicts
    T; TR at the right edge wraps to the current row's FIRST pixel (the
    contiguous-scan neighbor, already reconstructed). Per-pixel Python —
    fixture-scale budget, like the JPEG entropy loop."""
    h, w = img.shape[:2]
    px = img.astype(np.int32)
    black = np.array([255, 0, 0, 0], np.int32)
    for y in range(h):
        srow = sub[y >> pbits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                mode = int(srow[x >> pbits][2])  # green channel
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    # Select: p = L+T-TL; pick T when sum|p-T| <= sum|p-L|
                    # (|p-T| = |L-TL|, |p-L| = |T-TL|)
                    pT = int(np.abs(L - TL).sum())
                    pL = int(np.abs(T - TL).sum())
                    pred = T if pT <= pL else L
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    # ClampAddSubtractHalf(avg2(L,T), TL) per channel,
                    # with C-style truncation toward zero on the halving
                    a = _avg2(L, T)
                    d = a - TL
                    half = np.where(d >= 0, d >> 1, -((-d) >> 1))
                    pred = np.clip(a + half, 0, 255)
                else:
                    raise ValueError(f"WebP: predictor mode {mode}")
            px[y, x] = (px[y, x] + pred) & 0xFF
    img[:] = px.astype(np.uint8)


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray,
                        orig_w: int) -> np.ndarray:
    """Map index pixels (stored in the GREEN channel, possibly packed
    several-per-byte) through the palette."""
    n = len(palette)
    if n <= 2:
        width_bits = 3
    elif n <= 4:
        width_bits = 2
    elif n <= 16:
        width_bits = 1
    else:
        width_bits = 0
    h = img.shape[0]
    idx = img[:, :, 2]  # green holds the (packed) indices
    if width_bits:
        per = 1 << width_bits          # pixels per byte
        bits_per = 8 >> width_bits     # bits per pixel
        shifts = (np.arange(per) * bits_per)[None, None, :]
        mask = (1 << bits_per) - 1
        unpacked = ((idx[:, :, None].astype(np.uint16) >> shifts) & mask)
        idx = unpacked.reshape(h, -1)[:, :orig_w].astype(np.uint8)
    out = palette[np.clip(idx, 0, n - 1)]
    oob = idx >= n
    if oob.any():
        out[oob] = 0  # spec: out-of-range palette index -> 0x00000000
    return out


# ------------------------------------------------------------------ decode

def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP to ``(H, W, 3) uint8`` RGB, or ``(H, W, 4)`` RGBA
    when the image carries transparency. Lossless VP8L decodes in pure
    numpy (this module); lossy VP8 decodes through the SYSTEM libwebp
    when present (``webpnative.py`` — a spec-correct numpy VP8 decoder
    would need ~2k normative RFC 6386 constants that can only be
    transcribed, and production pipelines use the native codec anyway)
    and keeps the honest refusal with guidance otherwise. Corrupt
    streams raise ``ValueError``."""
    data = bytes(data)
    if not is_webp(data):
        raise ValueError("not a WebP (RIFF/WEBP signature missing)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fcc == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        if fcc == b"VP8 ":
            from .webpnative import libwebp_available, webp_decode_rgb
            if libwebp_available():
                return webp_decode_rgb(data)
            raise NotImplementedError(
                "WebP: lossy VP8 needs the full VP8 intra-prediction + "
                "boolean-coder stack; only lossless VP8L decodes in "
                "pure numpy. Install the system libwebp to enable the "
                "native lossy path (operators/webpnative.py)")
        if fcc == b"VP8X":
            # extended container: scan its sub-chunks for VP8L
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP: no VP8L chunk found")
    if not payload or payload[0] != 0x2F:
        raise ValueError("WebP: bad VP8L signature byte")
    bits = _Bits(payload, 8)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read(1)   # alpha hint
    if bits.read(3) != 0:
        raise ValueError("WebP: unknown VP8L version")

    transforms = []   # applied inverse in reverse order
    xsize = w
    while bits.read(1):
        ttype = bits.read(2)
        if ttype in (0, 1):  # predictor / color
            tb = bits.read(3) + 2
            sw = (xsize + (1 << tb) - 1) >> tb
            sh = (h + (1 << tb) - 1) >> tb
            sub = _read_entropy_image(bits, sw, sh, False)
            transforms.append((ttype, tb, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n = bits.read(8) + 1
            pal_img = _read_entropy_image(bits, n, 1, False)
            # palette entries are delta-coded component-wise
            pal = pal_img[0].astype(np.uint16)
            pal = np.cumsum(pal, axis=0).astype(np.uint8)  # mod-256 cumsum
            transforms.append((3, n, pal))
            if n <= 2:
                xsize = (xsize + 7) >> 3
            elif n <= 4:
                xsize = (xsize + 3) >> 2
            elif n <= 16:
                xsize = (xsize + 1) >> 1

    img = _read_entropy_image(bits, xsize, h, True)

    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:
            img = _inv_color_indexing(img, p2, w)
        elif ttype == 2:
            _inv_subtract_green(img)
        elif ttype == 1:
            _inv_color_transform(img, p2, p1)
        else:
            _inv_predictor(img, p2, p1)

    # ARGB -> RGB(A)
    a = img[:, :, 0]
    rgb = img[:, :, 1:4].copy()
    if (a != 255).any():
        return np.dstack([rgb, a])
    return rgb


# ------------------------------------------------------------------ encode

class _BitW:
    """LSB-first bit writer."""

    __slots__ = ("out", "cur", "n")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, v: int, bits: int):
        self.cur |= (v & ((1 << bits) - 1)) << self.n
        self.n += bits
        while self.n >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.n -= 8

    def flush(self):
        if self.n:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.n = 0


def _fixed_green_lengths() -> np.ndarray:
    """A complete 280-symbol code: 232 eight-bit + 48 nine-bit codes
    (232/256 + 48/512 = 1)."""
    lengths = np.full(_GREEN_BASE, 8, np.int32)
    lengths[232:280] = 9
    return lengths


def _write_code_lengths(w: _BitW, lengths: np.ndarray) -> None:
    """Emit a code-length-coded prefix code whose code-length alphabet
    uses fixed 3-bit... simplest valid form: all 19 length-codes coded,
    with a complete code over the set of lengths we actually use."""
    used = sorted(set(int(x) for x in lengths))
    cl_len = np.zeros(19, np.int32)
    w.write(0, 1)               # normal (code-length-coded)
    w.write(19 - 4, 4)          # all 19 code-length codes present
    if len(used) == 1:
        # single distinct length: a one-symbol code-length code — the
        # reader consumes ZERO bits per entry and fills the whole
        # alphabet with this length (complete by construction)
        cl_len[used[0]] = 1
        for sym in _CL_ORDER:
            w.write(int(cl_len[sym]), 3)
        w.write(0, 1)           # no max_symbol
        return
    # assign equal lengths (ceil log2) padded to completeness by giving
    # the first symbols one-bit-shorter codes when the count is not a
    # power of two — standard canonical construction over `used`.
    import math
    k = len(used)
    bitsn = max(1, math.ceil(math.log2(k)))
    # make a complete code: (2^bitsn - k) symbols get length bitsn-1
    shorter = (1 << bitsn) - k
    for i, sym in enumerate(used):
        cl_len[sym] = bitsn - 1 if i < shorter and bitsn > 1 else bitsn
    for sym in _CL_ORDER:
        w.write(int(cl_len[sym]), 3)
    w.write(0, 1)               # no max_symbol
    enc = _canonical_codes(cl_len)
    for ln in lengths:
        c, n = enc[int(ln)]
        w.write(_revbits(c, n), n)


def _canonical_codes(lengths: np.ndarray) -> dict:
    """symbol -> (code, nbits) canonical assignment (MSB-first codes)."""
    max_len = int(lengths.max())
    bl_count = np.bincount(lengths, minlength=max_len + 1)
    bl_count[0] = 0
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + int(bl_count[ln - 1])) << 1
        next_code[ln] = code
    out = {}
    for sym in range(len(lengths)):
        ln = int(lengths[sym])
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _revbits(v: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


@_functools.lru_cache(maxsize=1)
def _literal_mode_tables():
    """Constant side data for ``encode_webp_lossless`` literal mode:
    the four code-length-coded prefix headers + the distance simple
    code, pre-serialized as ONE (value, nbits) LSB-first bit segment,
    plus the pre-bit-reversed per-symbol code tables. Nothing here
    depends on the image — only on the fixed complete codes — so it is
    computed once per process (r18: building these per call was ~80%
    of a small-image encode)."""
    glen = _fixed_green_lengths()
    flat8 = np.full(256, 8, np.int32)
    wtr = _BitW()
    _write_code_lengths(wtr, glen)       # green+length
    for _ in range(3):                   # red, blue, alpha
        _write_code_lengths(wtr, flat8)
    # distance: simple code, single symbol 0 (never used)
    wtr.write(1, 1)
    wtr.write(0, 1)
    wtr.write(0, 1)
    wtr.write(0, 1)
    seg = (int.from_bytes(bytes(wtr.out), "little")
           | (wtr.cur << (8 * len(wtr.out))))
    segbits = 8 * len(wtr.out) + wtr.n
    genc = _canonical_codes(glen)
    benc = _canonical_codes(flat8)
    gcode = np.zeros(256, np.uint64)
    gbits = np.zeros(256, np.uint64)
    for sym in range(256):
        c, nb = genc[sym]
        gcode[sym] = _revbits(c, nb)
        gbits[sym] = nb
    bcode = np.zeros(256, np.uint64)
    for sym in range(256):
        c, nb = benc[sym]
        bcode[sym] = _revbits(c, nb)
    for a in (gcode, gbits, bcode):      # shared across calls: freeze
        a.setflags(write=False)
    return seg, segbits, gcode, gbits, bcode


# pixels per packing band (~35 MB scratch at <=33 bits/pixel); module
# constant so tests can shrink it to pin band-boundary byte-identity
_PACK_CHUNK = 1 << 20


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """Encode ``(H, W, 3) uint8`` RGB or ``(H, W, 4)`` RGBA as a
    literal-mode VP8L WebP (no transforms, no LZ77, fixed complete
    prefix codes) — valid for any standard WebP decoder; built for
    roundtrip tests."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless needs (H,W,3) or (H,W,4)")
    h, w_, c = img.shape
    if not (1 <= w_ <= 16384 and 1 <= h <= 16384):
        raise ValueError("encode_webp_lossless: dimensions out of range")
    alpha = img[:, :, 3] if c == 4 else np.full((h, w_), 255, np.uint8)

    wtr = _BitW()
    wtr.write(w_ - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(1 if (alpha != 255).any() else 0, 1)
    wtr.write(0, 3)             # version
    wtr.write(0, 1)             # no transforms
    wtr.write(0, 1)             # no color cache
    wtr.write(0, 1)             # no meta prefix codes

    # The prefix-code headers and symbol tables are CONSTANT (literal
    # mode always uses the same fixed complete codes), and building
    # them per call dominated small-image encodes (~80% of a 2 ms call:
    # 792 _revbits + 4 _write_code_lengths per image). Emit the cached
    # pre-serialized bit segment and reuse the cached code tables —
    # bit-identical output (r18; the DEFLATE-fixed-tables pattern).
    seg, segbits, gcode, gbits, bcode = _literal_mode_tables()
    wtr.write(seg, segbits)

    # Vectorized pixel stream: each pixel emits green(8-9b) + red(8b)
    # + blue(8b) + alpha(8b), all codes pre-bit-reversed; fuse the four
    # codes into one <=33-bit value per pixel and bit-pack the whole
    # stream with numpy (33 masked scatter ops + one packbits) instead
    # of a per-pixel Python loop — this was the repo's slowest inner
    # loop (round-9 verdict item #5).

    gn = gbits[img[:, :, 1].ravel()]
    val = (gcode[img[:, :, 1].ravel()]
           | (bcode[img[:, :, 0].ravel()] << gn)
           | (bcode[img[:, :, 2].ravel()] << (gn + np.uint64(8)))
           | (bcode[alpha.ravel()] << (gn + np.uint64(16))))
    nb = gn + np.uint64(24)

    # Pack in pixel bands of _PACK_CHUNK, carrying the partial-byte
    # writer state between bands: the scratch bit array is one byte per
    # OUTPUT BIT (~33 B/pixel), so a whole-stream pack of a 16384^2
    # image would transiently need ~9 GB — banding bounds it at ~35 MB
    # while staying byte-identical (each band flushes whole bytes and
    # hands its tail bits to the next, exactly like the scalar writer).
    one = np.uint64(1)
    for lo in range(0, len(nb), _PACK_CHUNK):
        v = val[lo:lo + _PACK_CHUNK]
        b = nb[lo:lo + _PACK_CHUNK]
        pend_bits, pend_val = wtr.n, wtr.cur
        starts = np.empty(len(b), np.int64)
        starts[0] = pend_bits
        np.cumsum(b[:-1].astype(np.int64), out=starts[1:])
        starts[1:] += pend_bits
        total_bits = int(starts[-1] + int(b[-1]))
        bits = np.zeros(((total_bits + 7) // 8) * 8, np.uint8)
        for j in range(pend_bits):
            bits[j] = (pend_val >> j) & 1
        for j in range(int(b.max())):
            ju = np.uint64(j)
            if j < 24:
                bits[starts + j] = ((v >> ju) & one).astype(np.uint8)
            else:
                m = b > ju
                bits[starts[m] + j] = ((v[m] >> ju) & one).astype(np.uint8)
        packed = np.packbits(bits, bitorder="little")
        full = total_bits // 8
        wtr.out.extend(packed[:full].tobytes())
        wtr.n = total_bits % 8
        wtr.cur = int(packed[full]) if wtr.n else 0
    wtr.flush()

    payload = b"\x2f" + bytes(wtr.out)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
