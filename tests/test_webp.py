"""Pure-Python WebP/VP8L codec (operators/webpcodec.py): encoder
roundtrips plus hand-built bitstreams covering each decode feature —
transforms, LZ77 references (both distance forms), color cache, packed
palette indexing — and refusals."""

import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.webpcodec import (
    _GREEN_BASE,
    _BitW,
    _canonical_codes,
    _revbits,
    _write_code_lengths,
    decode_webp,
    encode_webp_lossless,
    is_webp,
    webp_info,
)


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _green_lengths(extra: int = 0) -> np.ndarray:
    """A complete code over 280+extra symbols: pad the 8/9-bit split."""
    n = _GREEN_BASE + extra
    lengths = np.full(n, 9, np.int32)
    short = 512 - n              # (512-n)*2/512 + ... solve completeness
    # k8 symbols at 8 bits + (n-k8) at 9 bits complete when
    # k8/256 + (n-k8)/512 = 1  ->  k8 = 512 - n
    lengths[:short] = 8
    return lengths


class _Builder:
    """Hand-builds a VP8L entropy-coded image body (after the transform
    section): code headers + a pixel/symbol stream."""

    def __init__(self, cache_bits: int = 0):
        self.w = _BitW()
        self.cache_bits = cache_bits

    def header(self, w, h, alpha_hint=0):
        self.w.write(w - 1, 14)
        self.w.write(h - 1, 14)
        self.w.write(alpha_hint, 1)
        self.w.write(0, 3)

    def begin_image(self, toplevel=True):
        if toplevel:
            self.w.write(0, 1)          # no meta prefix codes
        if self.cache_bits:
            self.w.write(1, 1)
            self.w.write(self.cache_bits, 4)
        else:
            self.w.write(0, 1)
        extra = (1 << self.cache_bits) if self.cache_bits else 0
        self.glen = _green_lengths(extra)
        flat8 = np.full(256, 8, np.int32)
        _write_code_lengths(self.w, self.glen)
        for _ in range(3):
            _write_code_lengths(self.w, flat8)
        # distance code: all 40 symbols at complete lengths
        # (24 x 5-bit + 16 x 6-bit: 24/32 + 16/64 = 1)
        dlen = np.full(40, 6, np.int32)
        dlen[:24] = 5
        _write_code_lengths(self.w, dlen)
        self.genc = _canonical_codes(self.glen)
        self.benc = _canonical_codes(flat8)
        self.denc = _canonical_codes(dlen)

    def _emit(self, enc, sym):
        c, n = enc[int(sym)]
        self.w.write(_revbits(c, n), n)

    def literal(self, a, r, g, b):
        self._emit(self.genc, g)
        self._emit(self.benc, r)
        self._emit(self.benc, b)
        self._emit(self.benc, a)

    def cache_ref(self, idx):
        self._emit(self.genc, _GREEN_BASE + idx)

    def lz77(self, length, dist_code_value, extra_bits=None):
        """length in 1..4 (no extra bits); dist_code_value is the RAW
        prefix value fed to the plane-code mapping."""
        assert 1 <= length <= 4
        self._emit(self.genc, 256 + (length - 1))
        # choose the distance prefix symbol for the wanted value
        if dist_code_value <= 4:
            self._emit(self.denc, dist_code_value - 1)
        else:
            code = 13  # offset 96, 5 extra bits: values 97..128
            assert 97 <= dist_code_value <= 128
            self._emit(self.denc, code)
            self.w.write(dist_code_value - 97, 5)

    def payload(self) -> bytes:
        self.w.flush()
        return b"\x2f" + bytes(self.w.out)


def test_roundtrip_rgb_rgba_and_info():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    data = encode_webp_lossless(img)
    assert is_webp(data)
    assert webp_info(data) == {"format": "VP8L", "width": 13, "height": 21}
    assert np.array_equal(decode_webp(data), img)
    rgba = rng.integers(0, 256, (6, 31, 4), dtype=np.uint8)
    rgba[0, 0, 3] = 7           # force a real alpha channel
    assert np.array_equal(decode_webp(encode_webp_lossless(rgba)), rgba)


def test_lz77_both_distance_forms():
    """Backward refs: dist value 1 maps to (0,1) = previous ROW via the
    2D close-neighborhood table; value 121 (>120) is the direct form =
    distance 1 = previous PIXEL."""
    b = _Builder()
    b.header(4, 2)
    b.w.write(0, 1)             # no transforms
    b.begin_image()
    for i in range(4):          # row 0: distinct literals
        b.literal(255, 10 * i, 20, 30)
    b.lz77(3, 1)                # copy 3 px from previous row ((0,1) -> w)
    b.lz77(1, 121)              # copy 1 px from previous pixel
    img = decode_webp(_wrap(b.payload()))
    assert img.shape == (2, 4, 3)
    assert np.array_equal(img[1, :3], img[0, :3])
    assert np.array_equal(img[1, 3], img[1, 2])


def test_color_cache():
    b = _Builder(cache_bits=4)
    b.header(3, 1)
    b.w.write(0, 1)             # no transforms
    b.begin_image()
    b.literal(255, 77, 88, 99)
    px = (255 << 24) | (77 << 16) | (88 << 8) | 99
    idx = ((px * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - 4)
    b.cache_ref(idx)
    b.cache_ref(idx)
    img = decode_webp(_wrap(b.payload()))
    assert (img == [77, 88, 99]).all()


def test_subtract_green_transform():
    b = _Builder()
    b.header(2, 1)
    b.w.write(1, 1)             # a transform follows
    b.w.write(2, 2)             # SUBTRACT_GREEN
    b.w.write(0, 1)             # no more transforms
    b.begin_image()
    # stored (r-g, g, b-g) mod 256 for final (100, 40, 240), (5, 200, 10)
    b.literal(255, (100 - 40) % 256, 40, (240 - 40) % 256)
    b.literal(255, (5 - 200) % 256, 200, (10 - 200) % 256)
    img = decode_webp(_wrap(b.payload()))
    assert img[0, 0].tolist() == [100, 40, 240]
    assert img[0, 1].tolist() == [5, 200, 10]


def _predict_forward(img):
    """Scalar forward residuals for predictor mode 12 over one block,
    per the spec edge rules — the test's independent reference."""
    h, w, _ = img.shape
    argb = np.zeros((h, w, 4), np.int32)
    argb[:, :, 0] = 255
    argb[:, :, 1:] = img
    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = argb[0, x - 1]
            elif x == 0:
                pred = argb[y - 1, 0]
            else:
                L, T, TL = argb[y, x - 1], argb[y - 1, x], argb[y - 1, x - 1]
                pred = np.clip(L + T - TL, 0, 255)
            res[y, x] = (argb[y, x] - pred) % 256
    return res


def test_predictor_transform_mode12():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    res = _predict_forward(img)
    b = _Builder()
    b.header(6, 5)
    b.w.write(1, 1)             # a transform follows
    b.w.write(0, 2)             # PREDICTOR
    b.w.write(1, 3)             # size_bits code 1 -> block 2^3=8: one block
    # sub-image 1x1: literal with green = mode 12
    sb = _Builder()
    sb.w = b.w
    sb.cache_bits = 0
    sb.begin_image(toplevel=False)
    sb.literal(255, 0, 12, 0)
    b.w.write(0, 1)             # no more transforms
    b.begin_image()
    for y in range(5):
        for x in range(6):
            a, r, g, bl = res[y, x]
            b.literal(int(a), int(r), int(g), int(bl))
    out = decode_webp(_wrap(b.payload()))
    assert np.array_equal(out, img)


def test_color_indexing_packed():
    """4-color palette -> 2-bit packed indices (4 pixels per byte)."""
    pal = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 0],
                    [255, 255, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 1, 0], [3, 3, 0, 2, 1, 1]], np.uint8)
    b = _Builder()
    b.header(6, 2)
    b.w.write(1, 1)             # a transform follows
    b.w.write(3, 2)             # COLOR_INDEXING
    b.w.write(len(pal) - 1, 8)
    # palette image: 4x1 literals, DELTA-coded per channel
    pb = _Builder()
    pb.w = b.w
    pb.begin_image(toplevel=False)
    prev = np.zeros(4, np.int32)       # ARGB
    for p in pal:
        cur = np.array([255, p[0], p[1], p[2]], np.int32)
        d = (cur - prev) % 256
        pb.literal(int(d[0]), int(d[1]), int(d[2]), int(d[3]))
        prev = cur
    b.w.write(0, 1)             # no more transforms
    b.begin_image()
    # packed index rows: xsize' = ceil(6/4) = 2 bytes per row, low bits
    # = leftmost pixel; indices ride the GREEN channel
    for y in range(2):
        for byte_i in range(2):
            chunk = idx[y, byte_i * 4:(byte_i + 1) * 4]
            packed = 0
            for i, v in enumerate(chunk):
                packed |= int(v) << (2 * i)
            b.literal(255, 0, packed, 0)
    out = decode_webp(_wrap(b.payload()))
    assert np.array_equal(out, pal[idx])


def test_refusals_and_corrupt():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    lossy = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")
    good = encode_webp_lossless(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:24])
    with pytest.raises(ValueError):
        webp_info(b"RIFF\x00\x00\x00\x00WAVE")


def test_encoder_band_boundary_byte_identity(monkeypatch):
    """The banded bit-packer (bounded scratch) is byte-identical to a
    one-shot pack: shrink the band to force many partial-byte carries
    mid-stream and compare whole files."""
    import numpy as np
    from datasketches_spark_spark.operators import webpcodec as wc
    from datasketches_spark_spark.operators import decode_webp

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    one_shot = wc.encode_webp_lossless(img)
    monkeypatch.setattr(wc, "_PACK_CHUNK", 17)
    banded = wc.encode_webp_lossless(img)
    assert banded == one_shot
    assert np.array_equal(decode_webp(banded), img)
