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
    # with the system libwebp present the VP8 branch decodes natively
    # (a 4-byte stream is corrupt -> ValueError); without it the branch
    # refuses by name
    from datasketches_spark_spark.operators.webpnative import (
        libwebp_available)
    if libwebp_available():
        with pytest.raises(ValueError):
            decode_webp(lossy)
    else:
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


# -------------------------------------------------- lossy VP8 (round 13)

import hashlib
import os

import pytest

from datasketches_spark_spark.operators.webpnative import (
    libwebp_available,
    webp_decode_rgb,
    webp_encode_lossless_rgb,
    webp_encode_rgb,
)

_DATA = os.path.join(os.path.dirname(__file__), "data")

# VP8 decoding is exactly specified (RFC 6386): every compliant decoder
# produces bit-identical pixels for these committed streams, so the
# hashes are stable across libwebp versions (and would also pin any
# future from-scratch decoder).
_LOSSY_FIXTURES = {
    "lossy_gradient_q80.webp": ((48, 64, 3),
                                "1f4490ee50c16fc18d0013b43eabc8f1"),
    "lossy_solid_q50.webp": ((32, 32, 3),
                             "743ed107a3825f56d95a43f899f56b5f"),
    "lossy_photo_q60.webp": ((40, 56, 3),
                             "2d8b975dc41a877d0f9b0305bf1a55ac"),
}

needs_libwebp = pytest.mark.skipif(
    not libwebp_available(), reason="system libwebp not present")


@needs_libwebp
class TestLossyVp8Native:
    @pytest.mark.parametrize("name", sorted(_LOSSY_FIXTURES))
    def test_committed_fixture_decodes_bit_exact(self, name):
        from datasketches_spark_spark.operators import decode_webp
        with open(os.path.join(_DATA, name), "rb") as fh:
            blob = fh.read()
        assert blob[12:16] == b"VP8 "  # genuinely lossy streams
        img = decode_webp(blob)  # the engine entry point, VP8 branch
        shape, md5 = _LOSSY_FIXTURES[name]
        assert img.shape == shape
        assert hashlib.md5(img.tobytes()).hexdigest() == md5

    def test_sniff_and_decode_image_dispatch(self):
        from datasketches_spark_spark.operators import decode_image
        from datasketches_spark_spark.operators.imagecodec import (
            sniff_format)
        with open(os.path.join(_DATA, "lossy_solid_q50.webp"), "rb") as fh:
            blob = fh.read()
        assert sniff_format(blob) == "webp"
        img = decode_image(blob)
        assert img.shape == (32, 32, 3)

    def test_lossy_roundtrip_tolerance(self):
        img = np.zeros((24, 40, 3), np.uint8)
        img[:, :, 0] = np.linspace(10, 240, 40, dtype=np.uint8)[None, :]
        img[:, :, 1] = 99
        img[:, :, 2] = np.linspace(240, 10, 24, dtype=np.uint8)[:, None]
        dec = webp_decode_rgb(webp_encode_rgb(img, 90.0))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16

    def test_corrupt_stream_raises_valueerror(self):
        # truncation mid-header is detectable corruption (an arithmetic
        # payload of zeros is not -- the bool decoder happily reads it)
        with open(os.path.join(_DATA, "lossy_photo_q60.webp"), "rb") as fh:
            blob = fh.read()
        with pytest.raises(ValueError):
            webp_decode_rgb(blob[:20])


@needs_libwebp
class TestVp8lCrossValidation:
    """The pure-numpy VP8L codec against the REAL library — the same
    live-foreign-system pattern as the datasketches-java wire checks.
    Until round 13 the numpy VP8L path was validated only by its own
    round-trips."""

    def _imgs(self):
        rng = np.random.RandomState(5)
        grad = np.zeros((16, 21, 3), np.uint8)
        grad[:, :, 0] = np.linspace(0, 255, 21, dtype=np.uint8)[None, :]
        grad[:, :, 1] = np.linspace(255, 0, 16, dtype=np.uint8)[:, None]
        grad[:, :, 2] = 128
        yield grad
        yield np.full((8, 8, 3), [7, 200, 13], np.uint8)
        yield rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
        pal = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 0]], np.uint8)
        yield pal[rng.randint(0, 3, (12, 29))]

    def test_numpy_encoder_decodes_in_libwebp(self):
        from datasketches_spark_spark.operators import encode_webp_lossless
        for img in self._imgs():
            blob = encode_webp_lossless(img)
            dec = webp_decode_rgb(blob)
            assert (dec == img).all(), "libwebp disagrees with numpy VP8L"

    def test_libwebp_encoder_decodes_in_numpy(self):
        from datasketches_spark_spark.operators import decode_webp
        for img in self._imgs():
            blob = webp_encode_lossless_rgb(img)
            dec = decode_webp(blob)
            assert (dec[:, :, :3] == img).all(), \
                "numpy VP8L decoder disagrees with libwebp encoder"


@needs_libwebp
class TestLossyVp8Spark:
    def test_mapinpandas_batch_decode(self, spark):
        """The Spark-side plumbing: lossy payloads decode inside an
        Arrow batch pass (the q38 'img' leg shape) with real pixels."""
        import pandas as pd
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType)
        rows = []
        for name in sorted(_LOSSY_FIXTURES):
            with open(os.path.join(_DATA, name), "rb") as fh:
                rows.append((name, bytearray(fh.read())))
        df = spark.createDataFrame(rows, "name string, payload binary") \
            .repartition(2)

        schema = StructType([
            StructField("name", StringType()),
            StructField("h", LongType()),
            StructField("w", LongType()),
            StructField("px_md5", StringType()),
        ])

        def run(batches):
            from datasketches_spark_spark.operators import decode_image
            for pdf in batches:
                out = []
                for name, payload in zip(pdf["name"], pdf["payload"]):
                    img = decode_image(bytes(payload))
                    out.append((name, img.shape[0], img.shape[1],
                                hashlib.md5(img.tobytes()).hexdigest()))
                yield pd.DataFrame(
                    out, columns=["name", "h", "w", "px_md5"])

        got = {r.name: (r.h, r.w, r.px_md5)
               for r in df.mapInPandas(run, schema).collect()}
        for name, (shape, md5) in _LOSSY_FIXTURES.items():
            assert got[name] == (shape[0], shape[1], md5)
