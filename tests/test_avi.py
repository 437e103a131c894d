"""MJPEG-AVI container codec (operators/avicodec.py) and the now-real
sample_frames path for video payloads."""

import numpy as np
import pytest
from pyspark.sql import Row

from datasketches_spark_spark.operators.avicodec import (
    avi_frame_payloads, avi_info, decode_avi_frame, encode_avi_mjpeg,
    is_avi, mjpeg_frame_sampler)


def _solid_frames(n=10, w=16, h=8):
    # gray values at even offsets from 128 -> exact JPEG roundtrip
    return [np.full((h, w), 128 + 2 * k, np.uint8) for k in range(n)]


def test_roundtrip_all_frames_exact():
    frames = _solid_frames()
    avi = encode_avi_mjpeg(frames, fps=5)
    assert is_avi(avi)
    payloads = avi_frame_payloads(avi)
    assert len(payloads) == len(frames)
    for p, f in zip(payloads, frames):
        assert np.array_equal(decode_avi_frame(p), f)


def test_header_metadata():
    info = avi_info(encode_avi_mjpeg(_solid_frames(), fps=5))
    assert info["total_frames"] == 10
    assert (info["width"], info["height"]) == (16, 8)
    assert info["usec_per_frame"] == 200_000
    assert info["codec"] == "MJPG"


def test_sampler_even_spacing():
    avi = encode_avi_mjpeg(_solid_frames(10))
    picks = mjpeg_frame_sampler(avi, 4)
    vals = [int(decode_avi_frame(p)[0, 0]) for p in picks]
    assert vals == [128, 134, 140, 146]  # frames 0, 3, 6, 9
    # asking for more frames than exist returns them all
    assert len(mjpeg_frame_sampler(avi, 99)) == 10


def test_non_mjpeg_frame_refused():
    with pytest.raises(NotImplementedError, match="Motion-JPEG"):
        decode_avi_frame(b"\x00\x01\x02\x03")


def test_corrupt_raises():
    with pytest.raises(ValueError):
        avi_info(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        avi_frame_payloads(b"not avi at all")


def test_sample_frames_real_for_avi(spark):
    """The Spark operator emits REAL decodable JPEG frames for AVI
    payloads (no injected decoder), and still byte-slices other
    payloads."""
    from datasketches_spark_spark.operators import sample_frames
    avi = encode_avi_mjpeg(_solid_frames(8))
    df = spark.createDataFrame([
        Row(id=1, payload=bytearray(avi)),
        Row(id=2, payload=bytearray(b"\x00" * 64)),
    ])
    out = {(r.id, r.frame_idx): bytes(r.frame)
           for r in sample_frames(df, "id", 4).collect()}
    vids = sorted(k for k in out if k[0] == 1)
    assert len(vids) == 4
    first = decode_avi_frame(out[(1, 0)])
    assert np.array_equal(first, np.full((8, 16), 128, np.uint8))
    # non-AVI payload keeps the documented byte-slice behavior
    assert len([k for k in out if k[0] == 2]) == 4
    assert out[(2, 0)] == b"\x00" * 16


def test_multistream_rec_grouped_avi():
    """Audio-first multi-stream AVI with 'rec ' interleave groups: frame
    extraction must follow the first vids stream's id (01 here, not 00)
    and descend into the rec groupings."""
    import struct
    import numpy as np
    from datasketches_spark_spark.operators.avicodec import (
        avi_frame_payloads, decode_avi_frame)
    from datasketches_spark_spark.operators.jpegcodec import encode_jpeg

    def chunk(fcc, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype, payload):
        return chunk(b"LIST", ltype + payload)

    img = np.full((8, 8, 3), 128, np.uint8)
    jpg = encode_jpeg(img)
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0x10, 2, 0, 2,
                       len(jpg), 8, 8, 0, 0, 0, 0)
    strh_a = (b"auds" + b"\x00" * 4 + struct.pack("<IHHIIIIIIIII",
              0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0, 0))
    strh_v = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII",
              0, 0, 0, 0, 1, 10, 0, 2, len(jpg), 0, 0, 0))
    strf_v = struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG",
                         8 * 8 * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh_a)
                     + chunk(b"strf", b"\x00" * 16))
               + lst(b"strl", chunk(b"strh", strh_v)
                     + chunk(b"strf", strf_v)))
    # movi: two rec groups, each audio (00wb) + video (01dc); plus a stray
    # top-level 00dc (audio-stream compressed chunk) that must NOT match
    movi = lst(b"movi",
               lst(b"rec ", chunk(b"00wb", b"\x01\x02")
                   + chunk(b"01dc", jpg))
               + chunk(b"00dc", b"\xde\xad")
               + lst(b"rec ", chunk(b"00wb", b"\x03\x04")
                     + chunk(b"01dc", jpg)))
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    frames = avi_frame_payloads(data)
    assert len(frames) == 2
    assert all(f == jpg for f in frames)
    assert decode_avi_frame(frames[0]).shape == (8, 8, 3)


class TestUncompressedRgb:
    def test_rgb_roundtrip_lossless(self):
        """encode_avi_rgb -> frame payloads -> BI_RGB decode recovers
        every frame bit-exactly (BI_RGB is lossless)."""
        import numpy as np
        from datasketches_spark_spark.operators.avicodec import (
            avi_frame_payloads, avi_video_format, decode_avi_frame,
            encode_avi_rgb)
        rng = np.random.default_rng(11)
        frames = [rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
                  for _ in range(3)]
        raw = encode_avi_rgb(frames)
        fmt = avi_video_format(raw)
        assert (fmt["width"], fmt["height"], fmt["bit_count"]) == (7, 5, 24)
        assert fmt["compression"] == b"\x00\x00\x00\x00"
        payloads = avi_frame_payloads(raw)
        assert len(payloads) == 3
        for p, orig in zip(payloads, frames):
            assert np.array_equal(decode_avi_frame(p, fmt), orig)

    def test_sampler_wraps_dib_as_standalone_bmp(self):
        """mjpeg_frame_sampler on a BI_RGB AVI emits self-describing BMP
        blobs that decode_image reads without any AVI context."""
        import numpy as np
        from datasketches_spark_spark.operators.avicodec import (
            encode_avi_rgb, mjpeg_frame_sampler)
        from datasketches_spark_spark.operators.imagecodec import decode_image
        frames = [np.full((4, 6, 3), [10 * k, 20, 30], dtype=np.uint8)
                  for k in range(5)]
        raw = encode_avi_rgb(frames)
        sampled = mjpeg_frame_sampler(raw, 2)
        assert len(sampled) == 2
        assert all(bytes(f[:2]) == b"BM" for f in sampled)
        assert np.array_equal(decode_image(sampled[0]), frames[0])
        assert np.array_equal(decode_image(sampled[1]), frames[4])

    def test_payload_without_format_refuses(self):
        import numpy as np
        import pytest
        from datasketches_spark_spark.operators.avicodec import (
            avi_frame_payloads, decode_avi_frame, encode_avi_rgb)
        raw = encode_avi_rgb([np.zeros((2, 2, 3), np.uint8)])
        (p,) = avi_frame_payloads(raw)
        with pytest.raises(NotImplementedError, match="BI_RGB"):
            decode_avi_frame(p)


def _gradient_frames(n=6, w=32, h=16, shift=0):
    out = []
    for k in range(n):
        row = (np.arange(w, dtype=np.float64) * 4 + 8 * k + shift)
        img = np.clip(np.tile(row, (h, 1)) % 200 + 20, 0, 255)
        out.append(img.astype(np.uint8))
    return out


class TestVideoPhashSignature:
    """r15: video_phash_signature — per-video ordered frame-pHash
    sequences; re-encoded copies collide, different footage separates,
    and the set-Jaccard column handles trimmed variants."""

    def test_reencode_collides_and_content_separates(self, spark):
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        a1 = encode_avi_mjpeg(_gradient_frames(), fps=5, quality=40)
        a2 = encode_avi_mjpeg(_gradient_frames(), fps=30,
                              quality=85)   # genuine re-encode
        b = encode_avi_mjpeg(_gradient_frames(shift=100), fps=5)
        df = spark.createDataFrame(
            [(1, bytearray(a1)), (2, bytearray(a2)), (3, bytearray(b))],
            "id long, payload binary")
        sig = {r.id: tuple(r.phash_seq)
               for r in video_phash_signature(df, "id", 4).collect()}
        assert len(sig[1]) == 4
        assert sig[1] == sig[2]   # same footage, new fps AND quality
        assert sig[1] != sig[3]           # different footage

    def test_set_jaccard_for_trimmed_variant(self, spark):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        full = encode_avi_mjpeg(_gradient_frames(8), fps=5)
        trimmed = encode_avi_mjpeg(_gradient_frames(8)[:6], fps=5)
        other = encode_avi_mjpeg(_gradient_frames(8, shift=100), fps=5)
        df = spark.createDataFrame(
            [(1, bytearray(full)), (2, bytearray(trimmed)),
             (3, bytearray(other))], "id long, payload binary")
        sig = video_phash_signature(df, "id", 8)
        a = sig.where("id = 1").select(
            F.col("phash_seq").alias("a"))
        pairs = a.crossJoin(
            sig.where("id != 1").select("id",
                                        F.col("phash_seq").alias("b")))
        jac = pairs.select(
            "id",
            (F.size(F.array_intersect("a", "b"))
             / F.size(F.array_union("a", "b"))).alias("j"))
        got = {r.id: r.j for r in jac.collect()}
        assert got[2] > 0.6               # trimmed variant overlaps
        assert got[3] == 0.0              # unrelated footage

    def test_exchange_budget(self, spark):
        """One aggregation exchange; pixels never shuffle (rows into
        the exchange are id + hex strings)."""
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        df = spark.createDataFrame(
            [(1, bytearray(encode_avi_mjpeg(_gradient_frames())))],
            "id long, payload binary")
        plan = video_phash_signature(df, "id", 4) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
