"""Content sniffing (functions/mime.py): WHATWG byte patterns over
every container the codec set produces — REAL encoder output where the
engine has an encoder, spec-magic prefixes otherwise — plus the
markup probe, BOMs, the binary/text fallback, and the scan-stage pin.
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions import (detect_mime,
                                                is_binary_payload)


def _mimes(spark, cases):
    df = spark.createDataFrame(list(cases), ["name", "payload"])
    rows = df.select("name", detect_mime("payload").alias("m")).collect()
    return {r.name: r.m for r in rows}


def _real_payloads():
    """Engine-encoded bytes — sniffing must recognize its own output."""
    from datasketches_spark_spark.operators.audiocodec import encode_wav
    from datasketches_spark_spark.operators.avicodec import (
        encode_avi_rgb)
    from datasketches_spark_spark.operators.flaccodec import encode_flac
    from datasketches_spark_spark.operators.gifcodec import encode_gif
    from datasketches_spark_spark.operators.imagecodec import (
        encode_bmp, encode_ppm)
    from datasketches_spark_spark.operators.jpegcodec import encode_jpeg
    from datasketches_spark_spark.operators.pngcodec import encode_png
    from datasketches_spark_spark.operators.tiffcodec import encode_tiff
    img = (np.arange(256, dtype=np.uint8)
           .reshape(8, 8, 4)[:, :, :3].copy())
    gray = np.full((16, 16), 128, np.uint8)
    pcm = (np.sin(np.arange(400) / 7.0) * 12000).astype(np.int16)
    frames = [np.full((8, 8, 3), v, np.uint8) for v in (10, 200)]
    return [
        ("png", bytes(encode_png(img)), "image/png"),
        ("bmp", bytes(encode_bmp(img)), "image/bmp"),
        ("ppm", bytes(encode_ppm(img)), "image/x-portable-pixmap"),
        ("jpeg", bytes(encode_jpeg(gray)), "image/jpeg"),
        ("gif", bytes(encode_gif(img)), "image/gif"),
        ("tiff", bytes(encode_tiff(img)), "image/tiff"),
        ("wav", bytes(encode_wav(pcm, 8000)), "audio/wave"),
        ("flac", bytes(encode_flac(pcm, 8000)), "audio/flac"),
        ("avi", bytes(encode_avi_rgb(frames, 4)), "video/avi"),
        ("gzip", gzip.compress(b"member"), "application/gzip"),
    ]


SPEC_CASES = [
    # magic-only formats (no engine encoder): spec prefixes
    ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
    ("id3", b"ID3\x04\x00\x00\x00\x00\x00\x00", "audio/mpeg"),
    ("mp3sync", b"\xff\xfb\x90\x44" + b"\x00" * 8, "audio/mpeg"),
    # ADTS AAC: layer bits 00 put byte 2 in {F0,F1,F8,F9} (r18)
    ("adts", b"\xff\xf1\x4c\x80\x1e\x7f\xfc" + b"\x00" * 8,
     "audio/aac"),
    ("adts_crc", b"\xff\xf0\x4c\x80\x1e\x7f\xfc\x00\x00" + b"\x00" * 8,
     "audio/aac"),
    ("ogg", b"OggS\x00\x02", "application/ogg"),
    # full 0x18-byte ftyp box (WHATWG requires length >= box size)
    ("mp4", b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomavc1",
     "video/mp4"),
    # 'ftyp' at offset 4 is NOT enough: the leading box-size field
    # must be plausible (>= 12, multiple of 4 — WHATWG), else text
    # payloads containing the bytes route to video/mp4 (r15 ADVICE)
    ("ftyptext", b"textftyp in prose, not a box header.", "text/plain"),
    ("ftypsize2", b"\x00\x00\x00\x02ftypisom\x00\x00\x02\x00",
     "application/octet-stream"),
    ("ftypodd", b"\x00\x00\x00\x1aftypisom\x00\x00\x02\x00",
     "application/octet-stream"),
    ("zip", b"PK\x03\x04\x14\x00", "application/zip"),
    ("zstd", b"\x28\xb5\x2f\xfd\x20\x00", "application/zstd"),
    ("pdf", b"%PDF-1.7\n%\xe2\xe3\xcf\xd3", "application/pdf"),
    # markup probe: WHATWG tag set, leading whitespace trimmed,
    # case-insensitive, space-or-'>' terminated
    ("doctype", b"  \t<!DOCTYPE html><html></html>", "text/html"),
    ("divtag", b"<div class='c'>x</div>", "text/html"),
    ("uppertag", b"<HTML><BODY>x", "text/html"),
    ("comment", b"<!-- page -->", "text/html"),
    ("xml", b"<?xml version=\"1.0\"?><urlset/>", "text/xml"),
    # '<p' only counts when terminated -> '<para>' is not the HTML
    # tag 'p' (but IS markup-shaped text -> text/plain fallback)
    ("notatag", b"<para>x</para>", "text/plain"),
    # BOMs outrank everything (a BOM'd payload is text by fiat)
    ("bom8", b"\xef\xbb\xbf<html>", "text/plain"),
    # note: codecs' utf-16-le does NOT prepend a BOM — build it
    ("bom16le", b"\xff\xfe" + "hi".encode("utf-16-le"), "text/plain"),
    ("bom16be", b"\xfe\xff" + "hi".encode("utf-16-be"), "text/plain"),
    ("bom16", "hi".encode("utf-16"), "text/plain"),
    # fallback split
    ("prose", b"Just plain prose; punctuation, digits 123.\n",
     "text/plain"),
    ("binary", b"\x01\x02\x03\x04 not text", "application/octet-stream"),
    ("empty", b"", "text/plain"),
]


class TestDetectMime:
    def test_engine_encoders_roundtrip(self, spark):
        cases = _real_payloads()
        got = _mimes(spark, [(n, b) for n, b, _ in cases])
        want = {n: m for n, _, m in cases}
        assert got == want

    @pytest.mark.parametrize("name,payload,want", SPEC_CASES)
    def test_spec_prefixes(self, spark, name, payload, want):
        assert _mimes(spark, [(name, payload)])[name] == want

    def test_null_payload_is_null(self, spark):
        df = spark.createDataFrame([("n", None)],
                                   "name string, payload binary")
        r = df.select(detect_mime("payload").alias("m"),
                      is_binary_payload("payload").alias("b")) \
              .collect()[0]
        assert r.m is None and r.b is None

    def test_binary_probe_window(self, spark):
        # a binary byte BEYOND the probe window doesn't flip the verdict
        late = b"a" * 600 + b"\x00"
        early = b"a" * 100 + b"\x00" + b"a" * 100
        got = _mimes(spark, [("late", late), ("early", early)])
        assert got == {"late": "text/plain",
                       "early": "application/octet-stream"}

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("x", b"abc")], ["name", "payload"])
        out = df.select(detect_mime("payload"),
                        is_binary_payload("payload"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()

    def test_routes_decoded_warc_bodies(self, spark):
        # the intended composition: http_decode_body_bytes output is
        # what gets sniffed (gzip Content-Encoding already reversed,
        # so the PNG magic is visible, not 1F8B)
        from datasketches_spark_spark.functions import (
            http_decode_body_bytes)
        from datasketches_spark_spark.operators.pngcodec import (
            encode_png)
        png = bytes(encode_png(np.full((4, 4, 3), 77, np.uint8)))
        body = gzip.compress(png)
        msg = (b"HTTP/1.1 200 OK\r\n"
               b"Content-Type: application/octet-stream\r\n"
               b"Content-Encoding: gzip\r\n\r\n" + body)
        df = spark.createDataFrame([(msg,)], "payload binary")
        out = df.select(
            detect_mime(http_decode_body_bytes("payload")).alias("m"),
            detect_mime("payload").alias("raw_m"))
        r = out.collect()[0]
        assert r.m == "image/png"
        # the undecoded message is headers + compressed body: the gzip
        # bytes inside the probe window make it binary, NOT image/png —
        # sniffing before decode routes wrong either way
        assert r.raw_m == "application/octet-stream"


class TestDetectOoxml:
    """r15: ZIP-subtype refinement — the package type lives in the
    member list, not the byte magic."""

    def test_office_triple_and_odf(self, spark):
        import io
        import zipfile
        from datasketches_spark_spark.functions import detect_ooxml
        from datasketches_spark_spark.operators.docxcodec import (
            encode_docx_text)
        from datasketches_spark_spark.operators.ooxmlcodec import (
            encode_pptx_text, encode_xlsx_cells)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            zi = zipfile.ZipInfo("mimetype")
            zi.compress_type = zipfile.ZIP_STORED
            z.writestr(zi, "application/vnd.oasis.opendocument.text")
        rows = [
            ("docx", encode_docx_text(["x"]),
             "application/vnd.openxmlformats-officedocument."
             "wordprocessingml.document"),
            ("xlsx", encode_xlsx_cells([["x"]]),
             "application/vnd.openxmlformats-officedocument."
             "spreadsheetml.sheet"),
            ("pptx", encode_pptx_text(["x"]),
             "application/vnd.openxmlformats-officedocument."
             "presentationml.presentation"),
            ("odf", buf.getvalue(),
             "application/vnd.oasis.opendocument.text"),
            ("plainzip", _plain_zip(), "application/zip"),
            ("brokenzip", b"PK\x03\x04 broken central dir",
             "application/zip"),
            ("notzip", b"%PDF-1.4", None),
        ]
        df = spark.createDataFrame([(n, bytearray(p))
                                    for n, p, _ in rows],
                                   ["name", "payload"])
        got = {r.name: r.m for r in df.select(
            "name", detect_ooxml("payload").alias("m")).collect()}
        assert got == {n: m for n, _, m in rows}

    def test_null_payload(self, spark):
        from datasketches_spark_spark.functions import detect_ooxml
        df = spark.createDataFrame([(None,)],
                                   "payload binary")
        assert df.select(detect_ooxml("payload").alias("m")) \
                 .collect()[0].m is None


def _plain_zip() -> bytes:
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "hi")
    return buf.getvalue()
