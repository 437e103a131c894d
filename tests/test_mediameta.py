"""Embedded media metadata extraction (r18,
operators/mediameta.py): EXIF (incl. the has_gps PII signal), ID3v2
across versions and encodings, Vorbis comments from all three
carriers, PNG text chunks, RIFF INFO, the one-call sniff dispatch,
and the Spark operator's loud-null contract."""

import struct

import numpy as np
import pytest


def struct_pack_be32(n: int) -> bytes:
    return struct.pack(">I", n)

from datasketches_spark_spark.operators.mediameta import (
    META_KEYS, build_exif_app1, build_id3v2, exif_info, id3_info,
    jpeg_add_exif, jpeg_add_xmp, media_metadata, pdf_meta_info,
    pdf_with_info, png_add_text, png_text_info, riff_info,
    vorbis_comment_info, wav_add_info)


def _img():
    return np.full((16, 16, 3), 120, np.uint8)


class TestExif:
    def test_full_roundtrip_with_gps_and_com(self):
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        j = jpeg_add_exif(
            encode_jpeg(_img()),
            {"make": "CamCo", "model": "X100", "artist": "ann",
             "software": "engine", "title": "a pic",
             "copyright": "cc"},
            orientation=6, gps=True,
            date_original="2024:05:01 10:00:00",
            comment="jpeg comment")
        r = exif_info(j)
        assert r["make"] == "CamCo" and r["model"] == "X100"
        assert r["artist"] == "ann" and r["title"] == "a pic"
        assert r["date"] == "2024:05:01 10:00:00"
        assert r["orientation"] == 6
        assert r["has_gps"] is True
        assert r["comment"] == "jpeg comment"
        assert r["copyright"] == "cc"
        assert r["n_fields"] == 10

    def test_no_gps_reads_false(self):
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        j = jpeg_add_exif(encode_jpeg(_img()), {"make": "M"})
        r = exif_info(j)
        assert r["has_gps"] is False and r["make"] == "M"

    def test_plain_jpeg_is_empty_not_error(self):
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        r = exif_info(encode_jpeg(_img()))
        assert r["n_fields"] == 0 and r["has_gps"] is False

    def test_bare_tiff_structure(self):
        app1 = build_exif_app1({"make": "TiffCam"}, orientation=3)
        r = exif_info(app1[6:])       # strip Exif\0\0 -> bare TIFF
        assert r["make"] == "TiffCam" and r["orientation"] == 3

    def test_refuses_non_image(self):
        with pytest.raises(ValueError, match="not a JPEG or TIFF"):
            exif_info(b"\x89PNG\r\n\x1a\n")


class TestId3:
    def test_v23_text_frames_and_comment(self):
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        raw = build_id3v2(
            {"title": "Song", "artist": "Band", "album": "LP",
             "date": "2021", "genre": "rock"},
            version=3, comment="nice") + build_frame_stream(b"x", 4)
        r = id3_info(raw)
        assert (r["title"], r["artist"], r["album"], r["date"],
                r["genre"], r["comment"]) == (
            "Song", "Band", "LP", "2021", "rock", "nice")
        assert media_metadata(raw) == r

    def test_v24_utf16(self):
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        raw = build_id3v2({"title": "Smörgås", "artist": "Ääkkö"},
                          version=4, utf16=True) \
            + build_frame_stream(b"x", 4)
        r = id3_info(raw)
        assert r["title"] == "Smörgås" and r["artist"] == "Ääkkö"

    def test_id3v1_trailer_fallback(self):
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        raw = (build_frame_stream(b"x", 4) + b"TAG"
               + b"V1 title".ljust(30, b"\x00")
               + b"V1 artist".ljust(30, b"\x00")
               + b"V1 album".ljust(30, b"\x00") + b"1999"
               + b"\x00" * 31)
        r = id3_info(raw)
        assert (r["title"], r["artist"], r["album"], r["date"]) == (
            "V1 title", "V1 artist", "V1 album", "1999")

    def test_v22_three_char_frames(self):
        # ID3v2.2: 3-char ids, 3-byte sizes, no frame flags
        body = b""
        for fid, val in ((b"TT2", b"old title"), (b"TP1", b"old art")):
            payload = b"\x00" + val
            body += fid + len(payload).to_bytes(3, "big") + payload
        n = len(body)
        raw = (b"ID3" + bytes([2, 0, 0])
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + body)
        r = id3_info(raw)
        assert r["title"] == "old title" and r["artist"] == "old art"

    def test_tag_level_unsynchronisation(self):
        # flag 0x80: every 0xFF in the tag is followed by a stuffed
        # 0x00 the reader must remove before parsing frames
        payload = b"\x00" + "danger ÿ title".encode("latin-1")
        frame = b"TIT2" + struct_pack_be32(len(payload)) \
            + b"\x00\x00" + payload
        stuffed = frame.replace(b"\xff", b"\xff\x00")
        n = len(stuffed)
        raw = (b"ID3" + bytes([3, 0, 0x80])
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + stuffed)
        assert id3_info(raw)["title"] == "danger ÿ title"

    def test_compressed_encrypted_frames_skipped(self):
        # a v2.3 frame with the compression flag set must be skipped,
        # not decoded as garbage; a clean frame after it still parses
        p1 = b"\x00" + b"zlibgarbagenotreally"
        f1 = b"TIT2" + struct_pack_be32(len(p1)) + b"\x00\x80" + p1
        p2 = b"\x00" + b"clean artist"
        f2 = b"TPE1" + struct_pack_be32(len(p2)) + b"\x00\x00" + p2
        n = len(f1 + f2)
        raw = (b"ID3" + bytes([3, 0, 0])
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + f1 + f2)
        r = id3_info(raw)
        assert r["title"] is None and r["artist"] == "clean artist"

    def test_refuses_untagged(self):
        with pytest.raises(ValueError, match="no ID3"):
            id3_info(b"no tags here at all, just text")


class TestVorbisComments:
    def test_flac_block(self):
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        f = encode_flac(np.zeros(256), 8000,
                        tags={"TITLE": "ft", "ARTIST": "fa",
                              "ENCODER": "enc", "ALBUM": "al"})
        r = vorbis_comment_info(f)
        assert (r["title"], r["artist"], r["software"],
                r["album"]) == ("ft", "fa", "enc", "al")
        assert media_metadata(f) == r

    @pytest.mark.parametrize("codec", ["opus", "vorbis"])
    def test_ogg_carriers(self, codec):
        from datasketches_spark_spark.operators.oggcodec import (
            build_ogg_stream)
        o = build_ogg_stream(
            b"s", 6, codec=codec, tags=b"vendorX",
            comments={"TITLE": "ot", "ARTIST": "oa",
                      "DATE": "2019", "DESCRIPTION": "dd"})
        r = vorbis_comment_info(o)
        assert (r["title"], r["artist"], r["date"],
                r["comment"]) == ("ot", "oa", "2019", "dd")

    def test_untagged_flac_is_empty(self):
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        r = vorbis_comment_info(encode_flac(np.zeros(256), 8000))
        assert r["n_fields"] == 0


class TestPngRiff:
    def test_png_text_and_ztxt(self):
        from datasketches_spark_spark.operators.pngcodec import (
            encode_png)
        p = png_add_text(encode_png(_img()),
                         {"Title": "t1", "Author": "au",
                          "Software": "sw", "Creation Time": "2018"})
        r = png_text_info(p)
        assert (r["title"], r["artist"], r["software"],
                r["date"]) == ("t1", "au", "sw", "2018")
        pz = png_add_text(encode_png(_img()),
                          {"Description": "zzz"}, compressed=True)
        assert png_text_info(pz)["comment"] == "zzz"

    def test_png_decodes_unchanged_after_insert(self):
        from datasketches_spark_spark.operators.pngcodec import (
            decode_png, encode_png)
        p = png_add_text(encode_png(_img()), {"Title": "x"})
        assert (decode_png(p) == _img()).all()

    def test_riff_info_wav(self):
        from datasketches_spark_spark.operators.audiocodec import (
            decode_wav, encode_wav)
        w = wav_add_info(encode_wav(np.zeros(128), 8000),
                         {"title": "wt", "artist": "wa",
                          "date": "2020", "software": "sw"})
        r = riff_info(w)
        assert (r["title"], r["artist"], r["date"],
                r["software"]) == ("wt", "wa", "2020", "sw")
        # the INFO chunk must not break audio decode
        samples, rate = decode_wav(w)
        assert rate == 8000 and len(samples) == 128


class TestXmp:
    def test_xmp_fills_and_exif_wins(self):
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        jx = jpeg_add_xmp(encode_jpeg(_img()),
                          {"title": "X Title", "artist": "X Artist",
                           "date": "2023-01-01T00:00:00",
                           "software": "xtool"})
        r = exif_info(jx)
        assert (r["title"], r["artist"], r["software"]) == (
            "X Title", "X Artist", "xtool")
        both = jpeg_add_xmp(
            jpeg_add_exif(encode_jpeg(_img()),
                          {"software": "exiftool"}),
            {"software": "xmptool", "title": "only from xmp"})
        r2 = exif_info(both)
        assert r2["software"] == "exiftool"     # EXIF precedence
        assert r2["title"] == "only from xmp"   # XMP fills the gap


class TestPdfInfo:
    def test_literal_strings_with_escapes(self):
        p = pdf_with_info(["page one"],
                          {"title": "T(itle)", "artist": "Au\\thor",
                           "software": "engine",
                           "date": "20240101120000",
                           "comment": "subj"})
        r = pdf_meta_info(p)
        assert r["title"] == "T(itle)"
        assert r["artist"] == "Au\\thor"
        assert r["date"] == "20240101120000"   # D: prefix stripped
        assert r["n_fields"] == 5
        assert media_metadata(p) == r

    def test_utf16_hex_strings(self):
        p = pdf_with_info(["x"], {"title": "Ünïcode Tïtle",
                                  "artist": "Åuthor"}, utf16=True)
        r = pdf_meta_info(p)
        assert r["title"] == "Ünïcode Tïtle"
        assert r["artist"] == "Åuthor"

    def test_encrypted_reports_blank_not_ciphertext(self):
        from datasketches_spark_spark.operators.pdfcodec import (
            encode_pdf_text_encrypted)
        r = pdf_meta_info(encode_pdf_text_encrypted(["secret"]))
        assert r["kind"] == "pdf" and r["n_fields"] == 0

    def test_no_info_dict_is_blank(self):
        from datasketches_spark_spark.operators.pdfcodec import (
            encode_pdf_text)
        assert pdf_meta_info(encode_pdf_text(["a"]))["n_fields"] == 0

    def test_pdf_still_extracts_text(self):
        from datasketches_spark_spark.operators.pdfcodec import (
            pdf_text)
        p = pdf_with_info(["page body text"], {"title": "t"})
        assert "page body text" in pdf_text(p)


class TestContainerTags:
    def test_mkv_simpletags(self):
        from datasketches_spark_spark.operators.mkvcodec import (
            build_mkv)
        from datasketches_spark_spark.operators.mediameta import (
            mkv_tags_info)
        k = build_mkv(subtitle_cues=[b"c"],
                      tag_fields={"title": "MK Title",
                                  "artist": "MK Artist",
                                  "date": "2005", "genre": "g1",
                                  "software": "mkmux"})
        r = mkv_tags_info(k)
        assert (r["title"], r["artist"], r["date"], r["genre"],
                r["software"]) == ("MK Title", "MK Artist", "2005",
                                   "g1", "mkmux")
        assert media_metadata(k) == r
        # the legacy single-TITLE tags param still parses
        assert mkv_tags_info(build_mkv(
            subtitle_cues=[b"c"], tags=b"old"))["title"] == "old"
        # untagged -> blank, not error
        assert mkv_tags_info(build_mkv(
            subtitle_cues=[b"c"]))["n_fields"] == 0

    def test_mp4_ilst(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        from datasketches_spark_spark.operators.mediameta import (
            mp4_tags_info)
        m = build_mp4(subtitle_cues=["x"],
                      tag_fields={"title": "M4 Title",
                                  "artist": "M4 Artist",
                                  "album": "M4 Alb", "date": "2022"})
        r = mp4_tags_info(m)
        assert (r["title"], r["artist"], r["album"], r["date"]) == (
            "M4 Title", "M4 Artist", "M4 Alb", "2022")
        assert media_metadata(m) == r

    def test_mp4_fullbox_meta_shape(self):
        # real iTunes files write meta as a FullBox (4 version/flags
        # bytes before the children) — build that shape by hand
        import struct as st
        from datasketches_spark_spark.operators.mp4codec import (
            _box, build_mp4)
        from datasketches_spark_spark.operators.mediameta import (
            mp4_tags_info)
        plain = build_mp4(subtitle_cues=["x"],
                          tag_fields={"title": "FB Title"})
        # locate the meta box and splice version/flags in
        i = plain.find(b"meta")
        assert i > 0
        sz = st.unpack_from(">I", plain, i - 4)[0]
        body = plain[i + 4:i - 4 + sz]
        full = st.pack(">I", sz + 4) + b"meta" + b"\x00" * 4 + body
        # rebuild a minimal container around the FullBox meta (the
        # spliced original would have stale moov/udta sizes)
        ftyp = plain[:plain.find(b"moov") - 4]
        doc = ftyp + _box(b"moov", _box(b"udta", full))
        assert mp4_tags_info(doc)["title"] == "FB Title"

    def test_webp_exif_xmp(self):
        from datasketches_spark_spark.operators.webpcodec import (
            encode_webp_lossless)
        from datasketches_spark_spark.operators.mediameta import (
            webp_add_metadata)
        w = webp_add_metadata(
            encode_webp_lossless(_img()),
            {"make": "WCam", "artist": "wann"}, gps=True,
            xmp_fields={"title": "W Title"})
        r = media_metadata(w)
        assert (r["kind"], r["make"], r["artist"], r["title"],
                r["has_gps"]) == ("exif", "WCam", "wann", "W Title",
                                  True)
        # plain WebP -> blank exif record
        r2 = media_metadata(encode_webp_lossless(_img()))
        assert r2["kind"] == "exif" and r2["n_fields"] == 0

    def test_png_exif_chunk(self):
        from datasketches_spark_spark.operators.pngcodec import (
            decode_png, encode_png)
        from datasketches_spark_spark.operators.mediameta import (
            png_add_exif)
        p = png_add_exif(encode_png(_img()), {"make": "PCam"},
                         orientation=5)
        r = png_text_info(p)
        assert r["make"] == "PCam" and r["orientation"] == 5
        assert r["kind"] == "png"
        assert (decode_png(p) == _img()).all()


class TestLyrics:
    def test_all_carriers(self):
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        from datasketches_spark_spark.operators.mediameta import (
            media_lyrics)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        from datasketches_spark_spark.operators.oggcodec import (
            build_ogg_stream)
        m = build_id3v2({"title": "s"},
                        lyrics=("eng", "verse one\nverse two")) \
            + build_frame_stream(b"x", 3)
        assert media_lyrics(m) == {"text": "verse one\nverse two",
                                   "lang": "eng"}
        f = encode_flac(np.zeros(64), 8000,
                        tags={"LYRICS": "flac verse"})
        assert media_lyrics(f) == {"text": "flac verse",
                                   "lang": None}
        o = build_ogg_stream(b"s", 4, codec="vorbis",
                             comments={"UNSYNCEDLYRICS": "ogg v"})
        assert media_lyrics(o)["text"] == "ogg v"
        p = build_mp4(subtitle_cues=["c"],
                      tag_fields={"lyrics": "mp4 verse"})
        assert media_lyrics(p)["text"] == "mp4 verse"

    def test_lyrics_atom_not_in_uniform_record(self):
        from datasketches_spark_spark.operators.mediameta import (
            mp4_tags_info)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        p = build_mp4(subtitle_cues=["c"],
                      tag_fields={"lyrics": "v", "title": "t"})
        r = mp4_tags_info(p)
        assert r["title"] == "t" and r["n_fields"] == 1

    def test_refusals(self):
        from datasketches_spark_spark.operators.mediameta import (
            media_lyrics)
        with pytest.raises(ValueError, match="no USLT"):
            media_lyrics(build_id3v2({"title": "x"}) + b"\xff\xfb")
        with pytest.raises(ValueError, match="unrecognized"):
            media_lyrics(b"PK\x03\x04")


class TestCoverArt:
    def _png(self):
        from datasketches_spark_spark.operators.pngcodec import (
            encode_png)
        return encode_png(
            np.arange(192, dtype=np.uint8).reshape(8, 8, 3))

    def test_all_five_carriers_roundtrip(self):
        import hashlib
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        from datasketches_spark_spark.operators.mediameta import (
            cover_art, flac_add_picture, ogg_cover_comment)
        from datasketches_spark_spark.operators.mkvcodec import (
            build_mkv)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        from datasketches_spark_spark.operators.oggcodec import (
            build_ogg_stream)
        png = self._png()
        carriers = {
            "id3": build_id3v2({"title": "s"},
                               cover=("image/png", png))
            + build_frame_stream(b"x", 3),
            "flac": flac_add_picture(
                encode_flac(np.zeros(64), 8000,
                            tags={"TITLE": "t"}),
                "image/png", png),
            "ogg": build_ogg_stream(
                b"s", 4, codec="opus",
                comments={"METADATA_BLOCK_PICTURE":
                          ogg_cover_comment("image/png", png)}),
            "mp4": build_mp4(subtitle_cues=["c"],
                             cover=("image/png", png)),
            "mkv": build_mkv(subtitle_cues=[b"c"],
                             attachments=[("cover.png",
                                           "image/png", png)]),
        }
        ref = hashlib.md5(png).hexdigest()
        for name, payload in carriers.items():
            c = cover_art(payload)
            assert c["mime"] == "image/png", name
            assert hashlib.md5(c["image"]).hexdigest() == ref, name

    def test_utf16_apic_description(self):
        # enc 1 description terminates on an ALIGNED \x00\x00 — a
        # hand-built frame whose description contains single nulls
        import struct as st
        from datasketches_spark_spark.operators.mediameta import (
            cover_art)
        png = self._png()
        desc = "Ω cover".encode("utf-16")      # BOM + 2-byte units
        payload = (b"\x01" + b"image/png\x00" + bytes([3])
                   + desc + b"\x00\x00" + png)
        frame = b"APIC" + st.pack(">I", len(payload)) + b"\x00\x00" \
            + payload
        n = len(frame)
        raw = (b"ID3" + bytes([3, 0, 0])
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + frame)
        assert cover_art(raw)["image"] == png

    def test_v22_pic_frame(self):
        from datasketches_spark_spark.operators.mediameta import (
            cover_art)
        png = self._png()
        payload = b"\x00" + b"PNG" + bytes([3]) + b"d\x00" + png
        frame = b"PIC" + len(payload).to_bytes(3, "big") + payload
        n = len(frame)
        raw = (b"ID3" + bytes([2, 0, 0])
               + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F]) + frame)
        c = cover_art(raw)
        assert c["mime"] == "image/png" and c["image"] == png

    def test_refusals(self):
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        from datasketches_spark_spark.operators.mediameta import (
            cover_art)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        for payload, msg in (
                (build_id3v2({"title": "x"})
                 + build_frame_stream(b"x", 2), "no APIC"),
                (encode_flac(np.zeros(64), 8000), "no PICTURE"),
                (b"PK\x03\x04zip", "unrecognized")):
            with pytest.raises(ValueError, match=msg):
                cover_art(payload)

    def test_flac_still_decodes_after_insert(self):
        from datasketches_spark_spark.operators.flaccodec import (
            decode_flac, encode_flac)
        from datasketches_spark_spark.operators.mediameta import (
            flac_add_picture, vorbis_comment_info)
        f = flac_add_picture(
            encode_flac(np.zeros(128), 8000, tags={"TITLE": "t"}),
            "image/png", self._png())
        samples, rate = decode_flac(f)
        assert rate == 8000 and len(samples) == 128
        assert vorbis_comment_info(f)["title"] == "t"

    def test_spark_operator(self, spark):
        from datasketches_spark_spark.operators import (
            extract_cover_art)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        png = self._png()
        rows = [(0, bytearray(build_mp4(subtitle_cues=["c"],
                                        cover=("image/png", png)))),
                (1, bytearray(b"PK\x03\x04 nope"))]
        df = spark.createDataFrame(rows,
                                   "doc_id long, payload binary")
        got = {r["doc_id"]: (r["cover_mime"],
                             bytes(r["cover"]) if r["cover"] else None)
               for r in extract_cover_art(df, "doc_id").collect()}
        assert got[0] == ("image/png", png)
        assert got[1] == (None, None)


class TestDispatchAndOperator:
    def test_uniform_keys_everywhere(self):
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        for payload in (
                jpeg_add_exif(encode_jpeg(_img()), {"make": "M"}),
                encode_flac(np.zeros(64), 8000, tags={"TITLE": "t"}),
                build_id3v2({"title": "s"}) + b"\xff\xfb" + b"\x00" * 8):
            r = media_metadata(payload)
            assert tuple(sorted(r)) == tuple(sorted(META_KEYS))

    def test_refusal(self):
        with pytest.raises(ValueError, match="unrecognized"):
            media_metadata(b"PK\x03\x04 a zip, not media metadata")

    def test_spark_operator_mixed_and_loud_null(self, spark):
        from datasketches_spark_spark.operators import (
            extract_media_metadata)
        from datasketches_spark_spark.operators.jpegcodec import (
            encode_jpeg)
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        rows = [
            (0, bytearray(jpeg_add_exif(
                encode_jpeg(_img()), {"make": "CamCo"}, gps=True,
                date_original="2024:01:01 00:00:00"))),
            (1, bytearray(build_id3v2({"title": "Song"})
                          + b"\xff\xfb" + b"\x00" * 16)),
            (2, bytearray(encode_flac(np.zeros(64), 8000,
                                      tags={"ARTIST": "fa"}))),
            (3, bytearray(pdf_with_info(["pg"], {"title": "pt"}))),
            (4, bytearray(b"PK\x03\x04 not media")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r.asDict()
               for r in extract_media_metadata(df, "doc_id").collect()}
        assert got[0]["make"] == "CamCo" and got[0]["has_gps"] is True
        assert got[0]["date"] == "2024:01:01 00:00:00"
        assert got[1]["title"] == "Song" and got[1]["kind"] == "id3"
        assert got[2]["artist"] == "fa" and got[2]["kind"] == "vorbis"
        assert got[3]["title"] == "pt" and got[3]["kind"] == "pdf"
        assert got[4]["kind"] is None and got[4]["n_fields"] is None
