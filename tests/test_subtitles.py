"""Standalone subtitle-file extraction (r18,
operators/subtitlecodec.py): SRT / WebVTT / ASS / SSA parsing, the
one-call sniff dispatch (including the Matroska leg), MIME routing,
and the Spark operator's mixed-format loud-null contract."""

import pytest

from datasketches_spark_spark.operators.subtitlecodec import (
    ass_text, build_ass, build_srt, build_vtt, srt_text,
    subtitle_text, vtt_text)


CUES = [(0, 1500, "Hello world"), (2000, 3500, "Second cue"),
        (4000, 7250, "Third cue")]


class TestSRT:
    def test_roundtrip(self):
        r = srt_text(build_srt(CUES))
        assert r == {"text": "Hello world\nSecond cue\nThird cue",
                     "cues": 3, "format": "srt", "lang": "und"}

    def test_crlf_and_bom_normalize(self):
        plain = srt_text(build_srt(CUES))
        assert srt_text(build_srt(CUES, crlf=True, bom=True)) == plain

    def test_markup_strips_and_multiline_cues_keep_breaks(self):
        srt = build_srt([(0, 1000, "<i>ital</i> and <b>bold</b>"),
                         (1200, 2000, "line one\nline two")])
        r = srt_text(srt)
        assert r["text"] == "ital and bold\nline one\nline two"
        assert r["cues"] == 2

    def test_dot_millis_and_missing_index_tolerated(self):
        # wild files: '.' millisecond separator, no index line
        raw = (b"00:00:00.500 --> 00:00:01.900\nno index here\n\n"
               b"2\n00:00:02,000 --> 00:00:03,000\nwith index\n")
        r = srt_text(raw)
        assert r["text"] == "no index here\nwith index"
        assert r["cues"] == 2

    def test_refuses_non_srt(self):
        with pytest.raises(ValueError, match="not an SRT"):
            srt_text(b"plain prose\nwithout any cue blocks\n")


class TestVTT:
    def test_roundtrip_with_note_ids_settings(self):
        raw = build_vtt(CUES, note="encoder comment", ids=True,
                        settings="align:start position:10%")
        r = vtt_text(raw)
        assert r == {"text": "Hello world\nSecond cue\nThird cue",
                     "cues": 3, "format": "vtt", "lang": "und"}

    def test_requires_signature(self):
        with pytest.raises(ValueError, match="WEBVTT"):
            vtt_text(build_srt(CUES))

    def test_tags_and_escapes(self):
        raw = (b"WEBVTT\n\n00:01.000 --> 00:02.000\n"
               b"<v Ann>A &amp; B</v> <c.yellow>ok</c>\n\n"
               b"STYLE\n::cue { color: red }\n\n"
               b"00:03.000 --> 00:04.000\n&lt;tag&gt;&nbsp;kept\n")
        r = vtt_text(raw)
        # &nbsp; decodes to U+00A0 per the WebVTT escape table
        assert r["text"] == "A & B ok\n<tag>\u00a0kept"
        assert r["cues"] == 2

    def test_hourless_timestamps(self):
        raw = b"WEBVTT\n\n01:02.000 --> 01:03.500\nshort form\n"
        assert vtt_text(raw)["text"] == "short form"

    def test_bom_accepted(self):
        raw = b"\xef\xbb\xbf" + build_vtt(CUES)
        assert vtt_text(raw)["cues"] == 3


class TestASS:
    def test_roundtrip_overrides_and_soft_breaks(self):
        raw = build_ass([(0, 1500, r"{\b1}Bold{\b0} text\Nsecond"),
                         (2000, 3000, r"hard\hspace")])
        r = ass_text(raw)
        assert r["text"] == "Bold text\nsecond\nhard space"
        assert r["cues"] == 2
        assert r["format"] == "ass"

    def test_ssa_marked_field(self):
        r = ass_text(build_ass(CUES, ssa=True))
        assert r["text"] == "Hello world\nSecond cue\nThird cue"

    def test_format_driven_field_order(self):
        # a reordered Format line must still find the Text field
        raw = (b"[Events]\n"
               b"Format: Start, End, Text\n"
               b"Dialogue: 0:00:00.00,0:00:01.00,only, three, fields\n")
        r = ass_text(raw)
        # Text is field 3 of 3: commas INSIDE the text survive
        assert r["text"] == "only, three, fields"
        assert r["cues"] == 1

    def test_commas_in_dialogue_text_survive(self):
        r = ass_text(build_ass([(0, 1000, "a, b, and c")]))
        assert r["text"] == "a, b, and c"

    def test_refuses_without_events(self):
        with pytest.raises(ValueError, match="Events"):
            ass_text(b"[Script Info]\nTitle: no events here\n")


class TestMP4TimedText:
    def test_roundtrip_with_lang(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_subtitle_text)
        m = build_mp4(subtitle_cues=["Hello world", "cue two"],
                      subtitle_lang="deu")
        assert mp4_subtitle_text(m) == {
            "text": "Hello world\ncue two", "cues": 2,
            "codec_id": "tx3g", "lang": "deu"}

    def test_styl_modifier_boxes_skipped_and_layout_invariance(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_subtitle_text)
        base = mp4_subtitle_text(build_mp4(subtitle_cues=["a", "b"]))
        for kw in ({"subtitle_styl": True}, {"moov_first": False},
                   {"co64": True}, {"tags": b"dressing"},
                   {"fragmented": True}):
            got = mp4_subtitle_text(
                build_mp4(subtitle_cues=["a", "b"], **kw))
            assert got == base, kw

    def test_utf16_bom_cue(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_subtitle_text)
        m = build_mp4(subtitle_cues=[
            "﻿utf16 cue".encode("utf-16-be")])
        assert mp4_subtitle_text(m)["text"] == "utf16 cue"

    def test_alongside_video_track(self):
        import numpy as np
        from datasketches_spark_spark.operators.h264codec import (
            encode_h264_ipcm)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_extract_video, mp4_subtitle_text)
        fr = [np.full((32, 48, 3), 80, np.uint8)]
        m = build_mp4(video_annexb=encode_h264_ipcm(fr),
                      subtitle_cues=["mixed"], subtitle_lang="eng")
        assert mp4_subtitle_text(m)["text"] == "mixed"
        assert mp4_extract_video(m)["codec"] == "h264"

    def test_wvtt_roundtrip_and_dressing_invariance(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_subtitle_text)
        m = build_mp4(subtitle_cues=["wvtt cue one", "cue two"],
                      subtitle_lang="nld", subtitle_format="wvtt")
        assert mp4_subtitle_text(m) == {
            "text": "wvtt cue one\ncue two", "cues": 2,
            "codec_id": "wvtt", "lang": "nld"}
        base = mp4_subtitle_text(
            build_mp4(subtitle_cues=["a", "b"],
                      subtitle_format="wvtt"))
        for kw in ({"subtitle_styl": True}, {"moov_first": False},
                   {"fragmented": True}):
            assert mp4_subtitle_text(build_mp4(
                subtitle_cues=["a", "b"], subtitle_format="wvtt",
                **kw)) == base, kw

    def test_wvtt_via_sniff_dispatch(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        m = build_mp4(subtitle_cues=["dispatched"],
                      subtitle_format="wvtt")
        assert subtitle_text(m)["format"] == "wvtt"

    def test_refuses_without_subtitle_track(self):
        from datasketches_spark_spark.operators.aaccodec import (
            aac_frame_payloads, build_adts_stream)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_subtitle_text)
        payloads = aac_frame_payloads(build_adts_stream(b"seed", 8))
        m = build_mp4(audio_payloads=payloads)
        with pytest.raises(ValueError, match="no subtitle"):
            mp4_subtitle_text(m)


class TestSniffDispatch:
    def test_all_four_shapes(self):
        from datasketches_spark_spark.operators.mkvcodec import (
            build_mkv)
        mkv = build_mkv(subtitle_cues=[b"from mkv"],
                        subtitle_lang="eng")
        assert subtitle_text(mkv) == {
            "text": "from mkv", "cues": 1,
            "format": "S_TEXT/UTF8", "lang": "eng"}
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        mp4 = build_mp4(subtitle_cues=["from mp4"],
                        subtitle_lang="fra")
        assert subtitle_text(mp4) == {
            "text": "from mp4", "cues": 1,
            "format": "tx3g", "lang": "fra"}
        assert subtitle_text(build_srt(CUES))["format"] == "srt"
        assert subtitle_text(build_vtt(CUES))["format"] == "vtt"
        assert subtitle_text(build_ass(CUES))["format"] == "ass"
        # ASS routes via [Script Info] even with leading whitespace
        assert subtitle_text(
            b"\n" + build_ass(CUES, ssa=True))["format"] == "ass"

    def test_bom_before_signature(self):
        assert subtitle_text(
            b"\xef\xbb\xbf" + build_vtt(CUES))["format"] == "vtt"

    def test_refusals(self):
        for junk in (b"\x89PNG\r\n\x1a\n", b"",
                     b"prose without cues at all"):
            with pytest.raises(ValueError, match="not a recognized"):
                subtitle_text(junk)


class TestMimeRouting:
    def test_subtitle_mime_rules(self, spark):
        from datasketches_spark_spark.functions.mime import (
            detect_mime)
        rows = [
            ("vtt", bytearray(build_vtt(CUES))),
            ("vtt_bom", bytearray(b"\xef\xbb\xbf" + build_vtt(CUES))),
            ("srt", bytearray(build_srt(CUES))),
            ("srt_crlf", bytearray(build_srt(CUES, crlf=True))),
            ("ass", bytearray(build_ass(CUES))),
            ("plain", bytearray(b"just text, no cues")),
        ]
        df = spark.createDataFrame(rows, "name string, payload binary")
        got = {r["name"]: r["mime"]
               for r in df.select(
                   "name",
                   detect_mime("payload").alias("mime")).collect()}
        assert got == {"vtt": "text/vtt", "vtt_bom": "text/vtt",
                       "srt": "application/x-subrip",
                       "srt_crlf": "application/x-subrip",
                       "ass": "text/x-ssa", "plain": "text/plain"}


class TestSparkOperator:
    def test_mixed_formats_and_loud_null(self, spark):
        from datasketches_spark_spark.operators import (
            extract_subtitle_text)
        from datasketches_spark_spark.operators.mkvcodec import (
            build_mkv)
        rows = [
            (0, bytearray(build_mkv(subtitle_cues=[b"mkv cue"],
                                    subtitle_lang="fre"))),
            (1, bytearray(build_srt([(0, 900, "srt cue")]))),
            (2, bytearray(build_vtt([(0, 900, "vtt cue")]))),
            (3, bytearray(build_ass([(0, 900, "ass cue")]))),
            (4, bytearray(b"\x00\x01 not subtitles")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: (r["text"], r["sub_codec"], r["lang"])
               for r in extract_subtitle_text(df, "doc_id").collect()}
        assert got[0] == ("mkv cue", "S_TEXT/UTF8", "fre")
        assert got[1] == ("srt cue", "srt", "und")
        assert got[2] == ("vtt cue", "vtt", "und")
        assert got[3] == ("ass cue", "ass", "und")
        assert got[4] == (None, None, None)
