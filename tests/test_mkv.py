"""Matroska/WebM container demux (operators/mkvcodec.py): EBML
element walk, all four block-lacing modes, metadata-invariant content
hashing, cross-container identity (MKV <-> Ogg for Opus/Vorbis
packets, MKV <-> MP4 <-> raw Annex B for H.264/HEVC), VP8 keyframe
decode through the system libwebp (frames rewrapped as one-chunk
WebP), and the sample_frames integration. Write/read symmetry via
build_mkv (no Matroska tool in this environment — the documented
fixture convention)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.h264codec import (
    decode_h264_ipcm, encode_h264_ipcm)
from datasketches_spark_spark.operators.mkvcodec import (
    annexb_to_mkv_track, build_mkv, is_mkv, mkv_audio_hash,
    mkv_extract_video, mkv_frame_sampler, mkv_info, mkv_video_hash)
from datasketches_spark_spark.operators.mp4codec import (
    build_mp4, video_content_hash)
from datasketches_spark_spark.operators.oggcodec import (
    build_ogg_stream, ogg_audio_hash, ogg_audio_packets)


def _footage(seed: int, n: int = 5, shape=(32, 48)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, shape, dtype=np.uint8)
            for _ in range(n)]


def _h264_mkv(seed=7, n=5, **kw):
    annexb = encode_h264_ipcm(_footage(seed, n))
    cid, priv, blocks = annexb_to_mkv_track(annexb)
    return build_mkv(video_frames=blocks, video_codec=cid,
                     video_private=priv, video_dims=(48, 32), **kw), \
        annexb


def _pkts(seed: bytes, n: int, sizes=None):
    sizes = sizes or [300] + [64] * (n - 1)
    return [(hashlib.md5(seed + i.to_bytes(4, "big")).digest()
             * (sizes[i] // 16 + 1))[:sizes[i]] for i in range(n)]


def _vp8_frames(n: int = 4, quality: float = 80.0):
    """Real VP8 keyframe bitstreams (system libwebp encode, the WebP
    container stripped — the payload is identical in WebM)."""
    from datasketches_spark_spark.operators.mkvcodec import (
        webp_vp8_payload)
    from datasketches_spark_spark.operators.webpnative import (
        webp_encode_rgb)
    out = []
    for k in range(n):
        img = np.full((16, 32, 3), 40, np.uint8)
        img[(2 * k) % 12:(2 * k) % 12 + 4, :, :] = 220
        out.append(webp_vp8_payload(webp_encode_rgb(img,
                                                    quality=quality)))
    return out


class TestStructure:
    def test_info(self):
        m = build_mkv(audio_payloads=_pkts(b"a", 6), tags=b"t=x",
                      doctype="webm")
        assert is_mkv(m) and not is_mkv(b"\x00" * 16)
        info = mkv_info(m)
        assert info["doctype"] == "webm" and info["has_tags"]
        assert info["n_tracks"] == 1
        t = info["tracks"][0]
        assert t["type"] == "audio" and t["codec_id"] == "A_OPUS"
        assert t["sample_rate"] == 48000 and t["channels"] == 2
        assert t["n_blocks"] == 6
        assert t["payload_bytes"] == 300 + 5 * 64
        assert info["duration_s"] == pytest.approx(0.24)
        assert t["bitrate_kbps"] == pytest.approx(
            t["payload_bytes"] * 8 / 0.24 / 1000, abs=0.1)

    def test_two_tracks(self):
        m, _ = _h264_mkv(audio_payloads=_pkts(b"a", 3),
                         doctype="matroska")
        info = mkv_info(m)
        assert info["doctype"] == "matroska"
        kinds = {t["type"]: t for t in info["tracks"]}
        assert kinds["video"]["codec_id"] == "V_MPEG4/ISO/AVC"
        assert (kinds["video"]["width"],
                kinds["video"]["height"]) == (48, 32)
        assert kinds["audio"]["n_blocks"] == 3

    def test_unknown_size_segment_and_cluster(self):
        """The streamed/live shape: Segment and Cluster sizes all-ones
        (RFC 8794 unknown size) — the reader must extend Segment to
        EOF and each Cluster to the next Cluster magic."""
        pk = _pkts(b"s", 5)
        m = bytearray(build_mkv(audio_payloads=pk, per_cluster=2))
        h_known = mkv_audio_hash(bytes(m))
        # rewrite the Segment size vint as unknown (8-byte all-ones)
        seg_at = bytes(m).find(b"\x18\x53\x80\x67") + 4
        ln = 0
        b0 = m[seg_at]
        for i in range(8):
            if b0 & (0x80 >> i):
                ln = i + 1
                break
        m[seg_at:seg_at + ln] = b"\x01" + b"\xff" * 7
        assert mkv_audio_hash(bytes(m)) == h_known
        info = mkv_info(bytes(m))
        assert info["tracks"][0]["n_blocks"] == 5

    @pytest.mark.parametrize("lacing", ["xiph", "ebml", "fixed"])
    def test_lacing_reassembles(self, lacing):
        if lacing == "fixed":
            pk = _pkts(b"f", 6, sizes=[64] * 6)
        elif lacing == "xiph":
            # one packet >= 255 exercises the 255-run lacing bytes
            pk = _pkts(b"f", 6, sizes=[300, 510, 64, 64, 64, 64])
        else:
            pk = _pkts(b"f", 6, sizes=[300, 240, 360, 64, 64, 64])
        base = mkv_audio_hash(build_mkv(audio_payloads=pk))
        laced = build_mkv(audio_payloads=pk, lacing=lacing,
                          per_cluster=6)
        assert mkv_audio_hash(laced) == base
        assert mkv_info(laced)["tracks"][0]["n_blocks"] == 6

    def test_refusals(self):
        with pytest.raises(ValueError, match="EBML"):
            mkv_info(b"not matroska at all, not even close")
        with pytest.raises(ValueError, match="Segment"):
            mkv_info(b"\x1a\x45\xdf\xa3\x80")   # header, no Segment
        m = bytearray(build_mkv(audio_payloads=_pkts(b"x", 3)))
        with pytest.raises(ValueError, match="no video track"):
            mkv_extract_video(bytes(m))
        # an element whose declared size overruns its container
        bad = bytes(m[:len(m) // 2])
        with pytest.raises(ValueError):
            mkv_audio_hash(bad)


class TestHashing:
    def test_tag_and_layout_invariance(self):
        pk = _pkts(b"grp", 6)
        base = mkv_audio_hash(build_mkv(audio_payloads=pk))
        for kw in ({"tags": b"TITLE=retagged copy"},
                   {"per_cluster": 1}, {"per_cluster": 100},
                   {"void_pad": 33}, {"lacing": "xiph"},
                   {"doctype": "matroska"}):
            assert mkv_audio_hash(build_mkv(audio_payloads=pk, **kw)) \
                == base, kw
        other = mkv_audio_hash(build_mkv(audio_payloads=_pkts(b"o", 6)))
        assert other != base

    @pytest.mark.parametrize("codec,ogg_codec", [
        ("A_OPUS", "opus"), ("A_VORBIS", "vorbis")])
    def test_cross_container_ogg(self, codec, ogg_codec):
        """One encode's packets as Ogg and as MKV/WebM collapse to ONE
        hash: MKV block payloads ARE the codec packets (headers live
        in CodecPrivate), exactly what ogg_audio_hash hashes."""
        ogg = build_ogg_stream(b"enc1", 7, codec=ogg_codec,
                               tags=b"ogg-side tags")
        mkv = build_mkv(audio_payloads=ogg_audio_packets(ogg),
                        audio_codec=codec, tags=b"mkv-side tags")
        assert mkv_audio_hash(mkv) == ogg_audio_hash(ogg)

    def test_audio_content_hash_routes_mkv(self):
        from datasketches_spark_spark.operators.audiocodec import (
            audio_content_hash)
        ogg = build_ogg_stream(b"enc2", 5)
        mkv = build_mkv(audio_payloads=ogg_audio_packets(ogg))
        assert audio_content_hash(mkv) == audio_content_hash(ogg)

    def test_h264_three_container_collapse(self):
        mkv, annexb = _h264_mkv(seed=11)
        h = mkv_video_hash(mkv)
        assert h == video_content_hash(annexb)
        assert h == video_content_hash(build_mp4(video_annexb=annexb))
        assert video_content_hash(mkv) == h      # dispatch routes MKV
        other, _ = _h264_mkv(seed=12)
        assert mkv_video_hash(other) != h

    def test_hevc_cross_container(self):
        from datasketches_spark_spark.operators.hevcnative import (
            hevc_encode_keyframes, libde265_available)
        if not libde265_available():
            pytest.skip("libde265 absent")
        rgb = [np.repeat(f[:, :, None], 3, axis=2)
               for f in _footage(5, n=3, shape=(64, 64))]
        annexb = hevc_encode_keyframes(rgb, quality=80)
        cid, priv, blocks = annexb_to_mkv_track(annexb)
        assert cid == "V_MPEGH/ISO/HEVC"
        mkv = build_mkv(video_frames=blocks, video_codec=cid,
                        video_private=priv, video_dims=(64, 64))
        assert mkv_video_hash(mkv) == video_content_hash(annexb) \
            == video_content_hash(build_mp4(video_annexb=annexb,
                                            video_dims=(64, 64)))

    def test_vp8_hash_is_layout_invariant(self):
        frames = _vp8_frames()
        h = mkv_video_hash(build_mkv(video_frames=frames,
                                     video_dims=(32, 16)))
        assert h == mkv_video_hash(build_mkv(
            video_frames=frames, video_dims=(32, 16),
            tags=b"retagged", per_cluster=1, void_pad=9))


class TestDecode:
    def test_extract_h264_decodes_bit_exact(self):
        frames = _footage(21)
        annexb = encode_h264_ipcm(frames)
        cid, priv, blocks = annexb_to_mkv_track(annexb)
        mkv = build_mkv(video_frames=blocks, video_codec=cid,
                        video_private=priv, video_dims=(48, 32))
        v = mkv_extract_video(mkv)
        assert v["codec"] == "h264"
        dec = decode_h264_ipcm(v["annexb"])
        assert all(np.array_equal(a, b)
                   for a, b in zip(dec["frames"], frames))

    def test_vp8_frames_decode_via_libwebp(self):
        from datasketches_spark_spark.operators.imagecodec import (
            decode_image)
        from datasketches_spark_spark.operators.webpnative import (
            libwebp_available)
        if not libwebp_available():
            pytest.skip("libwebp absent")
        frames = _vp8_frames(n=4)
        mkv = build_mkv(video_frames=frames, video_dims=(32, 16))
        v = mkv_extract_video(mkv)
        assert v["codec"] == "vp8" and len(v["frames"]) == 4
        ppms = mkv_frame_sampler(mkv, 2)
        assert len(ppms) == 2
        img = decode_image(ppms[0])
        assert img.shape == (16, 32, 3)
        # the fixture is blocky on purpose: VP8 lossy preserves the
        # band exactly, so the decode is checkable without tolerance
        assert img[0:4].mean() == pytest.approx(220, abs=2)
        assert img[8:].mean() == pytest.approx(40, abs=2)

    def test_frame_sampler_refuses_undecodable(self):
        mkv = build_mkv(video_frames=[b"\x82vp9ish"],
                        video_codec="V_VP9", video_dims=(8, 8))
        with pytest.raises(NotImplementedError, match="vp9"):
            mkv_frame_sampler(mkv, 2)

    def test_h264_sampler_route(self):
        mkv, annexb = _h264_mkv(seed=9, n=6)
        from datasketches_spark_spark.operators.h264codec import (
            h264_frame_sampler)
        assert mkv_frame_sampler(mkv, 3) == h264_frame_sampler(
            annexb, 3)


class TestSubtitles:
    def test_utf8_cues_roundtrip(self):
        from datasketches_spark_spark.operators.mkvcodec import (
            mkv_subtitle_text)
        cues = [b"first cue text", b"second, with comma",
                b"third \xe6\x97\xa5 cue"]
        m = build_mkv(audio_payloads=_pkts(b"a", 2),
                      subtitle_cues=cues, subtitle_lang="eng",
                      tags=b"t", per_cluster=2)
        out = mkv_subtitle_text(m)
        assert out["cues"] == 3 and out["lang"] == "eng"
        assert out["codec_id"] == "S_TEXT/UTF8"
        assert out["text"] == ("first cue text\n"
                               "second, with comma\nthird 日 cue")
        info = mkv_info(m)
        sub = [t for t in info["tracks"]
               if t["type"] == "subtitle"][0]
        assert sub["n_blocks"] == 3 and sub["lang"] == "eng"

    def test_ass_dialogue_stripping(self):
        from datasketches_spark_spark.operators.mkvcodec import (
            mkv_subtitle_text)
        cues = [b"1,0,Default,,0,0,0,,{\\b1}bold{\\b0} words",
                b"2,0,Default,,0,0,0,,line one\\Nline two, more"]
        m = build_mkv(subtitle_cues=cues,
                      subtitle_codec="S_TEXT/ASS")
        out = mkv_subtitle_text(m)
        assert out["text"] == ("bold words\n"
                               "line one\nline two, more")
        assert out["lang"] == "und"

    def test_bitmap_subs_refuse(self):
        from datasketches_spark_spark.operators.mkvcodec import (
            mkv_subtitle_text)
        m = build_mkv(subtitle_cues=[b"\x00\x01"],
                      subtitle_codec="S_VOBSUB")
        with pytest.raises(NotImplementedError, match="S_VOBSUB"):
            mkv_subtitle_text(m)

    def test_extract_subtitle_text_loud_null(self, spark):
        from datasketches_spark_spark.operators import (
            extract_subtitle_text)
        good = build_mkv(subtitle_cues=[b"hello", b"world"],
                         subtitle_lang="fra")
        no_sub = build_mkv(audio_payloads=_pkts(b"a", 2))
        rows = [(1, bytearray(good)), (2, bytearray(no_sub)),
                (3, bytearray(b"junk bytes, not a container"))]
        df = spark.createDataFrame(rows, "vid int, payload binary")
        got = {r.vid: r for r in
               extract_subtitle_text(df, "vid").collect()}
        assert got[1].text == "hello\nworld" and got[1].cues == 2
        assert got[1].lang == "fra"
        assert got[2].text is None and got[3].text is None


class TestSpark:
    def test_sample_frames_routes_mkv(self, spark):
        from datasketches_spark_spark.operators import sample_frames
        mkv, _ = _h264_mkv(n=4)
        vp8 = build_mkv(video_frames=_vp8_frames(4),
                        video_dims=(32, 16))
        rows = [(1, bytearray(mkv)), (2, bytearray(vp8)),
                (3, bytearray(build_mkv(                 # refusal ->
                    video_frames=[b"\x80av1ish"],        # zero rows,
                    video_codec="V_AV1",                 # no abort
                    video_dims=(8, 8))))]
        df = spark.createDataFrame(rows, "vid int, payload binary")
        out = sample_frames(df, "vid", 2).collect()
        by_vid = {}
        for r in out:
            by_vid.setdefault(r.vid, []).append(r)
        assert len(by_vid[1]) == 2 and len(by_vid[2]) == 2
        assert 3 not in by_vid

    def test_video_phash_collapses_four_containers(self, spark):
        """The same footage as AVI-MJPG, raw Annex B, H.264-in-MP4 and
        H.264-in-MKV -> ONE pHash signature; WebM VP8 of the same
        footage joins the collapse through the libwebp decode path."""
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        from datasketches_spark_spark.operators.avicodec import (
            encode_avi_mjpeg)
        from datasketches_spark_spark.operators.webpnative import (
            libwebp_available)

        def band(g):
            out = []
            for k in range(4):
                img = np.full((16, 32), 40, np.uint8)
                if g == 0:
                    img[(2 * k) % 12:(2 * k) % 12 + 4, :] = 220
                else:
                    img[:, (4 * k) % 24:(4 * k) % 24 + 8] = 220
                out.append(img)
            return out

        h264 = encode_h264_ipcm(band(0), chroma=90)
        cid, priv, blocks = annexb_to_mkv_track(h264)
        rows = [(1, bytearray(encode_avi_mjpeg(band(0), quality=75))),
                (2, bytearray(h264)),
                (3, bytearray(build_mp4(video_annexb=h264))),
                (4, bytearray(build_mkv(
                    video_frames=blocks, video_codec=cid,
                    video_private=priv, video_dims=(32, 16)))),
                (5, bytearray(build_mkv(
                    video_frames=annexb_to_mkv_track(
                        encode_h264_ipcm(band(1)))[2],
                    video_codec=cid,
                    video_private=annexb_to_mkv_track(
                        encode_h264_ipcm(band(1)))[1],
                    video_dims=(32, 16))))]
        if libwebp_available():
            rows.append((6, bytearray(build_mkv(
                video_frames=_vp8_frames(4), video_dims=(32, 16)))))
        df = spark.createDataFrame(rows, "vid int, payload binary")
        sig = {r.vid: tuple(r.phash_seq) for r in
               video_phash_signature(df, "vid", num_frames=4)
               .collect()}
        assert sig[1] == sig[2] == sig[3] == sig[4]
        assert sig[5] != sig[1]
        if 6 in sig:
            assert sig[6] == sig[1]

    def test_detect_mime_routes_ebml(self, spark):
        from datasketches_spark_spark.functions.mime import detect_mime
        import pyspark.sql.functions as F
        m = build_mkv(audio_payloads=_pkts(b"m", 2))
        df = spark.createDataFrame([(bytearray(m),)], "p binary")
        assert df.select(detect_mime("p").alias("m")) \
            .collect()[0].m == "video/webm"
