#!/usr/bin/env python
"""r18 scale proof: the new container/codec paths must be O(bytes)
with sane constants — time each at 1x and 8x input and report the
growth exponent (wall ~ bytes^e; e ~ 1.0 = linear). Run:
``python devtools/scaleproof_r18.py``."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def best_of(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def report(name, t1, t8, b1, b8):
    import math
    e = math.log(t8 / t1) / math.log(b8 / b1)
    print(f"{name:30s} 1x {t1*1e3:8.1f} ms   8x {t8*1e3:8.1f} ms   "
          f"bytes x{b8/b1:.1f}   exponent {e:.2f}")
    return e


def main():
    from datasketches_spark_spark.operators.aaccodec import (
        aac_audio_hash, aac_frame_payloads, build_adts_stream)
    from datasketches_spark_spark.operators.h264codec import (
        encode_h264_ipcm)
    from datasketches_spark_spark.operators.mp4codec import (
        build_mp4, mp4_audio_hash, mp4_extract_video, mp4_video_hash)
    from datasketches_spark_spark.operators.pdfcodec import (
        encode_pdf_text_type0, pdf_text)

    results = {}

    # --- ADTS walk + hash
    a1 = build_adts_stream(b"sp", 200)
    a8 = build_adts_stream(b"sp", 1600)
    t1 = best_of(lambda: aac_audio_hash(a1))
    t8 = best_of(lambda: aac_audio_hash(a8))
    results["aac_audio_hash"] = report(
        "aac adts hash", t1, t8, len(a1), len(a8))

    # --- MP4 classic: demux tables + audio hash
    pls1 = aac_frame_payloads(a1)
    pls8 = aac_frame_payloads(a8)
    m1 = build_mp4(audio_payloads=pls1, per_chunk=7)
    m8 = build_mp4(audio_payloads=pls8, per_chunk=7)
    t1 = best_of(lambda: mp4_audio_hash(m1))
    t8 = best_of(lambda: mp4_audio_hash(m8))
    results["mp4_audio_hash"] = report(
        "mp4 classic audio hash", t1, t8, len(m1), len(m8))

    # --- fragmented MP4: moof/trun walk + audio hash
    f1 = build_mp4(audio_payloads=pls1, fragmented=True, per_chunk=4)
    f8 = build_mp4(audio_payloads=pls8, fragmented=True, per_chunk=4)
    t1 = best_of(lambda: mp4_audio_hash(f1))
    t8 = best_of(lambda: mp4_audio_hash(f8))
    results["fmp4_audio_hash"] = report(
        "mp4 fragmented audio hash", t1, t8, len(f1), len(f8))

    # --- MP4 video: demux + VCL hash + Annex B re-expression
    rng = np.random.default_rng(3)
    fr1 = [rng.integers(0, 256, (32, 48), np.uint8) for _ in range(4)]
    v1 = build_mp4(video_annexb=encode_h264_ipcm(fr1))
    v8 = build_mp4(video_annexb=encode_h264_ipcm(fr1 * 8))
    t1 = best_of(lambda: mp4_video_hash(v1))
    t8 = best_of(lambda: mp4_video_hash(v8))
    results["mp4_video_hash"] = report(
        "mp4 video vcl hash", t1, t8, len(v1), len(v8))
    t1 = best_of(lambda: mp4_extract_video(v1))
    t8 = best_of(lambda: mp4_extract_video(v8))
    results["mp4_extract_video"] = report(
        "mp4 -> annexb extract", t1, t8, len(v1), len(v8))

    # --- UCS2 predefined-CMap text extraction
    page = "unicode 日本語 text line for the ucs2 cmap path %d"
    p1 = encode_pdf_text_type0([page % i for i in range(12)],
                               mapping="ucs2")
    p8 = encode_pdf_text_type0([page % i for i in range(96)],
                               mapping="ucs2")
    t1 = best_of(lambda: pdf_text(p1))
    t8 = best_of(lambda: pdf_text(p8))
    results["pdf_ucs2_extract"] = report(
        "pdf ucs2 cmap extract", t1, t8, len(p1), len(p8))

    # --- HEVC decode via libde265 (pixels scale, bytes roughly too)
    from datasketches_spark_spark.operators.hevcnative import (
        hevc_decode_frames, hevc_encode_keyframes, libde265_available)
    if libde265_available():
        rgb = [np.repeat(rng.integers(0, 256, (64, 96, 1), np.uint8),
                         3, axis=2) for _ in range(2)]
        h1 = hevc_encode_keyframes(rgb)
        h8 = hevc_encode_keyframes(rgb * 8)
        t1 = best_of(lambda: hevc_decode_frames(h1))
        t8 = best_of(lambda: hevc_decode_frames(h8))
        results["hevc_decode"] = report(
            "hevc libde265 decode", t1, t8, len(h1), len(h8))

    # --- Matroska/WebM: EBML walk + lacing reassembly + hashes
    from datasketches_spark_spark.operators.mkvcodec import (
        annexb_to_mkv_track, build_mkv, mkv_audio_hash,
        mkv_extract_video, mkv_video_hash)
    from datasketches_spark_spark.operators.oggcodec import (
        build_ogg_stream, ogg_audio_packets)
    k1 = ogg_audio_packets(build_ogg_stream(b"sc", 120))
    k8 = ogg_audio_packets(build_ogg_stream(b"sc", 960))
    mk1 = build_mkv(audio_payloads=k1, lacing="xiph", per_cluster=8)
    mk8 = build_mkv(audio_payloads=k8, lacing="xiph", per_cluster=8)
    t1 = best_of(lambda: mkv_audio_hash(mk1))
    t8 = best_of(lambda: mkv_audio_hash(mk8))
    results["mkv_audio_hash"] = report(
        "mkv laced audio hash", t1, t8, len(mk1), len(mk8))
    cid, priv, blocks = annexb_to_mkv_track(encode_h264_ipcm(fr1))
    _, _, blocks8 = annexb_to_mkv_track(encode_h264_ipcm(fr1 * 8))
    w1 = build_mkv(video_frames=blocks, video_codec=cid,
                   video_private=priv, video_dims=(48, 32))
    w8 = build_mkv(video_frames=blocks8, video_codec=cid,
                   video_private=priv, video_dims=(48, 32))
    t1 = best_of(lambda: mkv_video_hash(w1))
    t8 = best_of(lambda: mkv_video_hash(w8))
    results["mkv_video_hash"] = report(
        "mkv video vcl hash", t1, t8, len(w1), len(w8))
    t1 = best_of(lambda: mkv_extract_video(w1))
    t8 = best_of(lambda: mkv_extract_video(w8))
    results["mkv_extract_video"] = report(
        "mkv -> annexb extract", t1, t8, len(w1), len(w8))

    # --- media metadata: ID3 frame walk + Vorbis comment parse
    from datasketches_spark_spark.operators.mediameta import (
        build_id3v2, id3_info, vorbis_comment_info)
    from datasketches_spark_spark.operators.flaccodec import (
        encode_flac)
    f1 = {f"k{i:03d}": "v" * 40 for i in range(8)}
    f8 = {f"k{i:03d}": "v" * 40 for i in range(64)}
    # n_fields caps at the recognized set; raw walks still scale
    i1 = build_id3v2({"title": "t" * 40}) + b"\xff\xfb" + b"\x00" * 64
    i8 = build_id3v2({"title": "t" * 40, "artist": "a" * 300,
                      "album": "b" * 300, "genre": "g" * 300,
                      "date": "2000", "software": "s" * 300,
                      "copyright": "c" * 300}) \
        + b"\xff\xfb" + b"\x00" * 64
    t1 = best_of(lambda: id3_info(i1))
    t8 = best_of(lambda: id3_info(i8))
    results["id3_parse"] = report(
        "id3 frame walk", t1, t8, len(i1), len(i8))
    v1 = encode_flac(np.zeros(64), 8000, tags=f1)
    v8 = encode_flac(np.zeros(64), 8000, tags=f8)
    t1 = best_of(lambda: vorbis_comment_info(v1))
    t8 = best_of(lambda: vorbis_comment_info(v8))
    results["vorbis_comment_parse"] = report(
        "vorbis comment parse", t1, t8, len(v1), len(v8))
    from datasketches_spark_spark.operators.mediameta import (
        mkv_tags_info, mp4_tags_info, pdf_meta_info, pdf_with_info)
    flds = {"title": "t" * 30, "artist": "a" * 30}
    p1 = pdf_with_info(["line\n" * 40], flds)
    p8 = pdf_with_info(["line\n" * 40] * 8, flds)
    t1 = best_of(lambda: pdf_meta_info(p1))
    t8 = best_of(lambda: pdf_meta_info(p8))
    results["pdf_meta_parse"] = report(
        "pdf /Info parse", t1, t8, len(p1), len(p8))
    g1 = build_mkv(audio_payloads=k1, tag_fields=flds)
    g8 = build_mkv(audio_payloads=k8, tag_fields=flds)
    t1 = best_of(lambda: mkv_tags_info(g1))
    t8 = best_of(lambda: mkv_tags_info(g8))
    results["mkv_tags_parse"] = report(
        "mkv Tags parse", t1, t8, len(g1), len(g8))
    from datasketches_spark_spark.operators.mp4codec import build_mp4
    q1 = build_mp4(audio_payloads=k1, tag_fields=flds)
    q8 = build_mp4(audio_payloads=k8, tag_fields=flds)
    t1 = best_of(lambda: mp4_tags_info(q1))
    t8 = best_of(lambda: mp4_tags_info(q8))
    results["mp4_ilst_parse"] = report(
        "mp4 ilst parse", t1, t8, len(q1), len(q8))

    bad = {k: round(e, 2) for k, e in results.items() if e > 1.25}
    print("exponents:", {k: round(e, 2) for k, e in results.items()})
    print("PASS" if not bad else f"FAIL superlinear: {bad}")


if __name__ == "__main__":
    main()
