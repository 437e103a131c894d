"""HEVC decode via the system libde265 (operators/hevcnative.py):
the one coded-video family with real wild-sample decode on this
image. Oracle: fixtures are x265-encoded through libheif — encoder
and decoder are independent HEVC implementations — and HEVC
reconstruction is exactly specified, so decoded-pixel digests are
pinned. Refusal path armed for lib-absent images."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from datasketches_spark_spark.operators.hevcnative import (
    hevc_decode_frames, hevc_encode_keyframes, hevc_frame_sampler,
    libde265_available)

needs_libs = pytest.mark.skipif(
    not libde265_available(),
    reason="system libde265 absent (refusal path covers this image)")


def _footage(g: int, n: int = 4, shape=(64, 96)):
    # bands snap to the 8x8 pHash grid (8-row / 12-col blocks for
    # 64x96) so block means sit far from the threshold at any encode
    # quality — the identity is the band's orientation + motion
    out = []
    for k in range(n):
        img = np.full((*shape, 3), 40, np.uint8)
        if g == 0:
            r = (16 * k) % 48
            img[r:r + 16, :, :] = 220
        else:
            c = (24 * k) % 72
            img[:, c:c + 24, :] = 220
        out.append(img)
    return out


@needs_libs
class TestDecode:
    def test_roundtrip_across_implementations(self):
        # x265 encode (via libheif) -> libde265 decode; luma must
        # match libheif's own RGB within rounding
        from datasketches_spark_spark.operators.heifnative import (
            heic_decode_rgb, heic_encode_rgb, libheif_available)
        if not libheif_available():
            pytest.skip("libheif absent")
        img = _footage(0, n=1)[0]
        annexb = hevc_encode_keyframes([img])
        dec = hevc_decode_frames(annexb)
        assert len(dec) == 1 and dec[0].shape == (64, 96)
        ref = heic_decode_rgb(heic_encode_rgb(img, quality=90))
        luma = (0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1]
                + 0.114 * ref[:, :, 2])
        assert np.abs(dec[0].astype(float) - luma).max() < 1.0

    def test_multi_frame_stream(self):
        annexb = hevc_encode_keyframes(_footage(0, n=4))
        dec = hevc_decode_frames(annexb)
        assert len(dec) == 4
        assert all(f.shape == (64, 96) for f in dec)

    def test_deterministic_pinned_digest(self):
        # x265 at fixed settings is deterministic; HEVC reconstruction
        # is exact, so both the stream and the pixels pin
        a = hevc_encode_keyframes(_footage(1, n=2))
        b = hevc_encode_keyframes(_footage(1, n=2))
        assert a == b
        d1 = [hashlib.md5(f.tobytes()).hexdigest()
              for f in hevc_decode_frames(a)]
        d2 = [hashlib.md5(f.tobytes()).hexdigest()
              for f in hevc_decode_frames(b)]
        assert d1 == d2

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            hevc_decode_frames(b"\x00\x00\x00\x01\xff" * 40)

    def test_sampler_emits_decodable_ppms(self):
        from datasketches_spark_spark.operators.imagecodec import (
            decode_image)
        annexb = hevc_encode_keyframes(_footage(0, n=4))
        ppms = hevc_frame_sampler(annexb, 2)
        assert len(ppms) == 2
        assert decode_image(ppms[0]).shape[:2] == (64, 96)


@needs_libs
class TestMp4Integration:
    def test_hevc_in_mp4_roundtrip(self):
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4, mp4_extract_video, mp4_info, mp4_video_hash,
            video_content_hash)
        annexb = hevc_encode_keyframes(_footage(0, n=3))
        mp4 = build_mp4(video_annexb=annexb, tags=b"hevc tags",
                        video_dims=(96, 64))
        info = mp4_info(mp4)
        assert info["tracks"][0]["format"] == "hev1"
        assert info["tracks"][0]["n_samples"] == 3
        v = mp4_extract_video(mp4)
        assert v["codec"] == "hevc"
        a = hevc_decode_frames(annexb)
        b = hevc_decode_frames(v["annexb"])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        assert mp4_video_hash(mp4) == video_content_hash(annexb)

    def test_sample_frames_routes_hevc_mp4(self, spark):
        from datasketches_spark_spark.operators import sample_frames
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        mp4 = build_mp4(
            video_annexb=hevc_encode_keyframes(_footage(1, n=4)),
            video_dims=(96, 64))
        df = spark.createDataFrame([(1, bytearray(mp4))],
                                   "vid int, payload binary")
        out = sample_frames(df, "vid", 2).collect()
        assert len(out) == 2

    def test_phash_collapses_hevc_reencode(self, spark):
        # same footage at two x265 qualities -> same pHash sequence
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        from datasketches_spark_spark.operators.mp4codec import (
            build_mp4)
        rows = [
            (1, bytearray(build_mp4(video_annexb=hevc_encode_keyframes(
                _footage(0), quality=90), video_dims=(96, 64)))),
            (2, bytearray(build_mp4(video_annexb=hevc_encode_keyframes(
                _footage(0), quality=60), video_dims=(96, 64)))),
            (3, bytearray(build_mp4(video_annexb=hevc_encode_keyframes(
                _footage(1), quality=90), video_dims=(96, 64)))),
        ]
        df = spark.createDataFrame(rows, "vid int, payload binary")
        sig = {r.vid: tuple(r.phash_seq) for r in
               video_phash_signature(df, "vid", num_frames=4)
               .collect()}
        assert sig[1] == sig[2]
        assert sig[1] != sig[3]


class TestRefusal:
    def test_refusal_names_lib_and_alternatives(self, monkeypatch):
        from datasketches_spark_spark.operators import hevcnative
        monkeypatch.setattr(hevcnative, "_LIB", None)
        monkeypatch.setattr(hevcnative, "_TRIED", True)
        with pytest.raises(NotImplementedError) as ei:
            hevcnative.hevc_decode_frames(b"\x00\x00\x00\x01\x40\x01")
        msg = str(ei.value)
        assert "libde265" in msg and "video_content_hash" in msg
