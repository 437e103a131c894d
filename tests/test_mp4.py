"""MP4/ISO-BMFF container demux (operators/mp4codec.py): box walk,
sample-table reconstruction (stsc runs x stco/co64 x stsz),
avcC/hvcC -> Annex B re-expression, metadata-invariant content
hashing, cross-container identity (MP4 <-> ADTS, MP4 <-> raw Annex B),
and the sample_frames integration. Write/read symmetry via build_mp4
(no MP4 tool in this environment — the documented fixture
convention)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from datasketches_spark_spark.operators.aaccodec import (
    aac_audio_hash, aac_frame_payloads, build_adts_stream)
from datasketches_spark_spark.operators.h264codec import (
    decode_h264_ipcm, encode_h264_ipcm)
from datasketches_spark_spark.operators.mp4codec import (
    build_mp4, is_mp4, mp4_audio_hash, mp4_extract_video, mp4_info,
    mp4_frame_sampler, mp4_video_hash, video_content_hash)


def _footage(seed: int, n: int = 5, shape=(32, 48)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, shape, dtype=np.uint8)
            for _ in range(n)]


def _mp4(seed=7, n=5, audio_seed=b"au", n_audio=9, **kw):
    annexb = encode_h264_ipcm(_footage(seed, n))
    pls = aac_frame_payloads(build_adts_stream(audio_seed, n_audio))
    return build_mp4(video_annexb=annexb, audio_payloads=pls, **kw), \
        annexb, pls


class TestStructure:
    def test_info(self):
        mp4, _, _ = _mp4(tags=b"artist=x")
        assert is_mp4(mp4)
        info = mp4_info(mp4)
        assert info["brand"] == "isom"
        assert info["n_tracks"] == 2 and info["has_tags"]
        vid, aud = info["tracks"]
        assert vid["handler"] == "vide" and vid["format"] == "avc1"
        assert (vid["width"], vid["height"]) == (48, 32)
        assert vid["n_samples"] == 5
        assert aud["handler"] == "soun" and aud["format"] == "mp4a"
        assert aud["sample_rate"] == 48000 and aud["channels"] == 2
        assert aud["n_samples"] == 9

    def test_video_extraction_decodes_bit_exact(self):
        frames = _footage(11)
        mp4 = build_mp4(video_annexb=encode_h264_ipcm(frames))
        v = mp4_extract_video(mp4)
        assert v["codec"] == "h264" and v["n_samples"] == 5
        dec = decode_h264_ipcm(v["annexb"])
        assert all(np.array_equal(a, b)
                   for a, b in zip(dec["frames"], frames))

    def test_determinism(self):
        assert _mp4()[0] == _mp4()[0]

    def test_image_brands_not_mp4(self):
        assert not is_mp4(b"\x00\x00\x00\x14ftypavif" + b"\x00" * 8)
        assert not is_mp4(b"\x00\x00\x00\x14ftypheic" + b"\x00" * 8)

    def test_truncated_mdat_raises(self):
        mp4, _, _ = _mp4(moov_first=False)
        with pytest.raises(ValueError,
                           match="truncated|overruns|box"):
            mp4_info(mp4[: len(mp4) // 2])

    def test_box_overrun_raises(self):
        mp4, _, _ = _mp4()
        # corrupt the moov size field upward
        i = mp4.find(b"moov") - 4
        bad = mp4[:i] + (1 << 30).to_bytes(4, "big") + mp4[i + 4:]
        with pytest.raises(ValueError, match="overruns"):
            mp4_info(bad)

    def test_no_moov_raises(self):
        with pytest.raises(ValueError, match="moov"):
            mp4_info(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00"
                     b"\x00\x00\x00\x08free")


class TestLayoutInvariance:
    """The content hashes must ignore every packaging knob."""

    def _variants(self):
        kws = [dict(), dict(tags=b"some tag dressing"),
               dict(moov_first=False), dict(co64=True, per_chunk=3),
               dict(free_pad=123, per_chunk=1),
               dict(per_chunk=100)]
        return [_mp4(**kw)[0] for kw in kws]

    def test_audio_hash_invariant(self):
        assert len({mp4_audio_hash(m) for m in self._variants()}) == 1

    def test_video_hash_invariant(self):
        assert len({mp4_video_hash(m) for m in self._variants()}) == 1

    def test_content_sensitivity(self):
        base, _, _ = _mp4()
        other_v, _, _ = _mp4(seed=8)
        other_a, _, _ = _mp4(audio_seed=b"zz")
        assert mp4_video_hash(base) != mp4_video_hash(other_v)
        assert mp4_audio_hash(base) == mp4_audio_hash(other_v)
        assert mp4_audio_hash(base) != mp4_audio_hash(other_a)
        assert mp4_video_hash(base) == mp4_video_hash(other_a)


class TestCrossContainer:
    def test_audio_mp4_equals_adts(self):
        adts = build_adts_stream(b"xc", 8)
        mp4 = build_mp4(audio_payloads=aac_frame_payloads(adts))
        assert mp4_audio_hash(mp4) == aac_audio_hash(adts)
        from datasketches_spark_spark.operators import (
            audio_content_hash)
        assert audio_content_hash(mp4) == audio_content_hash(adts)

    def test_video_mp4_equals_annexb(self):
        annexb = encode_h264_ipcm(_footage(3))
        mp4 = build_mp4(video_annexb=annexb)
        assert mp4_video_hash(mp4) == video_content_hash(annexb)
        assert video_content_hash(mp4) == video_content_hash(annexb)

    def test_video_hash_ignores_nonvcl(self):
        # same VCL NALs, SPS/PPS travel in-band vs in avcC — and the
        # raw annexb with params repeated still collapses
        annexb = encode_h264_ipcm(_footage(4))
        from datasketches_spark_spark.operators.h264codec import (
            _split_nals)
        nals = _split_nals(annexb)
        ps = [n for n in nals if (n[0] & 0x1F) in (7, 8)]
        redressed = b"".join(
            b"\x00\x00\x00\x01" + bytes(n)
            for n in (ps + nals))          # params duplicated
        assert video_content_hash(redressed) == \
            video_content_hash(annexb)

    def test_avi_leg(self):
        from datasketches_spark_spark.operators.avicodec import (
            encode_avi_mjpeg)
        frames = _footage(5, n=4, shape=(16, 32))
        a = encode_avi_mjpeg(frames, fps=5)
        b = encode_avi_mjpeg(frames, fps=9)   # fps is header metadata
        assert video_content_hash(a) == video_content_hash(b)
        c = encode_avi_mjpeg(_footage(6, n=4, shape=(16, 32)), fps=5)
        assert video_content_hash(a) != video_content_hash(c)

    def test_unknown_magic_raises(self):
        with pytest.raises(ValueError, match="video content-hash"):
            video_content_hash(b"GIF89a" + b"\x00" * 32)


class TestSampler:
    def test_mp4_frame_sampler(self):
        frames = _footage(9, n=6)
        mp4 = build_mp4(video_annexb=encode_h264_ipcm(frames))
        ppms = mp4_frame_sampler(mp4, 3)
        assert len(ppms) == 3
        from datasketches_spark_spark.operators.imagecodec import (
            decode_image)
        img = decode_image(ppms[0])
        assert img.shape[:2] == (32, 48)
        assert np.array_equal(img[:, :, 0], frames[0])

    def test_sample_frames_routes_mp4(self, spark):
        from datasketches_spark_spark.operators import sample_frames
        mp4, _, _ = _mp4(n=4)
        rows = [(1, bytearray(mp4)),
                (2, bytearray(b"not video at all" * 10))]
        df = spark.createDataFrame(rows, "vid int, payload binary")
        out = sample_frames(df, "vid", 2).collect()
        by_vid = {}
        for r in out:
            by_vid.setdefault(r.vid, []).append(r)
        assert len(by_vid[1]) == 2
        assert len(by_vid[2]) == 2     # byte-slice fallback

    def test_video_phash_collapses_mp4_and_avi_and_annexb(self, spark):
        # the r18 three-container collapse: same footage as AVI-MJPG,
        # raw Annex B H.264, and H.264-in-MP4 -> one pHash signature
        from datasketches_spark_spark.operators import (
            video_phash_signature)
        from datasketches_spark_spark.operators.avicodec import (
            encode_avi_mjpeg)

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
        rows = [(1, bytearray(encode_avi_mjpeg(band(0), quality=75))),
                (2, bytearray(h264)),
                (3, bytearray(build_mp4(video_annexb=h264))),
                (4, bytearray(build_mp4(
                    video_annexb=encode_h264_ipcm(band(1)))))]
        df = spark.createDataFrame(rows, "vid int, payload binary")
        sig = {r.vid: tuple(r.phash_seq) for r in
               video_phash_signature(df, "vid", num_frames=4)
               .collect()}
        assert sig[1] == sig[2] == sig[3]
        assert sig[4] != sig[1]


class TestFragmented:
    """r18: fragmented MP4 (the DASH/streaming shape) — empty moov
    tables + mvex/trex defaults, samples in moof/traf/trun runs."""

    def test_info_and_decode(self):
        frames = _footage(21, n=5)
        pls = aac_frame_payloads(build_adts_stream(b"fr", 9))
        frag = build_mp4(video_annexb=encode_h264_ipcm(frames),
                         audio_payloads=pls, fragmented=True,
                         tags=b"frag tags")
        info = mp4_info(frag)
        assert info["tracks"][0]["n_samples"] == 5
        assert info["tracks"][1]["n_samples"] == 9
        assert info["tracks"][1]["duration_s"] == round(
            9 * 1024 / 48000, 3)
        v = mp4_extract_video(frag)
        dec = decode_h264_ipcm(v["annexb"])
        assert all(np.array_equal(a, b)
                   for a, b in zip(dec["frames"], frames))

    def test_hashes_collapse_with_classic_and_adts(self):
        adts = build_adts_stream(b"xf", 8)
        pls = aac_frame_payloads(adts)
        annexb = encode_h264_ipcm(_footage(22, n=4))
        frag = build_mp4(video_annexb=annexb, audio_payloads=pls,
                         fragmented=True, per_chunk=3)
        classic = build_mp4(video_annexb=annexb, audio_payloads=pls,
                            co64=True, tags=b"t")
        assert mp4_video_hash(frag) == mp4_video_hash(classic)
        assert mp4_audio_hash(frag) == mp4_audio_hash(classic)
        assert mp4_audio_hash(frag) == aac_audio_hash(adts)
        assert mp4_video_hash(frag) == video_content_hash(annexb)

    def test_fragment_chunking_invariant(self):
        annexb = encode_h264_ipcm(_footage(23, n=6))
        a = build_mp4(video_annexb=annexb, fragmented=True,
                      per_chunk=1)
        b = build_mp4(video_annexb=annexb, fragmented=True,
                      per_chunk=4)
        assert a != b
        assert mp4_video_hash(a) == mp4_video_hash(b)

    def test_sampler_routes_fragmented(self):
        frag = build_mp4(
            video_annexb=encode_h264_ipcm(_footage(24, n=6)),
            fragmented=True)
        assert len(mp4_frame_sampler(frag, 3)) == 3

    def test_truncated_segment_raises(self):
        frag = build_mp4(
            video_annexb=encode_h264_ipcm(_footage(25, n=4)),
            fragmented=True)
        with pytest.raises(ValueError,
                           match="overruns|truncated|box"):
            mp4_info(frag[: len(frag) - 200])

    def test_empty_tables_without_fragments_raises(self):
        frag = build_mp4(
            video_annexb=encode_h264_ipcm(_footage(26, n=4)),
            fragmented=True)
        # cut everything after moov: an init segment alone has no
        # samples
        import struct as _st
        i = frag.find(b"moof") - 4
        with pytest.raises(ValueError, match="sample tables"):
            mp4_info(frag[:i])
