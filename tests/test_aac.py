"""AAC ADTS framing (operators/aaccodec.py): frame-header walk,
tag-invariant content hashing, cross-container identity with MP4
mp4a tracks, and the dispatch surface. Write/read symmetry via
build_adts_stream (no AAC tool in this environment — the documented
fixture convention; sample decode refuses per the mp3codec
rationale)."""

from __future__ import annotations

import pytest

from datasketches_spark_spark.operators.aaccodec import (
    aac_audio_hash, aac_frame_payloads, adts_info, build_adts_stream,
    is_adts)


class TestStructure:
    def test_info_fields(self):
        s = build_adts_stream(b"seed", 9)
        assert is_adts(s)
        info = adts_info(s)
        assert info["profile"] == "LC"
        assert info["sample_rate"] == 48000
        assert info["channels"] == 2
        assert info["n_frames"] == 9
        assert info["duration_s"] == round(9 * 1024 / 48000, 3)
        assert not info["crc"]

    def test_crc_header_form(self):
        s = build_adts_stream(b"seed", 4, crc=True)
        info = adts_info(s)
        assert info["crc"] and info["n_frames"] == 4
        # payloads exclude the 9-byte protected header
        assert aac_audio_hash(s) == aac_audio_hash(
            build_adts_stream(b"seed", 4, crc=False))

    @pytest.mark.parametrize("freq_idx,rate",
                             [(0, 96000), (4, 44100), (11, 8000)])
    def test_freq_table(self, freq_idx, rate):
        s = build_adts_stream(b"x", 2, freq_idx=freq_idx)
        assert adts_info(s)["sample_rate"] == rate

    def test_determinism(self):
        assert build_adts_stream(b"d", 5) == build_adts_stream(b"d", 5)

    def test_mid_stream_desync_raises(self):
        s = build_adts_stream(b"x", 6)
        corrupt = s[:300] + b"\x00" * 600 + s[300:]
        with pytest.raises(ValueError, match="lost frame sync"):
            adts_info(corrupt)

    def test_truncated_final_frame_raises(self):
        s = build_adts_stream(b"x", 3)
        with pytest.raises(ValueError, match="truncated|lost"):
            adts_info(s[:-40])

    def test_mixed_rate_chain_raises(self):
        a = build_adts_stream(b"x", 2, freq_idx=3)
        b = build_adts_stream(b"x", 2, freq_idx=4)
        with pytest.raises(ValueError, match="mixed"):
            adts_info(a + b)

    def test_garbage_is_not_adts(self):
        assert not is_adts(b"RIFF" + b"\x00" * 64)
        assert not is_adts(b"")
        # an MP3 frame is NOT ADTS (layer bits disambiguate)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        assert not is_adts(build_frame_stream(b"m", 3))

    def test_adts_is_not_mp3(self):
        from datasketches_spark_spark.operators.mp3codec import is_mp3
        assert not is_mp3(build_adts_stream(b"a", 3))


class TestContentHash:
    def test_tag_invariance(self):
        base = build_adts_stream(b"grp", 7)
        h = aac_audio_hash(base)
        id3v2 = b"ID3\x04\x00\x00\x00\x00\x00\x20" + b"\x00" * 32
        assert aac_audio_hash(id3v2 + base) == h
        assert aac_audio_hash(base + b"TAG" + b"\x00" * 125) == h
        assert aac_audio_hash(
            id3v2 + base + b"TAG" + b"\x01" * 125) == h

    def test_trailing_ape_tag_tolerated(self):
        base = build_adts_stream(b"grp", 7)
        ape = b"APETAGEX" + b"\x00" * 500
        assert aac_audio_hash(base + ape) == aac_audio_hash(base)

    def test_content_sensitivity(self):
        assert aac_audio_hash(build_adts_stream(b"A", 5)) != \
            aac_audio_hash(build_adts_stream(b"B", 5))
        assert aac_audio_hash(build_adts_stream(b"A", 5)) != \
            aac_audio_hash(build_adts_stream(b"A", 6))

    def test_audio_content_hash_routes_adts(self):
        from datasketches_spark_spark.operators import (
            audio_content_hash)
        s = build_adts_stream(b"r", 4)
        assert audio_content_hash(s) == aac_audio_hash(s)
        id3 = b"ID3\x04\x00\x00\x00\x00\x00\x10" + b"\x00" * 16
        assert audio_content_hash(id3 + s) == aac_audio_hash(s)

    def test_payloads_roundtrip_through_mux(self):
        # build from explicit payloads == the frame payloads read back
        pls = aac_frame_payloads(build_adts_stream(b"p", 6))
        remux = build_adts_stream(b"", 0, payloads=pls, crc=True)
        assert aac_frame_payloads(remux) == pls
