"""Ogg container codec (operators/oggcodec.py): RFC 3533 page
framing + CRC, packet reassembly across lacing boundaries, codec
identification, tag-invariant content hashing, and the dispatch
surface. Write/read symmetry via build_ogg_stream (no Ogg tool in
this environment — the documented fixture convention)."""

from __future__ import annotations

import struct

import pytest

from datasketches_spark_spark.operators.oggcodec import (
    _packets, _pages, build_ogg_stream, is_ogg, ogg_audio_hash,
    ogg_info)


class TestStructure:
    @pytest.mark.parametrize("codec", ["opus", "vorbis"])
    def test_info_fields(self, codec):
        s = build_ogg_stream(b"seed", 6, codec=codec)
        assert is_ogg(s)
        info = ogg_info(s)
        assert info["codec"] == codec and info["channels"] == 2
        assert info["sample_rate"] == (48000 if codec == "opus"
                                       else 44100)
        hdrs = 2 if codec == "opus" else 3
        assert info["n_packets"] == 6 + hdrs
        assert info["duration_s"] > 0

    def test_determinism(self):
        assert build_ogg_stream(b"s", 4) == build_ogg_stream(b"s", 4)

    def test_crc_corruption_detected(self):
        s = bytearray(build_ogg_stream(b"s", 4))
        s[60] ^= 1
        with pytest.raises(ValueError, match="CRC|sync"):
            ogg_info(bytes(s))

    def test_lost_sync_detected(self):
        s = build_ogg_stream(b"s", 4)
        # clobber the SECOND page's capture pattern specifically
        at = s.find(b"OggS", 4)
        with pytest.raises(ValueError, match="sync"):
            ogg_info(s[:at] + b"XXXX" + s[at + 4:])

    def test_packet_spans_255_lacing_boundary(self):
        # the first audio packet is 300 B: lacing 255 + 45 — the
        # reassembler must yield ONE 300-byte packet
        s = build_ogg_stream(b"s", 3, codec="opus")
        pages = list(_pages(s))
        pkts = list(_packets(pages, pages[0]["serial"]))
        audio = pkts[2:]                  # after OpusHead + OpusTags
        assert len(audio[0]) == 300 and len(audio[1]) == 64

    def test_bos_eos_flags(self):
        s = build_ogg_stream(b"s", 3)
        pages = list(_pages(s))
        assert pages[0]["htype"] & 0x02            # BOS
        assert pages[-1]["htype"] & 0x04           # EOS
        assert not any(p["htype"] & 0x06 for p in pages[1:-1])


class TestContentHash:
    @pytest.mark.parametrize("codec", ["opus", "vorbis"])
    def test_tag_invariance(self, codec):
        a = build_ogg_stream(b"grp", 5, codec=codec)
        b = build_ogg_stream(b"grp", 5, codec=codec,
                             tags=b"artist=someone else")
        assert a != b
        assert ogg_audio_hash(a) == ogg_audio_hash(b)

    def test_content_sensitivity(self):
        assert ogg_audio_hash(build_ogg_stream(b"A", 5)) != \
            ogg_audio_hash(build_ogg_stream(b"B", 5))
        assert ogg_audio_hash(build_ogg_stream(b"A", 5)) != \
            ogg_audio_hash(build_ogg_stream(b"A", 6))

    def test_audio_content_hash_routes_ogg(self):
        from datasketches_spark_spark.operators import (
            audio_content_hash)
        s = build_ogg_stream(b"x", 4)
        assert audio_content_hash(s) == ogg_audio_hash(s)

    def test_decode_audio_refusal_names_alternatives(self):
        from datasketches_spark_spark.operators import decode_audio
        with pytest.raises(NotImplementedError) as ei:
            decode_audio(build_ogg_stream(b"x", 3))
        assert "ogg_info" in str(ei.value)
        assert "audio_content_hash" in str(ei.value)

    def test_empty_and_garbage(self):
        assert not is_ogg(b"RIFF")
        with pytest.raises(ValueError):
            ogg_audio_hash(b"OggS" + b"\x00" * 10)


class TestFlacDeclaredHeaders:
    """r18 ADVICE fix: the Ogg-FLAC mapping header DECLARES its
    header-packet count (BE u16 at bytes 7-8); extra metadata packets
    (seektable/padding) must not leak into ogg_audio_hash."""

    def test_flac_tag_invariance_with_extra_headers(self):
        a = build_ogg_stream(b"grp", 5, codec="flac", extra_headers=3)
        b = build_ogg_stream(b"grp", 5, codec="flac", extra_headers=3,
                             tags=b"artist=someone else")
        assert a != b
        assert ogg_audio_hash(a) == ogg_audio_hash(b)

    def test_extra_metadata_packets_excluded(self):
        # same audio, different number of metadata header packets:
        # the content hash must collapse them
        a = build_ogg_stream(b"grp", 5, codec="flac", extra_headers=0)
        b = build_ogg_stream(b"grp", 5, codec="flac", extra_headers=4)
        assert ogg_audio_hash(a) == ogg_audio_hash(b)

    def test_flac_content_sensitivity(self):
        assert ogg_audio_hash(
            build_ogg_stream(b"A", 5, codec="flac", extra_headers=2)
        ) != ogg_audio_hash(
            build_ogg_stream(b"B", 5, codec="flac", extra_headers=2))

    def test_declared_count_parsed(self):
        from datasketches_spark_spark.operators.oggcodec import (
            _codec_of, _header_packet_count)
        s = build_ogg_stream(b"x", 3, codec="flac", extra_headers=2)
        first = next(_packets(list(_pages(s)), 0x5F17AB1E))
        assert _codec_of(first) == "flac"
        assert _header_packet_count("flac", first) == 4  # ident+cmt+2

    def test_declared_zero_falls_back_to_minimum(self):
        from datasketches_spark_spark.operators.oggcodec import (
            _header_packet_count)
        ident = b"\x7fFLAC" + bytes([1, 0]) + b"\x00\x00" + b"fLaC"
        assert _header_packet_count("flac", ident) == 2


class TestPacketStats:
    """r18: ogg_info packet-level fields (the mp3_info parity) —
    audio-quality filtering on Ogg without decode."""

    def test_audio_packet_fields(self):
        s = build_ogg_stream(b"seed", 6, codec="opus")
        info = ogg_info(s)
        assert info["n_audio_packets"] == 6
        # fixture: first audio packet 300 B, the rest 64 B
        assert info["audio_bytes"] == 300 + 5 * 64
        assert info["max_packet_bytes"] == 300
        assert info["mean_packet_bytes"] == round((300 + 5 * 64) / 6, 1)
        assert info["bitrate_kbps"] == round(
            info["audio_bytes"] * 8 / 1000 / info["duration_s"], 1)

    def test_header_packets_excluded_per_codec(self):
        v = ogg_info(build_ogg_stream(b"x", 5, codec="vorbis"))
        assert v["n_packets"] == 5 + 3 and v["n_audio_packets"] == 5
        f = ogg_info(build_ogg_stream(b"x", 5, codec="flac",
                                      extra_headers=3))
        assert f["n_packets"] == 5 + 5 and f["n_audio_packets"] == 5

    def test_tags_do_not_change_audio_stats(self):
        a = ogg_info(build_ogg_stream(b"g", 4))
        b = ogg_info(build_ogg_stream(b"g", 4, tags=b"artist=x"))
        for k in ("n_audio_packets", "audio_bytes",
                  "mean_packet_bytes", "max_packet_bytes"):
            assert a[k] == b[k]
