"""MPEG audio (MP3) frame-metadata parsing (operators/mp3codec.py):
synthetic frame chains (CBR/VBR, ID3 tags, Xing header), exact duration
math, and the decode refusal routing."""

import numpy as np
import pytest

from datasketches_spark_spark.operators.mp3codec import (
    _parse_header,
    is_mp3,
    mp3_info,
)


def _frame(version=3, layer=3, br_idx=9, sr_idx=0, padding=0,
           mode=0) -> bytes:
    """One MPEG frame with a zero payload. Defaults: MPEG1 Layer III
    128 kbps 44100 Hz stereo."""
    b1 = 0xE0 | (version << 3) | ((4 - layer) << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = mode << 6
    hdr = bytes([0xFF, b1, b2, b3])
    info = _parse_header(hdr, 0)
    assert info is not None
    return hdr + b"\x00" * (info["frame_len"] - 4)


def _id3v2(size=100) -> bytes:
    body = b"\x00" * size
    return (b"ID3\x04\x00\x00"
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F]) + body)


def test_cbr_chain_duration_and_rates():
    n = 38
    data = _id3v2() + _frame() * n + b"TAG" + b"\x00" * 125
    assert is_mp3(data)
    info = mp3_info(data)
    assert info["version"] == "1" and info["layer"] == 3
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["n_frames"] == n and info["vbr"] is False
    assert info["duration_s"] == round(n * 1152 / 44100, 3)
    assert info["bitrate_kbps"] == pytest.approx(128, rel=0.02)


def test_vbr_chain_and_padding():
    frames = [_frame(br_idx=i % 3 + 8, padding=i % 2) for i in range(20)]
    info = mp3_info(b"".join(frames))
    assert info["vbr"] is True and info["n_frames"] == 20
    # byte-weighted average sits between the min and max nominal rates
    assert 112 <= info["bitrate_kbps"] <= 160


def test_xing_frame_count_wins():
    """A Xing header in the first frame carries the authoritative frame
    count (the common LAME VBR layout): duration uses it."""
    first = bytearray(_frame())
    off = 36  # MPEG1 stereo side-info offset
    first[off:off + 4] = b"Xing"
    first[off + 4:off + 8] = (1).to_bytes(4, "big")       # FRAMES flag
    first[off + 8:off + 12] = (500).to_bytes(4, "big")    # frame count
    data = bytes(first) + _frame() * 4
    info = mp3_info(data)
    assert info["n_frames"] == 500 and info["vbr"] is True
    assert info["duration_s"] == round(500 * 1152 / 44100, 3)


def test_mpeg2_layer3_and_mono():
    data = _frame(version=2, sr_idx=0, mode=3) * 10
    info = mp3_info(data)
    assert info["version"] == "2" and info["sample_rate"] == 22050
    assert info["channels"] == 1 and info["mode"] == "mono"
    assert info["duration_s"] == round(10 * 576 / 22050, 3)


def test_corrupt_and_refusals():
    with pytest.raises(ValueError, match="no frame sync"):
        mp3_info(b"\x00" * 64)
    good = _frame() * 6
    broken = good[: len(_frame()) * 2] + b"\x12\x34" \
        + good[len(_frame()) * 2:]
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_info(broken)
    mixed = _frame() + _frame(sr_idx=1)
    with pytest.raises(ValueError, match="mixed"):
        mp3_info(mixed)
    from datasketches_spark_spark.operators import decode_audio
    with pytest.raises(NotImplementedError, match="mp3_info"):
        decode_audio(_id3v2() + _frame() * 3)


def test_trailing_garbage_tolerated_at_tail_only():
    data = _frame() * 5 + b"\x01\x02\x03"  # short, non-frame tail
    assert mp3_info(data)["n_frames"] == 5


class TestAudioHash:
    """r17: tag-invariant MP3 content identity (mp3_audio_hash)."""

    def _stream(self, seed=b"A", n=6, **kw):
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        return build_frame_stream(seed, n, **kw)

    def test_tag_and_metadata_frame_invariance(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        base = self._stream()
        h = mp3_audio_hash(base)
        id3v2 = (b"ID3\x04\x00\x00\x00\x00\x00\x20" + b"\x00" * 32)
        assert mp3_audio_hash(id3v2 + base) == h          # ID3v2
        assert mp3_audio_hash(base + b"TAG" + b"\x00" * 125) == h
        assert mp3_audio_hash(self._stream(xing=True)) == h   # Info
        # a different ID3v2 payload (retag) still collapses
        id3b = (b"ID3\x03\x00\x00\x00\x00\x00\x10" + b"\xaa" * 16)
        assert mp3_audio_hash(id3b + base + b"TAG" + b"\x01" * 125) == h

    def test_different_audio_differs(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        assert mp3_audio_hash(self._stream(b"A")) != \
            mp3_audio_hash(self._stream(b"B"))
        assert mp3_audio_hash(self._stream(b"A", n=6)) != \
            mp3_audio_hash(self._stream(b"A", n=7))

    def test_non_mp3_raises(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        with pytest.raises(ValueError, match="MPEG"):
            mp3_audio_hash(b"RIFF" + b"\x00" * 64)

    def test_builder_streams_walk_clean(self):
        info = mp3_info(self._stream(n=9))
        assert info["n_frames"] == 9 and info["layer"] == 3


class TestNativeDecode:
    """r17: the system-libmpg123 path (mp3native.py). On images
    without the library (this one — probed) the refusal path is
    asserted; when a future image carries libmpg123 the decode path
    cross-validates against a WAV-encoded reference tone."""

    def test_availability_is_probed_not_assumed(self):
        from datasketches_spark_spark.operators.mp3native import (
            mpg123_available)
        assert mpg123_available() in (True, False)

    def test_decode_or_refusal(self):
        import numpy as np
        from datasketches_spark_spark.operators.mp3native import (
            mp3_decode_pcm, mpg123_available)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        if not mpg123_available():
            with pytest.raises(NotImplementedError, match="libmpg123"):
                mp3_decode_pcm(build_frame_stream(b"x", 4))
            return
        # library present: the binding must decode SOMETHING sane
        # from a real MP3; the filler fixture is not decodable audio,
        # so only the structural call path is checked here — real
        # validation needs a genuine MP3 fixture, which only a
        # lib-bearing image can mint (encode via lame/ffmpeg there).
        with pytest.raises(ValueError):
            mp3_decode_pcm(b"\xff\xfb" + b"\x00" * 10)

    def test_decode_audio_dispatch_names_alternatives(self):
        from datasketches_spark_spark.operators import decode_audio
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        from datasketches_spark_spark.operators.mp3native import (
            mpg123_available)
        if mpg123_available():
            pytest.skip("library present: dispatch goes to mp3native")
        with pytest.raises(NotImplementedError) as ei:
            decode_audio(build_frame_stream(b"x", 4))
        msg = str(ei.value)
        assert "libmpg123" in msg and "mp3_audio_hash" in msg


class TestReviewR17:
    """r17 code-review regressions (mp3 side)."""

    def test_truncated_final_frame_keeps_tag_invariance(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        full = build_frame_stream(b"A", 6)
        trunc = full[:-40]                   # cut the last frame short
        h = mp3_audio_hash(trunc)
        assert mp3_audio_hash(trunc + b"TAG" + b"\x00" * 125) == h
        assert mp3_audio_hash(trunc + b"TAG" + b"\x01" * 125) == h

    def test_sub_128_byte_stream_does_not_wrap(self):
        # a single 104-byte frame (32 kbps / 44.1 kHz) whose body
        # happens to contain 'TAG' at the wrap offset must still hash
        # its frame, not md5-of-nothing
        from datasketches_spark_spark.operators import mp3_audio_hash
        from datasketches_spark_spark.operators.mp3codec import (
            mp3_info)
        hdr = bytes([0xFF, 0xFB, 0x10, 0x00])  # 32 kbps / 44.1 kHz
        body = bytearray(100)
        # the pre-fix probe read data[len-128:len-125] == data[-24:-21]
        body[100 - 24:100 - 21] = b"TAG"
        frame = hdr + bytes(body)
        assert len(frame) == 104
        import hashlib
        assert mp3_audio_hash(frame) == \
            hashlib.md5(frame).hexdigest()
        assert mp3_info(frame)["n_frames"] == 1


class TestTrailingTags:
    """r18 ADVICE fix: trailing APEv2/Lyrics3/extended-ID3v1 metadata
    (>= one frame length) terminates the walk cleanly instead of
    raising 'lost frame sync'; mid-stream desync still raises."""

    def _stream(self, seed=b"A", n=6):
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        return build_frame_stream(seed, n)

    def _ape_tag(self, nbytes=512):
        # APEv2 footer-only tag: 32-byte header/footer marker + items
        body = b"\x00" * (nbytes - 32)
        footer = (b"APETAGEX" + (2000).to_bytes(4, "little")
                  + nbytes.to_bytes(4, "little")
                  + (1).to_bytes(4, "little") + b"\x00" * 12)
        return body[:0] + footer + body  # marker leads in this layout

    def test_apev2_tail_tolerated(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        from datasketches_spark_spark.operators.mp3codec import mp3_info
        base = self._stream()
        tagged = base + self._ape_tag(600)
        assert mp3_info(tagged)["n_frames"] == 6
        assert mp3_audio_hash(tagged) == mp3_audio_hash(base)

    def test_lyrics3_tail_tolerated(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        base = self._stream()
        lyr = b"LYRICSBEGIN" + b"L" * 900 + b"LYRICS200"
        tagged = base + lyr + b"TAG" + b"\x00" * 125
        assert mp3_audio_hash(tagged) == mp3_audio_hash(base)

    def test_trailing_id3v2_tolerated(self):
        from datasketches_spark_spark.operators import mp3_audio_hash
        base = self._stream()
        id3 = b"ID3\x04\x00\x00\x00\x00\x04\x00" + b"\x00" * 512
        assert mp3_audio_hash(base + id3) == mp3_audio_hash(base)

    def test_mid_stream_desync_still_raises(self):
        from datasketches_spark_spark.operators.mp3codec import mp3_info
        base = self._stream(n=8)
        corrupt = base[:500] + b"\x00" * 800 + base[500:]
        with pytest.raises(ValueError, match="lost frame sync"):
            mp3_info(corrupt)
