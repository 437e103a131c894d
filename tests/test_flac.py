"""Pure-Python FLAC codec (operators/flaccodec.py): lossless roundtrips,
hand-built LPC and stereo-decorrelation streams, refusals."""

import numpy as np
import pytest

from datasketches_spark_spark.operators.flaccodec import (
    _BitW, _rice_write, crc8, crc16, decode_flac, encode_flac, flac_info,
    is_flac)


def _q16(x):
    return np.clip(np.round(np.asarray(x) * 32768), -32768, 32767) / 32768


def test_mono_lossless_roundtrip():
    rng = np.random.default_rng(9)
    x = _q16(0.5 * np.sin(np.arange(10_000) * 0.01)
             + 0.1 * rng.standard_normal(10_000))
    data = encode_flac(x, 8000)
    assert is_flac(data)
    dec, rate = decode_flac(data)
    assert rate == 8000 and dec.shape == (10_000, 1)
    assert np.abs(dec[:, 0] - x).max() == 0.0


def test_stereo_and_multiblock_lossless():
    rng = np.random.default_rng(10)
    left = _q16(0.3 * rng.standard_normal(5000))
    right = _q16(-0.5 * left)
    st = np.stack([left, right], axis=1)
    dec, rate = decode_flac(encode_flac(st, 44100, block_size=1024))
    assert rate == 44100 and dec.shape == (5000, 2)
    assert np.abs(dec - st).max() == 0.0


def test_info_and_silence():
    info = flac_info(encode_flac(np.zeros(5000), 16000))
    assert info == {"sample_rate": 16000, "channels": 1,
                    "bits_per_sample": 16, "total_samples": 5000}
    dec, _ = decode_flac(encode_flac(np.zeros(5000), 16000))
    assert float(np.abs(dec).max()) == 0.0


def _frame_header(w, nch, bs, depth_code=4, frame_no=0):
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)       # blocksize: 16-bit at end
    w.write(0, 4)       # rate from STREAMINFO
    return w


def _streaminfo(rate, nch, depth, total, block_size):
    import struct
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(depth - 1, 5)
    si.write(total, 36)
    si.out += bytes(16)
    return (b"fLaC" + bytes([0x80])
            + struct.pack(">I", len(si.out))[1:] + bytes(si.out))


def test_lpc_subframe_decodes():
    """Hand-built LPC subframe (order 2, coefs [3, -2], shift 1): the
    decoder must run the exact integer prediction recurrence."""
    bs = 16
    warm = [100, 110]
    coefs = [3, -2]
    shift = 1
    res = [5, -3, 2, 0, 1, -1, 4, -2, 0, 3, -5, 2, 1, 0]
    expect = list(warm)
    for r in res:
        pred = (coefs[0] * expect[-1] + coefs[1] * expect[-2]) >> shift
        expect.append(r + pred)
    w = _BitW()
    _frame_header(w, 1, bs)
    w.write(0, 4)        # channels: 1 (code 0)
    w.write(4, 3)        # 16-bit
    w.write(0, 1)
    w.write(0, 8)        # frame number 0
    w.write(bs - 1, 16)
    w.write(crc8(bytes(w.out)), 8)
    # subframe: LPC order 2 => type 32 + (2-1) = 33
    w.write(0, 1)
    w.write(33, 6)
    w.write(0, 1)        # no wasted bits
    for v in warm:
        w.write(v, 16)
    w.write(15 - 1, 4)   # precision 15 bits (code = prec-1)
    w.write(shift, 5)
    for c in coefs:
        w.write(c & 0x7FFF, 15)
    w.write(0, 2)        # 4-bit rice
    w.write(0, 4)        # partition order 0
    w.write(3, 4)        # rice param
    for r in res:
        _rice_write(w, r, 3)
    w.align()
    w.write(crc16(bytes(w.out)), 16)
    data = _streaminfo(8000, 1, 16, bs, bs) + bytes(w.out)
    dec, rate = decode_flac(data)
    got = np.round(dec[:, 0] * 32768).astype(int)
    assert list(got) == expect


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    """Hand-built decorrelated stereo frames (CONSTANT subframes): all
    three reconstruction formulas."""
    bs = 8
    left, right = 1000, 400
    side = left - right
    w = _BitW()
    _frame_header(w, 2, bs)
    code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    w.write(code, 4)
    w.write(4, 3)
    w.write(0, 1)
    w.write(0, 8)
    w.write(bs - 1, 16)
    w.write(crc8(bytes(w.out)), 8)

    def const(v, depth):
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(v & ((1 << depth) - 1), depth)

    if mode == "left_side":
        const(left, 16)
        const(side, 17)
    elif mode == "right_side":
        const(side, 17)
        const(right, 16)
    else:
        mid = (left + right) >> 1
        const(mid, 16)
        const(side, 17)
    w.align()
    w.write(crc16(bytes(w.out)), 16)
    data = _streaminfo(8000, 2, 16, bs, bs) + bytes(w.out)
    dec, _ = decode_flac(data)
    got = np.round(dec * 32768).astype(int)
    assert (got[:, 0] == left).all() and (got[:, 1] == right).all(), mode


def test_refusals_and_corrupt():
    with pytest.raises(ValueError):
        decode_flac(b"not flac")
    with pytest.raises(ValueError):
        flac_info(b"xxxx")
    good = encode_flac(np.zeros(1000), 8000)
    with pytest.raises(ValueError):
        decode_flac(good[:40])
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 3)), 8000)  # >2 channels


def test_decode_audio_dispatches_flac():
    from datasketches_spark_spark.operators import decode_audio, encode_wav
    x = _q16(np.sin(np.arange(500) * 0.2) * 0.4)
    df, rf = decode_audio(encode_flac(x, 8000))
    dw, rw = decode_audio(encode_wav(x, 8000))
    assert rf == rw == 8000
    assert np.abs(df[:, 0] - x).max() == 0.0
    assert np.abs(dw[:, 0] - x).max() == 0.0
    # ID3-tagged payloads now route to the mp3 metadata path's refusal
    with pytest.raises(NotImplementedError, match="mp3_info"):
        decode_audio(b"ID3\x04" + b"\x00" * 32)
    # r17: Ogg has its own refusal naming the structural alternatives
    with pytest.raises(NotImplementedError, match="ogg_info"):
        decode_audio(b"OggS" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="audio codec"):
        decode_audio(b"MThd" + b"\x00" * 32)  # MIDI: still unnamed


def test_crc_values_and_corruption_detected():
    """Encoder writes real header CRC-8 (poly 0x07) and frame CRC-16
    (poly 0x8005); the decoder verifies both, so one flipped payload bit
    is a hard error, not silent corruption."""
    assert crc8(b"123456789") == 0xF4          # CRC-8/SMBUS check value
    assert crc16(b"123456789") == 0xFEE8       # CRC-16/UMTS (poly 0x8005, init 0)
    x = _q16(np.sin(np.arange(3000) * 0.05) * 0.6)
    data = bytearray(encode_flac(x, 8000, block_size=1024))
    decode_flac(bytes(data))
    data[-40] ^= 0x10                          # flip a bit mid-payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def test_frame_number_utf8_four_byte_form():
    """Frame 65536+ needs the 4-byte UTF-8 form; the old encoder silently
    masked the lead byte. block_size=1 drives the frame counter past
    0x10000 cheaply."""
    n = 0x10000 + 40
    x = np.round(np.sin(np.arange(n) * 0.3) * 100) / 32768
    data = encode_flac(x, 8000, block_size=1)
    dec, _ = decode_flac(data)
    assert dec.shape == (n, 1)
    assert np.abs(dec[:, 0] - x).max() == 0.0


def test_unknown_total_samples_with_trailing_bytes():
    """STREAMINFO total_samples=0 is the legal 'unknown' value: decode
    must stop cleanly at a byte-aligned non-sync tail instead of raising
    'lost frame sync'."""
    x = _q16(np.sin(np.arange(2048) * 0.1) * 0.5)
    enc = encode_flac(x, 8000, block_size=1024)
    frames = enc[42:]  # 4 sig + 4 block hdr + 34 STREAMINFO
    data = _streaminfo(8000, 1, 16, 0, 1024) + frames + b"APETAGEX" * 4
    dec, rate = decode_flac(data)
    assert rate == 8000 and dec.shape == (2048, 1)
    assert np.abs(dec[:, 0] - x).max() == 0.0


class TestContentHashR17:
    """r17: container-metadata-invariant audio identity
    (audiocodec.audio_content_hash) + the STREAMINFO raw-samples md5
    the FLAC encoder now writes (spec content signature, cross-checked
    against the DECODE path)."""

    def _tone(self, f=40):
        import numpy as np
        return np.sin(np.linspace(0, f, 2000))

    def test_streaminfo_md5_matches_decoded_samples(self):
        import numpy as np
        from datasketches_spark_spark.operators.flaccodec import (
            decode_flac, encode_flac, raw_samples_md5)
        blob = encode_flac(self._tone(), 8000)
        x, _ = decode_flac(blob)
        q = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int64)
        # STREAMINFO md5 field: after 'fLaC' + block header(4) + 18
        assert blob[26:42] == raw_samples_md5(q, 16)

    def test_cross_container_and_tag_invariance(self):
        import struct
        from datasketches_spark_spark.operators import (
            audio_content_hash, encode_wav)
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        t = self._tone()
        flac = encode_flac(t, 8000)
        tagged = encode_flac(t, 8000, tags={"artist": "a", "t": "x"})
        assert tagged != flac
        wav = encode_wav(t, 8000)
        lst = (b"LIST" + struct.pack("<I", 12) + b"INFOIART"
               + struct.pack("<I", 0))
        wav_meta = wav[:12] + lst + wav[12:]
        wav_meta = (wav_meta[:4]
                    + struct.pack("<I", len(wav_meta) - 8)
                    + wav_meta[8:])
        hs = {audio_content_hash(b)
              for b in (flac, tagged, wav, wav_meta)}
        assert len(hs) == 1          # one identity across containers
        assert audio_content_hash(
            encode_wav(self._tone(25), 8000)) not in hs

    def test_tagged_flac_still_decodes(self):
        import numpy as np
        from datasketches_spark_spark.operators.flaccodec import (
            decode_flac, encode_flac)
        t = self._tone()
        x, r = decode_flac(encode_flac(t, 8000, tags={"k": "v"}))
        x0, _ = decode_flac(encode_flac(t, 8000))
        assert r == 8000 and np.array_equal(x, x0)

    def test_unset_streaminfo_md5_falls_back_to_frames(self):
        from datasketches_spark_spark.operators import (
            audio_content_hash)
        from datasketches_spark_spark.operators.flaccodec import (
            encode_flac)
        blob = bytearray(encode_flac(self._tone(), 8000))
        blob[26:42] = bytes(16)          # encoder left md5 unset
        h1 = audio_content_hash(bytes(blob))
        assert h1 != audio_content_hash(
            bytes(blob[:200]) + b"\x00" + bytes(blob[201:]))

    def test_mp3_routes_through_frame_hash(self):
        from datasketches_spark_spark.operators import (
            audio_content_hash, mp3_audio_hash)
        from datasketches_spark_spark.operators.mp3codec import (
            build_frame_stream)
        s = build_frame_stream(b"x", 5)
        assert audio_content_hash(s) == mp3_audio_hash(s)

    def test_unknown_container_raises(self):
        import pytest as _pt
        from datasketches_spark_spark.operators import (
            audio_content_hash)
        with _pt.raises(ValueError, match="content-hash"):
            audio_content_hash(b"MThd not audio we hash")
