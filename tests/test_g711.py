"""ITU-T G.711 mu-law / A-law WAV support, validated bit-exact against
the stdlib ``audioop`` reference implementation — a REAL in-container
oracle (the reason G.711 ships while MP3/VP8 sample decode stay honest
refusals: their normative tables have no reference here to validate
against)."""

import numpy as np
import pytest

from datasketches_spark_spark.operators import (
    decode_wav,
    encode_wav,
    g711_alaw_to_linear,
    g711_linear_to_alaw,
    g711_linear_to_ulaw,
    g711_ulaw_to_linear,
)

audioop = pytest.importorskip("audioop")


def test_decode_all_256_codes_match_audioop():
    codes = np.arange(256, dtype=np.uint8)
    ref_u = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), np.int16)
    ref_a = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), np.int16)
    assert np.array_equal(g711_ulaw_to_linear(codes), ref_u)
    assert np.array_equal(g711_alaw_to_linear(codes), ref_a)


def test_encode_full_16bit_domain_matches_audioop():
    x = np.arange(-32768, 32768, dtype=np.int16)
    ref_u = np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    ref_a = np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), np.uint8)
    assert np.array_equal(g711_linear_to_ulaw(x), ref_u)
    assert np.array_equal(g711_linear_to_alaw(x), ref_a)


@pytest.mark.parametrize("codec,tag", [("ulaw", 7), ("alaw", 6)])
def test_wav_roundtrip_and_features(codec, tag):
    """encode_wav(codec=...) -> decode_wav recovers the signal within
    G.711 segment quantization; the header carries the right format
    tag; decode_audio's sniffing dispatcher handles it."""
    from datasketches_spark_spark.operators.audiocodec import decode_audio
    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    blob = encode_wav(x, 8000, codec=codec)
    assert blob[20:22] == bytes([tag, 0])
    y, rate = decode_wav(blob)
    assert rate == 8000 and y.shape == (800, 1)
    # mu/A-law SNR on a half-scale sine is ~35+ dB; 2% absolute is loose
    assert np.abs(y[:, 0] - x).max() < 0.02
    y2, _ = decode_audio(blob)
    assert np.array_equal(y, y2)


def test_g711_stereo_and_silence():
    x = np.zeros((64, 2))
    y, rate = decode_wav(encode_wav(x, 16000, codec="ulaw"))
    assert y.shape == (64, 2)
    # mu-law code for 0 decodes to exactly 0
    assert np.abs(y).max() == 0.0


def test_monotonic_decode():
    """Decoded magnitudes are monotone in segment/mantissa order — a
    structural property a transcription slip would break."""
    codes = np.arange(128, dtype=np.uint8)  # one sign half
    u = g711_ulaw_to_linear(codes)
    assert (np.diff(u) > 0).all() or (np.diff(u) < 0).all()
