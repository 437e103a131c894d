"""Lossless JPEG (SOF3, operators/jpeglossless.py, r16): exact
write/read symmetry, a HAND-COMPUTED golden entropy stream (decoder
and encoder pinned independently — a symmetric bug cannot hide),
Annex-H boundary rules, and the refusal paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.jpeglossless import (
    decode_jpeg_lossless, encode_jpeg_lossless)


class TestRoundtrip:
    @pytest.mark.parametrize("predictor", list(range(1, 8)))
    def test_gray_all_predictors(self, predictor):
        rng = np.random.default_rng(predictor)
        img = rng.integers(0, 256, (13, 17)).astype(np.uint8)
        back = decode_jpeg_lossless(
            encode_jpeg_lossless(img, predictor=predictor))
        assert back.dtype == np.uint8
        assert np.array_equal(back, img)

    @pytest.mark.parametrize("predictor", [1, 4, 7])
    def test_rgb(self, predictor):
        rng = np.random.default_rng(40 + predictor)
        img = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
        back = decode_jpeg_lossless(
            encode_jpeg_lossless(img, predictor=predictor))
        assert np.array_equal(back, img)

    def test_16bit(self):
        rng = np.random.default_rng(99)
        img = rng.integers(0, 65536, (7, 5)).astype(np.uint16)
        back = decode_jpeg_lossless(encode_jpeg_lossless(img))
        assert back.dtype == np.uint16
        assert np.array_equal(back, img)

    def test_point_transform_drops_low_bits_losslessly(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        back = decode_jpeg_lossless(
            encode_jpeg_lossless(img, point_transform=2))
        assert np.array_equal(back, (img >> 2) << 2)

    def test_deterministic(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert encode_jpeg_lossless(img) == encode_jpeg_lossless(img)

    def test_gradient_compresses(self):
        # predictor 4 (a+b-c) makes a linear ramp all-zero residuals
        img = (np.arange(64)[:, None] + np.arange(64)[None, :]) \
            .astype(np.uint8)
        blob = encode_jpeg_lossless(img, predictor=4)
        # interior residuals are all zero; the tuned table prices them
        # at ~1 bit, so the stream is a small fraction of the raster
        assert len(blob) < img.size // 2
        assert np.array_equal(decode_jpeg_lossless(blob), img)

    def test_extreme_values_and_wraparound(self):
        # residuals spanning the full +-255 range plus the 32768 path
        img = np.array([[0, 255, 0, 255], [255, 0, 255, 0]],
                       dtype=np.uint8)
        for p in range(1, 8):
            assert np.array_equal(
                decode_jpeg_lossless(encode_jpeg_lossless(
                    img, predictor=p)), img)
        big = np.array([[0, 32768, 0], [65535, 1, 65535]],
                       dtype=np.uint16)
        for p in (1, 4):
            assert np.array_equal(
                decode_jpeg_lossless(encode_jpeg_lossless(
                    big, predictor=p)), big)


class TestGoldenVector:
    """Hand-computed streams for [100, 101, 99] (1x3 gray, predictor
    1, P=8, Pt=0) — Annex H math done by hand:

      sample 0: pred = 2^7 = 128, diff = -28 -> SSSS 5, bits
                -28 + 31 = 3 = 00011
      sample 1: pred = Ra = 100, diff = +1 -> SSSS 1, bits 1
      sample 2: pred = Ra = 101, diff = -2 -> SSSS 2, bits
                -2 + 3 = 1 = 01

    ENCODER side (frequency-tuned table): categories {5, 1, 2} once
    each + the reserved dummy = four weight-1 leaves -> all 2-bit
    codes; canonical (length, symbol) order gives 1->00, 2->01,
    5->10, dummy->11 (unused all-ones). Stream:
    10 00011 | 00 1 | 01 01 -> 14 bits, 1-padded to 16:
    10000110 01010111.

    DECODER side: an INDEPENDENTLY hand-built file with a flat 5-bit
    table (code(s) = s): 00101 00011 | 00001 1 | 00010 01 -> 22
    bits, 1-padded: 00101000 11000011 00010011.
    """

    FLAT_ENTROPY = bytes([0b00101000, 0b11000011, 0b00010011])
    TUNED_ENTROPY = bytes([0b10000110, 0b01010111])

    def test_encoder_emits_hand_bytes(self):
        img = np.array([[100, 101, 99]], dtype=np.uint8)
        blob = encode_jpeg_lossless(img, predictor=1)
        # entropy segment = after the SOS payload, before EOI
        sos = blob.index(b"\xff\xda")
        (ln,) = struct.unpack(">H", blob[sos + 2:sos + 4])
        seg = blob[sos + 2 + ln:-2]
        assert seg == self.TUNED_ENTROPY

    def test_decoder_reads_hand_built_stream(self):
        # built here with independent arithmetic (no encoder calls)
        bits = [0] * 16
        bits[4] = 17
        dht = bytes([0x00]) + bytes(bits) + bytes(range(17))
        sof = struct.pack(">BHHB", 8, 1, 3, 1) + bytes([1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 1, 0, 0])
        blob = (b"\xff\xd8"
                + b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
                + b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
                + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                + self.FLAT_ENTROPY + b"\xff\xd9")
        out = decode_jpeg_lossless(blob)
        assert out.shape == (1, 3)
        assert out.tolist() == [[100, 101, 99]]


class TestDispatchAndRefusals:
    def test_decode_jpeg_dispatches_sof3(self):
        from datasketches_spark_spark.operators import decode_jpeg
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(img)), img)

    def test_decode_image_sniffs_it(self):
        from datasketches_spark_spark.operators import decode_image
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        assert np.array_equal(
            decode_image(encode_jpeg_lossless(img)), img)

    def test_sof11_named_refusal(self):
        img = np.zeros((2, 2), dtype=np.uint8)
        blob = bytearray(encode_jpeg_lossless(img))
        blob[blob.index(b"\xff\xc3") + 1] = 0xCB
        with pytest.raises(NotImplementedError, match="SOF11"):
            decode_jpeg_lossless(bytes(blob))

    def test_subsampled_refused_by_name(self):
        img = np.zeros((2, 2), dtype=np.uint8)
        blob = bytearray(encode_jpeg_lossless(img))
        i = blob.index(b"\xff\xc3")
        # component HV byte sits at SOF payload offset 7 (id, HV, Tq)
        blob[i + 4 + 7] = 0x21
        with pytest.raises(NotImplementedError, match="subsampled"):
            decode_jpeg_lossless(bytes(blob))

    def test_truncated_raises_value_error(self):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = encode_jpeg_lossless(img)
        with pytest.raises(ValueError):
            decode_jpeg_lossless(blob[:len(blob) // 2])

    def test_hierarchical_refusal_names_sof3_as_supported(self):
        from datasketches_spark_spark.operators import decode_jpeg
        img = np.zeros((2, 2), dtype=np.uint8)
        blob = bytearray(encode_jpeg_lossless(img))
        blob[blob.index(b"\xff\xc3") + 1] = 0xC5
        with pytest.raises(NotImplementedError, match="SOF5"):
            decode_jpeg(bytes(blob))

    def test_restart_bytes_mid_amplitude_raise_value_error(self):
        # FF D0 landing where amplitude bits are expected must surface
        # as the public ValueError, not the private _RestartMarker
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        blob = bytearray(encode_jpeg_lossless(img))
        sos = blob.index(b"\xff\xda")
        (ln,) = struct.unpack(">H", bytes(blob[sos + 2:sos + 4]))
        ent = sos + 2 + ln
        blob[ent + 2:ent + 4] = b"\xff\xd0"
        with pytest.raises(ValueError):
            decode_jpeg_lossless(bytes(blob))

    def test_fibonacci_histogram_falls_back_to_flat_table(self):
        # depth-17 Huffman shapes must not crash the encoder — the
        # builder falls back to the flat 5-bit table
        import numpy as np
        from datasketches_spark_spark.operators.jpeglossless import (
            _huffman_bits_vals)
        fib = [1, 1]
        while len(fib) < 17:
            fib.append(fib[-1] + fib[-2])
        bits, vals = _huffman_bits_vals(np.array(fib))
        assert bits[4] == 17 and vals == list(range(17))

    def test_auto_predictor_roundtrips_and_near_minimal(self):
        import numpy as np
        from datasketches_spark_spark.operators.jpeglossless import (
            decode_jpeg_lossless, encode_jpeg_lossless)
        # auto models entropy bits + DHT size exactly; FF byte-
        # stuffing is data-dependent and unmodeled, so "minimal up to
        # a few stuffing bytes" is the documented contract
        rng = np.random.default_rng(11)
        for img in (((np.arange(32)[:, None] * 3
                      + np.arange(40)[None, :]) % 256)
                    .astype(np.uint8),
                    rng.integers(0, 256, (16, 16, 3)).astype(np.uint8),
                    rng.integers(0, 65536, (10, 9)).astype(np.uint16)):
            blob = encode_jpeg_lossless(img, predictor="auto")
            assert np.array_equal(decode_jpeg_lossless(blob), img)
            fixed = min(len(encode_jpeg_lossless(img, predictor=p))
                        for p in range(1, 8))
            assert len(blob) <= fixed + 8
            assert encode_jpeg_lossless(img, predictor="auto") == blob
