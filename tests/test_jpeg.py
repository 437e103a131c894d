"""Pure-numpy baseline JPEG codec (operators/jpegcodec.py): roundtrips,
subsampled decode, restart intervals, and honest refusals."""

import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.jpegcodec import (
    AC_CHR_BITS, AC_CHR_VALS, AC_LUM_BITS, AC_LUM_VALS, DC_CHR_BITS,
    DC_CHR_VALS, DC_LUM_BITS, DC_LUM_VALS, STD_CHR_Q, STD_LUM_Q,
    _BitWriter, _encode_amplitude, _encode_table, decode_jpeg, encode_jpeg)


def test_solid_gray_exact_roundtrip():
    # DC-only blocks at even offsets from 128 quantize exactly (Q[0]=16)
    for v in (78, 128, 130, 226):
        img = np.full((8, 16), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img)), img), v


def test_gradient_and_noise_error_bounds():
    g = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, quality=95))
    assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 3


def test_color_roundtrip_and_odd_dims():
    rgb = np.zeros((24, 16, 3), np.uint8)
    rgb[..., 0] = 200
    rgb[:12, :, 1] = 100
    rgb[..., 2] = 50
    dec = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec.shape == rgb.shape
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4
    odd = np.full((13, 11), 99, np.uint8)
    dec = decode_jpeg(encode_jpeg(odd))
    assert dec.shape == (13, 11)
    assert np.abs(dec.astype(int) - 99).max() <= 1


def test_quality_monotone():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    errs = []
    for q in (20, 50, 90):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def _marker(m, payload=b""):
    if payload:
        return bytes([0xFF, m]) + struct.pack(">H", 2 + len(payload)) \
            + payload
    return bytes([0xFF, m])


def _write_dc_only_block(writer, tabs, dc_val, pred):
    """Write one DC-only (EOB-terminated) block; returns new predictor."""
    dc_tab, ac_tab = tabs
    s, bits = _encode_amplitude(dc_val - pred)
    code, ln = dc_tab[s]
    writer.write(code, ln)
    if s:
        writer.write(bits, s)
    code, ln = ac_tab[0x00]
    writer.write(code, ln)
    return dc_val


def _build_stream(sof_comps, sos_comps, body, dri=None):
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, b"\x00" + bytes(STD_LUM_Q.astype(np.uint8)))
    out += _marker(0xDB, b"\x01" + bytes(STD_CHR_Q.astype(np.uint8)))
    for tc, bits, vals in (
            (0x00, DC_LUM_BITS, DC_LUM_VALS),
            (0x10, AC_LUM_BITS, AC_LUM_VALS),
            (0x01, DC_CHR_BITS, DC_CHR_VALS),
            (0x11, AC_CHR_BITS, AC_CHR_VALS)):
        out += _marker(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    out += _marker(0xC0, sof_comps)
    if dri is not None:
        out += _marker(0xDD, struct.pack(">H", dri))
    out += _marker(0xDA, sos_comps)
    out += body + b"\xff\xd9"
    return bytes(out)


def test_decode_420_subsampled():
    """Hand-built interleaved 4:2:0 stream (2x2 luma sampling, 16x16
    image, one MCU): solid mid-gray — validates the MCU block order and
    chroma pixel replication the 4:4:4 encoder cannot produce."""
    writer = _BitWriter()
    dc_lum = _encode_table(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _encode_table(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _encode_table(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _encode_table(AC_CHR_BITS, AC_CHR_VALS)
    v = 160  # Y DC = round(8*(160-128)/8/Q0)... choose via quantizer:
    # DC coefficient of a solid block = 8*(v-128); quantized by Q0=16
    dcq = round(8 * (v - 128) / STD_LUM_Q[0])  # = 16
    pred = 0
    for _ in range(4):  # 4 luma blocks in the 2x2 MCU
        pred = _write_dc_only_block(writer, (dc_lum, ac_lum), dcq, pred)
    _write_dc_only_block(writer, (dc_chr, ac_chr), 0, 0)  # Cb neutral
    _write_dc_only_block(writer, (dc_chr, ac_chr), 0, 0)  # Cr neutral
    writer.flush()
    sof = struct.pack(">BHHB", 8, 16, 16, 3) \
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    data = _build_stream(sof, sos, bytes(writer.out))
    dec = decode_jpeg(data)
    assert dec.shape == (16, 16, 3)
    expect = dcq * STD_LUM_Q[0] / 8 + 128  # = v when exact
    assert np.abs(dec.astype(float) - expect).max() <= 1


def test_decode_restart_intervals():
    """DRI=1 grayscale stream: predictor resets and RSTn markers are
    consumed between every MCU."""
    writer_blocks = []
    dc_lum = _encode_table(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _encode_table(AC_LUM_BITS, AC_LUM_VALS)
    vals = [96, 160]  # two 8x8 blocks -> 16x8 image
    body = bytearray()
    for i, v in enumerate(vals):
        w = _BitWriter()
        dcq = round(8 * (v - 128) / STD_LUM_Q[0])
        _write_dc_only_block(w, (dc_lum, ac_lum), dcq, 0)  # pred RESET
        w.flush()
        body += w.out
        if i == 0:
            body += bytes([0xFF, 0xD0])  # RST0
        writer_blocks.append(dcq)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    data = _build_stream(sof, sos, bytes(body), dri=1)
    dec = decode_jpeg(data)
    assert dec.shape == (8, 16)
    for i, dcq in enumerate(writer_blocks):
        expect = dcq * STD_LUM_Q[0] / 8 + 128
        got = dec[:, i * 8:(i + 1) * 8].astype(float)
        assert np.abs(got - expect).max() <= 1, (i, expect)


def test_nonbaseline_sof_refused_by_name():
    # progressive (SOF2) decodes as of round 8 — see
    # tests/test_jpeg_progressive.py; arithmetic/hierarchical refuse
    img = np.full((8, 8), 100, np.uint8)
    data = bytearray(encode_jpeg(img))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xCB  # SOF11 arithmetic lossless
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(data))


def test_corrupt_raises_valueerror():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    img = np.full((8, 8), 100, np.uint8)
    data = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(data[:len(data) // 2])  # truncated entropy segment


def test_decode_image_dispatches_jpeg():
    from datasketches_spark_spark.operators import decode_image
    img = np.full((8, 8), 130, np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(img)), img)


def test_multiscan_baseline_noninterleaved():
    """T.81 A.2 allows baseline SOF0 with one scan per component
    (non-interleaved). Built from the encoder's own pieces, it must
    decode identically to the interleaved single-scan encoding of the
    same image — and a stream that ends before all components have a
    scan must raise a named ValueError, not a KeyError."""
    import struct
    from datasketches_spark_spark.operators.jpegcodec import (
        AC_CHR_BITS, AC_CHR_VALS, AC_LUM_BITS, AC_LUM_VALS,
        DC_CHR_BITS, DC_CHR_VALS, DC_LUM_BITS, DC_LUM_VALS,
        _BitWriter, _encode_blocks, _encode_table, _fdct_quantize,
        _quality_tables, decode_jpeg, encode_jpeg)
    rng = np.random.default_rng(5)
    img = (rng.random((24, 17, 3)) * 255).astype(np.uint8)
    single = encode_jpeg(img)
    head = single[:single.find(b"\xff\xda")]  # SOI..DHT, shared

    lum_q, chr_q = _quality_tables(50)
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        (1, 0.299 * r + 0.587 * g + 0.114 * b, lum_q,
         (DC_LUM_BITS, DC_LUM_VALS, AC_LUM_BITS, AC_LUM_VALS), 0x00),
        (2, -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, chr_q,
         (DC_CHR_BITS, DC_CHR_VALS, AC_CHR_BITS, AC_CHR_VALS), 0x11),
        (3, 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, chr_q,
         (DC_CHR_BITS, DC_CHR_VALS, AC_CHR_BITS, AC_CHR_VALS), 0x11),
    ]
    out = bytearray(head)
    for cid, plane, q, (db, dv, ab, av), tsel in planes:
        sos = bytes([1, cid, tsel, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        w = _BitWriter()
        _encode_blocks(w, _fdct_quantize(plane, q),
                       _encode_table(db, dv), _encode_table(ab, av))
        w.flush()
        out += w.out
    multiscan = bytes(out) + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(multiscan), decode_jpeg(single))

    # only the first scan present -> named error, not KeyError
    first_scan_end = multiscan.find(b"\xff\xda", len(head) + 2)
    partial = multiscan[:first_scan_end] + b"\xff\xd9"
    with pytest.raises(ValueError, match="covered"):
        decode_jpeg(partial)


class TestExtended12Bit:
    """Round 11: SOF1 extended-sequential 12-bit samples. No normative
    tables are involved beyond the already-validated 8-bit machinery —
    Huffman tables ride in the file (the 12-bit encoder writes flat
    canonical tables), quant tables are 16-bit DQT entries, and the
    only sample-depth deltas are the 2^(P-1) level shift and wider
    categories — so encoder/decoder roundtrips genuinely exercise the
    format, unlike self-consistent-only codecs."""

    def test_gray_gradient_roundtrip(self):
        import numpy as np
        from datasketches_spark_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)
        x = np.linspace(0, 4095, 24 * 32).reshape(24, 32).astype(np.uint16)
        dec = decode_jpeg(encode_jpeg(x, quality=95, bits=12))
        assert dec.dtype == np.uint16 and dec.shape == x.shape
        assert np.abs(dec.astype(int) - x.astype(int)).max() < 64

    def test_solid_dc_exact(self):
        import numpy as np
        from datasketches_spark_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)
        s = np.full((16, 16), 2080, np.uint16)
        assert (decode_jpeg(encode_jpeg(s, quality=50, bits=12))
                == 2080).all()

    def test_rgb_roundtrip_and_header(self):
        import numpy as np
        from datasketches_spark_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)
        rng = np.random.default_rng(5)
        rgb = (rng.integers(0, 64, (8, 8, 3)) * 64).astype(np.uint16)
        enc = encode_jpeg(rgb, quality=95, bits=12)
        assert b"\xff\xc1" in enc      # SOF1, not SOF0
        dec = decode_jpeg(enc)
        assert dec.dtype == np.uint16
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() < 400

    def test_wide_dc_categories(self):
        """Full-range DC swings need categories Annex K cannot express —
        the flat tables must carry them."""
        import numpy as np
        from datasketches_spark_spark.operators.jpegcodec import (
            decode_jpeg, encode_jpeg)
        x = np.zeros((8, 32), np.uint16)
        x[:, 8:16] = 4095
        x[:, 24:] = 4095
        dec = decode_jpeg(encode_jpeg(x, quality=97, bits=12))
        assert np.abs(dec.astype(int) - x.astype(int)).max() < 256

    def test_range_and_bits_validation(self):
        import numpy as np
        import pytest
        from datasketches_spark_spark.operators.jpegcodec import encode_jpeg
        with pytest.raises(ValueError, match="4096"):
            encode_jpeg(np.full((4, 4), 5000, np.uint16), bits=12)
        with pytest.raises(ValueError, match="8 or 12"):
            encode_jpeg(np.zeros((4, 4), np.uint8), bits=10)
