"""Pure-Python GIF codec (operators/gifcodec.py): LZW roundtrips,
interlace, transparency, multi-frame, refusals."""

import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.gifcodec import (
    decode_gif, encode_gif, gif_frame_count)


def test_palette_roundtrip():
    rng = np.random.default_rng(4)
    palette = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 200, (20, 30))]
    dec = decode_gif(encode_gif(img))
    assert dec.shape == img.shape and np.array_equal(dec, img)


def test_grayscale_and_lzw_growth_stress():
    rng = np.random.default_rng(6)
    # 256 distinct gray values over 18k pixels: the LZW table grows to
    # its 4096 cap and resets mid-stream
    g = rng.integers(0, 256, (120, 150), dtype=np.uint8)
    dec = decode_gif(encode_gif(g))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))


def test_too_many_colors_refused():
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256-color"):
        encode_gif(big)


def _with_gce(data: bytes, transparent: int) -> bytes:
    """Insert a Graphic Control Extension before the image descriptor."""
    i = data.index(b"\x2c", 13)
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    return data[:i] + gce + data[i:]


def test_transparency_becomes_alpha():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    data = _with_gce(encode_gif(img), transparent=0)
    dec = decode_gif(data)
    assert dec.shape == (2, 2, 4)
    # index 0 is black (3 of 4 pixels) -> alpha 0; the red pixel opaque
    assert dec[0, 0, 3] == 255 and dec[0, 1, 3] == 0


def test_interlaced_decodes():
    """Encode the 4-pass row ordering, set the interlace flag, and the
    decoder must reorder back to the original image."""
    rng = np.random.default_rng(8)
    g = rng.integers(0, 200, (16, 9), dtype=np.uint8)
    rows = (list(range(0, 16, 8)) + list(range(4, 16, 8))
            + list(range(2, 16, 4)) + list(range(1, 16, 2)))
    body = encode_gif(g[rows])
    j = body.index(b"\x2c", 13)
    new = bytearray(body)
    new[j + 9] |= 0x40  # interlace flag in the image descriptor
    dec = decode_gif(bytes(new))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))


def test_multiframe_select_and_count():
    # both frames contain both colors, so encode_gif builds the SAME
    # global palette for each — the spliced second frame (which has no
    # local table) then resolves correctly against frame a's global one
    fa = np.full((3, 3), 10, np.uint8)
    fa[2, 2] = 200
    fb = np.full((3, 3), 200, np.uint8)
    fb[2, 2] = 10
    a, b = encode_gif(fa), encode_gif(fb)
    ib = b.index(b"\x2c", 13)
    merged = a[:-1] + b[ib:]  # drop a's trailer, append b's image+trailer
    assert gif_frame_count(merged) == 2
    f0 = decode_gif(merged, frame=0)
    f1 = decode_gif(merged, frame=1)
    assert f0[0, 0, 0] == 10 and f1[0, 0, 0] == 200
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(merged, frame=2)


def test_partial_frame_refused_by_name():
    data = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    i = bytes(data).index(b"\x2c", 13)
    # shrink the frame rect so it no longer covers the screen
    struct.pack_into("<HHHH", data, i + 1, 1, 1, 2, 2)
    with pytest.raises(NotImplementedError, match="disposal"):
        decode_gif(bytes(data))


def test_corrupt_raises_valueerror():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 8)
    good = encode_gif(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_gif(good[:20])


def test_decode_image_dispatches_gif():
    from datasketches_spark_spark.operators import decode_image
    img = np.repeat(
        (np.arange(16, dtype=np.uint8).reshape(4, 4) * 16)[:, :, None],
        3, axis=2)
    assert np.array_equal(decode_image(encode_gif(img)), img)
