"""Baseline TIFF codec (operators/tiffcodec.py) — roundtrips, the
baseline-subset refusals, and LIVE cross-validation against the SYSTEM
libtiff in both directions (the VP8L/libwebp pattern): numpy-encoded
files read back identically through TIFFReadRGBAImage, and
libtiff-written LZW/PackBits/predictor files decode identically in the
numpy decoder."""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np
import pytest

from datasketches_spark_spark.operators.tiffcodec import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    tiff_info,
)

# ------------------------------------------------------- libtiff oracle

_TAG = {"width": 256, "height": 257, "bits": 258, "comp": 259,
        "photo": 262, "spp": 277, "rps": 278, "planar": 284,
        "predictor": 317}
_COMP_LZW, _COMP_PACKBITS, _COMP_NONE = 5, 32773, 1


def _libtiff():
    name = ctypes.util.find_library("tiff") or "libtiff.so.6"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFReadRGBAImage.restype = ctypes.c_int
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    # silence warning handler chatter
    handler = ctypes.CFUNCTYPE(None, ctypes.c_char_p, ctypes.c_char_p,
                               ctypes.c_void_p)
    lib.TIFFSetWarningHandler(handler())
    return lib


_LIB = _libtiff()
needs_libtiff = pytest.mark.skipif(_LIB is None,
                                   reason="system libtiff not present")


def _oracle_read_rgba(data: bytes) -> np.ndarray:
    """Decode any TIFF bytes with libtiff -> (H, W, 4) uint8 top-down."""
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as fh:
        fh.write(data)
        path = fh.name
    try:
        tif = _LIB.TIFFOpen(path.encode(), b"r")
        assert tif, "libtiff could not open the file"
        w = ctypes.c_uint32(0)
        h = ctypes.c_uint32(0)
        _LIB.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(256),
                          ctypes.byref(w))
        _LIB.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(257),
                          ctypes.byref(h))
        n = w.value * h.value
        buf = (ctypes.c_uint32 * n)()
        ok = _LIB.TIFFReadRGBAImage(ctypes.c_void_p(tif), w, h, buf, 1)
        _LIB.TIFFClose(ctypes.c_void_p(tif))
        assert ok == 1, "TIFFReadRGBAImage failed"
        raster = np.frombuffer(bytes(buf), dtype="<u4").reshape(
            h.value, w.value)
        rgba = np.stack([(raster >> s) & 0xFF for s in (0, 8, 16, 24)],
                        axis=2).astype(np.uint8)
        return rgba[::-1]  # raster is bottom-up
    finally:
        os.unlink(path)


def _oracle_write(img: np.ndarray, comp: int, predictor: int = 1,
                  bits: int = 8) -> bytes:
    """Encode (H, W, 3|1) uint8/uint16 with libtiff."""
    img = np.ascontiguousarray(img, np.uint8 if bits == 8 else "<u2")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    path = tempfile.mktemp(suffix=".tif")
    tif = _LIB.TIFFOpen(path.encode(), b"w")
    assert tif, "libtiff could not open for write"
    t = ctypes.c_void_p(tif)

    def setf(tag, val):
        assert _LIB.TIFFSetField(t, ctypes.c_uint32(tag),
                                 ctypes.c_int(val)) == 1

    setf(_TAG["width"], w)
    setf(_TAG["height"], h)
    setf(_TAG["bits"], bits)
    setf(_TAG["spp"], spp)
    setf(_TAG["photo"], 2 if spp == 3 else 1)
    setf(_TAG["planar"], 1)
    setf(_TAG["comp"], comp)
    if predictor != 1:
        setf(_TAG["predictor"], predictor)
    setf(_TAG["rps"], max(1, h // 3))  # several strips on purpose
    for row in range(h):
        line = img[row].tobytes()
        assert _LIB.TIFFWriteScanline(
            t, ctypes.c_char_p(line), ctypes.c_uint32(row),
            ctypes.c_uint16(0)) == 1
    _LIB.TIFFClose(t)
    with open(path, "rb") as fh:
        data = fh.read()
    os.unlink(path)
    return data


def _imgs():
    rng = np.random.RandomState(9)
    grad = np.zeros((21, 33, 3), np.uint8)
    grad[:, :, 0] = np.linspace(0, 255, 33, dtype=np.uint8)[None, :]
    grad[:, :, 1] = np.linspace(255, 0, 21, dtype=np.uint8)[:, None]
    grad[:, :, 2] = 190
    yield "gradient", grad
    yield "solid", np.full((8, 8, 3), [12, 200, 99], np.uint8)
    yield "noise", rng.randint(0, 256, (15, 19, 3)).astype(np.uint8)
    runs = np.repeat(rng.randint(0, 256, (10, 7, 3)), 5, axis=1) \
        .astype(np.uint8)
    yield "runs", runs  # compresses well under PackBits/LZW


class TestRoundtrip:
    def test_rgb_and_gray_roundtrip(self):
        for _, img in _imgs():
            blob = encode_tiff(img)
            assert is_tiff(blob)
            assert (decode_tiff(blob) == img).all()
            gray = img[:, :, 0]
            gblob = encode_tiff(gray)
            assert (decode_tiff(gblob) == gray).all()

    def test_info(self):
        blob = encode_tiff(np.zeros((5, 7, 3), np.uint8))
        info = tiff_info(blob)
        assert info["width"] == 7 and info["height"] == 5
        assert info["compression"] == 1 and info["photometric"] == 2
        assert info["bits_per_sample"] == (8, 8, 8)

    def test_refusals(self):
        with pytest.raises(ValueError):
            decode_tiff(b"not a tiff")
        blob = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint8)))
        with pytest.raises(ValueError):
            decode_tiff(bytes(blob[:40]))


@needs_libtiff
class TestLibtiffCrossValidation:
    def test_numpy_encoder_reads_in_libtiff(self):
        for name, img in _imgs():
            rgba = _oracle_read_rgba(encode_tiff(img))
            assert (rgba[:, :, :3] == img).all(), name
            gray = img[:, :, 1]
            rgba_g = _oracle_read_rgba(encode_tiff(gray))
            assert (rgba_g[:, :, 0] == gray).all(), name

    @pytest.mark.parametrize("comp,predictor", [
        (_COMP_NONE, 1), (_COMP_PACKBITS, 1),
        (_COMP_LZW, 1), (_COMP_LZW, 2),
    ])
    def test_libtiff_encoded_decodes_in_numpy(self, comp, predictor):
        for name, img in _imgs():
            blob = _oracle_write(img, comp, predictor)
            info = tiff_info(blob)
            assert info["compression"] == comp
            got = decode_tiff(blob)
            assert (got == img).all(), (name, comp, predictor)

    def test_libtiff_gray_minisblack(self):
        img = np.linspace(0, 255, 64, dtype=np.uint8).reshape(8, 8)
        blob = _oracle_write(img, _COMP_LZW)
        assert (decode_tiff(blob) == img).all()

    @pytest.mark.parametrize("comp,predictor", [
        (_COMP_NONE, 1), (_COMP_LZW, 1), (_COMP_LZW, 2),
    ])
    def test_libtiff_16bit_scales_like_rgba(self, comp, predictor):
        # 16-bit samples v*257 have v as their high byte, so the numpy
        # decoder's PNG-convention downscale must reproduce v exactly
        # (predictor runs at the 16-bit sample width)
        rng = np.random.RandomState(4)
        v8 = rng.randint(0, 256, (11, 13, 3)).astype(np.uint16)
        img16 = (v8 * 257).astype(np.uint16)
        blob = _oracle_write(img16, comp, predictor, bits=16)
        info = tiff_info(blob)
        assert info["bits_per_sample"] == (16, 16, 16)
        got = decode_tiff(blob)
        assert (got == v8.astype(np.uint8)).all()
        rgba = _oracle_read_rgba(blob)
        assert (rgba[:, :, :3] == got).all()


class TestDispatch:
    def test_sniff_and_decode_image(self):
        from datasketches_spark_spark.operators import decode_image
        from datasketches_spark_spark.operators.imagecodec import (
            sniff_format)
        img = np.full((6, 9, 3), [1, 2, 3], np.uint8)
        blob = encode_tiff(img)
        assert sniff_format(blob) == "tiff"
        assert (decode_image(blob) == img).all()
