"""Progressive JPEG decode (T.81 Annex G — SOF2): spectral selection,
successive approximation (DC + AC refinement, EOB runs), equivalence
with the baseline path on identical coefficients."""

import struct

import numpy as np
import pytest

from datasketches_spark_spark.operators.jpegcodec import (
    AC_LUM_BITS, AC_LUM_VALS, DC_LUM_BITS, DC_LUM_VALS, STD_LUM_Q,
    ZIGZAG, _BitWriter, _C, _encode_amplitude, _encode_table,
    _fdct_quantize, decode_jpeg, encode_jpeg)

DC_TAB = _encode_table(DC_LUM_BITS, DC_LUM_VALS)
AC_TAB = _encode_table(AC_LUM_BITS, AC_LUM_VALS)


def _marker(m, payload=b""):
    return bytes([0xFF, m]) + struct.pack(">H", 2 + len(payload)) + payload


def _headers_gray(w, h):
    out = bytearray(b"\xff\xd8")
    out += _marker(0xDB, b"\x00" + bytes(STD_LUM_Q.astype(np.uint8)))
    out += _marker(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += _marker(0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += _marker(0xC2,
                   struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    return out


def _sos_gray(ss, se, ah, al, body):
    return _marker(0xDA,
                   bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + body


def _dc_scan(zz, al):
    w = _BitWriter()
    pred = 0
    for blk in zz:
        v = int(blk[0]) >> al
        s, bits = _encode_amplitude(v - pred)
        pred = v
        code, ln = DC_TAB[s]
        w.write(code, ln)
        if s:
            w.write(bits, s)
    w.flush()
    return bytes(w.out)


def _ac_first_scan(zz, ss, se, al):
    w = _BitWriter()
    for blk in zz:
        band = [int(b) >> al if b >= 0 else -((-int(b)) >> al)
                for b in blk[ss:se + 1]]
        nz = [i for i, v in enumerate(band) if v != 0]
        k = 0
        for i in nz:
            run = i - k
            while run >= 16:
                code, ln = AC_TAB[0xF0]
                w.write(code, ln)
                run -= 16
            s, bits = _encode_amplitude(band[i])
            code, ln = AC_TAB[(run << 4) | s]
            w.write(code, ln)
            w.write(bits, s)
            k = i + 1
        if k <= se - ss:
            code, ln = AC_TAB[0x00]
            w.write(code, ln)  # EOB (run of this one block)
    w.flush()
    return bytes(w.out)


def test_spectral_selection_equals_baseline():
    """DC scan + two AC band scans carry the exact same coefficients as
    one baseline scan — decoded images must be identical."""
    img = np.tile(np.linspace(10, 240, 24, dtype=np.uint8), (16, 1))
    zz = _fdct_quantize(img.astype(np.float64), STD_LUM_Q)
    prog = _headers_gray(24, 16)
    prog += _sos_gray(0, 0, 0, 0, _dc_scan(zz, 0))
    prog += _sos_gray(1, 5, 0, 0, _ac_first_scan(zz, 1, 5, 0))
    prog += _sos_gray(6, 63, 0, 0, _ac_first_scan(zz, 6, 63, 0))
    prog += b"\xff\xd9"
    assert np.array_equal(decode_jpeg(bytes(prog)),
                          decode_jpeg(encode_jpeg(img)))


def test_dc_successive_approximation():
    """DC first at Al=1 plus a one-bit refinement scan reconstructs the
    solid value exactly (plus empty AC first/refine scans exercising the
    EOB-run paths)."""
    img = np.full((8, 16), 170, np.uint8)
    zz = _fdct_quantize(img.astype(np.float64), STD_LUM_Q)
    prog = _headers_gray(16, 8)
    prog += _sos_gray(0, 0, 0, 1, _dc_scan(zz, 1))
    w = _BitWriter()
    for blk in zz:
        w.write(int(blk[0]) & 1, 1)
    w.flush()
    prog += _sos_gray(0, 0, 1, 0, bytes(w.out))
    prog += _sos_gray(1, 63, 0, 1, _ac_first_scan(zz, 1, 63, 1))
    w = _BitWriter()
    for _ in zz:
        code, ln = AC_TAB[0x00]
        w.write(code, ln)  # EOBRUN=1 per block, no history bits
    w.flush()
    prog += _sos_gray(1, 63, 1, 0, bytes(w.out))
    prog += b"\xff\xd9"
    assert np.array_equal(decode_jpeg(bytes(prog)), img)


def test_ac_refinement_with_nonzero_history():
    """An AC coefficient of 3 sent as 1 at Al=1 then corrected with one
    refinement bit must reconstruct the exact coefficient."""
    blk = np.zeros(64, np.int64)
    blk[1] = 3
    zz = blk[None, :]
    prog = _headers_gray(8, 8)
    prog += _sos_gray(0, 0, 0, 0, _dc_scan(zz, 0))
    prog += _sos_gray(1, 63, 0, 1, _ac_first_scan(zz, 1, 63, 1))
    w = _BitWriter()
    code, ln = AC_TAB[0x00]
    w.write(code, ln)       # EOBRUN covers the block...
    w.write(1, 1)           # ...with one correction bit for k=1
    w.flush()
    prog += _sos_gray(1, 63, 1, 0, bytes(w.out))
    prog += b"\xff\xd9"
    dec = decode_jpeg(bytes(prog))
    dq = blk * STD_LUM_Q
    full = np.zeros(64)
    full[ZIGZAG] = dq
    exp = np.clip(np.round(_C.T @ full.reshape(8, 8) @ _C + 128.0),
                  0, 255).astype(np.uint8)
    assert np.array_equal(dec, exp)


def test_differential_modes_still_refused():
    # r14: SOF9 AND SOF10 arithmetic now DECODE
    # (tests/test_jpeg_arith.py); the differential/hierarchical modes
    # remain the documented refusal
    img = np.full((8, 8), 100, np.uint8)
    data = bytearray(encode_jpeg(img))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xCE  # SOF14 differential progressive arithmetic
    with pytest.raises(NotImplementedError, match="SOF14"):
        decode_jpeg(bytes(data))


def test_truncated_progressive_raises():
    img = np.full((8, 16), 170, np.uint8)
    zz = _fdct_quantize(img.astype(np.float64), STD_LUM_Q)
    prog = _headers_gray(16, 8) + _sos_gray(0, 0, 0, 0, _dc_scan(zz, 0))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog)[:len(prog) - 4])
