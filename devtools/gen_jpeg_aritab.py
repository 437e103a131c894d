#!/usr/bin/env python
"""Regenerate/verify the T.81 Table D.3 constants in
``operators/jpegarith.py`` against the system libjpeg's exported
``jpeg_aritab`` (the normative-constants provenance check: the table
IS the spec; this script proves our embedded copy matches the
authoritative implementation byte-for-byte).

libjpeg(-turbo) packs each entry as a 64-bit
``(Qe << 16) | (Next_MPS << 8) | (Switch << 7) | Next_LPS``
(jaricom.c); entry 113 is the fixed ~0.5 state."""

import ctypes
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datasketches_spark_spark.operators.jpegarith import (  # noqa: E402
    _NEXT_LPS,
    _NEXT_MPS,
    _QE,
    _SWITCH,
)


def read_system_table():
    lj = ctypes.CDLL("libjpeg.so.62")
    addr = ctypes.cast(lj.jpeg_aritab, ctypes.c_void_p).value
    raw = (ctypes.c_int64 * 114).from_address(addr)
    return [((v >> 16) & 0xFFFF, v & 0x7F, (v >> 8) & 0xFF,
             (v >> 7) & 1) for v in raw]


def main():
    rows = read_system_table()
    ours = list(zip(_QE, _NEXT_LPS, _NEXT_MPS, _SWITCH))
    assert len(rows) == len(ours) == 114
    for i, (a, b) in enumerate(zip(rows, ours)):
        assert a == b, f"state {i}: system {a} != embedded {b}"
    print("embedded T.81 Table D.3 matches system libjpeg (114 states)")


if __name__ == "__main__":
    main()
