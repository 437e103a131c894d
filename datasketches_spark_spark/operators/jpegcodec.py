"""Pure-numpy BASELINE JPEG codec (ITU-T T.81 baseline sequential DCT,
Huffman entropy coding) — the one compressed format a real multimodal
pipeline meets on nearly every crawl.

Scope is deliberately exact:

* decode: baseline-sequential (SOF0), EXTENDED sequential (SOF1 —
  round 11: 8- or 12-bit samples, 16-bit DQT entries, 2^(P-1) level
  shift, uint16 output at 12 bits) AND progressive (SOF2, T.81
  Annex G: spectral selection + successive approximation with DC/AC
  refinement scans and EOB runs; 8- or 12-bit) JFIF/EXIF, grayscale or
  YCbCr with any of the standard subsampling factors (4:4:4, 4:2:2,
  4:2:0), restart intervals (DRI/RSTn), byte stuffing. LOSSLESS
  (SOF3) dispatches to ``jpeglossless.py`` (r16 — predictive Annex H,
  exact reconstruction, write/read-symmetric). Arithmetic-lossless
  (SOF11) and hierarchical modes stay refused with a named error.
* encode: baseline-sequential (grayscale or 4:4:4 YCbCr, the T.81
  Annex K example tables scaled by the usual IJG quality formula) and
  12-bit extended sequential (``bits=12``: Annex K x16 quant tables as
  16-bit DQT, flat file-carried Huffman tables sized for the wider
  DC/AC categories Annex K cannot express).

The entropy-coded segment is decoded bit-serially in Python (a few
symbol lookups per 8x8 block); everything block-shaped — IDCT/FDCT,
dequantization, level shift, color transform — is vectorized numpy over
ALL blocks at once (`einsum`), so cost scales with pixel count, not
Python overhead per pixel.

The quantization/Huffman tables transcribed here are the NORMATIVE
example tables of the public JPEG standard (T.81 Annex K.1/K.3) — the
same RFC-1951-fixed-Huffman situation as `compat/_cpc_tables.py`:
without them no baseline JPEG interoperates.

No counterpart in the reference (no multimodal surface there); this
closes the round-7 VERDICT stretch item on `imagecodec.py:63`.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_arith"]

# --------------------------------------------------------- T.81 constants

# zig-zag order: index i of the scan -> position in the 8x8 block
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 example quantization tables (luminance / chrominance)
STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
STD_CHR_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS list of 16 counts, HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# 8x8 DCT-II basis matrix: FDCT(X) = C @ X @ C.T ; IDCT(Y) = C.T @ Y @ C
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_C[0, :] = 0.5 / np.sqrt(2.0)


# ----------------------------------------------------------- Huffman build

def _canonical_codes(bits, vals):
    """(code, length) per symbol in canonical order (T.81 C.2)."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[i], code, length))
            i += 1
            code += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(length, code) -> symbol lookup dict."""
    return {(ln, code): sym for sym, code, ln in _canonical_codes(bits, vals)}


def _encode_table(bits, vals):
    """symbol -> (code, length) lookup dict."""
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


# ----------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG byte
    unstuffing (FF 00 -> FF); stops at any other FF xx marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self):
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("JPEG: truncated entropy segment")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise ValueError("JPEG: marker inside entropy segment")
        else:
            self.pos = p + 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def byte_align_and_skip_restart(self):
        """After a restart interval: drop partial bits, consume RSTn."""
        self.cur = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2


class _RestartMarker(Exception):
    def __init__(self, n):
        self.n = n


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received bits to signed amplitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0) or progressive (SOF2) JPEG
    bytes to ``(H, W) uint8`` grayscale or ``(H, W, 3) uint8`` RGB.
    Raises ``NotImplementedError`` for arithmetic/12-bit/hierarchical
    streams and ``ValueError`` for corrupt ones."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_jpeg_markers(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG: truncated or corrupt stream: {e}") from e
    except _RestartMarker:
        # a restart marker where the restart interval says none belongs:
        # corrupt stream, surfaced as the public error type
        raise ValueError("JPEG: unexpected restart marker") from None


def _decode_jpeg_markers(data: bytes) -> np.ndarray:
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    arith_dc_cond: dict[int, tuple] = {}
    arith_ac_cond: dict[int, int] = {}
    frame = None
    restart_interval = 0
    prog_coeffs = None
    base_coeffs = None
    base_seen: set[int] = set()
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0xF
                if prec not in (0, 1):
                    raise ValueError(f"JPEG: bad DQT precision {prec}")
                if prec:   # 16-bit entries (12-bit-sample streams)
                    qt[tid] = np.frombuffer(
                        seg[s + 1:s + 129], dtype=">u2").astype(np.int64)
                    s += 129
                else:
                    qt[tid] = np.frombuffer(
                        seg[s + 1:s + 65], dtype=np.uint8).astype(np.int64)
                    s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                vals = list(seg[s + 17:s + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(
                    bits, vals)
                s += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            # baseline is 8-bit by definition; extended sequential
            # (SOF1, round 11) carries 8- or 12-bit samples — the same
            # Huffman machinery with file-carried tables, wider
            # categories and a 2^(P-1) level shift
            if (marker == 0xC0 and prec != 8) or prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG: SOF{marker - 0xC0} with {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
        elif marker in (0xC2, 0xCA):  # SOF2 / SOF10 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if marker == 0xCA and prec != 8:
                raise NotImplementedError(
                    f"JPEG: SOF10 with {prec}-bit precision")
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG: progressive with {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": True,
                     "prec": prec, "arith": marker == 0xCA}
        elif marker == 0xC9:  # SOF9 sequential arithmetic (r14)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG: SOF9 with {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "arith": True}
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            s = 0
            while s + 1 < len(seg):
                tc, tb = seg[s] >> 4, seg[s] & 0xF
                cs = seg[s + 1]
                if tc == 0:
                    arith_dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    arith_ac_cond[tb] = cs                    # Kx
                s += 2
        elif marker == 0xC3:  # SOF3 lossless (r16)
            from .jpeglossless import decode_jpeg_lossless
            return decode_jpeg_lossless(data)
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} (arithmetic-lossless/"
                "hierarchical) — sequential (SOF0/SOF1), progressive "
                "(SOF2) and LOSSLESS (SOF3, r16 — predictive Annex H) "
                "Huffman decode plus sequential (SOF9) and progressive "
                "(SOF10) arithmetic decode (r14 — T.81 Annex D "
                "QM-coder + Annex G.2 successive-approximation models, "
                "libjpeg-cross-validated); arithmetic-lossless (SOF11) "
                "and hierarchical modes remain out of scope")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomp.append((comp, tdta >> 4, tdta & 0xF))
            if not frame.get("progressive"):
                # baseline may carry several scans (one per component is
                # legal, T.81 A.2): accumulate until EOI
                if base_coeffs is None:
                    base_coeffs = _alloc_coeffs(frame)
                if frame.get("arith"):
                    from .jpegarith import decode_scan_arith
                    pos = decode_scan_arith(
                        data, pos + seglen, frame, scomp,
                        arith_dc_cond, arith_ac_cond,
                        restart_interval, base_coeffs)
                else:
                    pos = _decode_scan(data, pos + seglen, frame, scomp,
                                       huff_dc, huff_ac,
                                       restart_interval, base_coeffs)
                base_seen.update(c["id"] for c, _, _ in scomp)
                continue
            if prog_coeffs is None:
                prog_coeffs = _alloc_coeffs(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if frame.get("arith"):
                from .jpegarith import decode_scan_progressive_arith
                end = decode_scan_progressive_arith(
                    data, pos + seglen, frame, scomp, ss, se,
                    ahal >> 4, ahal & 0xF, arith_dc_cond,
                    arith_ac_cond, restart_interval, prog_coeffs)
            else:
                end = _decode_scan_progressive(
                    data, pos + seglen, frame, scomp, ss, se,
                    ahal >> 4, ahal & 0xF, huff_dc, huff_ac,
                    restart_interval, prog_coeffs)
            pos = end
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and             prog_coeffs is not None:
        return _reconstruct(frame, prog_coeffs, qt)
    if frame is not None and base_coeffs is not None:
        missing = [c["id"] for c in frame["comps"]
                   if c["id"] not in base_seen]
        if missing:
            raise ValueError(
                f"JPEG: stream ended before scans covered component "
                f"ids {missing}")
        return _reconstruct(frame, base_coeffs, qt)
    raise ValueError("JPEG: no scan found")


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next non-stuffing, non-restart marker at/after
    ``p`` (the end of an entropy-coded segment)."""
    while p + 1 < len(data):
        if (data[p] == 0xFF and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)):
            return p
        p += 1
    return len(data)


def _decode_scan(data, pos, frame, scomp, huff_dc, huff_ac,
                 restart_interval, out):
    """Entropy-decode one baseline scan into ``out`` (per-component
    zig-zag coefficient arrays, written in place); returns the position
    of the next marker. A multi-component scan is MCU-interleaved; a
    single-component scan is non-interleaved and iterates that
    component's own block grid (T.81 A.2)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    reader = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scomp}
    single = len(scomp) == 1
    if single:
        nby, nbx = _comp_block_grid(frame, scomp[0][0])
        total = nby * nbx
    else:
        total = mcux * mcuy

    def decode_block(comp, td, ta) -> np.ndarray:
        dct, act = huff_dc[td], huff_ac[ta]
        blk = np.zeros(64, dtype=np.int64)
        s = reader.decode_symbol(dct)
        diff = _extend(reader.read_bits(s), s)
        pred[comp["id"]] += diff
        blk[0] = pred[comp["id"]]
        k = 1
        while k < 64:
            rs = reader.decode_symbol(act)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG: AC run overflow")
            blk[k] = _extend(reader.read_bits(sz), sz)
            k += 1
        return blk

    mcu = 0
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            reader.byte_align_and_skip_restart()
            for k in pred:
                pred[k] = 0
        try:
            if single:
                comp, td, ta = scomp[0]
                my, mx = divmod(mcu, nbx)
                out[comp["id"]][my, mx] = decode_block(comp, td, ta)
            else:
                my, mx = divmod(mcu, mcux)
                for comp, td, ta in scomp:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            out[comp["id"]][my * comp["v"] + by,
                                            mx * comp["h"] + bx] = \
                                decode_block(comp, td, ta)
        except _RestartMarker:
            raise ValueError("JPEG: unexpected restart marker")
        mcu += 1
    return _next_marker(data, reader.pos)


def _alloc_coeffs(frame):
    """Zig-zag coefficient buffers for every frame component, sized to
    the MCU grid (interleaved DC scans address the padded grid;
    non-interleaved scans stay inside the component's true block
    grid)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int64)
            for c in frame["comps"]}


def _comp_block_grid(frame, comp):
    """(blocks_high, blocks_wide) of a component's own sample grid —
    the iteration space of a NON-interleaved progressive scan."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_progressive(data, pos, frame, scomp, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval, coeffs):
    """One progressive scan (T.81 Annex G): DC first/refinement
    (interleaved when the scan lists several components), AC
    first/refinement with EOB runs (always single-component). Updates
    ``coeffs`` in place; returns the stream position of the next
    marker."""
    reader = _BitReader(data, pos)
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    state = {"eobrun": 0}

    def dc_first_block(comp, td, blk):
        s = reader.decode_symbol(huff_dc[td])
        diff = _extend(reader.read_bits(s), s)
        state["pred"][comp["id"]] += diff
        blk[0] = state["pred"][comp["id"]] << al

    def dc_refine_block(blk):
        if reader.read_bit():
            blk[0] |= 1 << al

    def ac_first(blk):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                state["eobrun"] = (1 << r) - 1 + reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG: AC run past spectral end")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    p1 = 1 << al
    m1 = -(1 << al)

    def _refine_nonzero(blk, k):
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    def ac_refine(blk):
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = (1 << r) + reader.read_bits(r)
                        break
                    # r == 15: run of 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG: invalid AC refinement size")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        _refine_nonzero(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(blk, k)
                k += 1
            state["eobrun"] -= 1

    def reset_state():
        state["pred"] = {comp["id"]: 0 for comp, _, _ in scomp}
        state["eobrun"] = 0

    reset_state()
    if ss == 0:  # DC scan (interleaved over all scan components)
        if se != 0:
            raise ValueError("JPEG: DC scan must have Se == 0")
        total = mcux * mcuy
        # T.81 A.2: any scan with a single component is non-interleaved
        # and iterates that component's own block grid
        single = len(scomp) == 1
        if single:
            nby, nbx = _comp_block_grid(frame, scomp[0][0])
            total = nbx * nby
        mcu = 0
        while mcu < total:
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.byte_align_and_skip_restart()
                reset_state()
            if single:
                comp, td, _ = scomp[0]
                my, mx = divmod(mcu, nbx)
                blk = coeffs[comp["id"]][my, mx]
                if ah == 0:
                    dc_first_block(comp, td, blk)
                else:
                    dc_refine_block(blk)
            else:
                my, mx = divmod(mcu, mcux)
                for comp, td, _ in scomp:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = coeffs[comp["id"]][
                                my * comp["v"] + by, mx * comp["h"] + bx]
                            if ah == 0:
                                dc_first_block(comp, td, blk)
                            else:
                                dc_refine_block(blk)
            mcu += 1
    else:  # AC scan: exactly one component, its own block raster
        if len(scomp) != 1:
            raise ValueError("JPEG: AC scan must be single-component")
        comp, _, ta = scomp[0]
        act = huff_ac[ta]
        nby, nbx = _comp_block_grid(frame, comp)
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n and n % restart_interval == 0:
                    reader.byte_align_and_skip_restart()
                    reset_state()
                blk = coeffs[comp["id"]][by, bx]
                if ah == 0:
                    ac_first(blk)
                else:
                    ac_refine(blk)
                n += 1
    return _next_marker(data, reader.pos)


def _reconstruct(frame, coeffs, qt):
    """Dequantize + IDCT every block (vectorized), upsample chroma,
    color-transform."""
    planes = []
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    for comp in frame["comps"]:
        zz = coeffs[comp["id"]]
        q = qt[comp["tq"]]
        deq = zz * q[None, None, :]
        blocks = np.zeros(zz.shape[:2] + (8, 8), dtype=np.float64)
        blocks.reshape(zz.shape[:2] + (64,))[:, :, ZIGZAG] = deq
        # IDCT all blocks at once: C.T @ B @ C
        half = float(1 << (frame.get("prec", 8) - 1))
        pix = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + half
        nby, nbx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # upsample to full resolution (nearest / pixel replication)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dt = np.uint8 if prec == 8 else np.uint16
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, maxv).astype(dt)
    if len(planes) != 3:
        raise NotImplementedError("JPEG: only 1- or 3-component frames")
    y, cb, cr = planes
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, maxv).astype(dt)


# ----------------------------------------------------------------- encoder

def _quality_tables(quality: int):
    """IJG quality scaling of the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((STD_LUM_Q * scale + 50) // 100, 1, 255)
    chr_ = np.clip((STD_CHR_Q * scale + 50) // 100, 1, 255)
    return lum, chr_


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.cur >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _encode_amplitude(v: int):
    """(size, bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = int(a).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_blocks(writer, zz, dc_tab, ac_tab):
    """Huffman-encode one component's blocks (in scan order) with a
    running DC predictor; returns nothing (bits land in writer)."""
    pred = 0
    for blk in zz:
        s, bits = _encode_amplitude(int(blk[0]) - pred)
        pred = int(blk[0])
        code, ln = dc_tab[s]
        writer.write(code, ln)
        if s:
            writer.write(bits, s)
        nz = np.nonzero(blk[1:])[0]
        k = 0
        for idx in nz:
            run = int(idx) - k
            while run >= 16:
                code, ln = ac_tab[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s, bits = _encode_amplitude(int(blk[1 + idx]))
            code, ln = ac_tab[(run << 4) | s]
            writer.write(code, ln)
            writer.write(bits, s)
            k = int(idx) + 1
        if k < 63:
            code, ln = ac_tab[0x00]  # EOB
            writer.write(code, ln)


def _flat_tables(prec: int):
    """Huffman tables for the {prec}-bit encoder. 8-bit uses the Annex K
    tables; 12-bit needs DC categories to 15 and AC sizes to 14, which
    Annex K (an 8-bit design) cannot express — so the encoder writes
    FLAT canonical tables into the DHT instead (DC: 16 symbols at 5
    bits; AC: EOB+ZRL+16x14 run/size symbols at 8 bits). JPEG tables
    ride in the file, so any conforming decoder reads them."""
    if prec == 8:
        return ((DC_LUM_BITS, DC_LUM_VALS), (AC_LUM_BITS, AC_LUM_VALS),
                (DC_CHR_BITS, DC_CHR_VALS), (AC_CHR_BITS, AC_CHR_VALS))
    dc_bits = [0] * 16
    dc_bits[4] = 16          # 16 codes of length 5 (bits[] is 1-based)
    dc_vals = list(range(16))
    ac_bits = [0] * 16
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 15)]
    ac_bits[7] = len(ac_vals)  # all codes at length 8 (226 <= 256)
    t = ((dc_bits, dc_vals), (ac_bits, ac_vals))
    return t + t


def _fdct_quantize(plane: np.ndarray, q: np.ndarray,
                   half: float = 128.0) -> np.ndarray:
    """Level-shift, 8x8 FDCT (vectorized), quantize, zig-zag; returns
    (n_blocks, 64) int coefficient rows in scan order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]  # edge replication
    padded[:, w:] = padded[:, w - 1:w]
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _C, blocks - half, _C.T)
    # decoder writes block.flat[ZIGZAG[i]] = scan[i], so the scan order
    # here must be coef.flat[ZIGZAG[i]]
    zz = coef.reshape(-1, 64)[:, ZIGZAG]
    # round-half-away-from-zero like libjpeg's descale
    qzz = np.sign(zz) * ((np.abs(zz) / q[None, :]) + 0.5).astype(np.int64)
    return qzz.astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 50,
                bits: int = 8) -> bytes:
    """Encode ``(H, W)`` grayscale or ``(H, W, 3)`` RGB to sequential
    JPEG (4:4:4, IJG quality scale). ``bits=8`` (uint8 input) writes
    baseline SOF0 with Annex K tables; ``bits=12`` (round 11; uint16
    input, values < 4096) writes EXTENDED sequential SOF1 with 16-bit
    quant tables (Annex K x16) and flat file-carried Huffman tables
    (``_flat_tables``). Decodable by this module's :func:`decode_jpeg`
    and any standard JPEG library built with 12-bit support."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg needs (H,W) or (H,W,3)")
    if bits not in (8, 12):
        raise ValueError(f"encode_jpeg bits must be 8 or 12, got {bits}")
    if bits == 12 and int(img.max(initial=0)) > 4095:
        raise ValueError("12-bit encode needs sample values < 4096")
    h, w = img.shape[:2]
    lum_q, chr_q = _quality_tables(quality)
    if bits == 12:
        lum_q = np.minimum(lum_q * 16, 32767)
        chr_q = np.minimum(chr_q * 16, 32767)
    half = float(1 << (bits - 1))
    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (8-bit entries for baseline, 16-bit for 12-bit samples)
    if bits == 12:
        out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x10" \
            + lum_q.astype(">u2").tobytes()
        if not gray:
            out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x11" \
                + chr_q.astype(">u2").tobytes()
    else:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
            + bytes(lum_q.astype(np.uint8))
        if not gray:
            out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" \
                + bytes(chr_q.astype(np.uint8))
    # SOF0 (baseline) / SOF1 (extended, 12-bit)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", bits, h, w, nc)
    sof += bytes([1, 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += (b"\xff\xc1" if bits == 12 else b"\xff\xc0") \
        + struct.pack(">H", 2 + len(sof)) + sof
    # DHT (Annex K for 8-bit; flat extended tables for 12-bit)
    (dlb, dlv), (alb, alv), (dcb, dcv), (acb, acv) = _flat_tables(bits)
    tables = [(0x00, dlb, dlv), (0x10, alb, alv)]
    if not gray:
        tables += [(0x01, dcb, dcv), (0x11, acb, acv)]
    for tc, bits, vals in tables:
        payload = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([nc, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded segment
    writer = _BitWriter()
    dc_lum = _encode_table(dlb, dlv)
    ac_lum = _encode_table(alb, alv)
    if gray:
        _encode_blocks(writer, _fdct_quantize(img.astype(np.float64),
                                              lum_q, half),
                       dc_lum, ac_lum)
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + half
        dc_chr = _encode_table(dcb, dcv)
        ac_chr = _encode_table(acb, acv)
        # 4:4:4 non-interleaved would need 3 scans; baseline interleaved
        # MCUs at 1x1 sampling = one block per component per MCU
        zys = _fdct_quantize(y, lum_q, half)
        zcb = _fdct_quantize(cb, chr_q, half)
        zcr = _fdct_quantize(cr, chr_q, half)
        predy = predb = predr = 0
        for i in range(zys.shape[0]):
            for zz, tabs, pred_name in ((zys[i], (dc_lum, ac_lum), "y"),
                                        (zcb[i], (dc_chr, ac_chr), "b"),
                                        (zcr[i], (dc_chr, ac_chr), "r")):
                pred = {"y": predy, "b": predb, "r": predr}[pred_name]
                s, bits = _encode_amplitude(int(zz[0]) - pred)
                if pred_name == "y":
                    predy = int(zz[0])
                elif pred_name == "b":
                    predb = int(zz[0])
                else:
                    predr = int(zz[0])
                code, ln = tabs[0][s]
                writer.write(code, ln)
                if s:
                    writer.write(bits, s)
                nzi = np.nonzero(zz[1:])[0]
                k = 0
                for idx in nzi:
                    run = int(idx) - k
                    while run >= 16:
                        code, ln = tabs[1][0xF0]
                        writer.write(code, ln)
                        run -= 16
                    s, bits = _encode_amplitude(int(zz[1 + idx]))
                    code, ln = tabs[1][(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(bits, s)
                    k = int(idx) + 1
                if k < 63:
                    code, ln = tabs[1][0x00]
                    writer.write(code, ln)
        writer.flush()
        out += writer.out + b"\xff\xd9"
        return bytes(out)
    writer.flush()
    out += writer.out + b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith(img: np.ndarray, quality: int = 50) -> bytes:
    """Encode ``(H, W)`` grayscale or ``(H, W, 3)`` RGB to SEQUENTIAL
    ARITHMETIC JPEG (SOF9, 4:4:4, IJG quality scale) — the QM-coder
    encode side of ``operators/jpegarith.py`` (r14). No Huffman
    tables; a DAC segment spells out the default conditioning
    explicitly. Decodable by this module's :func:`decode_jpeg` and by
    any arithmetic-capable JPEG library (tests cross-validate
    coefficients against the system libjpeg)."""
    from .jpegarith import encode_scan_arith
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg_arith needs (H,W) or (H,W,3)")
    h, w = img.shape[:2]
    lum_q, chr_q = _quality_tables(quality)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(lum_q.astype(np.uint8))
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" \
            + bytes(chr_q.astype(np.uint8))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    sof += bytes([1, 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof
    # DAC: defaults made explicit — DC (L=0, U=1) -> Cs = 0x10;
    # AC Kx = 5 (T.81 B.2.4.3)
    dac = bytes([0x00, 0x10, 0x10, 0x05])
    if not gray:
        dac += bytes([0x01, 0x10, 0x11, 0x05])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    sos = bytes([nc, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    if gray:
        z = _fdct_quantize(img.astype(np.float64), lum_q)
        mcus = ([(0, z[i])] for i in range(z.shape[0]))
        data = encode_scan_arith(mcus, [(0, 0)], 1)
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        zys = _fdct_quantize(y, lum_q)
        zcb = _fdct_quantize(cb, chr_q)
        zcr = _fdct_quantize(cr, chr_q)
        mcus = ([(0, zys[i]), (1, zcb[i]), (2, zcr[i])]
                for i in range(zys.shape[0]))
        data = encode_scan_arith(mcus, [(0, 0), (1, 1), (2, 1)], 3)
    out += data + b"\xff\xd9"
    return bytes(out)
