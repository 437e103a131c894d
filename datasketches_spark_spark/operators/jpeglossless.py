"""Lossless JPEG (SOF3) codec — pure numpy, T.81 Annex H.

Closes the r15 verdict's "lossless JPEG" documented refusal
(``jpegcodec.py`` decodes SOF0/1/2/9/10; SOF3 raised). Lossless JPEG
is the predictive mode medical/scientific archives and DNG rely on:
no DCT, no quantization — each sample's PREDICTION RESIDUAL is
Huffman-coded with the same category+bits scheme as the sequential
DC coefficients, so the decoder reconstructs every sample exactly.
That exactness is why the module can self-oracle through write/read
symmetry (the WARC/PDF convention): a deterministic encoder plus a
decoder whose output must be bit-identical to the encoder's input —
a symmetric bug cannot hide because the hand-computable residual
stream is also pinned by unit tests.

Spec anchors (ISO/IEC 10918-1 / ITU T.81, public):

* Annex H.1.2.1 — the seven predictors over (a=left, b=above,
  c=above-left); selection rides in the scan header's Ss field.
* H.1.2.2 — boundary rules: the very first sample predicts
  ``2^(P - Pt - 1)``; the rest of the first line uses Ra; the first
  column of later lines uses Rb; after a restart the scan re-enters
  the initial state.
* H.1.2.3 — residuals are modulo 2^16; category SSSS 0..16 where 16
  means a residual of exactly 32768 and carries NO extra bits.
* H.2 — decoder reconstruction ``Rx = (Px + DIFF) mod 2^16``, output
  left-shifted by the point transform Pt.

Scope (documented): Huffman entropy coding (the arithmetic lossless
SOF11 stays refused with the other arithmetic-lossless gap), 2-16 bit
precision, 1- or 3-component scans with NO subsampling (Hi=Vi=1 —
lossless subsampling is not meaningful and wild files do not use it),
interleaved or per-component scans, restart intervals on decode.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import (_BitReader, _BitWriter, _RestartMarker,
                        _canonical_codes, _decode_table, _encode_table,
                        _extend)

__all__ = ["encode_jpeg_lossless", "decode_jpeg_lossless"]


_PRED_INIT = "INIT"


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"lossless JPEG: predictor {sel} out of range 1-7")


# ----------------------------------------------------------------- encode

def _residual_plane(p: np.ndarray, sel: int, half: int) -> np.ndarray:
    """Vectorized Annex-H residuals for one component plane. Lossless
    coding means the decoder's reconstructed neighbors EQUAL the
    originals, so every prediction is computable directly from the
    input plane — no sequential loop on the encode side."""
    h, w = p.shape
    d = np.empty((h, w), dtype=np.int64)
    d[0, 0] = p[0, 0] - half
    if w > 1:
        d[0, 1:] = p[0, 1:] - p[0, :-1]                # first line: Ra
    if h > 1:
        d[1:, 0] = p[1:, 0] - p[:-1, 0]                # first col: Rb
        if w > 1:
            ra, rb, rc = p[1:, :-1], p[:-1, 1:], p[:-1, :-1]
            if sel == 1:
                pred = ra
            elif sel == 2:
                pred = rb
            elif sel == 3:
                pred = rc
            elif sel == 4:
                pred = ra + rb - rc
            elif sel == 5:
                pred = ra + ((rb - rc) >> 1)
            elif sel == 6:
                pred = rb + ((ra - rc) >> 1)
            else:
                pred = (ra + rb) >> 1
            d[1:, 1:] = p[1:, 1:] - pred
    return d


def _huffman_bits_vals(freq: np.ndarray) -> tuple[list, list]:
    """Canonical Huffman (bits[16], vals) for the SSSS category
    histogram, per the Annex K.2 idea: a reserved dummy symbol with
    count 1 guarantees no real code is the all-ones pattern. With at
    most 18 leaves the tree depth stays far below JPEG's 16-bit code
    limit, so no length adjustment pass is needed."""
    import heapq
    DUMMY = 255
    heap = []
    for sym in range(17):
        if freq[sym]:
            heapq.heappush(heap, (int(freq[sym]), sym, (sym,)))
    heapq.heappush(heap, (1, DUMMY, (DUMMY,)))
    if len(heap) == 1:                  # degenerate: dummy only
        heapq.heappush(heap, (1, 0, (0,)))
    depth = {s: 0 for _f, _t, syms in heap for s in syms}
    while len(heap) > 1:
        f1, t1, s1 = heapq.heappop(heap)
        f2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), s1 + s2))
    # Force the dummy to the maximum depth (deepening a leaf keeps the
    # Kraft sum <= 1, and canonical assignment tolerates incomplete
    # code spaces), then EXCLUDE it from both the DHT counts and vals:
    # since the dummy is canonically last (deepest level, symbol 255 >
    # every real category), dropping it leaves all real codes
    # unchanged — and the real Kraft sum is now strictly < 1, so no
    # real code can be the all-ones pattern (T.81 C.2 requirement).
    depth[DUMMY] = max(depth.values())
    if max(depth.values()) > 16:
        # 18 leaves can reach depth 17 on Fibonacci-like histograms —
        # a 17-bit code is unrepresentable in a DHT. Fall back to the
        # always-valid flat 5-bit table (review finding: the previous
        # revision indexed bits[16] and crashed on such inputs).
        bits = [0] * 16
        bits[4] = 17
        return bits, list(range(17))
    order = sorted((ln, s) for s, ln in depth.items() if s != DUMMY)
    bits = [0] * 16
    vals = []
    for ln, s in order:
        bits[ln - 1] += 1
        vals.append(s)
    return bits, vals


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         point_transform: int = 0) -> bytes:
    """Deterministic SOF3 writer. ``img``: HxW or HxWx3, uint8 (P=8)
    or uint16 (P=16). ``predictor``: Annex H selector 1-7 (4 =
    a+b-c, the planar default). ``point_transform``: Pt low bits
    dropped before coding (the coded stream is then lossless for
    ``img >> Pt << Pt``). One interleaved scan; the DC Huffman table
    is built from the image's own SSSS category histogram (two-pass —
    a smooth image's zero residuals cost 1-2 bits instead of a flat
    table's 5) and rides in the DHT like every JPEG table.
    Byte-identical across runs."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("lossless JPEG: HxW or HxWx3 input")
    if a.dtype == np.uint8:
        prec = 8
    elif a.dtype == np.uint16:
        prec = 16
    else:
        raise ValueError("lossless JPEG: uint8 or uint16 samples")
    auto = predictor in ("auto", 0)
    if not auto and not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7 or 'auto'")
    pt = int(point_transform)
    if not 0 <= pt < prec:
        raise ValueError("point transform must be in [0, precision)")
    h, w, nc = a.shape
    planes = (a.astype(np.int64) >> pt)
    half = 1 << (prec - pt - 1)

    def _categorize(sel):
        # pass 1: residuals (vectorized) + category histogram
        diffs = np.stack(
            [_residual_plane(planes[:, :, c], sel, half)
             for c in range(nc)], axis=2)
        dd = diffs & 0xFFFF
        i32 = dd == 32768
        dd = np.where(dd >= 32768, dd - 65536, dd)
        mag = np.abs(dd)
        cat = np.zeros(dd.shape, dtype=np.int64)
        nz = mag > 0
        cat[nz] = np.floor(np.log2(mag[nz])).astype(np.int64) + 1
        cat[i32] = 16
        return dd, i32, cat, np.bincount(cat.ravel(), minlength=17)

    if auto:
        # FILE cost per predictor: entropy bits ceil'd to bytes PLUS
        # its DHT segment (19 + len(vals) bytes — tables differ in
        # symbol count, and ignoring that let 'auto' lose to a fixed
        # predictor by a few bytes; r16 review, reproduced). The one
        # remaining unmodeled term is FF byte-stuffing (data-
        # dependent, unknowable before emission), so 'auto' is
        # minimal up to a few stuffing bytes — documented, not
        # "never loses". Ties -> lowest selector, deterministic.
        best = None
        for sel in range(1, 8):
            dd, i32, cat, freq = _categorize(sel)
            b_, v_ = _huffman_bits_vals(freq)
            lens = {s: ln for s, _c, ln in _canonical_codes(b_, v_)}
            ebits = sum(int(freq[s]) * (lens[s]
                                        + (0 if s == 16 else s))
                        for s in range(17) if freq[s])
            nbytes = (ebits + 7) // 8 + 19 + len(v_)
            if best is None or nbytes < best[0]:
                best = (nbytes, sel, dd, i32, cat, freq, b_, v_)
        (_cost, predictor, d, is32768, ssss, freq,
         bits, vals) = best
    else:
        d, is32768, ssss, freq = _categorize(predictor)
        bits, vals = _huffman_bits_vals(freq)
    enc = _encode_table(bits, vals)

    out = bytearray(b"\xff\xd8")                       # SOI
    dht = bytes([0x00]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])                 # id, 1x1, (no Tq)
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])                    # DC table 0
    sos += bytes([predictor, 0, pt])                   # Ss, Se, AhAl
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # pass 2: interleaved bit emission (sample order = y, x, component)
    wtr = _BitWriter()
    flat_s = ssss.reshape(-1)
    flat_d = d.reshape(-1)
    flat_32768 = is32768.reshape(-1)
    for i in range(flat_s.size):
        s = int(flat_s[i])
        code, ln = enc[s]
        wtr.write(code, ln)
        if s == 16 and flat_32768[i]:
            continue                                   # H.1.2.3: no bits
        if s:
            v = int(flat_d[i])
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ----------------------------------------------------------------- decode

def decode_jpeg_lossless(data: bytes) -> np.ndarray:
    """Decode an SOF3 stream to HxW (1 component) or HxWx3 — exact
    sample reconstruction per Annex H.2 (``(pred + diff) mod 2^16``,
    output ``<< Pt``). dtype: uint8 for P <= 8, uint16 otherwise."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("lossless JPEG: missing SOI")
    try:
        return _decode_markers(data)
    except (IndexError, struct.error) as e:
        raise ValueError(
            f"lossless JPEG: truncated or corrupt stream: {e}") from e
    except _RestartMarker:
        # an FF D0-D7 pair mid-amplitude-bits (decode_symbol's own
        # guard can't see it): corrupt stream, public error type
        raise ValueError(
            "lossless JPEG: unexpected restart marker") from None


def _decode_markers(data: bytes) -> np.ndarray:
    huff: dict[int, dict] = {}
    frame = None
    restart = 0
    pos = 2
    planes = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("lossless JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xC4:                             # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1:s + 17])
                n = sum(bits)
                if cls == 0:
                    huff[tid] = _decode_table(
                        bits, list(seg[s + 17:s + 17 + n]))
                s += 17 + n
        elif marker == 0xC3:                           # SOF3
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"lossless JPEG: precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG: subsampled components "
                        f"(HV=0x{hv:02x}) — lossless scans are 1x1 in "
                        "practice; resample upstream")
                comps.append(cid)
            frame = (prec, h, w, comps)
            planes = np.zeros((h, w, nc), dtype=np.int64)
        elif marker == 0xCB:
            raise NotImplementedError(
                "lossless JPEG: SOF11 (arithmetic-coded lossless) — "
                "Huffman lossless (SOF3) is the implemented mode")
        elif marker == 0xDD:                           # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                           # SOS
            if frame is None:
                raise ValueError("lossless JPEG: SOS before SOF3")
            prec, h, w, comps = frame
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i] >> 4
                scomp.append((comps.index(cid), tsel))
            sel = seg[1 + 2 * ns]
            pt = seg[3 + 2 * ns] & 0xF
            if not 1 <= sel <= 7:
                raise ValueError(
                    f"lossless JPEG: scan predictor {sel} out of 1-7")
            pos = _decode_scan(data, pos + seglen, planes, scomp,
                               huff, sel, pt, prec, restart)
            continue
        pos += seglen
    if planes is None:
        raise ValueError("lossless JPEG: no SOF3 frame")
    prec = frame[0]
    out = planes.astype(np.uint8 if prec <= 8 else np.uint16)
    return out[:, :, 0] if out.shape[2] == 1 else out


def _decode_scan(data, pos, planes, scomp, huff, sel, pt, prec,
                 restart):
    h, w = planes.shape[:2]
    half = 1 << (prec - pt - 1)
    rdr = _BitReader(data, pos)
    mask = (1 << prec) - 1
    if restart and restart % w != 0:
        raise NotImplementedError(
            f"lossless JPEG: restart interval {restart} not row-"
            f"aligned (width {w}) — a restart re-enters the initial "
            "prediction state (H.2.3), so a mid-row segment would "
            "reference samples of the previous segment; re-encode "
            "with a row-multiple interval")
    seg_row = 0         # first row of the current restart segment
    done = 0            # MCUs decoded in the current segment
    for y in range(h):
        if restart and done == restart:
            rdr.byte_align_and_skip_restart()
            done = 0
            seg_row = y
        for x in range(w):
            for ci, tsel in scomp:
                tab = huff.get(tsel)
                if tab is None:
                    raise ValueError(
                        f"lossless JPEG: missing DC table {tsel}")
                try:
                    s = rdr.decode_symbol(tab)
                except _RestartMarker:
                    raise ValueError(
                        "lossless JPEG: restart marker before the "
                        "declared interval")
                if s == 16:
                    diff = 32768              # H.1.2.3, no extra bits
                elif s:
                    diff = _extend(rdr.read_bits(s), s)
                else:
                    diff = 0
                # H.1.2.2 boundary rules, segment-local (a restart
                # re-enters the initial state)
                if y == seg_row:
                    pred = half if x == 0 else \
                        int(planes[y, x - 1, ci]) >> pt
                elif x == 0:
                    pred = int(planes[y - 1, 0, ci]) >> pt
                else:
                    pred = _predict(int(planes[y, x - 1, ci]) >> pt,
                                    int(planes[y - 1, x, ci]) >> pt,
                                    int(planes[y - 1, x - 1, ci]) >> pt,
                                    sel)
                rx = (pred + diff) & 0xFFFF
                planes[y, x, ci] = (rx << pt) & mask
            done += 1
    return rdr.pos
