"""Arithmetic-coded JPEG entropy decoding (ITU-T T.81 Annexes D & F).

Closes the engine's last verifiable codec refusal: JPEG scans coded
with the adaptive binary arithmetic coder (QM-coder) — BOTH
sequential (SOF9) and progressive (SOF10, successive approximation)
— now decode, cross-validated live against the system
libjpeg(-turbo) the same way VP8 is validated against libwebp and TIFF
against libtiff (``devtools/jpegarith_tool.c`` is the oracle harness;
``tests/test_jpeg_arith.py`` pins fixture pixels to libjpeg's own
decode of the same files and requires coefficient-for-coefficient
equality with ``jpeg_read_coefficients``).

What is implemented, all per T.81:
- the QM-coder binary decoder (Annex D): 16-bit interval register with
  lazy renormalization, conditional MPS/LPS exchange, and the
  113-state probability estimation machine;
- the sequential DC/AC statistical models (Annex F.2.4): DC difference
  conditioning contexts with the L/U thresholds, shared magnitude-
  category/magnitude-bit bins, AC zero/EOB ladder at 3 bins per
  coefficient index with the Kx split of the long-form category bins,
  the fixed (non-adapting) sign bin, and full statistics reset at
  restart markers;
- DAC (0xCC) conditioning: DC ``(L, U)`` and AC ``Kx`` per table id
  (defaults 0/1/5 per T.81);
- the progressive successive-approximation models (Annex G.2):
  DC-first/-refine, AC-first/-refine with the EOBx history rule —
  ``decode_scan_progressive_arith``.

The state-transition table below is the NORMATIVE constant set of
T.81 Table D.3 (Qe value, Next-Index-LPS, Next-Index-MPS, Switch-MPS
per state, plus the fixed ~0.5 state used for AC signs). Like the CPC
wire tables and the DEFLATE fixed trees, these values cannot be
re-derived — they ARE the spec; the packing here was extracted and
verified against the system libjpeg's exported ``jpeg_aritab`` by
``devtools/gen_jpeg_aritab.py``.
"""

from __future__ import annotations

__all__ = ["QmDecoder", "decode_scan_arith", "ARITH_DC_DEFAULT",
           "ARITH_AC_DEFAULT"]

ARITH_DC_DEFAULT = (0, 1)   # (L, U) conditioning bounds
ARITH_AC_DEFAULT = 5        # Kx: low/high split of AC long-form bins

# T.81 Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).
# Entry 113 is the fixed non-adapting ~0.5 state (AC sign decisions).
_QE = (
    0x5A1D, 0x2586, 0x1114, 0x080B, 0x03D8, 0x01DA, 0x00E5, 0x006F,
    0x0036, 0x001A, 0x000D, 0x0006, 0x0003, 0x0001, 0x5A7F, 0x3F25,
    0x2CF2, 0x207C, 0x17B9, 0x1182, 0x0CEF, 0x09A1, 0x072F, 0x055C,
    0x0406, 0x0303, 0x0240, 0x01B1, 0x0144, 0x00F5, 0x00B7, 0x008A,
    0x0068, 0x004E, 0x003B, 0x002C, 0x5AE1, 0x484C, 0x3A0D, 0x2EF1,
    0x261F, 0x1F33, 0x19A8, 0x1518, 0x1177, 0x0E74, 0x0BFB, 0x09F8,
    0x0861, 0x0706, 0x05CD, 0x04DE, 0x040F, 0x0363, 0x02D4, 0x025C,
    0x01F8, 0x01A4, 0x0160, 0x0125, 0x00F6, 0x00CB, 0x00AB, 0x008F,
    0x5B12, 0x4D04, 0x412C, 0x37D8, 0x2FE8, 0x293C, 0x2379, 0x1EDF,
    0x1AA9, 0x174E, 0x1424, 0x119C, 0x0F6B, 0x0D51, 0x0BB6, 0x0A40,
    0x5832, 0x4D1C, 0x438E, 0x3BDD, 0x34EE, 0x2EAE, 0x299A, 0x2516,
    0x5570, 0x4CA9, 0x44D9, 0x3E22, 0x3824, 0x32B4, 0x2E17, 0x56A8,
    0x4F46, 0x47E5, 0x41CF, 0x3C3D, 0x375E, 0x5231, 0x4C0F, 0x4639,
    0x415E, 0x5627, 0x50E7, 0x4B85, 0x5597, 0x504F, 0x5A10, 0x5522,
    0x59EB, 0x5A1D,
)
_NEXT_LPS = (
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111, 110, 112,
    112, 113,
)
_NEXT_MPS = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107, 111, 109,
    111, 113,
)
_SWITCH = (
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0,
    1, 0,
)


class QmDecoder:
    """T.81 Annex D binary arithmetic decoder over one entropy-coded
    segment. Registers: ``a`` = current interval (renormalized into
    [0x8000, 0x10000)), ``code`` = the code value within that interval,
    refilled bit-at-a-time from the unstuffed byte stream (0xFF 0x00 ->
    a 0xFF data byte; any other marker ends the segment and feeds zero
    bits thereafter, the T.81 decoder convention)."""

    __slots__ = ("data", "pos", "end", "a", "code", "_bitbuf",
                 "_bitcnt", "marker_hit")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.a = 0x10000
        self._bitbuf = 0
        self._bitcnt = 0
        self.marker_hit = False
        self.code = 0
        for _ in range(16):
            self.code = (self.code << 1) | self._next_bit()

    def _next_byte(self) -> int:
        if self.marker_hit:
            return 0
        d = self.data
        p = self.pos
        n = len(d)
        if p >= n:
            self.marker_hit = True
            return 0
        b = d[p]
        if b != 0xFF:
            self.pos = p + 1
            return b
        q = p + 1
        while q < n and d[q] == 0xFF:   # fill bytes before a marker
            q += 1
        if q < n and d[q] == 0x00:      # stuffed zero: data byte 0xFF
            self.pos = q + 1
            return 0xFF
        self.marker_hit = True          # marker: zero bits from now on
        return 0

    def _next_bit(self) -> int:
        if self._bitcnt == 0:
            self._bitbuf = self._next_byte()
            self._bitcnt = 8
        self._bitcnt -= 1
        return (self._bitbuf >> self._bitcnt) & 1

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against statistics bin ``st[i]`` (bit 7
        = current MPS sense, bits 0-6 = estimation state index),
        updating the bin per Estimate_after_MPS/LPS with conditional
        exchange (T.81 D.2.4/D.2.5)."""
        sv = st[i]
        idx = sv & 0x7F
        qe = _QE[idx]
        a = self.a - qe
        if self.code < a:
            if a >= 0x8000:             # fast path: no renorm, MPS
                self.a = a
                return sv >> 7
            if a < qe:                  # conditional exchange: LPS
                bit = 1 - (sv >> 7)
                if _SWITCH[idx]:
                    sv ^= 0x80
                st[i] = (sv & 0x80) | _NEXT_LPS[idx]
            else:
                bit = sv >> 7
                st[i] = (sv & 0x80) | _NEXT_MPS[idx]
            self.a = a
        else:
            self.code -= a
            if a < qe:                  # conditional exchange: MPS
                bit = sv >> 7
                st[i] = (sv & 0x80) | _NEXT_MPS[idx]
            else:
                bit = 1 - (sv >> 7)
                if _SWITCH[idx]:
                    sv ^= 0x80
                st[i] = (sv & 0x80) | _NEXT_LPS[idx]
            self.a = qe
        a = self.a
        code = self.code
        while a < 0x8000:
            a <<= 1
            code = (code << 1) | self._next_bit()
        self.a = a
        self.code = code
        return bit


def _decode_dc(dec, st, ctx_base, dc_ctx, ci, last_dc, L, U):
    """T.81 F.2.4.1: one DC difference. Returns the new DC value and
    stores the next block's conditioning category in ``dc_ctx[ci]``."""
    if dec.decode(st, ctx_base) == 0:
        dc_ctx[ci] = 0
        return last_dc
    sign = dec.decode(st, ctx_base + 1)
    m = dec.decode(st, ctx_base + 2 + sign)
    pos = ctx_base + 2 + sign
    if m:
        pos = 20                        # shared magnitude-category bins
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("JPEG: arithmetic DC magnitude overflow")
            pos += 1
    if m < ((1 << L) >> 1):
        dc_ctx[ci] = 0
    elif m > ((1 << U) >> 1):
        dc_ctx[ci] = 12 + (sign << 2)
    else:
        dc_ctx[ci] = 4 + (sign << 2)
    v = m
    pos += 14                           # magnitude-bit bins sit +14
    while True:
        m >>= 1
        if not m:
            break
        if dec.decode(st, pos):
            v |= m
    v += 1
    if sign:
        v = -v
    return last_dc + v


def _decode_ac(dec, st, blk, fixed, kx):
    """T.81 F.2.4.2: AC coefficients 1..63 of one block into ``blk``
    (ZIG-ZAG order — the convention of ``jpegcodec``'s coefficient
    buffers; ``_reconstruct`` de-zigzags once at the end)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):        # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > 63:
                raise ValueError("JPEG: arithmetic AC run overflow")
        sign = dec.decode(fixed, 0)
        pos = base + 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m = 2
                pos = 189 if k <= kx else 217
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "JPEG: arithmetic AC magnitude overflow")
                    pos += 1
        v = m
        pos += 14
        while True:
            m >>= 1
            if not m:
                break
            if dec.decode(st, pos):
                v |= m
        v += 1
        if sign:
            v = -v
        blk[k] = v
        k += 1


def decode_scan_arith(data, pos, frame, scomp, dc_cond, ac_cond,
                      restart_interval, out):
    """Entropy-decode one SEQUENTIAL arithmetic scan into ``out``
    (same contract as ``jpegcodec._decode_scan``: per-component
    natural-order coefficient arrays written in place; returns the
    position after the scan's entropy data). Restart markers reset the
    decoder registers, the statistics areas, the DC conditioning
    contexts, and the predictors (T.81 F.2.4.3.3)."""
    import numpy as np

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    single = len(scomp) == 1
    if single:
        from .jpegcodec import _comp_block_grid
        nby, nbx = _comp_block_grid(frame, scomp[0][0])
        total = nby * nbx
    else:
        total = mcux * mcuy

    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    for _, td, ta in scomp:
        dc_stats.setdefault(td, bytearray(64))
        ac_stats.setdefault(ta, bytearray(256))

    fixed = bytearray([113])   # non-adapting ~0.5 bin (AC signs)

    def fresh_contexts():
        for st in dc_stats.values():
            st[:] = bytes(len(st))
        for st in ac_stats.values():
            st[:] = bytes(len(st))
        fixed[0] = 113
        return ([0] * len(scomp),
                {comp["id"]: 0 for comp, _, _ in scomp})

    dc_ctx, last_dc = fresh_contexts()
    dec = QmDecoder(data, pos)

    def decode_block(ci, comp, td, ta) -> np.ndarray:
        blk = np.zeros(64, dtype=np.int64)
        L, U = dc_cond.get(td, ARITH_DC_DEFAULT)
        last_dc[comp["id"]] = _decode_dc(
            dec, dc_stats[td], dc_ctx[ci], dc_ctx, ci,
            last_dc[comp["id"]], L, U)
        blk[0] = last_dc[comp["id"]]
        _decode_ac(dec, ac_stats[ta], blk,
                   fixed, ac_cond.get(ta, ARITH_AC_DEFAULT))
        return blk

    mcu = 0
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # skip to the RSTn marker, then restart everything
            p = dec.pos
            n = len(data)
            while p + 1 < n and not (
                    data[p] == 0xFF and data[p + 1] != 0x00):
                p += 1
            while p + 1 < n and data[p + 1] == 0xFF:  # FF fill
                p += 1
            if p + 1 >= n or not (0xD0 <= data[p + 1] <= 0xD7):
                raise ValueError("JPEG: missing restart marker in "
                                 "arithmetic scan")
            dc_ctx, last_dc = fresh_contexts()
            dec = QmDecoder(data, p + 2)
        if single:
            comp, td, ta = scomp[0]
            my, mx = divmod(mcu, nbx)
            out[comp["id"]][my, mx] = decode_block(0, comp, td, ta)
        else:
            my, mx = divmod(mcu, mcux)
            for ci, (comp, td, ta) in enumerate(scomp):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        out[comp["id"]][my * comp["v"] + by,
                                        mx * comp["h"] + bx] = \
                            decode_block(ci, comp, td, ta)
        mcu += 1
    # position after entropy data: next true marker
    p = dec.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def decode_scan_progressive_arith(data, pos, frame, scomp, ss, se,
                                  ah, al, dc_cond, ac_cond,
                                  restart_interval, coeffs):
    """Entropy-decode one PROGRESSIVE arithmetic scan (SOF10) into the
    zig-zag coefficient buffers — the T.81 Annex G.2 successive-
    approximation models over the same QM decoder:

    - DC first (Ss=0, Ah=0): the sequential DC model; stored value is
      the accumulated prediction shifted left by Al.
    - DC refine (Ah>0): ONE fixed-probability bit per block ORed into
      bit Al (G.2.2 — no adaptive statistics).
    - AC first (Ss>0, Ah=0): the sequential AC model over Ss..Se with
      values shifted left by Al.
    - AC refine: per coefficient index, history-dependent bins — a
      correction bit (bin 3(k-1)+2) for previously-nonzero
      coefficients, the newly-nonzero decision (bin 3(k-1)+1) with a
      fixed-probability sign, and the end-of-block decision (bin
      3(k-1)) only ABOVE the previous stage's last nonzero index
      (EOBx), per G.2.3.

    Statistics areas are freshly zeroed per scan and at every restart
    marker (the same rule as the sequential path). Same contract as
    ``jpegcodec._decode_scan_progressive``."""
    import numpy as np  # noqa: F401  (kept for parity with callers)

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))

    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    for _, td, ta in scomp:
        dc_stats.setdefault(td, bytearray(64))
        ac_stats.setdefault(ta, bytearray(256))
    fixed = bytearray([113])

    def fresh_contexts():
        for st in dc_stats.values():
            st[:] = bytes(len(st))
        for st in ac_stats.values():
            st[:] = bytes(len(st))
        fixed[0] = 113
        return ([0] * len(scomp),
                {comp["id"]: 0 for comp, _, _ in scomp})

    dc_ctx, last_dc = fresh_contexts()
    dec = QmDecoder(data, pos)
    p1 = 1 << al
    m1 = -(1 << al)

    def dc_first_block(ci, comp, td, blk):
        L, U = dc_cond.get(td, ARITH_DC_DEFAULT)
        last_dc[comp["id"]] = _decode_dc(
            dec, dc_stats[td], dc_ctx[ci], dc_ctx, ci,
            last_dc[comp["id"]], L, U)
        blk[0] = last_dc[comp["id"]] << al

    def dc_refine_block(blk):
        if dec.decode(fixed, 0):
            blk[0] = int(blk[0]) | p1

    def ac_first_block(ta, blk):
        st = ac_stats[ta]
        kx = ac_cond.get(ta, ARITH_AC_DEFAULT)
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if dec.decode(st, base):            # EOB
                return
            while dec.decode(st, base + 1) == 0:
                k += 1
                base += 3
                if k > se:
                    raise ValueError(
                        "JPEG: arithmetic AC run past spectral end")
            sign = dec.decode(fixed, 0)
            ppos = base + 2
            m = dec.decode(st, ppos)
            if m:
                if dec.decode(st, ppos):
                    m = 2
                    ppos = 189 if k <= kx else 217
                    while dec.decode(st, ppos):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "JPEG: arithmetic AC magnitude overflow")
                        ppos += 1
            v = m
            ppos += 14
            while True:
                m >>= 1
                if not m:
                    break
                if dec.decode(st, ppos):
                    v |= m
            v += 1
            if sign:
                v = -v
            blk[k] = v << al
            k += 1

    def ac_refine_block(ta, blk):
        st = ac_stats[ta]
        kex = se
        while kex > 0 and blk[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if k > kex and dec.decode(st, base):    # EOB flag
                return
            while True:
                cur = int(blk[k])
                if cur:                              # history: nonzero
                    if dec.decode(st, base + 2):
                        blk[k] = cur + (m1 if cur < 0 else p1)
                    break
                if dec.decode(st, base + 1):         # newly nonzero
                    blk[k] = m1 if dec.decode(fixed, 0) else p1
                    break
                base += 3
                k += 1
                if k > se:
                    raise ValueError(
                        "JPEG: arithmetic AC refinement overflow")
            k += 1

    single = len(scomp) == 1
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG: DC scan must have Se == 0")
        if single:
            from .jpegcodec import _comp_block_grid
            nby, nbx = _comp_block_grid(frame, scomp[0][0])
            total = nby * nbx
        else:
            total = mcux * mcuy
        mcu = 0
        while mcu < total:
            if restart_interval and mcu \
                    and mcu % restart_interval == 0:
                dec = _restart(data, dec)
                dc_ctx, last_dc = fresh_contexts()
            if single:
                comp, td, _ = scomp[0]
                my, mx = divmod(mcu, nbx)
                blk = coeffs[comp["id"]][my, mx]
                if ah == 0:
                    dc_first_block(0, comp, td, blk)
                else:
                    dc_refine_block(blk)
            else:
                my, mx = divmod(mcu, mcux)
                for ci, (comp, td, _) in enumerate(scomp):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = coeffs[comp["id"]][
                                my * comp["v"] + by,
                                mx * comp["h"] + bx]
                            if ah == 0:
                                dc_first_block(ci, comp, td, blk)
                            else:
                                dc_refine_block(blk)
            mcu += 1
    else:
        if not single:
            raise ValueError("JPEG: AC scan must be single-component")
        from .jpegcodec import _comp_block_grid
        comp, _, ta = scomp[0]
        nby, nbx = _comp_block_grid(frame, comp)
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n \
                        and n % restart_interval == 0:
                    dec = _restart(data, dec)
                    dc_ctx, last_dc = fresh_contexts()
                blk = coeffs[comp["id"]][by, bx]
                if ah == 0:
                    ac_first_block(ta, blk)
                else:
                    ac_refine_block(ta, blk)
                n += 1
    p = dec.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 \
                and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def _restart(data, dec):
    """Skip to the RSTn marker at the current segment end and return a
    fresh decoder positioned after it."""
    p = dec.pos
    n = len(data)
    while p + 1 < n and not (data[p] == 0xFF and data[p + 1] != 0x00):
        p += 1
    while p + 1 < n and data[p + 1] == 0xFF:
        p += 1
    if p + 1 >= n or not (0xD0 <= data[p + 1] <= 0xD7):
        raise ValueError(
            "JPEG: missing restart marker in arithmetic scan")
    return QmDecoder(data, p + 2)


class QmEncoder:
    """T.81 Annex D binary arithmetic ENCODER — the exact inverse of
    :class:`QmDecoder`'s code-space interpretation (LPS subinterval on
    top, conditional exchange, renorm below 0x8000, one bitstream bit
    per renormalization). Emission is bit-level with direct carry
    propagation into already-emitted bits (a carry cannot ripple past
    the stream start: that would mean a code value of 1.0, outside
    every nested interval), then packed MSB-first with JPEG 0xFF00
    byte stuffing. Output need not be byte-identical to libjpeg's —
    any valid arithmetic representation of the same decision sequence
    decodes identically everywhere — and the tests hold exactly that:
    libjpeg must read back bit-identical COEFFICIENTS."""

    __slots__ = ("a", "low", "bits")

    def __init__(self):
        self.a = 0x10000
        self.low = 0
        self.bits: list[int] = []

    def _add(self, x: int) -> None:
        self.low += x
        if self.low >= 0x10000:
            self.low &= 0xFFFF
            i = len(self.bits) - 1
            while i >= 0 and self.bits[i]:
                self.bits[i] = 0
                i -= 1
            if i < 0:
                raise RuntimeError("QM encoder carry past stream start")
            self.bits[i] = 1

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        idx = sv & 0x7F
        qe = _QE[idx]
        a = self.a - qe
        if bit == (sv >> 7):            # MPS
            if a >= 0x8000:             # fast path: no renorm/update
                self.a = a
                return
            if a < qe:                  # conditional exchange: top
                self._add(a)
                self.a = qe
            else:
                self.a = a
            st[i] = (sv & 0x80) | _NEXT_MPS[idx]
        else:                           # LPS
            if a >= qe:                 # normal: LPS on top
                self._add(a)
                self.a = qe
            else:                       # exchange: LPS keeps bottom
                self.a = a
            if _SWITCH[idx]:
                sv ^= 0x80
            st[i] = (sv & 0x80) | _NEXT_LPS[idx]
        while self.a < 0x8000:
            self.a <<= 1
            self.low <<= 1
            self.bits.append(self.low >> 16)
            self.low &= 0xFFFF

    def finish(self) -> bytes:
        """Flush the remaining window (code value = interval base —
        trailing zero-fill on the decode side lands inside the final
        interval) and pack with 0xFF00 stuffing."""
        for _ in range(16):
            self.low <<= 1
            self.bits.append(self.low >> 16)
            self.low &= 0xFFFF
        out = bytearray()
        cur = n = 0
        for b in self.bits:
            cur = (cur << 1) | b
            n += 1
            if n == 8:
                out.append(cur)
                if cur == 0xFF:
                    out.append(0x00)
                cur = n = 0
        if n:
            cur <<= 8 - n
            out.append(cur)
            if cur == 0xFF:
                out.append(0x00)
        # trailing zero bytes are decoder-implied; drop them
        while out and out[-1] == 0x00 and (len(out) < 2
                                           or out[-2] != 0xFF):
            out.pop()
        return bytes(out)


def _encode_dc_arith(enc, st, ctx, dc_ctx, ci, diff, L, U):
    if diff == 0:
        enc.encode(st, ctx, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    m = 0
    if sz:
        enc.encode(st, ctx + 2 + sign, 1)
        m = 1
        pos = 20
        while (m << 1) <= sz:
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(st, pos, 0)
    else:
        enc.encode(st, ctx + 2 + sign, 0)
        pos = ctx + 2 + sign
    if m < ((1 << L) >> 1):
        dc_ctx[ci] = 0
    elif m > ((1 << U) >> 1):
        dc_ctx[ci] = 12 + (sign << 2)
    else:
        dc_ctx[ci] = 4 + (sign << 2)
    pos += 14
    mm = m
    while True:
        mm >>= 1
        if not mm:
            break
        enc.encode(st, pos, 1 if (sz & mm) else 0)


def _encode_ac_arith(enc, st, fixed, blk, kx):
    last = 0
    for k in range(63, 0, -1):
        if blk[k]:
            last = k
            break
    k = 1
    while k <= last:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)          # not end-of-block yet
        while blk[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = int(blk[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = (-v if sign else v) - 1
        pos = base + 2
        if sz == 0:
            enc.encode(st, pos, 0)
            m = 0
        elif sz == 1:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 0)
            m = 1
        else:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 1)
            m = 2
            pos = 189 if k <= kx else 217
            while (m << 1) <= sz:
                enc.encode(st, pos, 1)
                m <<= 1
                pos += 1
            enc.encode(st, pos, 0)
        pos += 14
        mm = m
        while True:
            mm >>= 1
            if not mm:
                break
            enc.encode(st, pos, 1 if (sz & mm) else 0)
        k += 1
    if last < 63:
        enc.encode(st, 3 * (k - 1), 1)   # end-of-block


def encode_scan_arith(mcus, comp_tables, n_components,
                      dc_cond=None, ac_cond=None) -> bytes:
    """Encode one sequential arithmetic scan. ``mcus`` iterates MCUs,
    each a list of ``(ci, zigzag_block)``; ``comp_tables[ci] =
    (td, ta)``. Returns stuffed entropy bytes (no markers)."""
    dc_cond = dc_cond or {}
    ac_cond = ac_cond or {}
    enc = QmEncoder()
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    for td, ta in comp_tables:
        dc_stats.setdefault(td, bytearray(64))
        ac_stats.setdefault(ta, bytearray(256))
    fixed = bytearray([113])
    dc_ctx = [0] * n_components
    pred = [0] * n_components
    for mcu in mcus:
        for ci, blk in mcu:
            td, ta = comp_tables[ci]
            L, U = dc_cond.get(td, ARITH_DC_DEFAULT)
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            _encode_dc_arith(enc, dc_stats[td], dc_ctx[ci], dc_ctx,
                             ci, diff, L, U)
            _encode_ac_arith(enc, ac_stats[ta], fixed, blk,
                             ac_cond.get(ta, ARITH_AC_DEFAULT))
    return enc.finish()
