"""Pure-Python decoder for the Apache DataSketches CPC serialized format.

The reference engine's DEFAULT distinct-count accumulate states are CPC
bytes (``distinctCntSketches.scala:57-66, :106`` — ``CpcSketch`` /
``CpcUnion`` with ``toByteArray``), so a user migrating persisted states
hits this format first. This module decodes the published CPC wire layout
(serial version 1, family 16) well enough to

* **estimate** any CPC image (HIP images carry their estimate; merged
  images use the ICON estimator on the preamble's coupon count), and
* **reconstruct the coupon bit matrix** from the compressed body, which
  makes CPC-to-CPC **union** (= ``approx_count_distinct_combine`` over
  foreign CPC states) possible without the Java library: the union of
  CPC sketches is the OR of their bit matrices (with row-folding when
  lgK differs), exactly ``CpcUnion``'s dense path.

Format knowledge comes from the public Apache DataSketches CPC
serialization: the preamble layouts for the eight formats
(EMPTY/SPARSE_HYBRID/PINNED_SLIDING × MERGED/HIP × SV/NOSV), the
surprising-value stream (column deltas in a 65-symbol length-limited
unary code; row deltas Golomb-coded with unary quotient and
``golomb_base_bits`` remainder bits), and the window stream (one static
prefix code per "pseudo phase" over the k window bytes, with a column
permutation + rotation for the sliding flavor). The static code tables
are normative format constants baked in ``_cpc_tables.py``. Everything
here is validated against committed golden fixtures generated from
datasketches-java 6.2.0 (``tests/data/cpc_fixtures.json``; generator in
``devtools/``), including the reference suite's golden CPC vector
(``SketchExpressionSuite.scala:75-85``).

Scale note: decoding is a per-state scalar operation used inside
estimate/combine UDFs; streams are at most O(k) words (k <= 2^26), with
no driver-side work.
"""

from __future__ import annotations

import struct

import numpy as np

from ._cpc_tables import (
    COLUMN_PERMUTATIONS_FOR_DECODING,
    DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE,
    ICON_POLYNOMIAL_COEFFICIENTS,
    ICON_POLYNOMIAL_NUM_COEFFICIENTS,
    LENGTH_LIMITED_UNARY_DECODING_65,
)

_FAMILY_CPC = 16
_SER_VER = 1

# Format ordinals, ((hasWindow << 2) | (hasTable << 1) | hasHip) from the
# flags byte. "Table" here is the compressed surprising-value stream.
_EMPTY_MERGED = 0
_EMPTY_HIP = 1
_SPARSE_HYBRID_MERGED = 2
_SPARSE_HYBRID_HIP = 3
_PINNED_SLIDING_MERGED_NOSV = 4
_PINNED_SLIDING_HIP_NOSV = 5
_PINNED_SLIDING_MERGED = 6
_PINNED_SLIDING_HIP = 7

_FLAG_BIG_ENDIAN = 1
_FLAG_COMPRESSED = 2
_FLAG_HAS_HIP = 4
_FLAG_HAS_TABLE = 8
_FLAG_HAS_WINDOW = 16


class CpcImage:
    """A parsed CPC serialized image (preamble + compressed streams)."""

    __slots__ = ("lgk", "fi_col", "flags", "seed_hash", "fmt",
                 "num_coupons", "num_sv", "kxp", "hip_accum",
                 "sv_words", "cw_words")

    @property
    def has_hip(self) -> bool:
        return bool(self.fmt & 1)

    @property
    def k(self) -> int:
        return 1 << self.lgk


def parse(data: bytes) -> CpcImage:
    """Parse a CPC serialized image into its preamble fields and streams."""
    data = bytes(data)
    if len(data) < 8:
        raise ValueError("CPC image too short for preamble")
    pre_ints, ser_ver, family, lgk, fi_col, flags = struct.unpack_from(
        "<6B", data, 0)
    (seed_hash,) = struct.unpack_from("<H", data, 6)
    if family != _FAMILY_CPC:
        raise ValueError(f"not a CPC image (family {family})")
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported CPC serial version {ser_ver}")
    if flags & _FLAG_BIG_ENDIAN:
        raise ValueError("big-endian CPC images are not supported")
    img = CpcImage()
    img.lgk = lgk
    img.fi_col = fi_col
    img.flags = flags
    img.seed_hash = seed_hash
    fmt = (((flags >> 4) & 1) << 2) | (((flags >> 3) & 1) << 1) | ((flags >> 2) & 1)
    img.fmt = fmt
    img.num_coupons = 0
    img.num_sv = 0
    img.kxp = float(1 << lgk)
    img.hip_accum = 0.0
    img.sv_words = None
    img.cw_words = None

    def _ints(off, n):
        return struct.unpack_from(f"<{n}I", data, off)

    def _dbl(off):
        return struct.unpack_from("<d", data, off)[0]

    expected_pre = {_EMPTY_MERGED: 2, _EMPTY_HIP: 2,
                    _SPARSE_HYBRID_MERGED: 4, _SPARSE_HYBRID_HIP: 8,
                    _PINNED_SLIDING_MERGED_NOSV: 4,
                    _PINNED_SLIDING_HIP_NOSV: 8,
                    _PINNED_SLIDING_MERGED: 6, _PINNED_SLIDING_HIP: 10}[fmt]
    if pre_ints != expected_pre:
        raise ValueError(
            f"CPC preamble length {pre_ints} != {expected_pre} for format {fmt}")

    sv_len = cw_len = 0
    if fmt in (_SPARSE_HYBRID_MERGED, _SPARSE_HYBRID_HIP):
        img.num_coupons, sv_len = _ints(8, 2)
        img.num_sv = img.num_coupons
        if fmt == _SPARSE_HYBRID_HIP:
            img.kxp = _dbl(16)
            img.hip_accum = _dbl(24)
    elif fmt in (_PINNED_SLIDING_MERGED_NOSV, _PINNED_SLIDING_HIP_NOSV):
        img.num_coupons, cw_len = _ints(8, 2)
        if fmt == _PINNED_SLIDING_HIP_NOSV:
            img.kxp = _dbl(16)
            img.hip_accum = _dbl(24)
    elif fmt in (_PINNED_SLIDING_MERGED, _PINNED_SLIDING_HIP):
        img.num_coupons, img.num_sv = _ints(8, 2)
        if fmt == _PINNED_SLIDING_HIP:
            img.kxp = _dbl(16)
            img.hip_accum = _dbl(24)
            sv_len, cw_len = _ints(32, 2)
        else:
            sv_len, cw_len = _ints(16, 2)

    # Data section order: the window stream precedes the surprising-value
    # stream (confirmed against datasketches-java images of every format).
    off = pre_ints * 4
    if cw_len:
        img.cw_words = np.frombuffer(data, np.uint32, cw_len, off)
        off += cw_len * 4
    if sv_len:
        img.sv_words = np.frombuffer(data, np.uint32, sv_len, off)
        off += sv_len * 4
    if off > len(data):
        raise ValueError("CPC image truncated: stream lengths exceed payload")
    return img


# ------------------------------------------------------------- bit reading

class _BitReader:
    """LSB-first bit reader over the little-endian 32-bit word stream.

    Reads up to two words past the final word return zero bits (the
    format pads streams so decode peeks land there); anything further
    means the image lies about its symbol counts — raise instead of
    synthesizing zeros forever (a corrupt Golomb unary run would
    otherwise spin an executor thread indefinitely).
    """

    __slots__ = ("words", "idx", "buf", "bits")

    def __init__(self, words):
        self.words = words
        self.idx = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            if self.idx >= len(self.words) + 2:
                raise ValueError(
                    "corrupt CPC stream: decode ran past the end")
            w = int(self.words[self.idx]) if self.idx < len(self.words) else 0
            self.idx += 1
            self.buf |= w << self.bits
            self.bits += 32

    def take(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        self._fill(nbits)
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.bits -= nbits
        return v

    def read_unary(self) -> int:
        total = 0
        while True:
            self._fill(8)
            peek8 = self.buf & 0xFF
            if peek8 == 0:
                self.buf >>= 8
                self.bits -= 8
                total += 8
                continue
            tz = (peek8 & -peek8).bit_length() - 1
            self.buf >>= tz + 1
            self.bits -= tz + 1
            return total + tz


def _golomb_base_bits(k: int, count: int) -> int:
    """Number of Golomb remainder bits for a pair stream: floor(log2((k-count)/count)), 0 if the quotient is 0."""
    q = (k - count) // count
    return q.bit_length() - 1 if q > 0 else 0


def _uncompress_pairs(words, num_pairs: int, base_bits: int) -> list[int]:
    """Decode the surprising-value stream into sorted (row << 6 | col) pairs."""
    reader = _BitReader(words if words is not None else ())
    lut = LENGTH_LIMITED_UNARY_DECODING_65
    pairs = []
    pred_row = 0
    pred_col = 0
    for _ in range(num_pairs):
        reader._fill(12)
        entry = lut[reader.buf & 0xFFF]
        code_len = entry >> 8
        if code_len == 0:
            raise ValueError("corrupt CPC pair stream: invalid column code")
        x_delta = entry & 0xFF
        reader.buf >>= code_len
        reader.bits -= code_len
        golomb_hi = reader.read_unary()
        golomb_lo = reader.take(base_bits)
        y_delta = (golomb_hi << base_bits) | golomb_lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        pairs.append((row << 6) | col)
        pred_row = row
        pred_col = col + 1
    return pairs


def _uncompress_window(words, n_bytes: int, lut) -> bytearray:
    reader = _BitReader(words if words is not None else ())
    out = bytearray(n_bytes)
    for i in range(n_bytes):
        reader._fill(12)
        entry = lut[reader.buf & 0xFFF]
        code_len = entry >> 8
        if code_len == 0:
            raise ValueError("corrupt CPC window stream: invalid byte code")
        out[i] = entry & 0xFF
        reader.buf >>= code_len
        reader.bits -= code_len
    return out


# ------------------------------------------------------ derived quantities

def _determine_flavor(lgk: int, c: int) -> str:
    k = 1 << lgk
    if c == 0:
        return "EMPTY"
    if (c << 5) < 3 * k:
        return "SPARSE"
    if (c << 1) < k:
        return "HYBRID"
    if (c << 3) < 27 * k:
        return "PINNED"
    return "SLIDING"


def _determine_correct_offset(lgk: int, c: int) -> int:
    k = 1 << lgk
    tmp = (c << 3) - 19 * k  # 8C - 19K
    if tmp < 0:
        return 0
    return tmp >> (lgk + 3)  # tmp / 8K


def _determine_pseudo_phase(lgk: int, c: int) -> int:
    """Select which of the 22 window code tables a sketch used.

    Mid-range occupancies use six hand-tuned pseudo-phases (tables
    16..21, plus steady-state table 6 just before its phase); dense
    occupancies use the true phase, the next 4 bits of C below lgK.
    """
    k = 1 << lgk
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16 + 0
        if 10 * c < 11 * k:
            return 16 + 1
        if 100 * c < 132 * k:
            return 16 + 2
        if 3 * c < 5 * k:
            return 16 + 3
        if 1000 * c < 1965 * k:
            return 16 + 4
        if 1000 * c < 2275 * k:
            return 16 + 5
        return 6
    return (c >> (lgk - 4)) & 15


def icon_estimate(lgk: int, c: int) -> float:
    """The ICON cardinality estimator for merged (non-HIP) CPC images."""
    if c < 2:
        return 0.0 if c == 0 else 1.0
    k = 1 << lgk
    threshold_factor = 5.7 if lgk < 14 else 5.6
    if c > threshold_factor * k:
        try:
            return 0.7940236163830469 * k * 2.0 ** (c / k)
        except OverflowError:  # Java Math.pow saturates to Infinity
            return float("inf")
    ncoef = ICON_POLYNOMIAL_NUM_COEFFICIENTS
    start = ncoef * (lgk - 4)
    x = c / (2.0 * k)
    total = ICON_POLYNOMIAL_COEFFICIENTS[start + ncoef - 1]
    for j in range(start + ncoef - 2, start - 1, -1):
        total = total * x + ICON_POLYNOMIAL_COEFFICIENTS[j]
    ratio = c / k
    result = total * c * (1.0 + ratio * ratio * ratio / 66.774757)
    return result if result > c else float(c)


# ------------------------------------------------------------- public API

def estimate(data_or_img) -> float:
    """Cardinality estimate of a CPC image (HIP accumulator or ICON)."""
    img = data_or_img if isinstance(data_or_img, CpcImage) else parse(data_or_img)
    if img.has_hip:
        return img.hip_accum
    return icon_estimate(img.lgk, img.num_coupons)


def bit_matrix(data_or_img) -> np.ndarray:
    """Reconstruct the k-row coupon bit matrix of a CPC image.

    Rows are uint64 bitmaps of the columns seen for that row. Columns
    below the sliding-window offset default to 1 (the "early zone");
    surprising-value pairs FLIP matrix bits, clearing surprising zeros in
    the early zone and setting surprising ones above the window.
    """
    img = data_or_img if isinstance(data_or_img, CpcImage) else parse(data_or_img)
    k = img.k
    matrix = np.zeros(k, np.uint64)
    if img.fmt in (_EMPTY_MERGED, _EMPTY_HIP):
        return matrix
    if img.fmt in (_SPARSE_HYBRID_MERGED, _SPARSE_HYBRID_HIP):
        # All coupons travel as absolute (row, col) pairs; offset is 0.
        base = _golomb_base_bits(k + img.num_sv, img.num_sv) if img.num_sv else 0
        for pair in _uncompress_pairs(img.sv_words, img.num_sv, base):
            matrix[pair >> 6] |= np.uint64(1 << (pair & 63))
        return matrix

    c = img.num_coupons
    offset = _determine_correct_offset(img.lgk, c)
    phase = _determine_pseudo_phase(img.lgk, c)
    window = _uncompress_window(
        img.cw_words, k, DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase])
    if offset > 0:
        matrix[:] = np.uint64((1 << offset) - 1)
    matrix |= np.frombuffer(bytes(window), np.uint8).astype(np.uint64) << np.uint64(offset)
    if img.num_sv:
        base = _golomb_base_bits(k + img.num_sv, img.num_sv)
        pairs = _uncompress_pairs(img.sv_words, img.num_sv, base)
        if offset == 0:
            # Pinned flavor: stored columns were reduced by 8 (window
            # covers columns 0..7, so every pair column is >= 8).
            for pair in pairs:
                matrix[pair >> 6] ^= np.uint64(1 << ((pair & 63) + 8))
        else:
            # Sliding flavor: invert the encoding's column permutation,
            # then rotate back by (offset + 8) mod 64.
            perm = COLUMN_PERMUTATIONS_FOR_DECODING[phase]
            for pair in pairs:
                col = perm[pair & 63]
                col = (col + offset + 8) & 63
                matrix[pair >> 6] ^= np.uint64(1 << col)
    return matrix


def downsample_matrix(matrix: np.ndarray, lgk_from: int, lgk_to: int) -> np.ndarray:
    """Fold a bit matrix to a smaller lgK: row i ORs into row (i mod k')."""
    if lgk_to > lgk_from:
        raise ValueError("cannot upsample a CPC bit matrix")
    if lgk_to == lgk_from:
        return matrix
    k_to = 1 << lgk_to
    return np.bitwise_or.reduce(matrix.reshape(-1, k_to), axis=0)


def _popcount(matrix: np.ndarray) -> int:
    return int(np.unpackbits(matrix.view(np.uint8)).sum())


class CpcUnionState:
    """Accumulating CPC union over foreign CPC images (dense bit-matrix OR).

    Mirrors ``CpcUnion``'s dense path: the union's lgK starts at the
    first image's lgK and collapses to the minimum lgK seen, folding rows
    mod k. The result estimate is the ICON estimate of the OR'd matrix's
    coupon count (a merged sketch's estimator, which is what the Java
    union returns too).

    This is the codec-local low-level helper; the ENGINE's canonical
    union surface — with seed-hash enforcement and engine-state io — is
    ``sketches.cpc_state.CpcUnionSketch`` (which layers on this module's
    primitives). ``update`` enforces the same cross-seed refusal.
    """

    __slots__ = ("lgk", "matrix", "seed_hash")

    def __init__(self, lgk: int | None = None):
        self.lgk = lgk
        self.matrix = None if lgk is None else np.zeros(1 << lgk, np.uint64)
        self.seed_hash: int | None = None

    def update(self, data_or_img) -> "CpcUnionState":
        img = data_or_img if isinstance(data_or_img, CpcImage) else parse(data_or_img)
        m = bit_matrix(img)
        if self.seed_hash is None:
            self.seed_hash = img.seed_hash
        elif img.seed_hash != self.seed_hash:
            raise ValueError(
                f"cannot union CPC states with different seed hashes "
                f"({self.seed_hash:#x} vs {img.seed_hash:#x})")
        if self.lgk is None:
            self.lgk = img.lgk
            self.matrix = m.copy()
            return self
        if img.lgk < self.lgk:
            self.matrix = downsample_matrix(self.matrix, self.lgk, img.lgk)
            self.lgk = img.lgk
        elif img.lgk > self.lgk:
            m = downsample_matrix(m, img.lgk, self.lgk)
        self.matrix |= m
        return self

    def num_coupons(self) -> int:
        return 0 if self.matrix is None else _popcount(self.matrix)

    def estimate(self) -> float:
        if self.matrix is None:
            return 0.0
        return icon_estimate(self.lgk, self.num_coupons())


# ------------------------------------------------------------- bit writing

class _BitWriter:
    """LSB-first bit writer emitting little-endian 32-bit words — the
    exact inverse of ``_BitReader``."""

    __slots__ = ("words", "buf", "bits")

    def __init__(self):
        self.words: list[int] = []
        self.buf = 0
        self.bits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.buf |= (value & ((1 << nbits) - 1)) << self.bits
        self.bits += nbits
        while self.bits >= 32:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf >>= 32
            self.bits -= 32

    def put_unary(self, v: int) -> None:
        while v >= 32:
            self.put(0, 32)
            v -= 32
        self.put(1 << v, v + 1)

    def finish(self, padding: int) -> list[int]:
        """Flush; ``padding`` zero bits are appended first — the format
        pads each stream so the decoder's 12-bit peek cannot overrun
        (window streams pad 11 bits; pair streams pad
        ``max(0, 10 - base_bits)``, both pinned by the golden images)."""
        self.bits += padding
        while self.bits >= 32:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf >>= 32
            self.bits -= 32
        if self.bits:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf = 0
            self.bits = 0
        return self.words


def _compress_pairs(pairs: list[int], base_bits: int) -> list[int]:
    """Encode sorted (row << 6 | col) pairs — inverse of
    ``_uncompress_pairs`` (column deltas in the 65-symbol length-limited
    unary code, row deltas Golomb: unary high bits + ``base_bits`` low)."""
    from ._cpc_tables import LENGTH_LIMITED_UNARY_ENCODING_65
    w = _BitWriter()
    pred_row = 0
    pred_col = 0
    for pair in pairs:
        row, col = pair >> 6, pair & 63
        y_delta = row - pred_row
        if y_delta > 0:
            pred_col = 0
        x_delta = col - pred_col
        info = LENGTH_LIMITED_UNARY_ENCODING_65[x_delta]
        w.put(info & 0xFFF, info >> 12)
        w.put_unary(y_delta >> base_bits)
        w.put(y_delta, base_bits)
        pred_row = row
        pred_col = col + 1
    return w.finish(max(0, 10 - base_bits))


def _compress_window(window: bytes, enc_table) -> list[int]:
    """Encode k window bytes with one static prefix code — inverse of
    ``_uncompress_window``."""
    w = _BitWriter()
    for b in window:
        info = enc_table[b]
        w.put(info & 0xFFF, info >> 12)
    return w.finish(11)


# ------------------------------------------------------ encode (public)

#: seed hash of the library's DEFAULT_UPDATE_SEED (9001) — the value every
#: default-seeded DataSketches CPC image carries in its preamble
DEFAULT_SEED_HASH = 0x93CC


def serialize_matrix(matrix: np.ndarray, lgk: int,
                     seed_hash: int = DEFAULT_SEED_HASH) -> bytes:
    """Serialize a coupon bit matrix as a *merged* (non-HIP) CPC image.

    This is the inverse of ``bit_matrix`` and the counterpart of
    datasketches-java's ``CpcUnion.getResult().toByteArray()``: flavor,
    window offset and pseudo-phase derive from (lgK, C) exactly as on the
    read path, so the output is decodable by the Java library (and
    byte-identical to it — pinned by the committed union/merged golden
    fixtures). Merged images carry no HIP accumulator by design: union
    results lose the per-update HIP history, and readers estimate them
    with ICON (``estimate``).
    """
    k = 1 << lgk
    if len(matrix) != k:
        raise ValueError(f"matrix has {len(matrix)} rows, expected {k}")
    c = _popcount(matrix)

    def _pre(pre_ints: int, fi_col: int, flags: int) -> bytearray:
        return bytearray(struct.pack(
            "<6BH", pre_ints, _SER_VER, _FAMILY_CPC, lgk, fi_col,
            flags | _FLAG_COMPRESSED, seed_hash))

    # fiCol = number of low columns saturated across ALL rows (the
    # sketch's "first interesting column"), NOT the window offset — the
    # two coincide only sometimes (pinned by the golden union images)
    fi_col = _trailing_ones(int(np.bitwise_and.reduce(matrix))) if c else 0

    flavor = _determine_flavor(lgk, c)
    if flavor == "EMPTY":
        return bytes(_pre(2, 0, 0))

    if flavor in ("SPARSE", "HYBRID"):
        pairs = sorted((int(row) << 6) | col
                       for row in range(k)
                       for col in _iter_bits(int(matrix[row])))
        base = _golomb_base_bits(k + c, c)
        sv_words = _compress_pairs(pairs, base)
        out = _pre(4, fi_col, _FLAG_HAS_TABLE)
        out += struct.pack("<2I", c, len(sv_words))
        out += struct.pack(f"<{len(sv_words)}I", *sv_words)
        return bytes(out)

    # PINNED (offset == 0) / SLIDING (offset >= 1)
    offset = _determine_correct_offset(lgk, c)
    phase = _determine_pseudo_phase(lgk, c)
    window = ((matrix >> np.uint64(offset)) & np.uint64(0xFF)) \
        .astype(np.uint8).tobytes()
    expected = (np.frombuffer(window, np.uint8).astype(np.uint64)
                << np.uint64(offset))
    if offset > 0:
        expected |= np.uint64((1 << offset) - 1)
    sv = matrix ^ expected

    from ._cpc_tables import (COLUMN_PERMUTATIONS_FOR_ENCODING,
                              ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE)
    pairs = []
    for row in range(k):
        bits = int(sv[row])
        for col in _iter_bits(bits):
            if offset == 0:
                enc_col = col - 8  # window covers columns 0..7
                if enc_col < 0:
                    raise AssertionError(
                        "pinned-flavor surprising bit inside the window")
            else:
                rot = (col - offset - 8) & 63
                enc_col = COLUMN_PERMUTATIONS_FOR_ENCODING[phase][rot]
            pairs.append((row << 6) | enc_col)
    pairs.sort()
    num_sv = len(pairs)

    cw_words = _compress_window(
        window, ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[phase])
    if num_sv == 0:
        out = _pre(4, fi_col, _FLAG_HAS_WINDOW)
        out += struct.pack("<2I", c, len(cw_words))
    else:
        base = _golomb_base_bits(k + num_sv, num_sv)
        sv_words = _compress_pairs(pairs, base)
        out = _pre(6, fi_col, _FLAG_HAS_WINDOW | _FLAG_HAS_TABLE)
        out += struct.pack("<2I", c, num_sv)
        out += struct.pack("<2I", len(sv_words), len(cw_words))
    out += struct.pack(f"<{len(cw_words)}I", *cw_words)
    if num_sv:
        out += struct.pack(f"<{len(sv_words)}I", *sv_words)
    return bytes(out)


def _trailing_ones(x: int) -> int:
    n = 0
    while x & 1:
        n += 1
        x >>= 1
    return n


def _iter_bits(bits: int):
    while bits:
        low = bits & -bits
        yield low.bit_length() - 1
        bits ^= low
