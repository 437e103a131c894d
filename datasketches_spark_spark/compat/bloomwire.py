"""Apache DataSketches *BloomFilter* wire-format interop.

The DataSketches filters family (famID 21) is the public membership
dialect: XxHash64-based double hashing over a fixed bit array with an
explicit u64 seed, so two parties sharing (seed, numBits, numHashes)
build UNION-COMPATIBLE filters. This module speaks that format in both
directions so membership states cross the system boundary:

* **parse** images a datasketches-java user serialized
  (``BloomFilter.toByteArray()``), query/union/estimate them;
* **serialize** images datasketches-java heapifies — byte-identical to
  Java's own dumps for the same update stream (validated live against
  the datasketches-java bundled with PySpark in
  ``tests/test_compat_bloomwire.py``);
* **accumulate** raw values into wire states through the grouped
  two-phase machinery (``approx_membership_accumulate_wire``).

Foreign wire states CANNOT mix with the engine's own
:class:`~datasketches_spark_spark.sketches.bloom.BloomFilter` (that
family derives indices from the engine's MurmurHash3 space; this one
from XxHash64 with Kirsch-Mitzenmacher double hashing) — cross-family
merges raise with migration guidance.

Wire layout (little-endian; probed live against datasketches-java —
normative constants of the public Apache-2.0 format, same class as
``compat/theta.py``)::

  byte0 preambleLongs (4; 3 when EMPTY) | byte1 serVer=1 |
  byte2 famID=21 | byte3 flags (4 = EMPTY) |
  bytes4-5 numHashes u16 | bytes6-7 pad |
  bytes8-15 seed u64 | bytes16-23 numLongs u64 |
  [bytes24-31 numBitsSet i64 (-1 = not tracked) | bitarray u64*numLongs]

Hash/index rule (reverse-engineered against the live jar; items 1, 2,
777 x seeds 0, 7, 12345 x m in {128, 256} x k 1-4 all byte-exact)::

  h0 = xxhash64(item_bytes, seed)      # longs: 8-byte little-endian
  h1 = xxhash64(item_bytes, h0)        # strings: UTF-8 bytes
  index_i = ((h0 + i*h1) mod 2^64) mod (2*numBits) >> 1,  i = 1..k
"""

from __future__ import annotations

import math
import struct

import numpy as np

_FAMILY_BLOOM = 21
_FLAG_EMPTY = 0x04

_U64 = np.uint64
_M64 = (1 << 64) - 1

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


# ------------------------------------------------------------------ xxhash64

def _rotl_np(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def xxhash64_longs(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized XxHash64 of int64/uint64 values (8-byte LE input path;
    bit-identical to Spark's ``xxhash64(bigint)`` and datasketches'
    ``XxHash.hashLong`` — cross-checked live). ``seed`` is a scalar or
    a uint64 array broadcastable to ``values``."""
    old = np.seterr(over="ignore")
    try:
        v = values.astype(np.uint64, copy=False)
        seed = np.asarray(seed, dtype=np.uint64)
        h = seed + _U64((_P5 + 8) & _M64)
        k1 = v * _U64(_P2)
        k1 = _rotl_np(k1, 31) * _U64(_P1)
        h = h ^ k1
        h = _rotl_np(h, 27) * _U64(_P1) + _U64(_P4)
        h ^= h >> _U64(33)
        h *= _U64(_P2)
        h ^= h >> _U64(29)
        h *= _U64(_P3)
        h ^= h >> _U64(32)
        return h
    finally:
        np.seterr(**old)


def xxhash64_bytes(data: bytes, seed: int) -> int:
    """Scalar XxHash64 over arbitrary bytes (full spec incl. the 32-byte
    stripe loop) — the string-item path (UTF-8 bytes, matching
    ``BloomFilter.update(String)``, probed live)."""
    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (k,) = struct.unpack_from("<Q", data, off + 8 * i)
                v = (v + k * _P2) & _M64
                v = (rotl(v, 31) * _P1) & _M64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            k = (rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (((h ^ k) * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while off + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, off)
        k = (rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = ((rotl(h ^ k, 27) * _P1) + _P4) & _M64
        off += 8
    if off + 4 <= n:
        (k,) = struct.unpack_from("<I", data, off)
        h = ((rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        off += 4
    while off < n:
        h = (rotl(h ^ ((data[off] * _P5) & _M64), 11) * _P1) & _M64
        off += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------------------------- filter

class DsBloomFilter:
    """A DataSketches-wire Bloom filter the engine can build, query,
    union, and round-trip byte-identically with datasketches-java."""

    __slots__ = ("seed", "n_hashes", "m_bits", "_words")

    def __init__(self, m_bits: int, n_hashes: int, seed: int = 0):
        if m_bits < 64:
            raise ValueError("m_bits must be >= 64")
        if not 1 <= n_hashes <= 0xFFFF:
            raise ValueError("n_hashes out of range")
        self.m_bits = ((int(m_bits) + 63) // 64) * 64  # java rounds up
        self.n_hashes = int(n_hashes)
        self.seed = int(seed) & _M64
        self._words = np.zeros(self.m_bits // 64, dtype=np.uint64)

    @classmethod
    def design(cls, expected_items: int, fpp: float = 0.01,
               seed: int = 0) -> "DsBloomFilter":
        """Java's ``BloomFilterBuilder.createByAccuracy`` sizing rule
        (standard optimal m/h)."""
        if expected_items < 1:
            raise ValueError("expected_items must be >= 1")
        if not 0.0 < fpp < 1.0:
            raise ValueError("fpp must be in (0, 1)")
        ln2 = math.log(2.0)
        raw_m = int(math.ceil(-expected_items * math.log(fpp)
                              / (ln2 * ln2)))
        # Java's BloomFilterBuilder.suggestNumHashes CEILs (verified
        # live against datasketches-java: (1000, 0.1) -> 4, (100, 0.5)
        # -> 2); round() would under-pick at those points and the
        # mixed-origin union would raise on geometry mismatch. The
        # engine-native BloomFilter.design keeps round() — it never
        # needs Java parity. numHashes derives from the RAW suggested
        # bit count, BEFORE any 64-bit floor/rounding, matching
        # createByAccuracy's call order (verified live: (1, 0.5) ->
        # java k=2 from raw_m=2, not k from the 64-bit minimum).
        h = max(1, int(math.ceil((raw_m / expected_items) * ln2)))
        return cls(m_bits=max(64, raw_m), n_hashes=h, seed=seed)

    # ------------------------------------------------------------ update

    def _indices_from_h(self, h0: np.ndarray, h1: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via the probed double-hash rule."""
        old = np.seterr(over="ignore")
        try:
            i = np.arange(1, self.n_hashes + 1, dtype=np.uint64)
            x = h0[:, None] + i[None, :] * h1[:, None]
            return (x % _U64(2 * self.m_bits)) >> _U64(1)
        finally:
            np.seterr(**old)

    def _indices_longs(self, values: np.ndarray) -> np.ndarray:
        h0 = xxhash64_longs(values, self.seed)
        h1 = xxhash64_longs(values, h0)
        return self._indices_from_h(h0, h1)

    def _indices_strings(self, values) -> np.ndarray:
        h0 = np.empty(len(values), dtype=np.uint64)
        h1 = np.empty(len(values), dtype=np.uint64)
        for j, s in enumerate(values):
            b = s.encode() if isinstance(s, str) else bytes(s)
            a = xxhash64_bytes(b, self.seed)
            h0[j] = a
            h1[j] = xxhash64_bytes(b, a)
        return self._indices_from_h(h0, h1)

    def _set(self, pos: np.ndarray) -> None:
        p = pos.ravel()
        np.bitwise_or.at(self._words, p >> _U64(6),
                         _U64(1) << (p & _U64(63)))

    def _test(self, pos: np.ndarray) -> np.ndarray:
        bits = (self._words[pos >> _U64(6)]
                >> (pos & _U64(63))) & _U64(1)
        return bits.all(axis=1)

    def update_longs(self, values: np.ndarray) -> None:
        if len(values):
            self._set(self._indices_longs(values))

    def update_strings(self, values) -> None:
        if len(values):
            self._set(self._indices_strings(values))

    def contains_longs(self, values: np.ndarray) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        return self._test(self._indices_longs(values))

    def contains_strings(self, values) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        return self._test(self._indices_strings(values))

    # ------------------------------------------------------------- merge

    def merge(self, other) -> "DsBloomFilter":
        from ..sketches.bloom import BloomFilter as _EngineBloom
        if isinstance(other, _EngineBloom):
            raise ValueError(
                "cannot union a DataSketches-wire Bloom filter with an "
                "engine-native membership state (different hash spaces); "
                "rebuild one side via approx_membership_accumulate_wire "
                "or approx_membership_accumulate")
        if not isinstance(other, DsBloomFilter):
            raise ValueError("not a bloom filter")
        if (self.m_bits, self.n_hashes, self.seed) != \
                (other.m_bits, other.n_hashes, other.seed):
            raise ValueError(
                "cannot merge Bloom wire filters of different geometry/"
                f"seed: ({self.m_bits},{self.n_hashes},{self.seed}) vs "
                f"({other.m_bits},{other.n_hashes},{other.seed})")
        out = DsBloomFilter(self.m_bits, self.n_hashes, self.seed)
        np.bitwise_or(self._words, other._words, out=out._words)
        return out

    # ----------------------------------------------------------- estimate

    def bits_set(self) -> int:
        return int(np.unpackbits(self._words.view(np.uint8)).sum())

    def fill_fraction(self) -> float:
        return self.bits_set() / self.m_bits

    def current_fpp(self) -> float:
        return self.fill_fraction() ** self.n_hashes

    def estimate(self) -> int:
        x = self.bits_set()
        if x >= self.m_bits:
            return -1
        n = -(self.m_bits / self.n_hashes) * math.log1p(-x / self.m_bits)
        return int(round(n))

    # -------------------------------------------------------------- serde

    def serialize(self) -> bytes:
        empty = not self._words.any()
        n_longs = len(self._words)
        if empty:
            return struct.pack("<BBBBHHQQ", 3, 1, _FAMILY_BLOOM,
                               _FLAG_EMPTY, self.n_hashes, 0, self.seed,
                               n_longs)
        # CANONICAL form: the engine always writes the computed
        # numBitsSet (java tracks it lazily and dumps -1 after raw
        # updates, the count after a union; its reader accepts both —
        # the counted form keeps engine states bit-identical under any
        # partition layout / merge tree, which java's history-dependent
        # field is not)
        head = struct.pack("<BBBBHHQQq", 4, 1, _FAMILY_BLOOM, 0,
                           self.n_hashes, 0, self.seed, n_longs,
                           self.bits_set())
        return head + self._words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "DsBloomFilter":
        data = bytes(data)
        if len(data) < 24 or data[2] != _FAMILY_BLOOM or data[1] != 1:
            raise ValueError("not a DataSketches BloomFilter image")
        pre, _, _, flags, n_hashes, _, seed, n_longs = struct.unpack_from(
            "<BBBBHHQQ", data, 0)
        sk = cls(m_bits=max(1, n_longs) * 64, n_hashes=max(1, n_hashes),
                 seed=seed)
        if flags & _FLAG_EMPTY:
            return sk
        if pre < 4 or len(data) < 32 + 8 * n_longs:
            raise ValueError("corrupt BloomFilter image")
        sk._words = np.frombuffer(data, np.uint64, n_longs, 32).copy()
        return sk


def is_dsbloom(data: bytes) -> bool:
    try:
        data = bytes(data)
        return len(data) >= 24 and data[2] == _FAMILY_BLOOM and \
            data[1] == 1 and data[0] in (3, 4)
    except Exception:
        return False
