"""Apache DataSketches *Theta* wire-format interop (compact images).

Theta is the DataSketches family for distributed set algebra — the role
the engine's own KMV ``ThetaSketch`` plays. A compact Theta image is a
tiny preamble over sorted retained hashes (MurmurHash3 seed-9001, top
bit cleared, hash space [1, 2^63)), so a pure-numpy codec covers the
whole format:

* **parse / estimate** any compact image (empty, single-item, exact,
  estimation-mode);
* **union / intersection / a-not-b / jaccard** among foreign images —
  the Theta-Sketch-Framework rules over the shared murmur hash space
  (``CompactSketch`` carries everything the set operations need);
* **serialize** back to the ordered-compact form, byte-identical to
  ``CompactSketch.toByteArray()`` (validated live against
  datasketches-java in ``tests/test_compat_theta.py``);
* **accumulate**: build Theta states from raw values with the engine's
  bit-identical MurmurHash3 (``sketches/murmur3.py``) — byte-identical
  to Java's compact in the exact regime; valid-but-not-byte-identical
  past nominal k (a live QuickSelect sketch's theta is rebuild-history-
  dependent, not a function of the item set; the KMV theta used here is
  the canonical k-th order statistic).

Foreign Theta states CANNOT mix with the engine's own ``ThetaSketch``
family (different hash spaces — the engine KMV hashes with its own
64-bit mix); cross-family ops raise with migration guidance.

Preamble (little-endian): byte0 preLongs (1 empty/single, 2 exact, 3
estimation) | byte1 serVer=3 | byte2 famID=3 (COMPACT) | bytes3-4 zero |
byte5 flags (1 BE, 2 READ_ONLY, 4 EMPTY, 8 COMPACT, 16 ORDERED, 32
SINGLEITEM) | bytes6-7 seedHash. preLongs>=2 adds retCount(u32) +
p(f32=1.0); preLongs==3 adds thetaLong(u64). Then the sorted hashes.
"""

from __future__ import annotations

import struct

import numpy as np

_FAMILY_COMPACT = 3
_SER_VER = 3
_THETA_MAX = (1 << 63) - 1  # Long.MAX_VALUE: "exact" theta

_F_BIG_ENDIAN = 1
_F_READ_ONLY = 2
_F_EMPTY = 4
_F_COMPACT = 8
_F_ORDERED = 16
_F_SINGLEITEM = 32

#: seed hash of DEFAULT_UPDATE_SEED (9001) — same constant as CPC's
DEFAULT_SEED_HASH = 0x93CC


class ThetaWireSketch:
    """A decoded compact Theta image: sorted retained hashes + theta."""

    __slots__ = ("hashes", "theta_long", "seed_hash")

    def __init__(self, hashes: np.ndarray | None = None,
                 theta_long: int = _THETA_MAX,
                 seed_hash: int = DEFAULT_SEED_HASH):
        self.hashes = (np.empty(0, np.uint64) if hashes is None
                       else np.asarray(hashes, np.uint64))
        self.theta_long = int(theta_long)
        self.seed_hash = int(seed_hash)

    # ------------------------------------------------------------- parse

    @classmethod
    def parse(cls, data: bytes) -> "ThetaWireSketch":
        data = bytes(data)
        if len(data) < 8:
            raise ValueError("Theta image too short for preamble")
        pre_longs, ser_ver, family, _, _, flags = struct.unpack_from(
            "<6B", data, 0)
        (seed_hash,) = struct.unpack_from("<H", data, 6)
        if family != _FAMILY_COMPACT:
            raise ValueError(f"not a compact Theta image (family {family})")
        if ser_ver != _SER_VER:
            raise ValueError(f"unsupported Theta serial version {ser_ver}")
        if flags & _F_BIG_ENDIAN:
            raise ValueError("big-endian Theta images are not supported")
        if flags & _F_EMPTY:
            return cls(seed_hash=seed_hash)
        if pre_longs == 1:  # single item
            if not flags & _F_SINGLEITEM or len(data) < 16:
                raise ValueError("malformed single-item Theta image")
            return cls(np.frombuffer(data, "<u8", 1, 8).copy(),
                       seed_hash=seed_hash)
        if pre_longs not in (2, 3):
            raise ValueError(f"bad Theta preLongs {pre_longs}")
        (ret,) = struct.unpack_from("<I", data, 8)
        theta = _THETA_MAX
        off = 16
        if pre_longs == 3:
            (theta,) = struct.unpack_from("<q", data, 16)
            off = 24
        if len(data) < off + 8 * ret:
            raise ValueError("Theta image truncated: retained count lies")
        hashes = np.frombuffer(data, "<u8", ret, off).copy()
        hashes.sort()  # unordered compacts exist; canonicalize
        if ret and int(hashes[-1]) >= theta:
            raise ValueError("corrupt Theta image: hash >= theta")
        return cls(hashes, theta, seed_hash)

    # --------------------------------------------------------- serialize

    def serialize(self) -> bytes:
        """Ordered-compact form — ``CompactSketch.toByteArray()``."""
        n = len(self.hashes)
        if n == 0 and self.theta_long == _THETA_MAX:
            flags = _F_READ_ONLY | _F_EMPTY | _F_COMPACT | _F_ORDERED
            return struct.pack("<6BH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
                               flags, 0)
        if n == 1 and self.theta_long == _THETA_MAX:
            flags = (_F_READ_ONLY | _F_COMPACT | _F_ORDERED
                     | _F_SINGLEITEM)
            return struct.pack("<6BH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0,
                               flags, self.seed_hash) + self.hashes.tobytes()
        flags = _F_READ_ONLY | _F_COMPACT | _F_ORDERED
        pre = 2 if self.theta_long == _THETA_MAX else 3
        out = struct.pack("<6BH", pre, _SER_VER, _FAMILY_COMPACT, 0, 0,
                          flags, self.seed_hash)
        out += struct.pack("<If", n, 1.0)
        if pre == 3:
            out += struct.pack("<q", self.theta_long)
        return out + self.hashes.tobytes()

    # ------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return self.theta_long == _THETA_MAX

    def theta(self) -> float:
        return self.theta_long / float(_THETA_MAX)

    def estimate(self) -> int:
        return int(round(len(self.hashes) / self.theta()))

    # ---------------------------------------------------------- set ops

    def _check(self, other: "ThetaWireSketch") -> None:
        if not isinstance(other, ThetaWireSketch):
            raise ValueError(
                "DataSketches Theta states only operate with other "
                "DataSketches Theta states: the engine's own KMV family "
                "hashes a different space, so mixing them would count "
                "garbage. Re-accumulate one side (engine: "
                "approx_count_distinct_accumulate_theta; wire-compatible: "
                "theta_wire_accumulate).")
        if self.seed_hash != other.seed_hash:
            raise ValueError(
                f"cannot combine Theta states with different seed hashes "
                f"({self.seed_hash:#x} vs {other.seed_hash:#x})")

    def merge(self, other: "ThetaWireSketch",
              k: int | None = None) -> "ThetaWireSketch":
        """Union: hashes below min(theta); optional nominal-``k`` cap
        lowers theta to the k-th order statistic like Java's Union."""
        self._check(other)
        theta = min(self.theta_long, other.theta_long)
        u = np.union1d(self.hashes, other.hashes)
        u = u[u < np.uint64(theta)]
        if k is not None and len(u) > k:
            theta = int(u[k])
            u = u[:k]
        return ThetaWireSketch(u, theta, self.seed_hash)

    def intersect(self, other: "ThetaWireSketch") -> "ThetaWireSketch":
        self._check(other)
        theta = min(self.theta_long, other.theta_long)
        t = np.uint64(theta)
        common = np.intersect1d(self.hashes[self.hashes < t],
                                other.hashes[other.hashes < t],
                                assume_unique=True)
        return ThetaWireSketch(common, theta, self.seed_hash)

    def a_not_b(self, other: "ThetaWireSketch") -> "ThetaWireSketch":
        self._check(other)
        theta = min(self.theta_long, other.theta_long)
        t = np.uint64(theta)
        only = np.setdiff1d(self.hashes[self.hashes < t],
                            other.hashes[other.hashes < t],
                            assume_unique=True)
        return ThetaWireSketch(only, theta, self.seed_hash)

    # parity with the engine ThetaSketch's method names, so the setop UDF
    # dispatches on either family transparently
    def intersection_estimate(self, other: "ThetaWireSketch") -> int:
        return self.intersect(other).estimate()

    def a_not_b_estimate(self, other: "ThetaWireSketch") -> int:
        return self.a_not_b(other).estimate()

    def jaccard_estimate(self, other: "ThetaWireSketch") -> float:
        self._check(other)
        theta = min(self.theta_long, other.theta_long)
        t = np.uint64(theta)
        a = self.hashes[self.hashes < t]
        b = other.hashes[other.hashes < t]
        union = np.union1d(a, b).size
        if union == 0:
            return 0.0
        return np.intersect1d(a, b, assume_unique=True).size / union


class ThetaWireAccumulator(ThetaWireSketch):
    """Build DataSketches-compatible Theta states from raw values.

    Hash = MurmurHash3(key, 9001).h1 >> 1 (top bit cleared; 0 skipped) —
    bit-identical to ``UpdateSketch.update``, so states built here are
    set-operable with states built by datasketches-java over overlapping
    data. Exact-regime serializations are byte-identical to Java's
    compact; past ``nominal_k`` the retained set is capped KMV-style
    (theta = the k-th order statistic — canonical, while a live Java
    QuickSelect theta depends on its rebuild history).
    """

    __slots__ = ("nominal_k",)

    def __init__(self, nominal_k: int = 4096,
                 seed_hash: int = DEFAULT_SEED_HASH):
        if nominal_k < 16:
            raise ValueError("nominal_k must be >= 16")
        super().__init__(seed_hash=seed_hash)
        self.nominal_k = int(nominal_k)

    def _fold(self, h: np.ndarray) -> None:
        h = h >> np.uint64(1)
        h = h[(h != 0) & (h < np.uint64(self.theta_long))]
        if h.size == 0:
            return
        merged = np.union1d(self.hashes, h)
        if len(merged) > self.nominal_k:
            self.theta_long = int(merged[self.nominal_k])
            merged = merged[: self.nominal_k]
        self.hashes = merged

    def update_longs(self, values: np.ndarray) -> None:
        from ..sketches.murmur3 import hash128_longs
        if len(values):
            self._fold(hash128_longs(np.asarray(values, np.int64))[0])

    def update_strings(self, values) -> None:
        from ..sketches.murmur3 import hash128_bytes
        enc = [s.encode("utf-8") for s in values
               if s is not None and s != ""]
        if enc:
            self._fold(hash128_bytes(enc)[0])
