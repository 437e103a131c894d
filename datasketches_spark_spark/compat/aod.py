"""Apache DataSketches *Tuple / ArrayOfDoubles* wire-format interop.

ArrayOfDoubles (AoD) is the DataSketches tuple dialect: a Theta-style
key sample (same MurmurHash3 seed-9001 hash space, top bit cleared)
where every retained key carries a fixed-width ``double[]`` summary,
and duplicate-key updates SUM elementwise — exactly the semantics of
the engine's own ``TupleSketch`` (count, sum) family, which persists in
the engine-private serde instead. This module speaks the public wire
format so states cross the system boundary in both directions:

* **parse** compact images (empty / exact / estimation-mode) AND
  updatable (QuickSelect hash-table) images — whatever a
  datasketches-java user serialized;
* **serialize** compact images datasketches-java heapifies (canonical
  sorted-key entry order; Java's own dumps use hash-table order and its
  reader accepts either, so cross-checks compare entry SETS and
  estimates, not byte order — unlike Theta, the AoD format has no
  ordered-compact dialect to be byte-identical to);
* **union** foreign images (per-key elementwise value sums, min-theta
  rule, nominal-k cutback);
* **accumulate** raw (key, value) pairs with the engine's bit-identical
  MurmurHash3 into states a datasketches-java reader decodes — the
  ``[1.0, x]`` two-value convention makes the summary (row count,
  value sum), aligning foreign states with the engine tuple family's
  estimators.

Foreign AoD states CANNOT mix with the engine's own ``TupleSketch``
family (different hash spaces — the engine KMV hashes with its own
64-bit mix); cross-family merges raise with migration guidance.

Wire layout (little-endian; probed live against the datasketches-java
bundled with PySpark — ``devtools/aod_probe.py``; constants are the
public Apache-2.0 format, clearly normative like ``compat/theta.py``):

compact (sketch type 3)::

  byte0 preambleLongs=1 | byte1 serVer=1 | byte2 famID=9 (TUPLE) |
  byte3 type=3 | byte4 flags (1 BE, 2 inOrder?, 4 EMPTY, 8 HAS_ENTRIES)
  | byte5 numValues | bytes6-7 seedHash | bytes8-15 thetaLong |
  [count u32 + pad u32 | keys u64*n | values f64*n*numValues]

updatable (sketch type 2)::

  ...same first 16 bytes with byte3=2... | byte16 lgNomEntries |
  byte17 lgCurrentCapacity | byte18 lgResizeFactor | byte19 pad |
  bytes20-23 samplingProbability f32 | bytes24-27 count u32 | pad |
  keys u64*capacity | values f64*capacity*numValues (key 0 = empty slot)
"""

from __future__ import annotations

import struct

import numpy as np

from .theta import DEFAULT_SEED_HASH

_FAMILY_TUPLE = 9
_SER_VER = 1
_PRE_LONGS = 1
_TYPE_UPDATABLE = 2
_TYPE_COMPACT = 3
_THETA_MAX = (1 << 63) - 1

_F_BIG_ENDIAN = 1
_F_EMPTY = 4
_F_HAS_ENTRIES = 8

_MAX_LONG_F = float(1 << 63)

__all__ = ["AodWireSketch", "AodWireAccumulator", "is_aod"]


def is_aod(data: bytes) -> bool:
    """Cheap sniff: a Tuple-family (9) ArrayOfDoubles image."""
    data = bytes(data or b"")
    return (len(data) >= 16 and data[1] == _SER_VER
            and data[2] == _FAMILY_TUPLE
            and data[3] in (_TYPE_UPDATABLE, _TYPE_COMPACT))


class AodWireSketch:
    """A decoded ArrayOfDoubles image: sorted retained key hashes, one
    float64 summary row per key, and theta."""

    __slots__ = ("hashes", "values", "theta_long", "seed_hash")

    def __init__(self, hashes: np.ndarray | None = None,
                 values: np.ndarray | None = None,
                 num_values: int = 1,
                 theta_long: int = _THETA_MAX,
                 seed_hash: int = DEFAULT_SEED_HASH):
        h = (np.empty(0, np.uint64) if hashes is None
             else np.asarray(hashes, np.uint64))
        v = (np.empty((0, num_values), np.float64) if values is None
             else np.asarray(values, np.float64).reshape(len(h), -1))
        order = np.argsort(h)
        self.hashes = h[order]
        self.values = v[order]
        self.theta_long = int(theta_long)
        self.seed_hash = int(seed_hash)

    @property
    def num_values(self) -> int:
        return self.values.shape[1]

    # ------------------------------------------------------------- parse

    @classmethod
    def parse(cls, data: bytes) -> "AodWireSketch":
        data = bytes(data)
        if len(data) < 16:
            raise ValueError("AoD image too short for preamble")
        _, ser_ver, family, stype, flags, nv = struct.unpack_from(
            "<6B", data, 0)
        (seed_hash,) = struct.unpack_from("<H", data, 6)
        if family != _FAMILY_TUPLE:
            raise ValueError(
                f"not an ArrayOfDoubles image (family {family})")
        if ser_ver != _SER_VER:
            raise ValueError(f"unsupported AoD serial version {ser_ver}")
        if flags & _F_BIG_ENDIAN:
            raise ValueError("big-endian AoD images are not supported")
        if nv < 1:
            raise ValueError(f"bad AoD numValues {nv}")
        (theta,) = struct.unpack_from("<q", data, 8)
        if stype == _TYPE_COMPACT:
            if flags & _F_EMPTY or len(data) == 16:
                return cls(num_values=nv, theta_long=theta,
                           seed_hash=seed_hash)
            (ret,) = struct.unpack_from("<I", data, 16)
            off = 24
            if len(data) < off + ret * 8 * (1 + nv):
                raise ValueError("AoD image truncated: count lies")
            keys = np.frombuffer(data, "<u8", ret, off).copy()
            vals = np.frombuffer(data, "<f8", ret * nv,
                                 off + 8 * ret).reshape(ret, nv).copy()
        elif stype == _TYPE_UPDATABLE:
            if len(data) < 32:
                raise ValueError("AoD updatable image too short")
            lg_cur = data[17]
            cap = 1 << lg_cur
            off = 32
            if len(data) < off + cap * 8 * (1 + nv):
                raise ValueError("AoD updatable image truncated")
            keys = np.frombuffer(data, "<u8", cap, off)
            vals = np.frombuffer(data, "<f8", cap * nv,
                                 off + 8 * cap).reshape(cap, nv)
            live = keys != 0
            keys, vals = keys[live].copy(), vals[live].copy()
        else:
            raise ValueError(f"unknown AoD sketch type {stype}")
        if len(keys) and int(keys.max()) >= (theta if theta > 0
                                             else _THETA_MAX + 1):
            raise ValueError("corrupt AoD image: key hash >= theta")
        return cls(keys, vals, nv, theta, seed_hash)

    # --------------------------------------------------------- serialize

    def serialize(self) -> bytes:
        """Compact form (canonical sorted-key entry order — heapified by
        ``ArrayOfDoublesSketches.heapifySketch``)."""
        n = len(self.hashes)
        if n == 0 and self.theta_long == _THETA_MAX:
            return struct.pack("<6BHq", _PRE_LONGS, _SER_VER, _FAMILY_TUPLE,
                               _TYPE_COMPACT, _F_EMPTY, self.num_values,
                               self.seed_hash, _THETA_MAX)
        flags = _F_HAS_ENTRIES if n else 0
        head = struct.pack("<6BHqII", _PRE_LONGS, _SER_VER, _FAMILY_TUPLE,
                           _TYPE_COMPACT, flags, self.num_values,
                           self.seed_hash, self.theta_long, n, 0)
        return head + self.hashes.tobytes() + self.values.tobytes()

    # ------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return self.theta_long == _THETA_MAX

    def theta(self) -> float:
        return self.theta_long / _MAX_LONG_F

    def estimate(self) -> int:
        """Distinct-key estimate — retained / theta (Java's rule)."""
        return int(round(len(self.hashes) / self.theta()))

    def _count_sum(self):
        """(counts, sums) under the engine's two-value [count, sum]
        convention — requires numValues == 2."""
        if self.num_values != 2:
            raise ValueError(
                "this AoD state carries "
                f"{self.num_values} value(s) per key, not the (count, sum) "
                "pair the tuple estimators read; use estimate() for NDV or "
                "rebuild the state with approx_tuple_accumulate_wire.")
        return self.values[:, 0], self.values[:, 1]

    def rows_estimate(self) -> int:
        counts, _ = self._count_sum()
        return int(round(float(counts.sum()) / self.theta()))

    def sum_estimate(self) -> float:
        _, sums = self._count_sum()
        return float(sums.sum()) / self.theta()

    def segment_estimate(self, min_count: int = 1,
                         min_sum: float = float("-inf")) -> tuple[int, float]:
        counts, sums = self._count_sum()
        mask = (counts >= float(min_count)) & (sums >= min_sum)
        scale = 1.0 / self.theta()
        return (int(round(float(mask.sum()) * scale)),
                float(sums[mask].sum()) * scale)

    # ------------------------------------------------------------ merge

    def merge(self, other: "AodWireSketch",
              nominal_k: int | None = None) -> "AodWireSketch":
        """Union — per-key elementwise value sums, min-theta rule, then
        an optional cutback to the ``nominal_k`` smallest hashes (theta
        = the (k+1)-th order statistic, the canonical KMV rule)."""
        if not isinstance(other, AodWireSketch):
            raise ValueError(
                f"cannot merge an ArrayOfDoubles state with a "
                f"{type(other).__name__}: AoD states only union with AoD "
                "states (the engine tuple family uses a different hash "
                "space — re-accumulate to migrate).")
        if self.seed_hash != other.seed_hash:
            raise ValueError("AoD seed-hash mismatch: sketches were built "
                             "with different update seeds")
        if self.num_values != other.num_values:
            raise ValueError("AoD numValues mismatch: "
                             f"{self.num_values} vs {other.num_values}")
        theta = min(self.theta_long, other.theta_long)
        all_h = np.concatenate([self.hashes, other.hashes])
        all_v = np.concatenate([self.values, other.values])
        keep = all_h < np.uint64(theta)
        all_h, all_v = all_h[keep], all_v[keep]
        uh, inv = np.unique(all_h, return_inverse=True)
        uv = np.zeros((len(uh), self.num_values), np.float64)
        np.add.at(uv, inv, all_v)
        if nominal_k is not None and len(uh) > nominal_k:
            theta = int(uh[nominal_k])
            uh, uv = uh[:nominal_k], uv[:nominal_k]
        self.hashes, self.values, self.theta_long = uh, uv, theta
        return self


class AodWireAccumulator(AodWireSketch):
    """Build DataSketches-compatible ArrayOfDoubles states from raw
    (key, value) pairs.

    Key hash = MurmurHash3(key, 9001).h1 >> 1 (0 skipped) — bit-identical
    to ``ArrayOfDoublesUpdatableSketch.update``, so states built here
    carry the same retained keys as states built by datasketches-java
    over the same data. Values follow the ``[1.0, x]`` convention:
    numValues=2 summaries accumulate to exact per-key (row count, value
    sum) — AoD's elementwise-sum update rule on both sides. Past
    ``nominal_k`` the retained set is capped KMV-style (theta = the
    (k+1)-th order statistic; a live Java QuickSelect theta depends on
    its rebuild history, so saturated states are valid-but-not-entry-
    identical, same caveat as ``ThetaWireAccumulator``)."""

    __slots__ = ("nominal_k",)

    def __init__(self, nominal_k: int = 4096,
                 seed_hash: int = DEFAULT_SEED_HASH):
        if nominal_k < 16:
            raise ValueError("nominal_k must be >= 16")
        super().__init__(num_values=2, seed_hash=seed_hash)
        self.nominal_k = int(nominal_k)

    def _fold(self, h: np.ndarray, v: np.ndarray) -> None:
        h = h >> np.uint64(1)
        live = (h != 0) & (h < np.uint64(self.theta_long))
        h, v = h[live], v[live]
        if h.size == 0:
            return
        pairs = np.column_stack([np.ones(len(h)), v])
        self.merge(AodWireSketch(h, pairs, 2, self.theta_long,
                                 self.seed_hash),
                   nominal_k=self.nominal_k)

    def update_longs(self, keys: np.ndarray, values: np.ndarray) -> None:
        from ..sketches.murmur3 import hash128_longs
        if len(keys):
            self._fold(hash128_longs(np.asarray(keys, np.int64))[0],
                       np.asarray(values, np.float64))

    def update_strings(self, keys, values) -> None:
        from ..sketches.murmur3 import hash128_bytes
        enc, vals = [], []
        for k, v in zip(keys, values):
            if k is not None and k != "":
                enc.append(str(k).encode("utf-8"))
                vals.append(v)
        if enc:
            self._fold(hash128_bytes(enc)[0],
                       np.asarray(vals, np.float64))
