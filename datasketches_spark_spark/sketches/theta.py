"""Distinct-count sketch — KMV / Theta (k minimum hash values).

Re-implements the capability of the reference's distinct-count family
(``distinctCntSketches.scala:38-107``: DataSketches CPC / HLL wrappers).
This engine offers two implementations:

* ``THETA`` (this module) — pure-Python KMV bottom-k sketch, the classic
  Theta-sketch estimator (Dasgupta et al., "Theta-Sketch Framework").
  EXACT while the observed distinct count < k (every hash retained); the
  regime used by oracle-checked queries.  Accepts ``CPC`` as an alias for
  reference API compatibility (the DataSketches CPC algorithm needs its
  native library; KMV provides the same accumulate/combine/estimate
  contract and comparable accuracy at k=4096: RSE ~ 1/sqrt(k-2) ~ 1.6%).
* ``HLL`` — delegated to Spark's native ``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate`` built-ins (JVM-side Apache
  DataSketches HLL, true partial aggregation); see
  ``datasketches_spark_spark.functions.distinctcnt``.

Hashing (the stable state spec — states store hash values, so these rules
must never change without a serde version bump):

* integers: splitmix64 finalizer over the int64 value;
* floats: integral values in int64 range hash as their integer (so an
  int column that arrives as float64 because of nulls merges consistently
  with partitions that arrived as int64); non-integral values hash their
  raw IEEE-754 bit pattern (1.5 and 1.7 stay distinct — the round-1 code
  truncated via astype(int64) and collapsed them);
* strings: pandas ``hash_array`` (vectorized C siphash13 with the fixed
  default key — deterministic across processes, no PYTHONHASHSEED
  dependence), replacing the round-1 per-row blake2b Python loop.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .serde import FAMILY_THETA, pack, unpack

_U64 = np.uint64
_MAX_U64 = float(2**64)
_INT64_MAX_F = float(2**63)


def hash_longs(values: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over int64/uint64 values."""
    x = np.asarray(values).astype(np.uint64)
    x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> _U64(30)
    x = (x * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> _U64(27)
    x = (x * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> _U64(31)
    return x


def hash_strings(values) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=True).astype(np.uint64)


def hash_doubles(values: np.ndarray) -> np.ndarray:
    """Per-value rule (batch-composition independent): integral & in-range
    -> int64 hash; otherwise hash the IEEE bit pattern (-0.0 normalized)."""
    f = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    if f.size == 0:
        return np.empty(0, dtype=np.uint64)
    as_int = (np.floor(f) == f) & (np.abs(f) < _INT64_MAX_F)
    out = np.empty(f.size, dtype=np.uint64)
    out[as_int] = hash_longs(f[as_int].astype(np.int64))
    rest = f[~as_int] + 0.0  # -0.0 -> 0.0 so equal values hash equally
    out[~as_int] = hash_longs(rest.view(np.uint64))
    return out


def hash_series(v: pd.Series) -> np.ndarray:
    """Dtype dispatch for a null-free pandas Series -> uint64 hashes."""
    if pd.api.types.is_integer_dtype(v):
        return hash_longs(v.to_numpy(dtype=np.int64))
    if pd.api.types.is_float_dtype(v):
        return hash_doubles(v.to_numpy(dtype=np.float64))
    return hash_strings(v.astype(str).to_numpy(dtype=object))


class ThetaSketch:
    __slots__ = ("k", "_hashes")

    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self._hashes = np.empty(0, dtype=np.uint64)  # sorted, unique, k smallest

    # ------------------------------------------------------------------ update

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        merged = np.union1d(self._hashes, hashes)  # sorted unique
        self._hashes = merged[: self.k]

    def update_longs(self, values: np.ndarray) -> None:
        self.update_hashes(hash_longs(values))

    def update_strings(self, values) -> None:
        self.update_hashes(hash_strings(values))

    # ------------------------------------------------------------------ merge

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        self.k = min(self.k, other.k)
        self.update_hashes(other._hashes)
        self._hashes = self._hashes[: self.k]
        return self

    # ------------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return len(self._hashes) < self.k

    def estimate(self) -> int:
        m = len(self._hashes)
        if m < self.k:
            return m  # every distinct hash retained -> exact
        kth = float(self._hashes[self.k - 1]) + 1.0
        return int((self.k - 1) * _MAX_U64 / kth)

    # ------------------------------------------------------------------ set ops

    def _theta(self) -> float:
        """Inclusion threshold as a fraction of the hash space: 1.0 while
        exact; (k-th smallest hash + 1)/2^64 once saturated (matching the
        estimator in :meth:`estimate`)."""
        if len(self._hashes) < self.k:
            return 1.0
        return (float(self._hashes[self.k - 1]) + 1.0) / _MAX_U64

    def intersection_estimate(self, other: "ThetaSketch") -> int:
        """|A ∩ B| via the Theta set-operation rule (Dasgupta et al.,
        "Theta-Sketch Framework"): count common hashes below the combined
        threshold θ = min(θ_a, θ_b), scale by 1/θ. EXACT while both
        sketches are exact."""
        theta = min(self._theta(), other._theta())
        cut = np.uint64(theta * _MAX_U64) if theta < 1.0 else None
        a, b = self._hashes, other._hashes
        if cut is not None:
            a, b = a[a < cut], b[b < cut]
        common = np.intersect1d(a, b, assume_unique=True).size
        return int(round(common / theta))

    def a_not_b_estimate(self, other: "ThetaSketch") -> int:
        """|A \\ B| with the same combined-threshold rule."""
        theta = min(self._theta(), other._theta())
        cut = np.uint64(theta * _MAX_U64) if theta < 1.0 else None
        a, b = self._hashes, other._hashes
        if cut is not None:
            a, b = a[a < cut], b[b < cut]
        only_a = np.setdiff1d(a, b, assume_unique=True).size
        return int(round(only_a / theta))

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        """|A ∩ B| / |A ∪ B| — the ratio of common to total hashes below
        the combined threshold (the standard KMV Jaccard estimator; exact
        while both sketches are exact)."""
        theta = min(self._theta(), other._theta())
        cut = np.uint64(theta * _MAX_U64) if theta < 1.0 else None
        a, b = self._hashes, other._hashes
        if cut is not None:
            a, b = a[a < cut], b[b < cut]
        union = np.union1d(a, b).size
        if union == 0:
            return 0.0
        common = np.intersect1d(a, b, assume_unique=True).size
        return common / union

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        head = struct.pack("<IQ", self.k, len(self._hashes))
        return pack(FAMILY_THETA, head + self._hashes.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "ThetaSketch":
        family, payload = unpack(data)
        if family != FAMILY_THETA:
            raise ValueError(f"not a theta state (family={family})")
        k, m = struct.unpack_from("<IQ", payload, 0)
        off = struct.calcsize("<IQ")
        sk = cls(k=k)
        sk._hashes = np.frombuffer(payload, dtype=np.uint64, count=m, offset=off).copy()
        return sk
