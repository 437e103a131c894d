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
  truncated via astype(int64) and collapsed them).
  KNOWN LIMIT: float64 represents integers exactly only up to 2^53. A
  nullable int64 column that Spark's Arrow conversion delivers as float64
  (classic pandas has no NA for int64) rounds values above 2^53 BEFORE the
  engine sees them, so such values can hash differently from partitions
  that arrived as int64 — full-width 64-bit keys with nulls should be
  pre-hashed or cast to string upstream. Columns arriving as pandas
  nullable ``Int64`` extension dtype are handled losslessly;
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
    """Dtype dispatch for a null-free pandas Series -> uint64 hashes.

    Covers numpy int64 and pandas nullable ``Int64`` (lossless integer
    path — never through float64), float dtypes (see the 2^53 note in the
    module docstring), everything else as strings."""
    if pd.api.types.is_integer_dtype(v):
        # works for both numpy int dtypes and masked extension arrays once
        # nulls are dropped; never round-trips through float64
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
        if not isinstance(other, ThetaSketch):
            raise ValueError(
                f"cannot merge a Theta state with a {type(other).__name__} "
                "state: distinct-count states accumulated under different "
                "spark.sql.dataSketches.distinctCnt.sketchImpl settings are "
                "not mergeable. Re-accumulate one side — use "
                "approx_count_distinct_accumulate_theta for Theta states, "
                "or the default approx_count_distinct_accumulate for the "
                "conf-selected family.")
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

    def _cut(self) -> int | None:
        """Exclusive inclusion threshold as an exact INTEGER hash value:
        None while exact; (k-th smallest hash + 1) once saturated. Kept as
        a Python int — a float64 round-trip could move the boundary by up
        to 2^11 for thresholds near 2^64, including/excluding boundary
        hashes inconsistently with the estimator (and for kth = 2^64 - 1
        would overflow a uint64 conversion)."""
        if len(self._hashes) < self.k:
            return None
        return int(self._hashes[self.k - 1]) + 1

    def _setop_inputs(self, other: "ThetaSketch"):
        """Hashes of both sketches below the combined integer threshold,
        plus theta (the threshold as a hash-space fraction, derived FROM
        the integer cut so filter and scale can never disagree)."""
        cuts = [c for c in (self._cut(), other._cut()) if c is not None]
        cut = min(cuts) if cuts else None
        if cut is not None and cut >= 2**64:  # kth == max u64: keep all
            cut = None
        a, b = self._hashes, other._hashes
        if cut is None:
            return a, b, 1.0
        u = _U64(cut)
        return a[a < u], b[b < u], cut / _MAX_U64

    def intersection_estimate(self, other: "ThetaSketch") -> int:
        """|A ∩ B| via the Theta set-operation rule (Dasgupta et al.,
        "Theta-Sketch Framework"): count common hashes below the combined
        threshold θ = min(θ_a, θ_b), scale by 1/θ. EXACT while both
        sketches are exact."""
        a, b, theta = self._setop_inputs(other)
        common = np.intersect1d(a, b, assume_unique=True).size
        return int(round(common / theta))

    def a_not_b_estimate(self, other: "ThetaSketch") -> int:
        """|A \\ B| with the same combined-threshold rule."""
        a, b, theta = self._setop_inputs(other)
        only_a = np.setdiff1d(a, b, assume_unique=True).size
        return int(round(only_a / theta))

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        """|A ∩ B| / |A ∪ B| — the ratio of common to total hashes below
        the combined threshold (the standard KMV Jaccard estimator; exact
        while both sketches are exact)."""
        a, b, theta = self._setop_inputs(other)
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
