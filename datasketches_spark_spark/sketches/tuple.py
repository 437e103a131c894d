"""Tuple sketch — a Theta-style distinct-key sample where every retained
key carries an aggregate summary (count, sum).

The Apache DataSketches analog is the Tuple / ArrayOfDoubles sketch
family: a KMV bottom-k sample of the distinct-KEY space whose entries
ride per-key summaries, enabling "per-distinct-key analytics" from one
state — NDV, total rows, total value, and (the capability nothing else
in the engine gives) ESTIMATES OVER PREDICATES ON PER-KEY AGGREGATES,
e.g. "how many distinct users have >= 20 events" or "how much value do
repeat purchasers carry", computed from the state alone.

Mechanics: identical hash space and retention rule as
:class:`~datasketches_spark_spark.sketches.theta.ThetaSketch` (the k
smallest distinct 64-bit key hashes; same ``hash_series`` dispatch, so a
tuple state and a theta state built over the same key column sample the
same hash positions). Each retained hash carries ``(count, sum)``
accumulated over EVERY row of that key — rows of a retained key are
never subsampled, so per-key summaries are always exact for the keys in
the sample. Estimation applies only across keys: a predicate-count
estimate is ``|retained matching| / theta`` (Horvitz-Thompson over the
uniform key sample), with the same RSE class as KMV NDV
(``~1/sqrt(k-2)`` at saturation).

EXACT while observed NDV < k (theta = 1, every key retained) — the
regime oracle-checked queries use; estimation-mode coverage is gated by
``accuracy_report.py`` envelopes like the other families.

No counterpart in the reference repo (its jar stops at quantiles / freq
/ distinct-count); this is the natural fourth aggregate family on the
same four-verb lifecycle (``README.md:63-64`` accumulate / combine /
estimate model).
"""

from __future__ import annotations

import struct

import numpy as np

from .serde import FAMILY_TUPLE, pack, unpack

_MAX_U64 = float(2**64)


class TupleSketch:
    __slots__ = ("k", "_hashes", "_counts", "_sums")

    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self._hashes = np.empty(0, dtype=np.uint64)   # sorted unique
        self._counts = np.empty(0, dtype=np.int64)
        self._sums = np.empty(0, dtype=np.float64)

    # ------------------------------------------------------------------ update

    def update_batch(self, hashes: np.ndarray, values: np.ndarray) -> None:
        """Fold (key hash, value) pairs. Values must be float64; null
        rows are dropped by the caller BEFORE hashing (a null key is no
        key). A null VALUE should arrive as 0.0 with the row still
        counted, or be dropped — the UDF layer decides; this kernel
        counts every pair it is given."""
        if len(hashes) == 0:
            return
        h = np.asarray(hashes, dtype=np.uint64)
        v = np.asarray(values, dtype=np.float64)
        uh, inv = np.unique(h, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(uh)).astype(np.int64)
        sm = np.bincount(inv, weights=v, minlength=len(uh))
        self._fold(uh, cnt, sm)

    def _fold(self, uh: np.ndarray, cnt: np.ndarray, sm: np.ndarray) -> None:
        """Merge (sorted unique hashes, counts, sums) into the retained
        set, then cut back to the k smallest."""
        if len(self._hashes) == 0:
            merged_h, merged_c, merged_s = uh, cnt, sm
        else:
            all_h = np.concatenate([self._hashes, uh])
            all_c = np.concatenate([self._counts, cnt])
            all_s = np.concatenate([self._sums, sm])
            merged_h, inv = np.unique(all_h, return_inverse=True)
            merged_c = np.zeros(len(merged_h), dtype=np.int64)
            merged_s = np.zeros(len(merged_h), dtype=np.float64)
            np.add.at(merged_c, inv, all_c)
            np.add.at(merged_s, inv, all_s)
        self._hashes = merged_h[: self.k]
        self._counts = np.ascontiguousarray(merged_c[: self.k])
        self._sums = np.ascontiguousarray(merged_s[: self.k])

    # ------------------------------------------------------------------ merge

    def merge(self, other: "TupleSketch") -> "TupleSketch":
        if not isinstance(other, TupleSketch):
            raise ValueError(
                f"cannot merge a tuple state with a {type(other).__name__} "
                "state: approx_tuple_combine only merges "
                "approx_tuple_accumulate outputs.")
        self.k = min(self.k, other.k)
        self._fold(other._hashes, other._counts, other._sums)
        return self

    # ------------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return len(self._hashes) < self.k

    def _sample(self):
        """``(counts, sums, scale)`` of the Horvitz-Thompson sample.
        Exact regime: every retained key at scale 1. Saturated: the k-th
        smallest hash DEFINES theta and is excluded (the KMV (k-1)/theta
        convention), so every estimator — NDV, rows, sum, segment — uses
        one consistent sample and one consistent scale."""
        if len(self._hashes) < self.k:
            return self._counts, self._sums, 1.0
        kth = float(self._hashes[self.k - 1]) + 1.0
        return self._counts[:-1], self._sums[:-1], _MAX_U64 / kth

    def estimate(self) -> int:
        """NDV estimate — the KMV (k-1)/theta rule (ThetaSketch's)."""
        counts, _, scale = self._sample()
        return int(round(len(counts) * scale))

    def rows_estimate(self) -> int:
        """Estimated total row count (per-key counts HT-scaled)."""
        counts, _, scale = self._sample()
        return int(round(float(counts.sum()) * scale))

    def sum_estimate(self) -> float:
        """Estimated total value (per-key sums HT-scaled)."""
        _, sums, scale = self._sample()
        return float(sums.sum()) * scale

    def segment_estimate(self, min_count: int = 1,
                         min_sum: float = float("-inf")) -> tuple[int, float]:
        """(distinct keys, total value) of the segment of keys whose
        per-key row count >= ``min_count`` AND per-key value sum >=
        ``min_sum`` — the per-key-predicate estimator that makes this
        family more than a Theta sketch. Exact while the sketch is
        exact; Horvitz-Thompson scaled at saturation (so
        ``segment_estimate(1)[0] == estimate()`` always)."""
        counts, sums, scale = self._sample()
        mask = (counts >= int(min_count)) & (sums >= min_sum)
        keys = int(round(float(mask.sum()) * scale))
        total = float(sums[mask].sum()) * scale
        return keys, total

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        head = struct.pack("<IQ", self.k, len(self._hashes))
        return pack(FAMILY_TUPLE, head + self._hashes.tobytes()
                    + self._counts.tobytes() + self._sums.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "TupleSketch":
        family, payload = unpack(data)
        if family != FAMILY_TUPLE:
            raise ValueError(f"not a tuple state (family={family})")
        k, m = struct.unpack_from("<IQ", payload, 0)
        off = struct.calcsize("<IQ")
        if len(payload) < off + m * 24:
            raise ValueError("corrupt tuple state")
        sk = cls(k=k)
        sk._hashes = np.frombuffer(payload, np.uint64, m, off).copy()
        sk._counts = np.frombuffer(payload, np.int64, m, off + 8 * m).copy()
        sk._sums = np.frombuffer(payload, np.float64, m, off + 16 * m).copy()
        return sk
