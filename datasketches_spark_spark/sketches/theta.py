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

Hashing: 64-bit splitmix64 for integers, blake2b-8 for strings — stable
across processes and sessions (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import struct
from hashlib import blake2b

import numpy as np

from .serde import FAMILY_THETA, pack, unpack

_U64 = np.uint64
_MAX_U64 = float(2**64)


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
    out = np.empty(len(values), dtype=np.uint64)
    for i, s in enumerate(values):
        out[i] = int.from_bytes(
            blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out


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
