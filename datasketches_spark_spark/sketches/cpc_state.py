"""Engine wrapper for imported Apache DataSketches CPC states.

The reference's DEFAULT ``approx_count_distinct_accumulate`` states are
CPC bytes (``distinctCntSketches.scala:57-66, :106``). This class makes
those states first-class citizens of the engine's distinct-count state
surface: ``deserialize_any`` returns one for any family-16 image, so

* ``approx_count_distinct_estimate`` decodes foreign CPC states (HIP
  images read their stored estimator; merged images use the ICON
  estimator on the decoded coupon count), and
* ``approx_count_distinct_combine`` unions foreign CPC states with each
  other — the union is the OR of the decoded coupon bit matrices with
  row-folding across mixed lgK, ``CpcUnion``'s dense-path semantics
  (``compat/cpc.py``) — without the Java library.

A combined result serializes DIRECTLY as a *merged* CPC wire image —
byte-identical to ``CpcUnion.getResult().toByteArray()`` on the Java
side (pinned by the committed union golden fixtures) — so accumulate
partials, combine outputs and exports all speak the reference's dialect;
the engine envelope (family 10) survives only to carry a foreign HIP
image's estimate through identity combines. CPC cannot merge with Theta or engine-HLL states
(different hash families), and Java refuses cross-seed unions, so
``merge`` raises on mismatched seed hashes too.
"""

from __future__ import annotations

import struct

import numpy as np

from ..compat import cpc as _cpc
from .serde import FAMILY_CPCUNION, pack, unpack


class CpcUnionSketch:
    """A decoded CPC coupon bit matrix, mergeable across CPC states.

    While the sketch holds exactly one un-merged image, ``estimate()``
    returns that image's native estimate (HIP when present — matching
    ``CpcSketch.getEstimate`` on the reference side); after any merge the
    ICON estimator applies, which is what ``CpcUnion.getResult`` yields.
    """

    __slots__ = ("lgk", "matrix", "_single_est", "seed_hash")

    def __init__(self, lgk: int, matrix: np.ndarray | None = None,
                 single_est: float | None = None,
                 seed_hash: int = _cpc.DEFAULT_SEED_HASH):
        self.lgk = lgk
        self.matrix = (matrix if matrix is not None
                       else np.zeros(1 << lgk, np.uint64))
        self._single_est = single_est
        self.seed_hash = seed_hash

    # -------------------------------------------------------- construction

    @classmethod
    def from_datasketches(cls, data: bytes) -> "CpcUnionSketch":
        img = _cpc.parse(data)
        # only HIP images need their native estimate preserved (ICON of
        # the matrix IS a merged image's estimate) — keeping single_est
        # None for merged images lets them serialize straight back to
        # wire bytes, so combine chains stay in one format
        est = _cpc.estimate(img) if img.has_hip else None
        return cls(img.lgk, _cpc.bit_matrix(img),
                   single_est=est, seed_hash=img.seed_hash)

    # ----------------------------------------------------------- lifecycle

    def merge(self, other: "CpcUnionSketch") -> "CpcUnionSketch":
        if not isinstance(other, CpcUnionSketch):
            raise ValueError(
                "CPC states only merge with other CPC states (Theta and "
                "HLL states hash differently); re-accumulate instead")
        if self.seed_hash != other.seed_hash:
            raise ValueError(
                f"cannot union CPC states with different seed hashes "
                f"({self.seed_hash:#x} vs {other.seed_hash:#x}) — the "
                "Java library enforces the same invariant")
        lgk = min(self.lgk, other.lgk)
        a = _cpc.downsample_matrix(self.matrix, self.lgk, lgk)
        b = _cpc.downsample_matrix(other.matrix, other.lgk, lgk)
        return CpcUnionSketch(lgk, a | b, seed_hash=self.seed_hash)

    def num_coupons(self) -> int:
        return _cpc._popcount(self.matrix)

    def estimate(self) -> int:
        if self._single_est is not None:
            return int(round(self._single_est))
        return int(round(_cpc.icon_estimate(self.lgk, self.num_coupons())))

    # ----------------------------------------------------------------- io

    def serialize(self) -> bytes:
        """Merged CPC states serialize as GENUINE CPC wire bytes (family
        16) — the engine's CPC state IS the Apache DataSketches format,
        so accumulate partials, combine outputs and exports all speak
        one dialect the reference reads directly. The ENGINE envelope
        (family 10: lgk + est + seed_hash + packed bit matrix) survives
        only to carry a foreign single image's HIP estimate through an
        identity combine, which the merged wire format cannot express.
        """
        if self._single_est is None:
            return self.to_datasketches()
        payload = (struct.pack("<BdH", self.lgk, float(self._single_est),
                               self.seed_hash) + self.matrix.tobytes())
        return pack(FAMILY_CPCUNION, payload)

    @classmethod
    def deserialize(cls, data: bytes) -> "CpcUnionSketch":
        family, payload = unpack(data)
        if family != FAMILY_CPCUNION:
            raise ValueError(f"not a CPC-union state (family={family})")
        lgk, est, seed_hash = struct.unpack_from("<BdH", payload, 0)
        matrix = np.frombuffer(payload, np.uint64, 1 << lgk, 11).copy()
        return cls(lgk, matrix, single_est=est, seed_hash=seed_hash)

    def to_datasketches(self) -> bytes:
        """Export as a *merged* CPC wire image (what ``CpcUnion.getResult()
        .toByteArray()`` produces) — decodable by datasketches-java and by
        the reference engine's estimate/combine functions."""
        return _cpc.serialize_matrix(self.matrix, self.lgk,
                                     seed_hash=self.seed_hash)

    def update_hashes128(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Fold (h1, h2) MurmurHash3 pairs in as CPC coupons — exactly
        ``CpcSketch.hashUpdate``: ``row = h0 & (k-1)``,
        ``col = min(nlz(h1), 63)``, plus the reference's rowCol == -1
        collision rule (at lgK=26 the all-ones pair folds onto row
        2^26-2, the hash table's empty-marker dodge). Lives on the BASE
        class so a state rehydrated from wire bytes (streaming resume,
        combine chains) stays update-capable."""
        k = 1 << self.lgk
        rows = (h1 & np.uint64(k - 1)).astype(np.intp)
        cols = np.minimum(_nlz64(h2), 63).astype(np.uint64)
        if self.lgk == 26:
            clash = (rows == k - 1) & (cols == np.uint64(63))
            if clash.any():
                rows = np.where(clash, rows ^ 1, rows)
        np.bitwise_or.at(self.matrix, rows, np.uint64(1) << cols)
        self._single_est = None


def _nlz64(v: np.ndarray) -> np.ndarray:
    """Vectorized number-of-leading-zeros over uint64 (0 -> 64)."""
    n = np.zeros(v.shape, np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        su = np.uint64(s)
        big = (v >> su) != 0
        n = np.where(big, n + su, n)
        v = np.where(big, v >> su, v)
    return (np.uint64(64) - (n + v)).astype(np.int64)


class CpcAccumulator(CpcUnionSketch):
    """An UPDATE-capable CPC sketch: raw values -> genuine Apache
    DataSketches CPC coupons.

    Coupon derivation is exactly ``CpcSketch.hashUpdate``: MurmurHash3
    x64 128 (seed 9001), ``row = h0 & (k-1)``,
    ``col = min(nlz(h1), 63)`` — verified by reproducing the coupon
    matrix of every committed datasketches-java fixture from its raw
    update stream (182/182, ``tests/test_compat_cpc.py``). The state is
    matrix form (merged semantics, ICON estimator — what
    ``CpcUnion.getResult`` yields); ``to_datasketches()`` emits wire
    bytes datasketches-java reads, and sketches built HERE union
    correctly with sketches built THERE over overlapping data because
    the hashes are bit-identical.

    Longs hash vectorized (numpy); strings hash per item (UTF-8, one
    pass per Arrow batch). Nulls skip; empty strings skip (Java's
    ``update(String)`` ignores null/empty).
    """

    def update_longs(self, values: np.ndarray) -> None:
        from .murmur3 import hash128_longs
        if len(values) == 0:
            return
        self.update_hashes128(*hash128_longs(values))

    def update_strings(self, values) -> None:
        from .murmur3 import hash128_bytes
        enc = [s.encode("utf-8") for s in values
               if s is not None and s != ""]
        if not enc:
            return
        self.update_hashes128(*hash128_bytes(enc))
