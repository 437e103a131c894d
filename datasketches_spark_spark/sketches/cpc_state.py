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

A combined result serializes in the ENGINE envelope (family 10) as the
packed bit matrix; it re-enters estimate/combine like any engine state,
and ``to_datasketches()`` re-encodes it as a *merged* CPC wire image —
byte-identical to ``CpcUnion.getResult().toByteArray()`` on the Java
side (pinned by the committed union golden fixtures) — closing the
export direction. CPC cannot merge with Theta or engine-HLL states
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
        return cls(img.lgk, _cpc.bit_matrix(img),
                   single_est=_cpc.estimate(img), seed_hash=img.seed_hash)

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
        return int(np.unpackbits(self.matrix.view(np.uint8)).sum())

    def estimate(self) -> int:
        if self._single_est is not None:
            return int(round(self._single_est))
        return int(round(_cpc.icon_estimate(self.lgk, self.num_coupons())))

    # ----------------------------------------------------------------- io

    def serialize(self) -> bytes:
        """ENGINE envelope: lgk(u8) + est(f64) + seed_hash(u16) + packed
        bit matrix.

        The single-image native estimate survives a serialize round-trip
        so estimate-after-identity-combine stays HIP-accurate; the seed
        hash survives so a later ``to_datasketches()`` export carries the
        original stream's seed.
        """
        est = -1.0 if self._single_est is None else float(self._single_est)
        payload = struct.pack("<BdH", self.lgk, est, self.seed_hash)             + self.matrix.tobytes()
        return pack(FAMILY_CPCUNION, payload)

    @classmethod
    def deserialize(cls, data: bytes) -> "CpcUnionSketch":
        family, payload = unpack(data)
        if family != FAMILY_CPCUNION:
            raise ValueError(f"not a CPC-union state (family={family})")
        lgk, est, seed_hash = struct.unpack_from("<BdH", payload, 0)
        matrix = np.frombuffer(payload, np.uint64, 1 << lgk, 11).copy()
        return cls(lgk, matrix, single_est=None if est < 0 else est,
                   seed_hash=seed_hash)

    def to_datasketches(self) -> bytes:
        """Export as a *merged* CPC wire image (what ``CpcUnion.getResult()
        .toByteArray()`` produces) — decodable by datasketches-java and by
        the reference engine's estimate/combine functions."""
        return _cpc.serialize_matrix(self.matrix, self.lgk,
                                     seed_hash=self.seed_hash)
