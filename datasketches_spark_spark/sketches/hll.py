"""HyperLogLog sketch (pure numpy) — dense 8-bit registers.

Complements the engine's Theta/KMV distinct-count sketch
(``theta.py``): KMV is EXACT below k (the oracle-query regime) but its
state is 8 bytes per retained hash; HLL is never exact but holds
CPC-class accuracy in a fixed 2^lgk-byte state — RSE ≈ 1.04/sqrt(2^lgk),
so lgk=15 ≈ 0.57%, on par with the reference's published CPC accuracy
(+0.56% on BitcoinHeist, ``README.md:259-264``) at a fraction of KMV's
state size for large NDV.

This is the engine's own implementation for the accumulate/combine/
estimate lifecycle (SQL path and two-phase operator); the DataFrame
``approx_count_distinct_hll`` fast path still routes to Spark's native
JVM ``hll_sketch_agg`` built-ins (different, DataSketches-format states —
see ``functions/distinctcnt.py``).

Estimator: the raw harmonic-mean estimate with small-range linear
counting (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA'07).
"""

from __future__ import annotations

import struct

import numpy as np

from .serde import FAMILY_HLL, pack, unpack


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HllSketch:
    """Dense HLL with 2^lgk byte registers. ``lgk`` must be >= 12 so the
    rank computation stays within float64's exact-integer range."""

    __slots__ = ("lgk", "_regs")

    def __init__(self, lgk: int = 12):
        if not (12 <= lgk <= 20):
            raise ValueError("lgk must be in [12, 20]")
        self.lgk = int(lgk)
        self._regs = np.zeros(1 << lgk, dtype=np.uint8)

    # ------------------------------------------------------------------ update

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Fold 64-bit hashes in: index = top lgk bits, rank = leading-zero
        count of the remaining (64-lgk)-bit word + 1, register = max."""
        if len(hashes) == 0:
            return
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.lgk)).astype(np.int64)
        w = (h << np.uint64(self.lgk)) >> np.uint64(self.lgk)
        # bit length via frexp exponent (w < 2^52 exact in float64)
        _, exp = np.frexp(w.astype(np.float64))
        rank = ((64 - self.lgk) - exp + 1).astype(np.uint8)
        np.maximum.at(self._regs, idx, rank)

    # ------------------------------------------------------------------ merge

    def merge(self, other: "HllSketch") -> "HllSketch":
        if other.lgk != self.lgk:
            raise ValueError(
                f"cannot merge HLL sketches of different lgk "
                f"({self.lgk} vs {other.lgk})")
        np.maximum(self._regs, other._regs, out=self._regs)
        return self

    # ------------------------------------------------------------------ query

    def estimate(self) -> int:
        m = self._regs.size
        est = _alpha(m) * m * m / np.power(2.0, -self._regs.astype(np.float64)).sum()
        if est <= 2.5 * m:
            zeros = int((self._regs == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return int(round(est))

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        return pack(FAMILY_HLL, struct.pack("<B", self.lgk) + self._regs.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "HllSketch":
        family, payload = unpack(data)
        if family != FAMILY_HLL:
            raise ValueError(f"not an HLL state (family={family})")
        (lgk,) = struct.unpack_from("<B", payload, 0)
        sk = cls(lgk=lgk)
        regs = np.frombuffer(payload, dtype=np.uint8, count=1 << lgk, offset=1)
        sk._regs = regs.copy()
        return sk
