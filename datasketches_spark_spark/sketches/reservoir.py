"""Mergeable uniform reservoir sampling sketch.

The DataSketches library's *sampling* family (reservoir / VarOpt) is the
one family the reference repo does not wrap; a curation pipeline wants it
with the same four-verb lifecycle as the other sketches —
``accumulate -> combine -> estimate`` — so per-group uniform samples ride
the two-phase operator and the family-agnostic combine, exactly like
quantile or theta states.

Algorithm: classic Algorithm R per batch (item *t* replaces a random slot
with probability ``k/t``), vectorized over numpy draws. Merge is the
exactly-uniform two-reservoir union: the count drawn from A is
``Hypergeometric(nA, nB, k)`` and a uniform subset of a uniform sample is
uniform, so the merged reservoir is a true uniform k-sample of the
concatenated stream regardless of merge order or tree shape — the
property that makes the state a monoid for Spark partial aggregation.

EXACT regime: while ``n <= k`` the reservoir retains everything, so
estimate returns the complete multiset — the oracle-checkable contract
(mirrors the other families' exact-below-capacity design).

Determinism: draws come from a per-instance ``default_rng`` with a fixed
seed, so a fixed input split reproduces the same sample run-to-run
(same contract as KLL's compaction coin flips, ``kll.py:64-66``).
"""

from __future__ import annotations

import struct

import numpy as np

from .freq import ITEM_LONG, ITEM_STR
from .serde import FAMILY_RESERVOIR, pack, unpack

ITEM_DOUBLE = "double"

_ITEM_CODES = {ITEM_DOUBLE: 0, ITEM_LONG: 1, ITEM_STR: 2}
_CODE_ITEMS = {v: k for k, v in _ITEM_CODES.items()}


class ReservoirSketch:
    """Uniform k-sample without replacement over an unbounded stream."""

    FAMILY = FAMILY_RESERVOIR

    __slots__ = ("k", "item_type", "n", "_items", "_rng")

    def __init__(self, k: int = 1024, item_type: str = ITEM_DOUBLE):
        if k <= 0:
            raise ValueError(f"reservoir k must be positive, got {k}")
        if item_type not in _ITEM_CODES:
            raise ValueError(f"unsupported item type {item_type!r}")
        self.k = int(k)
        self.item_type = item_type
        self.n = 0
        self._items: list = []
        self._rng = np.random.default_rng(0xD5C0FFEE)

    # ------------------------------------------------------------------ update

    def update_batch(self, items) -> None:
        arr = np.asarray(items, dtype=object)
        m = arr.size
        if m == 0:
            return
        fill = min(self.k - len(self._items), m)
        if fill > 0:
            self._items.extend(arr[:fill].tolist())
        rest = arr[fill:]
        if rest.size:
            # stream position (1-based) of each remaining item
            pos = np.arange(rest.size, dtype=np.float64) + (self.n + fill + 1)
            accept = self._rng.random(rest.size) < (self.k / pos)
            hits = rest[accept]
            slots = self._rng.integers(0, self.k, size=hits.size)
            for item, s in zip(hits.tolist(), slots.tolist()):
                self._items[s] = item
        self.n += int(m)

    def update(self, item) -> None:
        self.update_batch([item])

    # ------------------------------------------------------------------ merge

    def merge(self, other: "ReservoirSketch") -> "ReservoirSketch":
        if other.n == 0:
            return self
        if other.FAMILY != self.FAMILY:
            raise ValueError("cannot merge reservoir with another family")
        if other.item_type != self.item_type:
            raise ValueError("cannot merge reservoirs of different item types")
        self.k = min(self.k, other.k)
        if self.n + other.n <= self.k:
            # both in exact regime: union retains everything
            self._items.extend(other._items)
            self.n += other.n
            return self
        mine = self._subset(self._items, min(len(self._items), self.k))
        theirs = self._subset(other._items, min(len(other._items), self.k))
        # Exactly-uniform union: |from self| ~ Hypergeometric(n, other.n, k)
        want = min(self.k, self.n + other.n)
        x = int(self._rng.hypergeometric(self.n, other.n, want))
        x = min(x, len(mine))                      # n >= len(mine) always
        y = min(want - x, len(theirs))
        self._items = self._subset(mine, x) + self._subset(theirs, y)
        self.n += other.n
        return self

    def _subset(self, items: list, size: int) -> list:
        if size >= len(items):
            return list(items)
        idx = self._rng.choice(len(items), size=size, replace=False)
        return [items[i] for i in idx]

    # ------------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return self.n <= self.k

    def items(self) -> list:
        """Retained sample, sorted (deterministic output order)."""
        if self.item_type == ITEM_STR:
            return sorted(str(x) for x in self._items)
        if self.item_type == ITEM_LONG:
            return sorted(int(x) for x in self._items)
        return sorted(float(x) for x in self._items)

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        items = self.items()
        head = struct.pack("<IBQI", self.k, _ITEM_CODES[self.item_type],
                           self.n, len(items))
        if self.item_type == ITEM_STR:
            parts = [head]
            for s in items:
                b = s.encode("utf-8")
                parts.append(struct.pack("<I", len(b)) + b)
            return pack(self.FAMILY, b"".join(parts))
        dtype = "<f8" if self.item_type == ITEM_DOUBLE else "<q"
        body = np.asarray(items, dtype=dtype).tobytes()
        return pack(self.FAMILY, head + body)

    @classmethod
    def deserialize(cls, data: bytes) -> "ReservoirSketch":
        family, payload = unpack(data)
        if family != cls.FAMILY:
            raise ValueError(f"not a ReservoirSketch state (family={family})")
        k, code, n, count = struct.unpack_from("<IBQI", payload, 0)
        off = struct.calcsize("<IBQI")
        item_type = _CODE_ITEMS[code]
        sk = cls(k=k, item_type=item_type)
        sk.n = int(n)
        if item_type == ITEM_STR:
            items = []
            for _ in range(count):
                (ln,) = struct.unpack_from("<I", payload, off)
                off += 4
                items.append(payload[off:off + ln].decode("utf-8"))
                off += ln
            sk._items = items
        else:
            dtype = "<f8" if item_type == ITEM_DOUBLE else "<q"
            arr = np.frombuffer(payload, dtype=dtype, offset=off, count=count)
            sk._items = arr.tolist()
        if len(sk._items) != min(sk.n, sk.k) and len(sk._items) != count:
            raise ValueError("corrupt reservoir state")
        return sk
