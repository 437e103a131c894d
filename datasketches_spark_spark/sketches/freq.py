"""Frequent-items ("heavy hitters") sketch — Misra-Gries with merge support.

Re-implements the capability of the reference's frequent-items family
(``freqItemSketches.scala:37-99``: DataSketches ``ItemsSketch[String]`` /
``LongsSketch`` wrappers).  Semantics preserved:

* items with String or Long type (``freqItemSketches.scala:42-43``);
* result rows ``struct<item, estimated: long>`` sorted by estimate
  descending (``freqItemSketches.scala:75-79, :91-95``) — ties broken by
  item ascending here for determinism (the reference leaves tie order
  unspecified);
* NO_FALSE_POSITIVES: only items whose lower-bound count exceeds the
  sketch's maximum error are reported (``freqItemSketches.scala:76, :92``);
* EXACT when the column's distinct-count never exceeds ``max_map_size``
  (no purge ever happens) — the regime used by oracle-checked queries.

Merge rule follows Agarwal et al., "Mergeable Summaries" (PODS'12): sum
counters, then subtract the (cap+1)-th largest counter from all and drop
non-positive counters.
"""

from __future__ import annotations

import struct
from collections import Counter

from .serde import FAMILY_FREQ_LONG, FAMILY_FREQ_STR, pack, unpack

ITEM_STR = "str"
ITEM_LONG = "long"


class FreqItemsSketch:
    __slots__ = ("max_map_size", "item_type", "n", "_counts", "_errs", "_max_err")

    def __init__(self, max_map_size: int = 1024, item_type: str = ITEM_STR):
        if max_map_size <= 0 or (max_map_size & (max_map_size - 1)) != 0:
            raise ValueError("maxMapSize must be a positive power of 2")
        self.max_map_size = int(max_map_size)
        self.item_type = item_type
        self.n = 0
        self._counts: dict = {}   # item -> lower-bound count
        self._errs: dict = {}     # item -> overcount bound (estimate = count + err)
        self._max_err = 0         # global max subtracted offset

    # ------------------------------------------------------------------ update

    def update_batch(self, items) -> None:
        batch = Counter(items)
        if not batch:
            return
        self.n += sum(batch.values())
        counts, errs = self._counts, self._errs
        cap = self.max_map_size
        pending = {}
        for item, w in batch.items():
            if item in counts:
                counts[item] += w
            else:
                pending[item] = w
        if pending:
            free = cap - len(counts)
            if free >= len(pending):
                for item, w in pending.items():
                    counts[item] = w
                    errs[item] = self._max_err
            else:
                for item, w in pending.items():
                    counts[item] = w
                    errs[item] = self._max_err
                self._purge()

    def update(self, item, weight: int = 1) -> None:
        if weight < 0:
            raise ValueError("weight must be non-negative")
        if weight:
            self.update_batch({item: weight})

    # ------------------------------------------------------------------ merge

    def merge(self, other: "FreqItemsSketch") -> "FreqItemsSketch":
        if other.n == 0:
            return self
        if other.item_type != self.item_type:
            raise ValueError("cannot merge freq sketches of different item types")
        self.max_map_size = min(self.max_map_size, other.max_map_size)
        counts, errs = self._counts, self._errs
        other_counts = other._counts
        if other._max_err:
            # items present only in self could have been purged from other:
            # their estimate upper bound grows by other's max error (mirrors
            # the self._max_err added to other-only items below).
            for item in counts:
                if item not in other_counts:
                    errs[item] += other._max_err
        for item, c in other_counts.items():
            if item in counts:
                counts[item] += c
                errs[item] += other._errs[item]
            else:
                counts[item] = c
                errs[item] = other._errs[item] + self._max_err
        self._max_err += other._max_err
        self.n += other.n
        if len(counts) > self.max_map_size:
            self._purge()
        return self

    # ------------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return self._max_err == 0

    def estimate(self, item) -> int:
        if item not in self._counts:
            return 0
        return self._counts[item] + self._errs[item]

    def frequent_items(self) -> list[tuple[object, int]]:
        """(item, estimated) pairs, NO_FALSE_POSITIVES, estimate desc / item asc."""
        thr = self._max_err
        out = [
            (item, c + self._errs[item])
            for item, c in self._counts.items()
            if c > thr or thr == 0
        ]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        family = FAMILY_FREQ_STR if self.item_type == ITEM_STR else FAMILY_FREQ_LONG
        head = struct.pack("<IQQI", self.max_map_size, self.n, self._max_err,
                           len(self._counts))
        parts = [head]
        if self.item_type == ITEM_STR:
            for item, c in self._counts.items():
                b = item.encode("utf-8")
                parts.append(struct.pack("<IqQ", len(b), c, self._errs[item]))
                parts.append(b)
        else:
            for item, c in self._counts.items():
                parts.append(struct.pack("<qqQ", item, c, self._errs[item]))
        return pack(family, b"".join(parts))

    @classmethod
    def deserialize(cls, data: bytes) -> "FreqItemsSketch":
        family, payload = unpack(data)
        if family not in (FAMILY_FREQ_STR, FAMILY_FREQ_LONG):
            raise ValueError(f"not a freq-items state (family={family})")
        item_type = ITEM_STR if family == FAMILY_FREQ_STR else ITEM_LONG
        cap, n, max_err, size = struct.unpack_from("<IQQI", payload, 0)
        off = struct.calcsize("<IQQI")
        sk = cls(max_map_size=cap, item_type=item_type)
        sk.n = n
        sk._max_err = max_err
        for _ in range(size):
            if item_type == ITEM_STR:
                ln, c, e = struct.unpack_from("<IqQ", payload, off)
                off += struct.calcsize("<IqQ")
                item = payload[off:off + ln].decode("utf-8")
                off += ln
            else:
                item, c, e = struct.unpack_from("<qqQ", payload, off)
                off += struct.calcsize("<qqQ")
            sk._counts[item] = c
            sk._errs[item] = e
        return sk

    # ------------------------------------------------------------------ internals

    def _purge(self) -> None:
        counts = self._counts
        if len(counts) <= self.max_map_size:
            return
        vals = sorted(counts.values(), reverse=True)
        cutoff = vals[self.max_map_size]
        errs = self._errs
        for item in list(counts):
            c = counts[item] - cutoff
            if c > 0:
                counts[item] = c
                errs[item] += cutoff
            else:
                del counts[item]
                del errs[item]
        self._max_err += cutoff
