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

Determinism AND decorrelation: the uniform reservoir's draws come from a
per-instance rng seeded from the first items it sees (content-derived),
and the weighted family derives its A-ES priority keys from a 64-bit mix
of (item bits, stream position) with no rng at all. Both reproduce the
same sample run-to-run for a fixed input split (same contract as KLL's
compaction coin flips, ``kll.py:64-66``) — but, unlike a CONSTANT seed,
sketches built on different partitions draw differently. A constant seed
makes every partition's sketch accept the same stream positions, which
clusters the merged sample (a distributed-sampling bias the accuracy
report's chi-square uniformity experiment now guards).
"""

from __future__ import annotations

import struct

import numpy as np

from .freq import ITEM_LONG, ITEM_STR
from .serde import FAMILY_RESERVOIR, FAMILY_WRESERVOIR, pack, unpack

ITEM_DOUBLE = "double"

_ITEM_CODES = {ITEM_DOUBLE: 0, ITEM_LONG: 1, ITEM_STR: 2}
_CODE_ITEMS = {v: k for k, v in _ITEM_CODES.items()}

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a bijective 64-bit mix (public constant
    set, Steele et al. 'Fast Splittable PRNGs')."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _item_bits(arr: np.ndarray, item_type: str) -> np.ndarray:
    """Stable 64-bit value bits per item (never Python's salted hash())."""
    if item_type == ITEM_DOUBLE:
        return np.asarray(arr, dtype=np.float64).view(np.uint64)
    if item_type == ITEM_LONG:
        return np.asarray(arr, dtype=np.int64).view(np.uint64)
    import hashlib
    return np.array([int.from_bytes(
        hashlib.blake2b(str(s).encode("utf-8"), digest_size=8).digest(),
        "little") for s in arr], dtype=np.uint64)


def _priority_uniforms(bits: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """u in (0, 1) per (item, stream-position) pair: mix(item_bits xor
    mix(position)). Mixing the item VALUE in is what decorrelates sketches
    built on different partitions — a shared-seed RNG gives every
    partition the same draw sequence, so the same batch positions win in
    every partition and the merged sample clusters (caught by the
    accuracy report's chi-square uniformity check). Mixing the POSITION
    in keeps duplicate values at different stream positions independent,
    preserving occurrence sampling."""
    u = (_mix64(bits ^ _mix64(positions.astype(np.uint64))) >> np.uint64(11)
         ).astype(np.float64) * (2.0 ** -53)
    u[u == 0.0] = np.nextafter(0.0, 1.0)  # log(0) guard
    return u


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
        self._rng = None  # seeded lazily from content: _ensure_rng

    def _ensure_rng(self, material=None) -> np.random.Generator:
        """Deterministic CONTENT-DERIVED seeding. A constant seed would
        give every partition's sketch the same draw sequence, so the same
        stream positions would be accepted in every partition and the
        merged sample would cluster (the bias the accuracy report's
        uniformity check guards). Seeding from the first items keeps
        run-to-run determinism for a fixed input split while decorrelating
        sketches that hold different data."""
        if self._rng is None:
            entropy = 0xD5C0FFEE
            if material is not None:
                arr = np.asarray(material, dtype=object)[:16]
                if arr.size:
                    bits = _item_bits(arr, self.item_type)
                    entropy = int(_mix64(bits ^ _GOLDEN).sum(
                        dtype=np.uint64))
            self._rng = np.random.default_rng((entropy, 0xD5C0FFEE))
        return self._rng

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
            rng = self._ensure_rng(arr)
            # stream position (1-based) of each remaining item
            pos = np.arange(rest.size, dtype=np.float64) + (self.n + fill + 1)
            accept = rng.random(rest.size) < (self.k / pos)
            hits = rest[accept]
            slots = rng.integers(0, self.k, size=hits.size)
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
        # merge draws come from a rng seeded on BOTH sides' retained
        # items, so different groups' merge trees draw independently
        self._ensure_rng(np.asarray(self._items + other._items,
                                    dtype=object))
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
        idx = self._ensure_rng(np.asarray(items, dtype=object)).choice(
            len(items), size=size, replace=False)
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


class WeightedReservoirSketch:
    """Weight-proportional k-sample without replacement (VarOpt-class
    semantics via Efraimidis-Spirakis A-ES priority keys).

    Each positive-weight item gets a key ``log(u)/w`` once, at update
    time; the sketch retains the k LARGEST keys. ``u`` is derived from a
    64-bit mix of the item's value bits and its stream position
    (:func:`_priority_uniforms`) rather than a per-instance RNG: a
    shared-seed RNG repeats the same draw sequence in every partition's
    sketch, which correlates the per-partition winners and makes the
    MERGED sample cluster (a real bias, caught by the accuracy report's
    chi-square uniformity check; Cohen & Kaplan's bottom-k/priority
    sampling is the standard hash-derived construction). Because the keys
    are part of the serialized state, merging is a deterministic top-k
    over the union — order- and tree-shape-independent with NO randomness
    at merge, a strict monoid (stronger than the uniform reservoir, whose
    merge must re-randomize). Zero/negative/NaN weights are excluded
    (they can never be drawn). EXACT regime: n <= k retains every
    positive-weight item.
    """

    FAMILY = FAMILY_WRESERVOIR

    __slots__ = ("k", "item_type", "n", "total_weight",
                 "_keys", "_items")

    def __init__(self, k: int = 1024, item_type: str = ITEM_DOUBLE):
        if k <= 0:
            raise ValueError(f"reservoir k must be positive, got {k}")
        if item_type not in _ITEM_CODES:
            raise ValueError(f"unsupported item type {item_type!r}")
        self.k = int(k)
        self.item_type = item_type
        self.n = 0                      # positive-weight items seen
        self.total_weight = 0.0
        self._keys = np.empty(0, dtype=np.float64)
        self._items: list = []

    # ------------------------------------------------------------------ update

    def update_batch(self, items, weights) -> None:
        arr = np.asarray(items, dtype=object)
        w = np.asarray(weights, dtype=np.float64)
        if arr.size != w.size:
            raise ValueError("items and weights must align")
        ok = np.isfinite(w) & (w > 0)
        arr, w = arr[ok], w[ok]
        if arr.size == 0:
            return
        positions = np.arange(arr.size, dtype=np.uint64) + np.uint64(self.n)
        u = _priority_uniforms(_item_bits(arr, self.item_type), positions)
        keys = np.log(u) / w                  # in (-inf, 0); larger wins
        self._insert(keys, arr.tolist())
        self.n += int(arr.size)
        self.total_weight += float(w.sum())

    def update(self, item, weight: float) -> None:
        self.update_batch([item], [weight])

    def _insert(self, keys: np.ndarray, items: list) -> None:
        all_keys = np.concatenate([self._keys, keys])
        all_items = self._items + items
        if all_keys.size > self.k:
            top = np.argpartition(all_keys, all_keys.size - self.k)[-self.k:]
            all_keys = all_keys[top]
            all_items = [all_items[i] for i in top.tolist()]
        self._keys = all_keys
        self._items = all_items

    # ------------------------------------------------------------------ merge

    def merge(self, other: "WeightedReservoirSketch") -> "WeightedReservoirSketch":
        if other.n == 0:
            return self
        if other.FAMILY != self.FAMILY:
            raise ValueError("cannot merge weighted reservoir with another family")
        if other.item_type != self.item_type:
            raise ValueError("cannot merge reservoirs of different item types")
        self.k = min(self.k, other.k)
        self._insert(other._keys, list(other._items))
        if self._keys.size > self.k:  # k may have shrunk below both sizes
            self._insert(np.empty(0), [])
        self.n += other.n
        self.total_weight += other.total_weight
        return self

    # ------------------------------------------------------------------ query

    def is_exact(self) -> bool:
        return self.n <= self.k

    def items(self) -> list:
        if self.item_type == ITEM_STR:
            return sorted(str(x) for x in self._items)
        if self.item_type == ITEM_LONG:
            return sorted(int(x) for x in self._items)
        return sorted(float(x) for x in self._items)

    # ------------------------------------------------------------------ serde

    def serialize(self) -> bytes:
        order = np.argsort(self._keys)
        keys = self._keys[order]
        items = [self._items[i] for i in order.tolist()]
        head = struct.pack("<IBQdI", self.k, _ITEM_CODES[self.item_type],
                           self.n, self.total_weight, len(items))
        parts = [head, keys.astype("<f8").tobytes()]
        if self.item_type == ITEM_STR:
            for s in items:
                b = str(s).encode("utf-8")
                parts.append(struct.pack("<I", len(b)) + b)
        else:
            dtype = "<f8" if self.item_type == ITEM_DOUBLE else "<q"
            parts.append(np.asarray(items, dtype=dtype).tobytes())
        return pack(self.FAMILY, b"".join(parts))

    @classmethod
    def deserialize(cls, data: bytes) -> "WeightedReservoirSketch":
        family, payload = unpack(data)
        if family != cls.FAMILY:
            raise ValueError(
                f"not a WeightedReservoirSketch state (family={family})")
        k, code, n, tw, count = struct.unpack_from("<IBQdI", payload, 0)
        off = struct.calcsize("<IBQdI")
        sk = cls(k=k, item_type=_CODE_ITEMS[code])
        sk.n = int(n)
        sk.total_weight = float(tw)
        sk._keys = np.frombuffer(payload, dtype="<f8", offset=off,
                                 count=count).copy()
        off += 8 * count
        if sk.item_type == ITEM_STR:
            items = []
            for _ in range(count):
                (ln,) = struct.unpack_from("<I", payload, off)
                off += 4
                items.append(payload[off:off + ln].decode("utf-8"))
                off += ln
            sk._items = items
        else:
            dtype = "<f8" if sk.item_type == ITEM_DOUBLE else "<q"
            sk._items = np.frombuffer(payload, dtype=dtype, offset=off,
                                      count=count).tolist()
        if len(sk._items) != count or count > sk.k:
            raise ValueError("corrupt weighted reservoir state")
        return sk
