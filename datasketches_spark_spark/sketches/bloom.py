"""Bloom filter — an approximate set-MEMBERSHIP sketch on the engine's
four-verb lifecycle (accumulate / combine / contains / estimate).

The capability gap this fills: every other distinct-value family in the
engine (Theta/KMV, HLL, CPC, tuple) answers "how many?"; none answers
"is THIS key one of them?".  Membership is the primitive a large-scale
incremental pipeline needs constantly — "was this document fingerprint
in any previous crawl snapshot?", "is this user in the contaminated-id
set?" — and at 100 TB the whole point is answering it WITHOUT shuffling
the historical corpus: a Bloom state over 100M keys at 1% FPP is
~120 MB, broadcastable, while the key set itself is not.

Guarantees (classic Bloom, Bloom 1970 CACM):

* **No false negatives** — a key that was accumulated ALWAYS tests
  positive, under any partitioning/merge order (the bit array is a
  union homomorphism: ``bloom(A ∪ B) == bloom(A) | bloom(B)``
  bit-for-bit, so map-side partials are exact).  This is what makes the
  prefilter-then-verify dedup pattern (``operators/dedup.py::
  bloom_prefilter_match``) EXACT end-to-end.
* False-positive probability ~ ``fill**h`` where ``fill`` is the set-bit
  fraction; sized at design time from ``(expected_items, fpp)`` via the
  standard ``m = -n·ln p / ln²2``, ``h = (m/n)·ln 2``.

Determinism: indices derive from the engine's shared MurmurHash3
(``theta.hash_series`` — the same 64-bit hash space every other family
samples) via Kirsch-Mitzenmacher double hashing, so states are
bit-identical across partitionings, sessions, and platforms.

NDV estimate from a filter (Swamidass & Baldi 2007):
``n ≈ -(m/h)·ln(1 - X/m)`` for ``X`` set bits — exact-ish at low fill,
and the surface ``approx_membership_estimate`` exposes.

No counterpart in the reference repo (its jar stops at quantiles / freq
/ distinct-count; Apache DataSketches ships a BloomFilter but the
reference never wraps it) — extension component, engine-private wire
(serde family 12).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .serde import FAMILY_BLOOM, pack, unpack

# Kirsch-Mitzenmacher second hash: an odd fixed-point multiplier mix of
# the base hash (golden-ratio constant) decorrelates h2 from h1 without
# a second hash pass over the data.
_H2_MULT = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Fixed-geometry Bloom filter over 64-bit key hashes.

    Geometry ``(m_bits, n_hashes)`` is part of the state identity: only
    filters with identical geometry merge (same rule as Apache
    DataSketches' BloomFilter, which additionally pins a seed).
    """

    __slots__ = ("m_bits", "n_hashes", "n_updates", "_words")

    def __init__(self, m_bits: int, n_hashes: int):
        if m_bits < 64:
            raise ValueError("m_bits must be >= 64")
        if not 1 <= n_hashes <= 64:
            raise ValueError("n_hashes must be in [1, 64]")
        self.m_bits = int(m_bits)
        self.n_hashes = int(n_hashes)
        self.n_updates = 0  # keys fed (with multiplicity) — diagnostics only
        self._words = np.zeros((self.m_bits + 63) // 64, dtype=np.uint64)

    # ------------------------------------------------------------- design

    @classmethod
    def design(cls, expected_items: int, fpp: float = 0.01
               ) -> "BloomFilter":
        """Size a filter for ``expected_items`` distinct keys at design
        false-positive probability ``fpp`` (standard optimal sizing)."""
        if expected_items < 1:
            raise ValueError("expected_items must be >= 1")
        if not 0.0 < fpp < 1.0:
            raise ValueError("fpp must be in (0, 1)")
        ln2 = math.log(2.0)
        m = max(64, int(math.ceil(-expected_items * math.log(fpp)
                                  / (ln2 * ln2))))
        h = max(1, min(64, round((m / expected_items) * ln2)))
        return cls(m_bits=m, n_hashes=h)

    # ------------------------------------------------------------- update

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(len(hashes), n_hashes) bit positions via double hashing."""
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = (h1 * _H2_MULT) | np.uint64(1)  # odd -> full-period stride
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(
            self.m_bits)

    def update_hashes(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self._words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n_updates += len(hashes)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: True where ALL h probe bits are set."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        bits = (self._words[pos >> np.uint64(6)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    # -------------------------------------------------------------- merge

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.n_hashes) != (other.m_bits, other.n_hashes):
            raise ValueError(
                "cannot merge Bloom filters of different geometry: "
                f"({self.m_bits},{self.n_hashes}) vs "
                f"({other.m_bits},{other.n_hashes})")
        out = BloomFilter(self.m_bits, self.n_hashes)
        np.bitwise_or(self._words, other._words, out=out._words)
        out.n_updates = self.n_updates + other.n_updates
        return out

    # ----------------------------------------------------------- estimate

    def bits_set(self) -> int:
        # popcount via uint8 view (numpy < 2 lacks a vectorized popcount
        # on uint64); one pass over m/8 bytes
        return int(np.unpackbits(self._words.view(np.uint8)).sum())

    def fill_fraction(self) -> float:
        return self.bits_set() / self.m_bits

    def current_fpp(self) -> float:
        """Probability a NEVER-inserted key tests positive, at the
        current fill."""
        return self.fill_fraction() ** self.n_hashes

    def estimate(self) -> int:
        """Distinct-key estimate from the fill (Swamidass & Baldi)."""
        x = self.bits_set()
        if x >= self.m_bits:  # saturated: estimate is unbounded
            return -1
        n = -(self.m_bits / self.n_hashes) * math.log1p(-x / self.m_bits)
        return int(round(n))

    # -------------------------------------------------------------- serde

    def serialize(self) -> bytes:
        head = struct.pack("<QBQ", self.m_bits, self.n_hashes,
                           self.n_updates)
        return pack(FAMILY_BLOOM, head + self._words.tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        family, payload = unpack(data)
        if family != FAMILY_BLOOM:
            raise ValueError(f"not a bloom state (family={family})")
        head = struct.Struct("<QBQ")
        if len(payload) < head.size:
            raise ValueError("corrupt bloom state")
        m_bits, n_hashes, n_updates = head.unpack_from(payload, 0)
        n_words = (m_bits + 63) // 64
        if len(payload) != head.size + n_words * 8:
            raise ValueError("corrupt bloom state (bad length)")
        sk = cls(m_bits=m_bits, n_hashes=n_hashes)
        sk.n_updates = n_updates
        sk._words = np.frombuffer(payload, np.uint64, n_words,
                                  head.size).copy()
        return sk
