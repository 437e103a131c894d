"""MurmurHash3 x64 128 with seed — the key hash of every Apache
DataSketches family (seed 9001 by default).

Public algorithm (Austin Appleby, public domain; the DataSketches
variant adds the seed and fixes the lane order). Needed so the engine
can build coupon-compatible CPC states from raw values: a CPC sketch
accumulated HERE must union correctly with one accumulated by
datasketches-java over overlapping data, which requires bit-identical
hashes. Validated against ``org.apache.datasketches.hash.MurmurHash3``
on Spark's driver classpath in ``tests/test_compat_cpc.py``.

Two paths: a vectorized numpy kernel for int64 columns (8-byte keys,
block-free — the distinct-count hot path), and a scalar bytes path for
strings/UTF-8.
"""

from __future__ import annotations

import numpy as np

DEFAULT_SEED = 9001

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def hash128(data: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128 of ``data`` -> (h1, h2) as unsigned 64-bit."""
    length = len(data)
    h1 = h2 = seed & _M
    nblocks = length // 16
    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off:off + 8], "little")
        k2 = int.from_bytes(data[off + 8:off + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = data[nblocks * 16:]
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k2 = int.from_bytes(tail[8:16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        if len(tail) > 8:
            k2 = (k2 * _C2) & _M
            k2 = _rotl(k2, 33)
            k2 = (k2 * _C1) & _M
            h2 ^= k2
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def hash128_longs(values: np.ndarray,
                  seed: int = DEFAULT_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3 x64 128 of int64 keys (each hashed as its
    8-byte little-endian representation, exactly what
    ``CpcSketch.update(long)`` does). Returns (h1, h2) uint64 arrays."""
    with np.errstate(over="ignore"):
        c1 = np.uint64(_C1)
        c2 = np.uint64(_C2)
        k1 = np.asarray(values).astype(np.int64).view(np.uint64).copy()
        h1 = np.full(k1.shape, seed, np.uint64)
        h2 = h1.copy()
        # 8-byte key: no 16-byte blocks, single-lane tail
        k1 *= c1
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 *= c2
        h1 ^= k1
        eight = np.uint64(8)
        h1 ^= eight
        h2 ^= eight
        h1 += h2
        h2 += h1
        for h in (h1, h2):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        h1 += h2
        h2 += h1
    return h1, h2
