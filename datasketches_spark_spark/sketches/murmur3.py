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


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 *= np.uint64(_C1)
    k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
    k1 *= np.uint64(_C2)
    return k1


def _mix_k2(k2: np.ndarray) -> np.ndarray:
    k2 *= np.uint64(_C2)
    k2 = (k2 << np.uint64(33)) | (k2 >> np.uint64(31))
    k2 *= np.uint64(_C1)
    return k2


def _finalize(h1: np.ndarray, h2: np.ndarray, length: int):
    le = np.uint64(length)
    h1 ^= le
    h2 ^= le
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


def _hash128_fixed_len(mat: np.ndarray, length: int, seed: int):
    """Vectorized hash of n same-length keys given as an (n, padded)
    uint8 matrix whose first ``length`` columns are the key bytes and the
    rest are zero (zero-padding is exactly how the scalar tail assembles
    its partial lanes)."""
    n = mat.shape[0]
    lanes = mat.view(np.uint64).reshape(n, -1)  # little-endian 8-byte lanes
    h1 = np.full(n, seed, np.uint64)
    h2 = h1.copy()
    nblocks = length // 16
    with np.errstate(over="ignore"):
        for b in range(nblocks):
            h1 ^= _mix_k1(lanes[:, 2 * b].copy())
            h1 = (h1 << np.uint64(27)) | (h1 >> np.uint64(37))
            h1 += h2
            h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
            h2 ^= _mix_k2(lanes[:, 2 * b + 1].copy())
            h2 = (h2 << np.uint64(31)) | (h2 >> np.uint64(33))
            h2 += h1
            h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)
        tail = length - nblocks * 16
        if tail:
            h1 ^= _mix_k1(lanes[:, 2 * nblocks].copy())
            if tail > 8:
                h2 ^= _mix_k2(lanes[:, 2 * nblocks + 1].copy())
        return _finalize(h1, h2, length)


def hash128_bytes(items: list, seed: int = DEFAULT_SEED):
    """Vectorized MurmurHash3 x64 128 over a batch of byte strings.

    Groups keys by length and runs the block/tail math on uint64
    matrices — same results as ``hash128`` item-by-item (property-tested
    against it), ~3-4x faster on realistic string columns (the residual
    cost is the one packing copy per group). Returns (h1, h2) uint64
    arrays aligned with ``items``.
    """
    n = len(items)
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    lens = np.fromiter((len(b) for b in items), np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    i = 0
    while i < n:
        j = i
        length = int(lens[order[i]])
        while j < n and lens[order[j]] == length:
            j += 1
        idx = order[i:j]
        i = j
        if length == 0:
            continue  # callers skip empties; zero-length hash unused
        padded = ((length + 15) // 16) * 16
        buf = np.zeros((len(idx), padded), np.uint8)
        buf[:, :length] = np.frombuffer(
            b"".join(items[ix] for ix in idx), np.uint8).reshape(-1, length)
        g1, g2 = _hash128_fixed_len(buf, length, seed)
        h1[idx] = g1
        h2[idx] = g2
    return h1, h2
