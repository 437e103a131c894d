"""Binary wire format shared by all sketch families.

The reference engine (maropu/datasketches-spark) serializes sketch state in
the Apache DataSketches cross-language wire format (e.g.
``quantileSketches.scala:66-79``: ``heapify(Memory.wrap(bytes))``).  This
engine defines its own compact, versioned format because the DataSketches
Python binding is not available in the target environment; states remain an
opaque ``BinaryType`` column exactly as in the reference
(``quantileSketches.scala:476``), and round-trip between accumulate /
combine / estimate.

Layout:  ``MAGIC(4) | family(u8) | version(u8) | payload``
"""

from __future__ import annotations

import struct

MAGIC = b"DSSS"
# v1: original layouts (HLL payload = lgk(u8) + 2^lgk dense registers).
# v2: HLL payload gained a mode byte after lgk for the sparse coupon
#     phase; every other family's payload is unchanged. Decoders accept
#     both versions; writers emit the current VERSION.
# v3: KLL/REQ payloads carry the EXACT stream min/max (two f64 after n) —
#     compaction drops extreme items, so retained extrema understate the
#     true range (r15 verdict: quantile(0) wrong in the estimation
#     regime). Apache DataSketches KLL/REQ/Doubles all serialize exact
#     min/max for the same reason. Other families' payloads unchanged.
VERSION = 3
_ACCEPTED_VERSIONS = frozenset({1, 2, 3})

FAMILY_KLL = 1
FAMILY_FREQ_STR = 2
FAMILY_FREQ_LONG = 3
FAMILY_THETA = 4
FAMILY_REQ = 5
FAMILY_MINHASH = 6
FAMILY_HLL = 7
FAMILY_RESERVOIR = 8
FAMILY_WRESERVOIR = 9
FAMILY_CPCUNION = 10
FAMILY_TUPLE = 11
FAMILY_BLOOM = 12

_HEADER = struct.Struct("<4sBB")


def pack(family: int, payload: bytes) -> bytes:
    return _HEADER.pack(MAGIC, family, VERSION) + payload


def unpack(data: bytes) -> tuple[int, bytes]:
    """Return (family, payload). Raises ValueError on corrupt input."""
    family, payload, _ = unpack_versioned(data)
    return family, payload


def unpack_versioned(data: bytes) -> tuple[int, bytes, int]:
    """Return (family, payload, version) for format-evolution decoders."""
    if data is None or len(data) < _HEADER.size:
        raise ValueError("sketch state too short")
    magic, family, version = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad sketch magic: {magic!r}")
    if version not in _ACCEPTED_VERSIONS:
        raise ValueError(f"unsupported sketch version: {version}")
    return family, data[_HEADER.size:], version


def family_of(data: bytes) -> int:
    return unpack(data)[0]
