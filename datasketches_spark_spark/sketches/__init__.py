"""Pure-Python mergeable sketch implementations.

One class per family, all exposing the reference's four-verb lifecycle
(accumulate / combine / estimate + direct aggregate; see SURVEY.md §0):
``update* -> serialize -> deserialize -> merge -> estimate/quantile/...``.
"""

from .bloom import BloomFilter
from .cpc_state import CpcAccumulator, CpcUnionSketch
from .freq import ITEM_LONG, ITEM_STR, FreqItemsSketch
from .hll import HllSketch
from .kll import KllSketch
from .req import ReqSketch
from .reservoir import ITEM_DOUBLE, ReservoirSketch, WeightedReservoirSketch
from .serde import (
    FAMILY_BLOOM,
    FAMILY_CPCUNION,
    FAMILY_TUPLE,
    FAMILY_FREQ_LONG,
    FAMILY_FREQ_STR,
    FAMILY_HLL,
    FAMILY_KLL,
    FAMILY_REQ,
    FAMILY_RESERVOIR,
    FAMILY_THETA,
    FAMILY_WRESERVOIR,
    MAGIC,
    family_of,
)
from .tuple import TupleSketch
from .theta import (
    ThetaSketch,
    hash_doubles,
    hash_longs,
    hash_series,
    hash_strings,
)


def _foreign_sketch(data: bytes):
    """Fallback for bytes without the engine magic: try the Apache
    DataSketches wire format (reference-persisted states; compat module).
    Returns an engine sketch object, or None if the bytes are not a
    recognizable DataSketches state."""
    from ..compat.datasketches import is_datasketches, to_engine_sketch
    if not is_datasketches(data):
        return None
    return to_engine_sketch(data)


def deserialize_any(data: bytes):
    """Decode a state produced by any family's accumulate/combine, or an
    imported Apache DataSketches state (compat fallback)."""
    if len(data or b"") >= 4 and bytes(data[:4]) != MAGIC:
        sk = _foreign_sketch(data)
        if sk is not None:
            return sk
    fam = family_of(data)
    if fam == FAMILY_KLL:
        return KllSketch.deserialize(data)
    if fam == FAMILY_REQ:
        return ReqSketch.deserialize(data)
    if fam in (FAMILY_FREQ_STR, FAMILY_FREQ_LONG):
        return FreqItemsSketch.deserialize(data)
    if fam == FAMILY_THETA:
        return ThetaSketch.deserialize(data)
    if fam == FAMILY_HLL:
        return HllSketch.deserialize(data)
    if fam == FAMILY_RESERVOIR:
        return ReservoirSketch.deserialize(data)
    if fam == FAMILY_WRESERVOIR:
        return WeightedReservoirSketch.deserialize(data)
    if fam == FAMILY_CPCUNION:
        return CpcUnionSketch.deserialize(data)
    if fam == FAMILY_TUPLE:
        return TupleSketch.deserialize(data)
    if fam == FAMILY_BLOOM:
        return BloomFilter.deserialize(data)
    raise ValueError(f"unknown sketch family {fam}")


def make_quantile_sketch(impl: str, k: int, dtype):
    """Factory for the three quantile impls (KLL / REQ / MERGEABLE)."""
    if impl == "REQ":
        return ReqSketch(k=k, dtype=dtype)
    return KllSketch(k=k, dtype=dtype)


def deserialize_quantile(data: bytes):
    """Decode a quantile-family state (KLL or REQ), or an imported
    DataSketches quantile state (KLL/REQ/classic doubles; compat
    fallback); raises on other families so estimate UDFs keep the
    corrupt-state->null contract."""
    if len(data or b"") >= 4 and bytes(data[:4]) != MAGIC:
        sk = _foreign_sketch(data)
        if isinstance(sk, KllSketch):  # ReqSketch subclasses KllSketch
            return sk
        if sk is not None:
            raise ValueError("not a quantile sketch state (imported "
                             "DataSketches state of another family)")
    fam = family_of(data)
    if fam == FAMILY_KLL:
        return KllSketch.deserialize(data)
    if fam == FAMILY_REQ:
        return ReqSketch.deserialize(data)
    raise ValueError(f"not a quantile sketch state (family={fam})")


__all__ = [
    "HllSketch",
    "KllSketch",
    "ReqSketch",
    "FreqItemsSketch",
    "ReservoirSketch",
    "WeightedReservoirSketch",
    "ThetaSketch",
    "CpcAccumulator",
    "CpcUnionSketch",
    "ITEM_DOUBLE",
    "make_quantile_sketch",
    "deserialize_quantile",
    "ITEM_STR",
    "ITEM_LONG",
    "hash_longs",
    "hash_strings",
    "hash_doubles",
    "hash_series",
    "deserialize_any",
    "family_of",
]
