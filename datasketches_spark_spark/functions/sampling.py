"""Reservoir-sampling sketch functions — the accumulate/combine/estimate
lifecycle for uniform per-group samples (``sketches/reservoir.py``).

Mirrors the other families' verb surface (SURVEY.md §0); combine is the
shared family-agnostic kernel (``udfs.combine_udf``), so reservoir states
merge in the same SQL/DataFrame pipelines as every other sketch. For
whole-table sampling prefer ``operators.sampling`` (top-k physics, no
Python in the row path); this family is for PER-GROUP samples inside a
sketch summary table.
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import col as _to_col, pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
)

from ..sketches import (
    ITEM_DOUBLE,
    ITEM_LONG,
    ITEM_STR,
    ReservoirSketch,
    WeightedReservoirSketch,
    deserialize_any,
)

_SAMPLE_FAMILIES = (ReservoirSketch, WeightedReservoirSketch)

log = logging.getLogger(__name__)


def _col(c) -> Column:
    return _to_col(c) if isinstance(c, str) else c


def _item_type(item_type: str) -> str:
    if item_type in ("long", "int", ITEM_LONG):
        return ITEM_LONG
    if item_type in ("string", ITEM_STR):
        return ITEM_STR
    if item_type in ("double", "float", ITEM_DOUBLE):
        return ITEM_DOUBLE
    raise ValueError(f"unsupported sample item type {item_type!r}")


_RESULT_TYPES = {
    ITEM_DOUBLE: DoubleType(),
    ITEM_LONG: LongType(),
    ITEM_STR: StringType(),
}


def sample_acc_udf(k: int, item_type: str):
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        sk = ReservoirSketch(k=k, item_type=item_type)
        vals = v.dropna()
        if len(vals):
            if item_type == ITEM_STR:
                sk.update_batch(vals.astype(str).to_numpy(object))
            elif item_type == ITEM_LONG:
                sk.update_batch(pd.to_numeric(vals).astype("int64").to_numpy())
            else:
                sk.update_batch(pd.to_numeric(vals).astype("float64").to_numpy())
        return sk.serialize() if sk.n else None

    return acc


def sample_est_udf(item_type: str):
    rt = ArrayType(_RESULT_TYPES[item_type], containsNull=False)

    @pandas_udf(rt)
    def est(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, _SAMPLE_FAMILIES):
                    raise ValueError("not a reservoir sample state")
                # empty aggregation -> null (family contract; an n=0 state
                # can reach here via two-phase partials of an all-filtered
                # group, e.g. every weight zero)
                out.append(sk.items() if sk.n else None)
            except Exception as e:  # corrupt state -> null (family contract)
                log.warning("approx_sample_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return est


def sample_size_udf():
    @pandas_udf(LongType())
    def size(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, _SAMPLE_FAMILIES):
                    raise ValueError("not a reservoir sample state")
                out.append(int(sk.n) if sk.n else None)
            except Exception as e:
                log.warning("approx_sample_stream_size: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return size


def wsample_acc_udf(k: int, item_type: str):
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")

    @pandas_udf(BinaryType())
    def acc(v: pd.Series, w: pd.Series) -> bytes:
        sk = WeightedReservoirSketch(k=k, item_type=item_type)
        weights = pd.to_numeric(w, errors="coerce").astype("float64")
        mask = v.notna() & weights.notna()
        vals = v[mask]
        if len(vals):
            if item_type == ITEM_STR:
                items = vals.astype(str).to_numpy(object)
            elif item_type == ITEM_LONG:
                items = pd.to_numeric(vals).astype("int64").to_numpy()
            else:
                items = pd.to_numeric(vals).astype("float64").to_numpy()
            sk.update_batch(items, weights[mask].to_numpy())
        return sk.serialize() if sk.n else None

    return acc


# ------------------------------------------------------------------ public

def approx_sample_accumulate(col, k: int = 1024,
                             item_type: str = "double") -> Column:
    """Aggregate: column -> serialized reservoir state (k-sample)."""
    return sample_acc_udf(k, _item_type(item_type))(_col(col))


def approx_sample_weighted_accumulate(col, weight_col, k: int = 1024,
                                      item_type: str = "double") -> Column:
    """Aggregate: (value, weight) -> serialized A-ES weighted-reservoir
    state. Zero/negative/null weights are excluded; merge is the
    deterministic top-k over persisted keys."""
    return wsample_acc_udf(k, _item_type(item_type))(_col(col),
                                                     _col(weight_col))


def approx_sample_combine(col) -> Column:
    """Aggregate: merge reservoir states (family-agnostic kernel; the
    merged reservoir is exactly uniform over the concatenated stream)."""
    from .udfs import combine_udf
    return combine_udf()(_col(col))


def approx_sample_estimate(col, item_type: str = "double") -> Column:
    """Scalar: state -> the retained sample as a SORTED array (complete
    multiset while the stream stayed within k)."""
    return sample_est_udf(_item_type(item_type))(_col(col))


def approx_sample_stream_size(col) -> Column:
    """Scalar: state -> total items the reservoir has seen (n, not |sample|)."""
    return sample_size_udf()(_col(col))
