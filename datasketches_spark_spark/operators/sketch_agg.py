"""Two-phase sketch aggregation — the engine's scale path.

The reference's ``TypedImperativeAggregate`` gets partial/final aggregation
from Spark's JVM planner for free (``quantileSketches.scala:234-273``:
partial sketches per executor, serialized at the shuffle boundary, merged in
the final stage). A plain ``GROUPED_AGG`` pandas UDF cannot do that — Spark
shuffles *raw rows* to the aggregating task. At 100 TB that difference is
the whole game: shuffling ~KB sketch states per (partition x group) instead
of the raw column.

This module reproduces the reference's physics explicitly:

  phase 1 (map-side)   ``mapInPandas``: stream each input partition once,
                        maintain one live sketch per group key, emit
                        ``(keys..., state: binary)`` — one row per group per
                        partition;
  phase 2 (reduce-side) ``groupBy(keys).agg(combine_udf)``: shuffle only the
                        small states and merge.

The output of ``sketch_accumulate`` is a re-aggregable summary table exactly
like the reference's accumulate results (``README.md:68-100``): filter it,
re-combine subsets, and ``*_estimate`` the merged states without rescanning
raw data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from .. import conf
from ..functions.udfs import combine_udf
from ..sketches import (
    ITEM_LONG,
    ITEM_STR,
    FreqItemsSketch,
    KllSketch,
    ThetaSketch,
)

_QUANTILE_DTYPES = {"KLL": np.float32, "REQ": np.float32, "MERGEABLE": np.float64}


# --------------------------------------------------------------------- families

def _quantile_family(impl: str | None, k: int | None):
    impl = (impl or conf.quantile_impl()).upper()
    k = k or conf.quantile_k(impl)
    dtype = _QUANTILE_DTYPES[impl]

    def make():
        return KllSketch(k=k, dtype=dtype)

    def update(sk, values: pd.Series):
        arr = pd.to_numeric(values, errors="coerce").dropna().to_numpy(np.float64)
        sk.update_batch(arr)

    return make, update


def _freq_family(item_type: str, max_map_size: int | None):
    m = max_map_size or conf.freq_max_map_size()

    def make():
        return FreqItemsSketch(max_map_size=m, item_type=item_type)

    def update(sk, values: pd.Series):
        v = values.dropna()
        if v.empty:
            return
        if item_type == ITEM_LONG:
            sk.update_batch(v.astype(np.int64).tolist())
        else:
            sk.update_batch(v.astype(str).tolist())

    return make, update


def _theta_family(k: int | None):
    k = k or conf.distinct_theta_k()

    def make():
        return ThetaSketch(k=k)

    def update(sk, values: pd.Series):
        v = values.dropna()
        if v.empty:
            return
        if pd.api.types.is_integer_dtype(v) or pd.api.types.is_float_dtype(v):
            sk.update_longs(v.astype(np.int64).to_numpy())
        else:
            sk.update_strings(v.astype(str).tolist())

    return make, update


def _family(name: str, **params):
    if name in ("quantile", "kll", "req", "mergeable"):
        impl = None if name == "quantile" else name.upper()
        return _quantile_family(params.get("impl", impl), params.get("k"))
    if name in ("freq", "freqitems"):
        return _freq_family(params.get("item_type", ITEM_STR),
                            params.get("max_map_size"))
    if name in ("theta", "cpc", "distinct"):
        return _theta_family(params.get("k"))
    raise ValueError(f"unknown sketch family {name!r}")


# --------------------------------------------------------------------- operator

def sketch_partial(df: DataFrame, keys: list[str], col: str,
                   family: str, state_col: str = "state",
                   **params) -> DataFrame:
    """Phase 1: partition-local sketching. One output row per (partition,
    group); no shuffle. Input is pruned to ``keys + [col]`` so the parquet
    scan reads only those columns."""
    make, update = _family(family, **params)
    src = df.select(*keys, col)
    fields = [src.schema[k] for k in keys]
    out_schema = StructType(fields + [StructField(state_col, BinaryType())])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if not keys:
                sk = sketches.get(())
                if sk is None:
                    sk = sketches[()] = make()
                update(sk, pdf[col])
                continue
            for kv, grp in pdf.groupby(keys, dropna=False, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                sk = sketches.get(kv)
                if sk is None:
                    sk = sketches[kv] = make()
                update(sk, grp[col])
        if sketches:
            rows = {k: [kv[i] for kv in sketches] for i, k in enumerate(keys)}
            rows[state_col] = [sk.serialize() for sk in sketches.values()]
            yield pd.DataFrame(rows)

    return src.mapInPandas(build, out_schema)


def sketch_merge(df: DataFrame, keys: list[str],
                 state_col: str = "state") -> DataFrame:
    """Phase 2: merge partial states per group (family-agnostic)."""
    merged = combine_udf()(F.col(state_col)).alias(state_col)
    if keys:
        return df.groupBy(*keys).agg(merged)
    return df.agg(merged)


def sketch_accumulate(df: DataFrame, keys: list[str], col: str,
                      family: str, state_col: str = "state",
                      **params) -> DataFrame:
    """Two-phase accumulate: ``(keys..., state)`` summary table.

    Equivalent result to ``groupBy(keys).agg(approx_*_accumulate(col))`` but
    with map-side combine: the shuffle carries sketch states, not raw rows.
    """
    return sketch_merge(sketch_partial(df, keys, col, family, state_col,
                                       **params), keys, state_col)
