"""Tuple (per-key summary) sketch functions — the engine's fourth
aggregate family on the reference's four-verb lifecycle
(``README.md:63-64`` accumulate / combine / estimate model; no jar
counterpart — the reference stops at quantiles / freq / distinct-count).

A tuple state is a Theta-style KMV sample of the distinct-KEY space
(same hash dispatch as ``sketches/theta.py``) where every retained key
carries exact ``(row count, value sum)`` summaries. From one state a
pipeline reads: NDV, total rows, total value, AND estimates over
predicates on per-key aggregates ("distinct users with >= 20 events",
"value carried by repeat keys") — questions a Theta/HLL state cannot
answer without re-scanning raw data.

EXACT while observed NDV < k (``spark.sql.dataSketches.tuple.k``,
default 4096); KMV-class error (~1/sqrt(k-2)) at saturation
(estimation-mode coverage gated by ``accuracy_report.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import conf
from .udfs import (
    combine_udf,
    tuple_acc_udf,
    tuple_est_udf,
    tuple_segment_sum_udf,
    tuple_segment_udf,
)


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def approx_tuple_accumulate(key_col, value_col, k: int | None = None) -> Column:
    """Aggregate ``(key, value)`` rows into a serialized tuple state.
    Null-key rows are dropped; a null value counts its row with a 0.0
    contribution. For the two-phase map-side plan use
    ``operators.sketch_agg`` with family ``"tuple"``."""
    k = k or conf.tuple_k()
    return tuple_acc_udf(k)(_col(key_col), _col(value_col).cast("double"))


def approx_tuple_combine(col) -> Column:
    """Merge serialized tuple states (family-agnostic byte-sniff kernel,
    like every other ``*_combine``)."""
    return combine_udf()(_col(col))


def approx_tuple_estimate(col) -> Column:
    """Decode a tuple state: ``struct(ndv: long, rows: long,
    value_sum: double)`` — distinct keys, total rows, total value."""
    return tuple_est_udf()(_col(col))


def approx_tuple_segment_estimate(col, min_count: int = 1,
                                  min_sum: float | None = None) -> Column:
    """``struct(keys: long, value_sum: double)`` for the segment of keys
    whose per-key row count >= ``min_count`` (and, when ``min_sum`` is
    given, per-key value sum >= ``min_sum``) — the per-key-predicate
    estimator (exact while the state is exact; Horvitz-Thompson scaled
    at saturation)."""
    if min_sum is None:
        return tuple_segment_udf()(_col(col), F.lit(int(min_count)))
    return tuple_segment_sum_udf()(_col(col), F.lit(int(min_count)),
                                   F.lit(float(min_sum)))
