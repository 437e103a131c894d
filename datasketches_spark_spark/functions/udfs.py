"""Pandas-UDF builders backing every sketch function.

Execution pattern (SURVEY.md §4): the reference's ``TypedImperativeAggregate``
update/merge/serialize contract (``quantileSketches.scala:234-273``) maps to

* *accumulate / direct agg*  -> ``GROUPED_AGG`` pandas UDF (Arrow-batched),
* *combine*                  -> ``GROUPED_AGG`` pandas UDF over binary states,
* *estimate / pmf*           -> scalar pandas UDF over binary states.

For true map-side combine at scale, see
``datasketches_spark_spark.operators.sketch_agg`` which pre-sketches per
partition with ``mapInPandas`` before the merge UDAF — the two-phase physics
of the reference's partial/final aggregation.

Error semantics preserved from the reference:

* input nulls skipped (``quantileSketches.scala:248-249``);
* empty aggregation -> null (``quantileSketches.scala:286-287``);
* ``*_estimate`` swallows corrupt state bytes -> null with a warning
  (``quantileSketches.scala:614-624``);
* ``*_combine`` raises on corrupt state bytes (``quantileSketches.scala:542-551``).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sketches import (
    ITEM_LONG,
    ITEM_STR,
    CpcUnionSketch,
    FreqItemsSketch,
    HllSketch,
    ThetaSketch,
    deserialize_any,
    deserialize_quantile,
    hash_series,
    make_quantile_sketch,
)

log = logging.getLogger(__name__)


# --------------------------------------------------------------------- utils

def validate_percentage(percentage):
    """Analysis-time validation, matching the reference's AnalysisException
    rules (``quantileSketches.scala:176-194``). Returns (list[float], is_multi).
    """
    if isinstance(percentage, (list, tuple, np.ndarray)):
        if any(p is None for p in percentage):
            # reference: "Percentage value must not be null"
            # (quantileSketches.scala:176-184)
            raise ValueError("percentage value must not be null")
        ps = [float(p) for p in percentage]
        multi = True
    elif isinstance(percentage, (int, float)) and not isinstance(percentage, bool):
        ps = [float(percentage)]
        multi = False
    else:
        raise ValueError(
            f"percentage must be a numeric literal or a list of numeric "
            f"literals, but got {percentage!r}")
    for p in ps:
        if not (0.0 <= p <= 1.0):
            raise ValueError(
                f"percentage(s) must be between 0.0 and 1.0, but got {p}")
    return ps, multi


def validate_num_splits(num_splits):
    if not isinstance(num_splits, int) or isinstance(num_splits, bool) or num_splits <= 1:
        raise ValueError(
            f"the number of splits must be greater than 1, but got {num_splits}")
    return num_splits


def _clean_numeric(v: pd.Series) -> np.ndarray:
    arr = pd.to_numeric(v, errors="coerce").dropna().to_numpy(dtype=np.float64)
    return arr


def _clean_items(v: pd.Series, item_type: str):
    """Null-free item list for the freq family. String mode renders
    integral float batches as ints (``_wire_strings``) so a nullable
    bigint column — float64 through Arrow when a batch holds a null —
    yields the same items batch-independently ('17', never '17.0')."""
    v = v.dropna()
    if item_type == ITEM_LONG:
        return _wire_longs(v).tolist()
    return _wire_strings(v)


# --------------------------------------------------------------------- quantile

def quantile_acc_udf(impl: str, k: int, dtype):
    """GROUPED_AGG: numeric values -> serialized KLL/REQ state (or null)."""

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        arr = _clean_numeric(v)
        if arr.size == 0:
            return None
        sk = make_quantile_sketch(impl, k, dtype)
        sk.update_batch(arr)
        return sk.serialize()

    return acc


def quantile_acc_weighted_udf(impl: str, k: int, dtype):
    """GROUPED_AGG: (value, count) pairs -> serialized quantile state.

    The weight-expanded twin of :func:`quantile_acc_udf`: feeding a
    map-side-combined (value, count) table yields the same
    rank/cdf/quantile surfaces as accumulating the raw rows (sketch
    updates are update-order-independent in what the engine surfaces,
    and ``KllSketch.update_weighted`` places each value at its count's
    set-bit levels so nothing is materialized). This lets an
    exact-regime accumulate shuffle ~distinct-value rows instead of
    every raw row (guide §2.3 "aggregate before you shuffle")."""

    @pandas_udf(BinaryType())
    def acc(v: pd.Series, w: pd.Series) -> bytes:
        vals = pd.to_numeric(v, errors="coerce").to_numpy(np.float64)
        wts = pd.to_numeric(w, errors="coerce").fillna(0).to_numpy(np.int64)
        sk = make_quantile_sketch(impl, k, dtype)
        sk.update_weighted(vals, wts)
        if sk.n == 0:
            return None
        return sk.serialize()

    return acc


def quantile_direct_udf(impl: str, k: int, dtype, percentages: list[float],
                        multi: bool, rule: str = "disc"):
    """GROUPED_AGG: numeric values -> quantile estimate(s) directly."""
    rt = ArrayType(DoubleType(), containsNull=False) if multi else DoubleType()

    if multi:
        @pandas_udf(rt)
        def direct(v: pd.Series) -> list:
            arr = _clean_numeric(v)
            if arr.size == 0:
                return None
            sk = make_quantile_sketch(impl, k, dtype)
            sk.update_batch(arr)
            return sk.quantiles(percentages, rule=rule)
    else:
        @pandas_udf(rt)
        def direct(v: pd.Series) -> float:
            arr = _clean_numeric(v)
            if arr.size == 0:
                return None
            sk = make_quantile_sketch(impl, k, dtype)
            sk.update_batch(arr)
            return sk.quantile(percentages[0], rule=rule)

    return direct


def quantile_est_udf(percentages: list[float], multi: bool,
                     rule: str = "disc"):
    """Scalar: binary state -> double (or array<double>). Always double-typed,
    matching the reference (``quantileSketches.scala:601-605``)."""
    rt = ArrayType(DoubleType(), containsNull=False) if multi else DoubleType()

    @pandas_udf(rt)
    def est(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_quantile(bytes(blob))
                qs = sk.quantiles(percentages, rule=rule)
                out.append(None if qs is None else (qs if multi else qs[0]))
            except Exception as e:  # corrupt state -> null (reference parity)
                log.warning("approx_percentile_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return est


def rank_est_udf(value: float):
    """Scalar: binary quantile state -> rank of `value` in [0,1] (the
    inverse of quantile(); extension beyond the reference surface)."""
    @pandas_udf(DoubleType())
    def rank(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                out.append(deserialize_quantile(bytes(blob)).rank(value))
            except Exception as e:
                log.warning("approx_rank_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return rank


def cdf_est_udf(split_points: list[float]):
    """Scalar: binary quantile state -> cumulative mass at each split point
    (+ trailing 1.0), complementing approx_pmf_estimate."""
    @pandas_udf(ArrayType(DoubleType(), containsNull=False))
    def cdf(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                out.append(deserialize_quantile(bytes(blob)).cdf(split_points))
            except Exception as e:
                log.warning("approx_cdf_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return cdf


def pmf_est_udf(num_splits: int):
    @pandas_udf(ArrayType(DoubleType(), containsNull=False))
    def pmf(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_quantile(bytes(blob))
                out.append(sk.pmf(num_splits))
            except Exception as e:
                log.warning("approx_pmf_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return pmf


# --------------------------------------------------------------------- combine

def combine_udf():
    """GROUPED_AGG: binary states (any family) -> merged binary state.

    Family-agnostic: dispatches on the state header, so one combine kernel
    serves quantiles, freq-items and theta (the reference has one class per
    family; semantics identical). Raises on corrupt input like the
    reference's combine (``quantileSketches.scala:542-551``).
    """

    @pandas_udf(BinaryType())
    def combine(states: pd.Series) -> bytes:
        merged = None
        for blob in states:
            if blob is None:
                continue
            sk = deserialize_any(bytes(blob))  # raises on corrupt input
            merged = sk if merged is None else merged.merge(sk)
        return None if merged is None else merged.serialize()

    return combine


# --------------------------------------------------------------------- freq items

def freq_result_type(item_type: str) -> ArrayType:
    item_dt = StringType() if item_type == ITEM_STR else LongType()
    return ArrayType(StructType([
        StructField("item", item_dt),
        StructField("estimated", LongType()),
    ]))


def freq_acc_udf(max_map_size: int, item_type: str):
    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        items = _clean_items(v, item_type)
        if not items:
            return None
        sk = FreqItemsSketch(max_map_size=max_map_size, item_type=item_type)
        sk.update_batch(items)
        return sk.serialize()

    return acc


def freq_direct_udf(max_map_size: int, item_type: str):
    @pandas_udf(freq_result_type(item_type))
    def direct(v: pd.Series) -> list:
        items = _clean_items(v, item_type)
        if not items:
            return None
        sk = FreqItemsSketch(max_map_size=max_map_size, item_type=item_type)
        sk.update_batch(items)
        return [{"item": i, "estimated": int(c)} for i, c in sk.frequent_items()]

    return direct


def freq_est_udf(item_type: str):
    @pandas_udf(freq_result_type(item_type))
    def est(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_any(bytes(blob))  # engine or imported state
                if not isinstance(sk, FreqItemsSketch):
                    raise ValueError("not a frequent-items state")
                out.append([{"item": i, "estimated": int(c)}
                            for i, c in sk.frequent_items()])
            except Exception as e:
                log.warning("approx_freqitems_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return est


def quantile_bounds_udf(rule: str):
    """Scalar: (state, p, eps) -> [lower, upper] quantile confidence
    bounds — the values at ranks ``p - eps`` and ``p + eps`` (clamped to
    [0, 1]). With ``eps`` NULL, the sketch's normalized rank-error bound
    is used: 0 in the exact regime (bounds collapse to the point
    estimate), else the published KLL envelope ``2.296 / k^0.9``
    (Apache DataSketches' KLL getNormalizedRankError constant; the
    DataSketches quantile API exposes the same capability as
    getQuantileLowerBound/getQuantileUpperBound). The true quantile lies
    inside the interval with ~99% probability per the KLL PAC bound."""
    from ..sketches.kll import KllSketch

    @pandas_udf(ArrayType(DoubleType(), containsNull=False))
    def bounds(states: pd.Series, p: pd.Series, eps: pd.Series) -> pd.Series:
        out = []
        for blob, pct, e in zip(states, p, eps):
            if blob is None or _is_nullish(pct):
                out.append(None)
                continue
            # argument validation raises (reference AnalysisException
            # semantics); state decode problems degrade to NULL below
            ps, _ = validate_percentage(float(pct))
            pct = ps[0]
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, KllSketch):
                    raise TypeError("not a quantile (KLL-family) state")
                if _is_nullish(e):
                    e = 0.0 if sk.is_exact() else 2.296 / (sk.k ** 0.9)
                lo = sk.quantile(max(0.0, pct - float(e)), rule=rule)
                hi = sk.quantile(min(1.0, pct + float(e)), rule=rule)
                out.append(None if lo is None else [lo, hi])
            except Exception as ex:
                log.warning("approx_percentile_bounds: corrupt state: %s", ex)
                out.append(None)
        return pd.Series(out, dtype="object")

    return bounds


def _is_nullish(v) -> bool:
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def distinct_bounds_udf():
    """Scalar: (theta state, num_std) -> [lower, upper] NDV bounds.

    Exact-regime sketches (Theta with all hashes retained; HLL still in
    its sparse coupon phase) return the exact count for both ends. In
    estimation mode the relative standard error is ``1/sqrt(k-2)`` for
    Theta/KMV (Beyer et al., SIGMOD'07; the constant the DataSketches
    Theta getLowerBound/getUpperBound envelope is built on) and
    ``1.04/sqrt(2^lgk)`` for dense HLL (Flajolet et al., 2007), so
    bounds are ``est / (1 +/- num_std * rse)``. Empirical coverage at
    num_std=2 measured ~98% over 60 trials per family
    (`tests/test_accuracy_bounds.py`)."""
    from ..sketches import HllSketch as _Hll
    from ..sketches import ThetaSketch as _Theta
    from ..sketches import TupleSketch as _Tuple

    @pandas_udf(ArrayType(LongType(), containsNull=False))
    def bounds(states: pd.Series, num_std: pd.Series) -> pd.Series:
        out = []
        for blob, ns in zip(states, num_std):
            if blob is None:
                out.append(None)
                continue
            ns = 2.0 if _is_nullish(ns) else float(ns)
            if ns <= 0:
                raise ValueError(
                    "approx_count_distinct_bounds: num_std must be > 0")
            try:
                sk = deserialize_any(bytes(blob))
                if isinstance(sk, (_Theta, _Tuple)):
                    # same KMV bottom-k sample -> same Beyer RSE class
                    exact, rse = sk.is_exact(), 1.0 / np.sqrt(sk.k - 2)
                elif isinstance(sk, _Hll):
                    exact = sk.is_sparse
                    rse = 1.04 / np.sqrt(1 << sk.lgk)
                else:
                    raise TypeError("not a Theta, HLL or tuple state")
                est = sk.estimate()
                if exact:
                    out.append([int(est), int(est)])
                    continue
                lo = int(np.floor(est / (1 + ns * rse)))
                hi = int(np.ceil(est / max(1e-12, 1 - ns * rse)))
                out.append([lo, hi])
            except Exception as ex:
                log.warning(
                    "approx_count_distinct_bounds: corrupt state: %s", ex)
                out.append(None)
        return pd.Series(out, dtype="object")

    return bounds


def freq_maxerr_udf():
    """Scalar: frequent-items state -> the sketch's maximum estimation
    error (Misra-Gries ``max_err``): every reported count is within
    [true, true + max_err]. Zero in the exact regime — the documented
    way to ASSERT exactness of a freq-items result at read time."""

    @pandas_udf(LongType())
    def maxerr(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, FreqItemsSketch):
                    raise TypeError("not a frequent-items state")
                out.append(int(sk._max_err))
            except Exception as ex:
                log.warning("approx_freqitems_maxerr: corrupt state: %s", ex)
                out.append(None)
        return pd.Series(out, dtype="object")

    return maxerr


def ks_distance_udf():
    """Scalar: two quantile (KLL-family) states -> two-sample
    Kolmogorov-Smirnov distance, ``sup_x |F_A(x) - F_B(x)|`` over the
    union of retained items (the sup of two step functions is attained
    at a jump point, so evaluating at every retained value is exact for
    the sketched distributions).

    Exact-regime states retain every raw value at weight 1, so the
    result IS the exact two-sample KS statistic; in estimation mode it
    is the KS distance between the sketch-approximated ECDFs, with error
    bounded by the two sketches' rank-error envelopes. The DataSketches
    library ships the same capability for its quantile sketches
    (kolmogorov_smirnov_test); this engine computes the distance from
    any two persisted states — the drift-detection primitive for
    comparing two time windows without raw rescans."""
    from ..sketches.kll import KllSketch

    @pandas_udf(DoubleType())
    def ks(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(a, b):
            if ba is None or bb is None:
                out.append(None)
                continue
            try:
                sa = deserialize_any(bytes(ba))
                sb = deserialize_any(bytes(bb))
                if not (isinstance(sa, KllSketch)
                        and isinstance(sb, KllSketch)):
                    raise ValueError("not quantile (KLL-family) states")
                if sa.n == 0 or sb.n == 0:
                    out.append(None)
                    continue
                va, wa = sa._weighted_items()
                vb, wb = sb._weighted_items()
                xs = np.union1d(va, vb)

                def ecdf(v, w):
                    cum = np.cumsum(w)
                    idx = np.searchsorted(v, xs, side="right")
                    return np.where(idx > 0, cum[np.maximum(idx - 1, 0)],
                                    0) / float(cum[-1])

                out.append(float(np.max(np.abs(ecdf(va, wa)
                                               - ecdf(vb, wb)))))
            except Exception as e:
                log.warning("approx_ks_distance: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype="object")

    return ks


def freq_join_size_udf():
    """Scalar: two frequent-items states -> estimated equi-join output
    cardinality on the sketched key, ``sum_k est_A(k) * est_B(k)`` over
    the smaller sketch's item map.

    EXACT when both states are in the exact regime (no purge yet) — the
    sum is then literally |A JOIN B| on that key. In estimation mode it
    is a heavy-hitter approximation: retained items contribute their
    upper-bound estimates, purged (low-frequency) items contribute 0.
    Join size is dominated by heavy keys (the terms are products), which
    is exactly what the sketch retains — the standard use of frequency
    sketches in join planning."""

    @pandas_udf(LongType())
    def jsize(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(a, b):
            if ba is None or bb is None:
                out.append(None)
                continue
            try:
                sa = deserialize_any(bytes(ba))
                sb = deserialize_any(bytes(bb))
                if not (isinstance(sa, FreqItemsSketch)
                        and isinstance(sb, FreqItemsSketch)):
                    raise ValueError("not frequent-items states")
                if len(sa._counts) > len(sb._counts):
                    sa, sb = sb, sa
                out.append(sum(sa.estimate(i) * sb.estimate(i)
                               for i in sa._counts))
            except Exception as e:
                log.warning("approx_join_size: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype="object")

    return jsize


# --------------------------------------------------------------------- set ops

def _theta_pair(blob_a, blob_b):
    from ..compat.theta import ThetaWireSketch
    a = deserialize_any(bytes(blob_a))
    b = deserialize_any(bytes(blob_b))
    if isinstance(a, ThetaWireSketch) and isinstance(b, ThetaWireSketch):
        return a, b  # foreign DataSketches Theta pair: same hash space
    if isinstance(a, ThetaWireSketch) or isinstance(b, ThetaWireSketch):
        raise ValueError(
            "cannot mix a DataSketches Theta state with an engine KMV "
            "state (different hash spaces); re-accumulate one side")
    if not isinstance(a, ThetaSketch) or not isinstance(b, ThetaSketch):
        raise ValueError("set operations need Theta sketch states")
    return a, b


def theta_setop_udf(op: str):
    """Scalar over two Theta states: 'jaccard' -> double, 'intersection' /
    'a_not_b' -> long. Null/corrupt state -> null (estimate-side parity)."""
    rt = DoubleType() if op == "jaccard" else LongType()

    @pandas_udf(rt)
    def setop(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for blob_a, blob_b in zip(sa, sb):
            if blob_a is None or blob_b is None:
                out.append(None)
                continue
            try:
                a, b = _theta_pair(blob_a, blob_b)
                if op == "jaccard":
                    out.append(a.jaccard_estimate(b))
                elif op == "intersection":
                    out.append(a.intersection_estimate(b))
                else:
                    out.append(a.a_not_b_estimate(b))
            except Exception as e:
                log.warning("theta set op %s: corrupt state: %s", op, e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return setop


# --------------------------------------------------------------------- distinct count

def hll_acc_udf(lgk: int):
    """Accumulate into the engine's numpy HLL (sparse->dense) state."""
    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = HllSketch(lgk=lgk)
        sk.update_hashes(hash_series(v))
        return sk.serialize()

    return acc


def cpc_wire_acc_udf(lgk: int, item_type: str = ITEM_STR):
    """Accumulate into a GENUINE Apache DataSketches CPC state (wire
    bytes, family 16) — byte-compatible with the reference engine's
    default accumulate states and with datasketches-java
    (``sketches/cpc_state.py::CpcAccumulator``; hashes bit-identical to
    ``CpcSketch.update``). The slower path vs the engine HLL (strings
    hash per item in Python) — use when states must be readable by the
    reference side without an export step."""
    from ..sketches.cpc_state import CpcAccumulator

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = CpcAccumulator(lgk)
        if item_type == ITEM_LONG:
            sk.update_longs(_wire_longs(v))
        else:
            sk.update_strings(_wire_strings(v))
        return sk.serialize()

    return acc


def theta_wire_acc_udf(k: int, item_type: str = ITEM_STR):
    """Accumulate into a GENUINE Apache DataSketches compact Theta state
    (wire bytes, family 3) — set-operable with sketches built by
    datasketches-java over overlapping data (``compat/theta.py``;
    byte-identical in the exact regime)."""
    from ..compat.theta import ThetaWireAccumulator

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = ThetaWireAccumulator(k)
        if item_type == ITEM_LONG:
            sk.update_longs(_wire_longs(v))
        else:
            sk.update_strings(_wire_strings(v))
        return sk.serialize()

    return acc


def hll_direct_udf(lgk: int):
    """Direct NDV estimate via the engine's numpy HLL — exact while the
    sketch is in its sparse phase (NDV <= 2^(lgk-3)), CPC-class RSE past
    it. Serves the CPC name (conf.distinct_cpc_lgk)."""
    @pandas_udf(LongType())
    def direct(v: pd.Series) -> int:
        v = v.dropna()
        if v.empty:
            return None
        sk = HllSketch(lgk=lgk)
        sk.update_hashes(hash_series(v))
        return sk.estimate()

    return direct


def theta_acc_udf(k: int):
    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = ThetaSketch(k=k)
        sk.update_hashes(hash_series(v))
        return sk.serialize()

    return acc


def theta_direct_udf(k: int):
    @pandas_udf(LongType())
    def direct(v: pd.Series) -> int:
        v = v.dropna()
        if v.empty:
            return None
        sk = ThetaSketch(k=k)
        sk.update_hashes(hash_series(v))
        return sk.estimate()

    return direct


def theta_est_udf():
    """Estimate for distinct-count states — accepts both Theta/KMV and the
    engine's numpy HLL states (dispatch on the state header), mirroring the
    family-agnostic combine."""
    @pandas_udf(LongType())
    def est(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                from ..compat.theta import ThetaWireSketch
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, (ThetaSketch, HllSketch,
                                       CpcUnionSketch, ThetaWireSketch)):
                    raise ValueError("not a distinct-count state")
                out.append(sk.estimate())
            except Exception as e:
                log.warning("approx_count_distinct_estimate: corrupt state: %s", e)
                out.append(None)
        return pd.Series(out, dtype=object)

    return est


# --------------------------------------------------------------------- tuple

def aod_wire_acc_udf(k: int, item_type: str = ITEM_STR):
    """GROUPED_AGG: (key, value) -> a GENUINE Apache DataSketches
    Tuple/ArrayOfDoubles compact state (wire bytes, family 9) — readable
    by ``ArrayOfDoublesSketches.heapifySketch`` and union-able with
    states built by datasketches-java over overlapping data
    (``compat/aod.py``; same retained keys in the exact regime). Values
    follow the [1.0, x] convention, so summaries are per-key (row count,
    value sum) and the engine tuple estimators read foreign copies."""
    from ..compat.aod import AodWireAccumulator

    @pandas_udf(BinaryType())
    def acc(key: pd.Series, value: pd.Series) -> bytes:
        mask = key.notna()
        if not mask.any():
            return None
        key = key[mask]
        v = pd.to_numeric(value[mask], errors="coerce") \
            .fillna(0.0).to_numpy(np.float64)
        sk = AodWireAccumulator(k)
        if item_type == ITEM_LONG:
            sk.update_longs(_wire_longs(key), v)
        else:
            sk.update_strings(_wire_strings(key), v)
        return sk.serialize()

    return acc


def tuple_acc_udf(k: int):
    """GROUPED_AGG: (key, value) -> serialized tuple state. Null-key rows
    are dropped (a null key is no key); a null value counts the row with
    a 0.0 contribution (count(*)/sum(value) SQL semantics)."""
    from ..sketches import TupleSketch

    @pandas_udf(BinaryType())
    def acc(key: pd.Series, value: pd.Series) -> bytes:
        mask = key.notna()
        if not mask.any():
            return None
        key = key[mask]
        v = pd.to_numeric(value[mask], errors="coerce") \
            .fillna(0.0).to_numpy(np.float64)
        sk = TupleSketch(k=k)
        sk.update_batch(hash_series(key), v)
        return sk.serialize()

    return acc


TUPLE_EST_TYPE = StructType([
    StructField("ndv", LongType()),
    StructField("rows", LongType()),
    StructField("value_sum", DoubleType()),
])

TUPLE_SEGMENT_TYPE = StructType([
    StructField("keys", LongType()),
    StructField("value_sum", DoubleType()),
])


def tuple_est_udf():
    """Scalar: tuple state -> struct(ndv, rows, value_sum). Foreign
    ArrayOfDoubles (DataSketches Tuple wire, family 9) states decode too
    when they carry the two-value (count, sum) convention
    (``compat/aod.py``)."""
    from ..compat.aod import AodWireSketch
    from ..sketches import TupleSketch

    @pandas_udf(TUPLE_EST_TYPE)
    def est(states: pd.Series) -> pd.DataFrame:
        out = []
        for blob in states:
            if blob is None:
                out.append((None, None, None))
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, (TupleSketch, AodWireSketch)):
                    raise ValueError("not a tuple state")
                out.append((sk.estimate(), sk.rows_estimate(),
                            sk.sum_estimate()))
            except Exception as e:
                log.warning("approx_tuple_estimate: corrupt state: %s", e)
                out.append((None, None, None))
        return pd.DataFrame(out, columns=["ndv", "rows", "value_sum"])

    return est


def tuple_segment_udf():
    """Scalar: (tuple state, min_count) -> struct(keys, value_sum) for
    the segment of keys with per-key row count >= min_count."""
    from ..compat.aod import AodWireSketch
    from ..sketches import TupleSketch

    @pandas_udf(TUPLE_SEGMENT_TYPE)
    def seg(states: pd.Series, min_count: pd.Series) -> pd.DataFrame:
        out = []
        for blob, mc in zip(states, min_count):
            if blob is None:
                out.append((None, None))
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, (TupleSketch, AodWireSketch)):
                    raise ValueError("not a tuple state")
                mc = 1 if _is_nullish(mc) else int(mc)
                out.append(sk.segment_estimate(min_count=mc))
            except Exception as e:
                log.warning(
                    "approx_tuple_segment_estimate: corrupt state: %s", e)
                out.append((None, None))
        return pd.DataFrame(out, columns=["keys", "value_sum"])

    return seg


def tuple_segment_sum_udf():
    """Scalar: (tuple state, min_count, min_sum) -> struct(keys,
    value_sum) for keys with per-key count >= min_count AND per-key sum
    >= min_sum (the value-weighted segment form)."""
    from ..compat.aod import AodWireSketch
    from ..sketches import TupleSketch

    @pandas_udf(TUPLE_SEGMENT_TYPE)
    def seg(states: pd.Series, min_count: pd.Series,
            min_sum: pd.Series) -> pd.DataFrame:
        out = []
        for blob, mc, ms in zip(states, min_count, min_sum):
            if blob is None:
                out.append((None, None))
                continue
            try:
                sk = deserialize_any(bytes(blob))
                if not isinstance(sk, (TupleSketch, AodWireSketch)):
                    raise ValueError("not a tuple state")
                mc = 1 if _is_nullish(mc) else int(mc)
                ms = float("-inf") if _is_nullish(ms) else float(ms)
                out.append(sk.segment_estimate(min_count=mc, min_sum=ms))
            except Exception as ex:
                log.warning(
                    "approx_tuple_segment_estimate: corrupt state: %s", ex)
                out.append((None, None))
        return pd.DataFrame(out, columns=["keys", "value_sum"])

    return seg


# --------------------------------------------------------------------- bloom


def _bloom_state(blob):
    """Deserialize either membership dialect: the engine family or a
    DataSketches family-21 wire image."""
    from ..compat.bloomwire import DsBloomFilter
    from ..sketches import BloomFilter
    sk = deserialize_any(bytes(blob))
    if not isinstance(sk, (BloomFilter, DsBloomFilter)):
        raise ValueError("not a bloom state")
    return sk


def _wire_longs(vals: pd.Series) -> np.ndarray:
    """Null-free series -> int64 keys for a wire-filter long path.

    Integer dtypes convert directly (lossless, incl. pandas ``Int64``).
    Object dtypes (decimal strings / python ints) parse per element —
    exact at any magnitude. Float dtypes must be integral-valued:
    a nullable bigint column crosses Arrow as float64 whenever the
    batch holds a null, so an integral float batch is an int column in
    disguise and converts losslessly (keys above 2^53 were already
    degraded by that Arrow conversion — plan-time ``item_type='long'``
    in the membership API routes around it by shipping the keys as
    cast-to-string). A genuinely fractional value under
    ``item_type='long'`` is a caller error: silently rounding would
    produce wrong keys with no signal, so it raises instead."""
    if pd.api.types.is_integer_dtype(vals):
        return vals.to_numpy(dtype=np.int64)
    if pd.api.types.is_float_dtype(vals):
        arr = vals.to_numpy(dtype=np.float64)
        if arr.size and not (np.all(np.isfinite(arr))
                             and np.all(arr == np.floor(arr))):
            bad = arr[~(np.isfinite(arr) & (arr == np.floor(arr)))][0]
            raise ValueError(
                "item_type='long' requires integral keys; got a "
                f"non-integral double value {bad!r} — cast the column "
                "to BIGINT explicitly, or use item_type='string'")
        return arr.astype(np.int64)
    return np.fromiter((int(x) for x in vals), dtype=np.int64,
                       count=len(vals))


def _wire_strings(vals: pd.Series) -> list:
    """Null-free series -> string keys for a wire-filter string path.
    Integral-valued float batches render through int64 first so a
    nullable bigint column yields '17', not '17.0' — the same logical
    value must hash identically whether or not its Arrow batch happened
    to contain a null."""
    if pd.api.types.is_float_dtype(vals):
        arr = vals.to_numpy(dtype=np.float64)
        if arr.size and np.all(np.isfinite(arr)) \
                and np.all(arr == np.floor(arr)):
            return [str(x) for x in arr.astype(np.int64)]
    elif pd.api.types.is_integer_dtype(vals):
        return [str(x) for x in vals.to_numpy(dtype=np.int64)]
    return vals.astype(str).tolist()


def _bloom_probe(sk, vals: pd.Series,
                 item_type: str | None = None) -> np.ndarray:
    """Membership test dispatch: engine filters probe the shared
    MurmurHash3 space; wire filters probe XxHash64 (longs as 8-byte LE,
    everything else as UTF-8 strings — the datasketches-java rule).

    ``item_type`` is the plan-time declaration (``ITEM_LONG`` /
    ``ITEM_STR``); when absent, an integer (or integral-float — a
    nullable bigint column arrives from Arrow as float64 whenever the
    batch holds a null) probe against a wire filter tests BOTH hash
    spaces and ORs the results: the state may have been built by either
    Java overload — ``update(long)`` (8-byte-LE keys) or the
    engine's default-``item_type`` accumulate, which renders integer
    keys as UTF-8 strings — and probing only one space silently
    breaks the family's no-false-negative guarantee against the other.
    The OR at most doubles the false-positive rate; pin ``item_type``
    on both sides for the designed fpp."""
    from ..sketches import BloomFilter
    if isinstance(sk, BloomFilter):
        return sk.contains_hashes(hash_series(vals))
    if item_type == ITEM_LONG:
        return sk.contains_longs(_wire_longs(vals))
    if item_type is None:
        longs = None
        if pd.api.types.is_integer_dtype(vals):
            longs = vals.to_numpy(dtype=np.int64)
        elif pd.api.types.is_float_dtype(vals):
            arr = vals.to_numpy(dtype=np.float64)
            if arr.size and np.all(np.isfinite(arr)) \
                    and np.all(arr == np.floor(arr)):
                longs = arr.astype(np.int64)
        if longs is not None:
            in_longs = np.asarray(sk.contains_longs(longs))
            in_strs = np.asarray(
                sk.contains_strings([str(x) for x in longs]))
            return in_longs | in_strs
    return sk.contains_strings(_wire_strings(vals))


def bloom_acc_udf(expected_items: int, fpp: float):
    """GROUPED_AGG: raw values -> serialized Bloom membership state.
    Geometry is fixed by the (expected_items, fpp) design so every
    partial in one aggregation merges (same rule as grouped theta k)."""
    from ..sketches import BloomFilter

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = BloomFilter.design(expected_items, fpp)
        sk.update_hashes(hash_series(v))
        return sk.serialize()

    return acc


def bloom_contains_udf(item_type: str | None = None):
    """Scalar: (bloom state, value) -> boolean membership test. The
    state column is usually one broadcast literal repeated per row, so
    the deserialized filter is cached per distinct byte payload within
    the Arrow batch (one decode per batch in the common case).
    ``item_type`` pins the wire-filter hash path at plan time (see
    :func:`_bloom_probe`); None keeps the dtype heuristic."""
    from ..sketches import BloomFilter

    @pandas_udf(BooleanType())
    def contains(states: pd.Series, v: pd.Series) -> pd.Series:
        out = np.full(len(v), None, dtype=object)
        cache: dict[bytes, BloomFilter] = {}
        # group rows by state payload; vectorize the probe per group
        for blob, idx in _bloom_state_groups(states):
            if blob is None:
                continue
            try:
                sk = cache.get(blob)
                if sk is None:
                    sk = _bloom_state(blob)
                    cache[blob] = sk
            except Exception as ex:
                log.warning(
                    "approx_membership_contains: corrupt state: %s", ex)
                continue
            vals = v.iloc[idx]
            ok = vals.notna().to_numpy()
            res = np.full(len(vals), None, dtype=object)
            if ok.any():
                hits = _bloom_probe(sk, vals[ok.tolist()], item_type)
                res[ok] = [bool(b) for b in hits]
            out[idx] = res
        return pd.Series(out, dtype=object)

    return contains


def _bloom_state_groups(states: pd.Series):
    """Yield (state_bytes_or_None, positional_index_array) per distinct
    state payload in the batch — bytes aren't hashable-groupable through
    pandas groupby on all versions, so group positionally."""
    groups: dict[bytes | None, list[int]] = {}
    for i, blob in enumerate(states):
        key = None if blob is None else bytes(blob)
        groups.setdefault(key, []).append(i)
    for key, idx in groups.items():
        yield key, np.asarray(idx, dtype=np.int64)


def bloom_estimate_udf():
    """Scalar: bloom state -> distinct-key estimate (fill-ratio based,
    Swamidass & Baldi 2007). Saturated filter -> null."""
    from ..sketches import BloomFilter

    @pandas_udf(LongType())
    def est(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = _bloom_state(blob)
                n = sk.estimate()
                out.append(None if n < 0 else n)
            except Exception as ex:
                log.warning(
                    "approx_membership_estimate: corrupt state: %s", ex)
                out.append(None)
        return pd.Series(out, dtype=object)

    return est


def bloom_fpp_udf():
    """Scalar: bloom state -> CURRENT false-positive probability
    (fill_fraction ** n_hashes) — the read-time error surface of the
    membership family, like approx_count_distinct_bounds for NDV."""
    from ..sketches import BloomFilter

    @pandas_udf(DoubleType())
    def fpp(states: pd.Series) -> pd.Series:
        out = []
        for blob in states:
            if blob is None:
                out.append(None)
                continue
            try:
                sk = _bloom_state(blob)
                out.append(sk.current_fpp())
            except Exception as ex:
                log.warning(
                    "approx_membership_fpp: corrupt state: %s", ex)
                out.append(None)
        return pd.Series(out, dtype=object)

    return fpp


def bloom_contains_broadcast_udf(bc, item_type: str | None = None):
    """Scalar membership probe against ONE driver-collected state
    shipped as a SparkContext broadcast — the big-probe path. The
    two-argument ``bloom_contains_udf`` carries the state as a COLUMN,
    which Arrow re-serializes per row (an MB-scale state times a
    million-row probe is terabytes of transfer); this variant moves the
    state once per executor and deserializes once per python worker.
    ``bc`` is ``sc.broadcast(state_bytes)``. ``item_type`` pins the
    wire-filter hash path at plan time (see :func:`_bloom_probe`)."""
    from ..sketches import BloomFilter

    holder: dict[int, BloomFilter] = {}

    @pandas_udf(BooleanType())
    def contains(v: pd.Series) -> pd.Series:
        sk = holder.get(0)
        if sk is None:
            sk = _bloom_state(bc.value)
            holder[0] = sk
        out = np.full(len(v), None, dtype=object)
        ok = v.notna().to_numpy()
        if ok.any():
            hits = _bloom_probe(sk, v[ok.tolist()], item_type)
            out[ok] = [bool(b) for b in hits]
        return pd.Series(out, dtype=object)

    return contains


def bloom_contains_keyed_udf(bc, item_type: str | None = None):
    """Scalar membership probe against a PER-GROUP state map shipped as
    one broadcast: ``bc`` is ``sc.broadcast({group_key: state_bytes})``
    (group cardinality is dimension-bounded, so the map is small).
    Args: (group_key, value) -> boolean; unknown group or null -> null.
    Same rationale as :func:`bloom_contains_broadcast_udf` — the state
    must not ride a column past Arrow once per probe row."""
    from ..sketches import BloomFilter

    cache: dict[object, BloomFilter] = {}

    @pandas_udf(BooleanType())
    def contains(key: pd.Series, v: pd.Series) -> pd.Series:
        out = np.full(len(v), None, dtype=object)
        states = bc.value
        for kval, idx in _bloom_probe_groups(key):
            blob = states.get(kval)
            if blob is None:
                continue
            sk = cache.get(kval)
            if sk is None:
                sk = _bloom_state(blob)
                cache[kval] = sk
            vals = v.iloc[idx]
            ok = vals.notna().to_numpy()
            res = np.full(len(vals), None, dtype=object)
            if ok.any():
                hits = _bloom_probe(sk, vals[ok.tolist()], item_type)
                res[ok] = [bool(b) for b in hits]
            out[idx] = res
        return pd.Series(out, dtype=object)

    return contains


def _bloom_probe_groups(key: pd.Series):
    groups: dict[object, list[int]] = {}
    for i, kv in enumerate(key):
        if kv is None:
            continue
        groups.setdefault(kv, []).append(i)
    for kv, idx in groups.items():
        yield kv, np.asarray(idx, dtype=np.int64)


def bloomwire_acc_udf(expected_items: int, fpp: float, seed: int,
                      item_type: str = ITEM_STR):
    """GROUPED_AGG: raw values -> a GENUINE DataSketches BloomFilter
    wire image (family 21; byte-identical to datasketches-java for the
    same update stream). ``item_type`` is resolved ONCE at plan time —
    the Java update() overload rule is static, and dispatching on the
    observed pandas dtype would make state content null-dependent (a
    nullable bigint group crosses Arrow as float64 exactly when the
    group holds a null, so the same logical data would hash as longs in
    one group and as '1.0'-style strings in another). ``ITEM_LONG``
    hashes 8-byte LE longs (integral float batches convert losslessly
    below 2^53; the membership API's plan-time cast-to-string routes
    larger keys exactly); the default hashes UTF-8 strings with
    integral floats rendered as ints for the same null-independence."""
    from ..compat.bloomwire import DsBloomFilter

    @pandas_udf(BinaryType())
    def acc(v: pd.Series) -> bytes:
        v = v.dropna()
        if v.empty:
            return None
        sk = DsBloomFilter.design(expected_items, fpp, seed)
        if item_type == ITEM_LONG:
            sk.update_longs(_wire_longs(v))
        else:
            sk.update_strings(_wire_strings(v))
        return sk.serialize()

    return acc
