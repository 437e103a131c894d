"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator (SURVEY.md §2) at a scale
where the sketch is in its EXACT regime (retained items below sketch
capacity), so results hash-match the DuckDB oracle bit-for-bit; pytest
covers the approximate regime against error bounds separately
(tests/test_functions_spark.py, tests/test_sketches_core.py).

Engine quantile rank rule == DuckDB ``quantile_disc``: value at rank
``max(ceil(p*n), 1)`` (see sketches/kll.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasketches_spark_spark import functions as dsf
from datasketches_spark_spark.operators import (
    distinct_measure,
    freqitems_measure,
    percentile_measure,
    sketch_accumulate,
    sketch_grouped_agg,
)
from datasketches_spark_spark.sources import read_table

# Sketch sizes chosen so sf0.01 (and sf0.1 for the pipeline queries on
# `events`) stays in the exact regime; see module docstring.
_QK = 262_144        # quantile sketch k (l_returnflag group ~20k rows at sf0.01)
_TK = 16_384         # theta k (user_id NDV 1.5k at sf0.1)


# --------------------------------------------------------------------- queries

def _q01_percentile_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two measures, one scan, one state-only shuffle (map-side sketching
    via sketch_grouped_agg — raw rows never cross the exchange)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (sketch_grouped_agg(
                li, ["l_returnflag"],
                percentile_measure("p50_qty", "l_quantity", 0.5,
                                   impl="MERGEABLE", k=_QK),
                percentile_measure("p95_price", "l_extendedprice", 0.95,
                                   impl="MERGEABLE", k=_QK))
            .orderBy("l_returnflag"))


def _q02_percentile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    agg = sketch_grouped_agg(
        li, ["l_returnflag", "l_linestatus"],
        percentile_measure("qs", "l_extendedprice", [0.25, 0.5, 0.75, 0.95],
                           impl="MERGEABLE", k=_QK))
    return (agg.select("l_returnflag", "l_linestatus",
                       F.element_at("qs", 1).alias("p25"),
                       F.element_at("qs", 2).alias("p50"),
                       F.element_at("qs", 3).alias("p75"),
                       F.element_at("qs", 4).alias("p95"))
            .orderBy("l_returnflag", "l_linestatus"))


def _q03_percentile_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: accumulate per day -> filter window -> combine -> estimate.

    The reference's distinguishing capability (README.md:68-100): sketch
    summaries per time bucket, merged over an arbitrary later-chosen subset
    without rescanning raw data. Two-phase map-side combine via
    sketch_accumulate."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    summaries = sketch_accumulate(
        ev.select(day, "value"), ["day"], "value",
        family="quantile", impl="MERGEABLE", k=_QK)
    merged = (summaries
              .where((F.col("day") >= "2024-01-08") & (F.col("day") < "2024-01-22"))
              .agg(dsf.approx_percentile_combine("state").alias("m")))
    est = dsf.approx_percentile_estimate("m", [0.5, 0.95])
    return merged.select(F.element_at(est, 1).alias("p50"),
                         F.element_at(est, 2).alias("p95"))


def _q04_pmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    summ = sketch_accumulate(li, ["l_returnflag"], "l_quantity",
                             family="quantile", impl="MERGEABLE", k=_QK)
    pmf = dsf.approx_pmf_estimate("state", 4)
    return (summ.select("l_returnflag",
                        F.element_at(pmf, 1).alias("b0"),
                        F.element_at(pmf, 2).alias("b1"),
                        F.element_at(pmf, 3).alias("b2"),
                        F.element_at(pmf, 4).alias("b3"))
            .orderBy("l_returnflag"))


def _q05_ndv_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (sketch_grouped_agg(ev, ["event_type"],
                               distinct_measure("ndv_users", "user_id", k=_TK))
            .orderBy("event_type"))


def _q06_ndv_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    summaries = sketch_accumulate(ev.select(day, "user_id"), ["day"], "user_id",
                                  family="theta", k=_TK)
    merged = (summaries.where(F.col("day") < "2024-01-15")
              .agg(dsf.approx_count_distinct_combine("state").alias("m")))
    return merged.select(dsf.approx_count_distinct_estimate("m").alias("ndv_users"))


def _q07_ndv_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native DataSketches HLL path (JVM TypedImperativeAggregate)."""
    ev = read_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(dsf.approx_count_distinct_hll("user_id").alias("ndv_users"))
            .orderBy("event_type"))


def _q08_freqitems_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    pt = read_table(spark, sf_dir, "part")
    # broadcast the small dim: lineitem ⋈ part is a broadcast-hash join
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    # single-group aggregate via map-side sketching: each partition emits one
    # small freq-items state; only ~num_partitions states reach the one
    # merging task (round 1 shuffled every raw row to it).
    fi = sketch_grouped_agg(joined, [], freqitems_measure("fi", "p_brand"))
    return fi.select(F.inline("fi")).orderBy(F.desc("estimated"), "item")


def _q09_freqitems_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = read_table(spark, sf_dir, "orders")
    summ = sketch_accumulate(od, ["o_orderstatus"], "o_orderpriority",
                             family="freq")
    merged = summ.agg(dsf.approx_freqitems_combine("state").alias("m"))
    est = merged.select(dsf.approx_freqitems_estimate("m").alias("fi"))
    return est.select(F.inline("fi")).orderBy(F.desc("estimated"), "item")


def _q10_freqitems_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    fi = sketch_grouped_agg(li, [],
                            freqitems_measure("fi", "l_suppkey",
                                              item_type="long"))
    return (fi.select(F.inline("fi"))
            .orderBy(F.desc("estimated"), "item").limit(10))


def _q11_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary with a sketch percentile column:
    exact aggregates stay JVM-side (whole-stage codegen), only the sketch
    runs through Arrow."""
    li = read_table(spark, sf_dir, "lineitem")
    # sum over integer-valued doubles (l_quantity) and integer cents is
    # order-independent — exact match with the oracle regardless of
    # partial-aggregation order; a raw double sum would differ in the last
    # bits between Spark's partial/final tree and DuckDB's scan order.
    # floor(), not round(): both engines floor the identical IEEE double
    # (l_extendedprice*100), whereas Spark rounds via BigDecimal HALF_UP on
    # the shortest-decimal repr and DuckDB via C round on the binary value —
    # they disagree on half-cent boundaries (CORRECTNESS_r01 q11 hash miss).
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    filtered = li.where(F.col("l_shipdate") <= "1998-09-01")
    # Spark cannot mix a grouped-agg pandas UDF with JVM aggregates in one
    # Aggregate ([INVALID_PANDAS_UDF_PLACEMENT]), so the sketch runs as a
    # separate two-phase aggregation and joins back on the (tiny) group keys.
    exact = (filtered.groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum("l_quantity").alias("sum_qty"),
                  F.sum(cents).alias("sum_base_price_cents"),
                  F.count("*").alias("count_order")))
    sketched = sketch_accumulate(filtered, ["l_returnflag", "l_linestatus"],
                                 "l_quantity", family="quantile",
                                 impl="MERGEABLE", k=_QK)
    sketched = sketched.select(
        "l_returnflag", "l_linestatus",
        dsf.approx_percentile_estimate("state", 0.9).alias("p90_qty"))
    return (exact.join(sketched, ["l_returnflag", "l_linestatus"])
            .orderBy("l_returnflag", "l_linestatus"))


def _q12_percentile_impls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three quantile impls (KLL / REQ / default=REQ per conf) through
    the oracle on l_quantity — integer-valued, exactly representable in the
    float32 the KLL/REQ sketches use (l_extendedprice would lose float32
    precision; the MERGEABLE/float64 impl covers that in q01/q02)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (sketch_grouped_agg(
                li, ["l_returnflag"],
                # default impl (conf: REQ) — covers approx_percentile_ex
                percentile_measure("p50_default", "l_quantity", 0.5,
                                   impl=None, k=65_536),
                percentile_measure("p90_kll", "l_quantity", 0.9,
                                   impl="KLL", k=262_144),
                percentile_measure("p99_req", "l_quantity", 0.99,
                                   impl="REQ", k=65_536))
            .orderBy("l_returnflag"))


def _q13_percentile_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registry path for approx_percentile_ex (default conf impl = REQ),
    exact regime via a conf-tuned k — the path a spark.sql() user runs."""
    import datasketches_spark_spark as dss
    spark.conf.set("spark.sql.dataSketches.quantiles.req.k", "65536")
    try:
        dss.install(spark)
    finally:
        spark.conf.set("spark.sql.dataSketches.quantiles.req.k", "12")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               approx_percentile_ex(l_quantity, 0.5) AS p50_qty,
               approx_percentile_req(l_quantity, 0.95) AS p95_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q03_percentile_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_percentile_by_flag": _q01_percentile_by_flag,
        "q02_percentile_multi": _q02_percentile_multi,
        "q03_percentile_pipeline": _q03_percentile_pipeline,
        "q04_pmf": _q04_pmf,
        "q05_ndv_by_type": _q05_ndv_by_type,
        "q06_ndv_pipeline": _q06_ndv_pipeline,
        "q07_ndv_hll": _q07_ndv_hll,
        "q08_freqitems_brand": _q08_freqitems_brand,
        "q09_freqitems_pipeline": _q09_freqitems_pipeline,
        "q10_freqitems_long": _q10_freqitems_long,
        "q11_pricing_summary": _q11_pricing_summary,
        "q12_percentile_impls": _q12_percentile_impls,
        "q13_percentile_sql": _q13_percentile_sql,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_percentile_by_flag": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.5) AS p50_qty,
                   quantile_disc(l_extendedprice, 0.95) AS p95_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q02_percentile_multi": """
            SELECT l_returnflag, l_linestatus,
                   quantile_disc(l_extendedprice, 0.25) AS p25,
                   quantile_disc(l_extendedprice, 0.50) AS p50,
                   quantile_disc(l_extendedprice, 0.75) AS p75,
                   quantile_disc(l_extendedprice, 0.95) AS p95
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q03_percentile_pipeline": """
            SELECT quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.95) AS p95
            FROM events
            WHERE date_trunc('day', ts) >= TIMESTAMP '2024-01-08'
              AND date_trunc('day', ts) <  TIMESTAMP '2024-01-22'
        """,
        # PMF bins: splitpoints at min + i*((max-min)/4), mass of x < sp
        # (matching sketches/kll.py::pmf); integer-valued l_quantity avoids
        # boundary-equality float hazards.
        "q04_pmf": """
            WITH b AS (SELECT l_returnflag, min(l_quantity) lo,
                              max(l_quantity) hi, count(*) n
                       FROM lineitem GROUP BY l_returnflag)
            SELECT li.l_returnflag,
                   CAST(sum(CASE WHEN l_quantity <  lo + (hi-lo)/4 THEN 1 ELSE 0 END) AS DOUBLE) / any_value(n) AS b0,
                   CAST(sum(CASE WHEN l_quantity >= lo + (hi-lo)/4 AND l_quantity < lo + 2*((hi-lo)/4) THEN 1 ELSE 0 END) AS DOUBLE) / any_value(n) AS b1,
                   CAST(sum(CASE WHEN l_quantity >= lo + 2*((hi-lo)/4) AND l_quantity < lo + 3*((hi-lo)/4) THEN 1 ELSE 0 END) AS DOUBLE) / any_value(n) AS b2,
                   CAST(sum(CASE WHEN l_quantity >= lo + 3*((hi-lo)/4) THEN 1 ELSE 0 END) AS DOUBLE) / any_value(n) AS b3
            FROM lineitem li JOIN b ON li.l_returnflag = b.l_returnflag
            GROUP BY li.l_returnflag ORDER BY li.l_returnflag
        """,
        "q05_ndv_by_type": """
            SELECT event_type, count(DISTINCT user_id) AS ndv_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q06_ndv_pipeline": """
            SELECT count(DISTINCT user_id) AS ndv_users
            FROM events WHERE date_trunc('day', ts) < TIMESTAMP '2024-01-15'
        """,
        "q07_ndv_hll": """
            SELECT event_type, count(DISTINCT user_id) AS ndv_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q08_freqitems_brand": """
            SELECT p_brand AS item, count(*) AS estimated
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY estimated DESC, item
        """,
        "q09_freqitems_pipeline": """
            SELECT o_orderpriority AS item, count(*) AS estimated
            FROM orders GROUP BY o_orderpriority ORDER BY estimated DESC, item
        """,
        "q10_freqitems_long": """
            SELECT l_suppkey AS item, count(*) AS estimated
            FROM lineitem GROUP BY l_suppkey
            ORDER BY estimated DESC, item LIMIT 10
        """,
        "q11_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_cents,
                   count(*) AS count_order,
                   quantile_disc(l_quantity, 0.9) AS p90_qty
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q12_percentile_impls": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.5)  AS p50_default,
                   quantile_disc(l_quantity, 0.9)  AS p90_kll,
                   quantile_disc(l_quantity, 0.99) AS p99_req
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q13_percentile_sql": """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.5)  AS p50_qty,
                   quantile_disc(l_quantity, 0.95) AS p95_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    }
