#!/usr/bin/env python
"""Side-by-side parity demo: the reference's README workflow, re-expressed.

The reference's flagship example (maropu/datasketches-spark README.md:68-100)
builds weekly percentile summaries over a household-power CSV, filters a
date range, merges the summaries and estimates p95 — without rescanning raw
data. This script runs the same workflow shape on the `events` fixture with
this engine, exercising both the SQL surface (after install()) and the
DataFrame API, so a reference user can map every line 1:1.

Run: python examples/reference_parity_demo.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import datasketches_spark_spark as dss  # noqa: E402
from datasketches_spark_spark import functions as dsf
from datasketches_spark_spark.operators import sketch_accumulate
from datasketches_spark_spark.sources import read_table, session_builder
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (session_builder(master="local[4]", shuffle_partitions=4)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # ------------------------------------------------- reference: install()
    dss.install(spark)                       # == DataSketchApi.install()
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")

    # -------------------------- reference README.md:31-60: direct aggregate
    spark.sql("""
        SELECT approx_percentile_ex(value, 0.95) AS p95,
               approx_percentile_kll(value, 0.95) AS p95_kll,
               approx_percentile_mergeable(value, 0.95) AS p95_mergeable
        FROM events
    """).show()

    # ------------- reference README.md:68-100: accumulate per time window,
    # filter a date range, combine the subset, estimate — no raw rescan.
    # (Two-phase map-side sketching; the reference gets the same physics
    # from TypedImperativeAggregate.)
    summaries = sketch_accumulate(
        ev.select(F.window("ts", "1 week").alias("window"), "value"),
        ["window"], "value", family="quantile", impl="MERGEABLE")
    summaries.persist()
    summaries.select("window.start", F.bit_length("state").alias("bits")) \
             .show(5, truncate=False)

    merged = (summaries
              .where(F.col("window.start") >= "2024-01-08")
              .agg(dsf.approx_percentile_combine("state").alias("merged")))
    merged.select(
        dsf.approx_percentile_estimate("merged", 0.95).alias("p95"),
        dsf.approx_pmf_estimate("merged", 4).alias("pmf4")).show(truncate=False)

    # ----------------- reference README.md:141-168: frequent items + inline
    spark.sql("""
        SELECT inline(approx_freqitems(event_type)) FROM events
    """).show()

    # ------------------- reference README.md:239-302: distinct count family
    spark.sql("""
        SELECT approx_count_distinct_ex(user_id) AS ndv_cpc_class,
               approx_count_distinct_theta(user_id) AS ndv_theta
        FROM events
    """).show()
    # native HLL path (DataFrame API routes to Spark's JVM built-ins)
    ev.agg(dsf.approx_count_distinct_hll("user_id").alias("ndv_hll")).show()

    # ---------------- migration: estimate a reference-persisted state here.
    # These bytes are the reference test suite's golden KLL vector
    # (SketchExpressionSuite.scala:27-37) — an Apache DataSketches Java
    # serialized state. The engine's estimate functions read it directly
    # (deserializer sniffs foreign bytes); import_datasketches_state
    # converts a whole column once for merge-heavy pipelines.
    golden_kll = bytes(x & 0xFF for x in [
        5, 1, 15, 0, -56, 0, 8, 0, 4, 0, 0, 0, 0, 0, 0, 0, -56,
        0, 1, 0, -60, 0, 0, 0, 0, 0, 0, 0, 0, 0, 32, 65, 0, 0, 32,
        65, 0, 0, 0, 64, 0, 0, -128, 63, 0, 0, 0, 0])
    spark.createDataFrame([(bytearray(golden_kll),)], "state binary") \
         .createOrReplaceTempView("reference_states")
    spark.sql("""
        SELECT approx_percentile_estimate(state, 0.95) AS p95_direct,
               approx_percentile_estimate(
                   import_datasketches_state(state), 0.95) AS p95_migrated
        FROM reference_states
    """).show()
    # ...and the EXPORT direction: EXACT-REGIME engine states write
    # DataSketches wire bytes (byte-identical to the reference's golden
    # vectors on the same inputs), so summaries built here remain
    # readable by DataSketches tooling elsewhere. Exact regime requires
    # sketch capacity >= stream size (compacted states refuse to export).
    spark.conf.set("spark.sql.dataSketches.quantiles.sketchImpl", "MERGEABLE")
    spark.conf.set("spark.sql.dataSketches.quantiles.mergeable.k", "65536")
    dss.install(spark)
    spark.sql("""
        SELECT export_datasketches_state(
                 approx_percentile_accumulate(value)) AS ds_wire_state
        FROM events
    """).select(F.octet_length("ds_wire_state").alias("wire_bytes")).show()

    # --------------- extension: sampling (no reference analogue). Uniform
    # reservoir states ride the same combine; weighted states merge
    # deterministically via persisted A-ES keys.
    spark.sql("""
        SELECT event_type,
               approx_sample_estimate(approx_sample_accumulate(value))
                 AS sampled_values,
               approx_sample_stream_size(approx_sample_accumulate(value))
                 AS n_seen
        FROM events GROUP BY event_type ORDER BY event_type
    """).show(truncate=60)

    spark.stop()


if __name__ == "__main__":
    main()
