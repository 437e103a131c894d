#!/usr/bin/env python
"""Wire-format migration demo: reference-persisted states flow through
this engine and back, with datasketches-java verifying every hand-off.

A user migrating from the reference engine holds summary tables of
serialized sketch states — by default CPC bytes for distinct counts
(``distinctCntSketches.scala:57-66``). This script walks the full loop:

1. simulate the reference side: per-group CPC states built by the REAL
   datasketches-java ``CpcSketch`` (on Spark's driver classpath);
2. the engine estimates and combines those foreign states in SQL;
3. the engine re-exports the combined state to CPC wire bytes and Java
   reads them back — byte-level round trip;
4. the engine ACCUMULATES new data into genuine CPC states (bit-identical
   MurmurHash3 coupons) that union with the reference's states;
5. the same story for compact Theta set algebra: engine-built and
   Java-built states intersect/Jaccard across the ecosystem boundary.

Run: python examples/wire_migration_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import datasketches_spark_spark as dss  # noqa: E402
from datasketches_spark_spark.sources import session_builder  # noqa: E402


def main() -> None:
    spark = (session_builder(master="local[4]", shuffle_partitions=4)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    dss.install(spark)
    jvm = spark._jvm

    # -- 1. reference-side CPC states (one per region)
    jcpc = jvm.org.apache.datasketches.cpc.CpcSketch
    regions = {"emea": range(0, 600), "apac": range(400, 1100),
               "amer": range(900, 1500)}
    rows = []
    for region, users in regions.items():
        sk = jcpc(11)
        for u in users:
            sk.update(f"user-{u}")
        rows.append((region, bytes(sk.toByteArray())))
    spark.createDataFrame(rows, "region string, state binary") \
        .createOrReplaceTempView("reference_summaries")

    # -- 2. engine reads the foreign states directly
    print("\nPer-region NDV from reference CPC bytes (engine decode):")
    for r in spark.sql("""
            SELECT region,
                   approx_count_distinct_estimate(state) AS ndv
            FROM reference_summaries ORDER BY region""").collect():
        print(f"  {r.region}: {r.ndv}")

    (g,) = spark.sql("""
        SELECT approx_count_distinct_estimate(
                 approx_count_distinct_combine(state)) AS ndv,
               export_datasketches_state(
                 approx_count_distinct_combine(state)) AS wire
        FROM reference_summaries""").collect()
    print(f"Global NDV via engine combine: {g.ndv} (true 1500)")

    # -- 3. Java reads the engine's re-exported bytes
    jsk = jcpc.heapify(bytearray(bytes(g.wire)))
    print(f"datasketches-java reads the engine's exported state: "
          f"{round(jsk.getEstimate())}")

    # -- 4. engine-accumulated CPC unions with the reference's states
    new_rows = [(f"user-{u}",) for u in range(1200, 2000)]
    spark.createDataFrame(new_rows, "user string") \
        .createOrReplaceTempView("new_events")
    (acc,) = spark.sql("""
        SELECT approx_count_distinct_accumulate_cpc(user) AS state
        FROM new_events""").collect()
    spark.createDataFrame(
        [("new", bytearray(bytes(acc.state)))] +
        [(r, bytearray(b)) for r, b in rows],
        "region string, state binary").createOrReplaceTempView("all_states")
    (m,) = spark.sql("""
        SELECT approx_count_distinct_estimate(
                 approx_count_distinct_combine(state)) AS ndv
        FROM all_states""").collect()
    print(f"Union of engine-built + reference-built CPC: {m.ndv} "
          f"(true 2000)")

    # -- 5. Theta set algebra across the boundary
    jtheta = jvm.org.apache.datasketches.theta
    jb = jtheta.UpdateSketch.builder().build()
    for u in range(400, 1100):
        jb.update(f"user-{u}")
    java_theta = bytes(jb.compact().toByteArray())
    (et,) = spark.sql("""
        SELECT approx_count_distinct_accumulate_theta_wire(user) AS st
        FROM (SELECT concat('user-', CAST(id + 800 AS STRING)) AS user
              FROM range(600))""").collect()
    spark.createDataFrame(
        [(bytearray(bytes(et.st)), bytearray(java_theta))],
        "a binary, b binary").createOrReplaceTempView("theta_pair")
    (t,) = spark.sql("""
        SELECT approx_set_intersection(a, b) AS common,
               approx_set_jaccard(a, b) AS j FROM theta_pair""").collect()
    # engine side holds user-800..1399, java side user-400..1099
    print(f"Cross-origin Theta: |A∩B|={t.common} (true 300), "
          f"jaccard={t.j:.4f} (true {300/1000:.4f})")
    spark.stop()


if __name__ == "__main__":
    main()
