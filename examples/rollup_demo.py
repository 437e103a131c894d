#!/usr/bin/env python
"""Managed sketch-rollup lifecycle on the fixture events table.

The serving pattern for 100 TB: accumulate once into a per-bucket state
table, then build, refresh, re-group, and compact WITHOUT ever
rescanning raw data.

Run: python examples/rollup_demo.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from datasketches_spark_spark.operators import SketchRollup  # noqa: E402
from datasketches_spark_spark.operators.sketch_agg import (  # noqa: E402
    distinct_measure, percentile_measure)
from datasketches_spark_spark.sources import (  # noqa: E402
    read_table, session_builder)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (session_builder(master="local[8]", shuffle_partitions=8)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type", "value", "user_id")

    roll = SketchRollup(
        tempfile.mkdtemp(prefix="dss_rollup_demo_"),
        ["day", "event_type"],
        [percentile_measure("p50_value", "value", 0.5,
                            impl="MERGEABLE", k=262_144),
         distinct_measure("ndv_users", "user_id", k=16_384)])

    # [1] build from January week 1-2 — the only scan of that raw data
    roll.build(ev.where(F.col("day") < "2024-01-15"))
    print(f"[1] built: {roll.states(spark).count()} state rows")

    # [2] new data arrives: refresh appends partial states, nothing is
    # reprocessed
    roll.refresh(ev.where(F.col("day") >= "2024-01-15"))
    print(f"[2] refreshed: {roll.states(spark).count()} state rows")

    # [3] answer a question the rollup was never specifically built for:
    # per-type stats over a window SPANNING the refresh boundary,
    # re-grouping day-level states at read time
    win = (F.col("day") >= "2024-01-08") & (F.col("day") < "2024-01-22")
    print("[3] window query (Jan 08-22), day states re-grouped by type:")
    for r in (roll.estimate(spark, where=win, group_by=["event_type"])
              .orderBy("event_type").collect()):
        print(f"      {r.event_type}: p50={r.p50_value:.2f} "
              f"ndv_users={r.ndv_users}")

    # [4] compact the appended partials back to one row per group
    roll.compact(spark)
    print(f"[4] compacted: {roll.states(spark).count()} state rows")
    spark.stop()


if __name__ == "__main__":
    main()
