#!/usr/bin/env python
"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage: python devtools/capture_plans.py <tag> [query substr ...]

Writes plans/<tag>/<query>_{suffix}.txt where suffix comes from
$PLAN_SUFFIX (default 'before'). Queries whose construction itself runs
jobs (streaming, index builds) still work — we only ask the returned
DataFrame for its plan, not its rows.
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datasketches_spark_spark.sources import session_builder  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r18"
    only = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = (session_builder(master=f"local[{cpus}]",
                             shuffle_partitions=cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in entrymod.queries().items():
        if only and not any(s in name for s in only):
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
