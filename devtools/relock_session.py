#!/usr/bin/env python
"""One isolated perf-lock session (BASELINE.md three-session
protocol, r18 episode-filter revision).

Usage: ``python devtools/relock_session.py q42_ngram_jaccard_dedup
q36_streaming_dedup`` — starts a fresh local[32] session at sf0.1
(bench.py's exact warmup), runs the three control queries best-of-3,
then each named query best-of-3, and prints ONE JSON line::

    {"controls": {...}, "control_factor": 1.12, "contended": false,
     "queries": {...}}

``control_factor`` is the median control ratio vs
ENGINE_BASELINE.json. The r18 rule (r17 verdict "What's wrong" #3): a
session whose controls read **> 1.5x** is CONTENDED — discard it and
run a replacement session, so a host-I/O episode can never inflate a
lock (the old worst/1.9 guard merely damped it). Lock formula over
the surviving sessions' best-of-3 values stays
``max(best, worst/1.9, 0.25)``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from datasketches_spark_spark.sources import session_builder  # noqa: E402

_CONTROLS = ["q01_percentile_by_flag", "q07_ndv_hll", "q20_textstats"]


def _best_of_3(fn, spark, sf_dir) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    targets = sys.argv[1:]
    if not targets:
        raise SystemExit("usage: relock_session.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "ENGINE_BASELINE.json")) as f:
        base_q = json.load(f)["queries"]

    spark = (session_builder(master=f"local[{cpus}]",
                             shuffle_partitions=cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import datasketches_spark_spark.operators  # noqa: F401
        import datasketches_spark_spark.sketches  # noqa: F401
        yield from batches

    warm = spark.range(cpus * 10).repartition(cpus)
    warm.mapInPandas(_warm, warm.schema).selectExpr("count(*)").collect()

    qs = entrymod.queries()
    controls = {c: _best_of_3(qs[c], spark, sf_dir) for c in _CONTROLS}
    ratios = sorted(controls[c] / base_q[c] for c in _CONTROLS
                    if base_q.get(c, 0) > 0)
    cf = ratios[len(ratios) // 2] if ratios else 1.0
    out = {"controls": controls, "control_factor": round(cf, 3),
           "contended": cf > 1.5,
           "queries": {t: _best_of_3(qs[t], spark, sf_dir)
                       for t in targets}}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
