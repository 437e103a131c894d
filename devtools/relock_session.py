#!/usr/bin/env python
"""One isolated perf-lock session (BASELINE.md three-session
protocol, r18 episode-filter revision).

Usage: ``python devtools/relock_session.py q42_ngram_jaccard_dedup``
— fresh local[32] session at sf0.1 (bench.py's exact warmup), the
three control queries best-of-3 BEFORE and AFTER the targets, each
target best-of-3, one JSON line out.

The r18 rule (r17 verdict "What's wrong" #3): a session whose
control factor reads **> 1.5x** is CONTENDED — discard it and run a
replacement, so a host-I/O episode can never inflate a lock (the old
worst/1.9 guard merely damped it). Two r18 calibration findings
baked in:

* Control baselines are SOLO-SESSION floors (min over >= 7 isolated
  sessions, 2026-08-16), NOT bench.py's mid-sweep numbers — the
  bench sweep runs controls with a far warmer JVM, so q07/q20 there
  read ~1.6x faster and every lock session would look contended.
* Controls bracket the targets (pre AND post medians, factor = the
  worse one): an episode striking mid-session hits the post set even
  when the pre set was clean.

Lock formula over surviving sessions' best-of-3 values stays
``max(best, worst/1.9, 0.25)``. Zero targets = a controls-only
calibration session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entrymod  # noqa: E402
from datasketches_spark_spark.sources import session_builder  # noqa: E402

# solo-session floors, min over 7 isolated sessions (see module doc)
_CONTROLS = {"q01_percentile_by_flag": 1.476,
             "q07_ndv_hll": 0.386,
             "q20_textstats": 1.076}


def _best_of_3(fn, spark, sf_dir) -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _control_factor(vals: dict) -> float:
    ratios = sorted(vals[c] / b for c, b in _CONTROLS.items())
    return round(ratios[len(ratios) // 2], 3)


def main() -> None:
    targets = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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
    pre = {c: _best_of_3(qs[c], spark, sf_dir) for c in _CONTROLS}
    res = {t: _best_of_3(qs[t], spark, sf_dir) for t in targets}
    post = {c: _best_of_3(qs[c], spark, sf_dir) for c in _CONTROLS}
    cf = max(_control_factor(pre), _control_factor(post))
    spark.stop()
    print(json.dumps({
        "controls_pre": pre, "controls_post": post,
        "control_factor": cf, "contended": cf > 1.5,
        "queries": res}))


if __name__ == "__main__":
    main()
