#!/usr/bin/env python
"""Seed ENGINE_BASELINE.json entries for newly added queries.

Same protocol as the v2 lock (see BASELINE.md): warm local[32] session,
three isolated timed runs per query, lock = max(best, worst/1.9). Only
queries NOT already in the baseline are seeded; existing locks are never
rewritten. Usage: python devtools/seed_baseline.py [qname ...]
"""
import json
import sys
import time

import __spark_entry__ as entrymod
from datasketches_spark_spark.sources import session_builder

BASE = "ENGINE_BASELINE.json"
SF_DIR = "/root/testdata/sf0.1"


def main():
    base = json.load(open(BASE))
    qs = entrymod.queries()
    targets = sys.argv[1:] or [n for n in qs if n not in base["queries"]]
    targets = [n for n in targets if n not in base["queries"]]
    if not targets:
        print("nothing to seed")
        return
    spark = (session_builder(master="local[32]", shuffle_partitions=32)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import datasketches_spark_spark.operators  # noqa: F401
        import datasketches_spark_spark.sketches  # noqa: F401
        yield from batches

    warm = spark.range(32 * 10).repartition(32)
    warm.mapInPandas(_warm, warm.schema).selectExpr("count(*)").collect()

    for name in targets:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        lock = round(max(min(runs), max(runs) / 1.9), 3)
        base["queries"][name] = lock
        print(f"{name}: runs={runs} lock={lock}")
    base["value"] = round(sum(base["queries"].values()), 3)
    json.dump(base, open(BASE, "w"), indent=2)
    print("total locked:", base["value"])
    spark.stop()


if __name__ == "__main__":
    main()
