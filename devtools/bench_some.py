#!/usr/bin/env python
"""Time a subset of declared queries with bench.py's exact methodology
(same session config, same warmup, best-of-N) — the isolation tool the
optimization guide §1 asks for. Usage:

    python devtools/bench_some.py q55 q60 [--n 3] [--noop]

``--noop`` times ``df.write.format('noop')`` instead of ``collect()``
(guide §1.4) so sink/driver-transfer cost is excluded.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datasketches_spark_spark.sources import session_builder  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i:i + 2]
    noop = "--noop" in args
    args = [a for a in args if a != "--noop"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    out = {}
    for name, fn in qs.items():
        if args and not any(s in name for s in args):
            continue
        spark.sparkContext.setJobDescription(name)
        best, runs = None, []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"best": round(best, 3), "runs": runs}
        print(f"{name}: best {best:.3f}s  runs {runs}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
