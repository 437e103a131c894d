#!/usr/bin/env python
"""Per-trigger StreamingQueryProgress triage for the streaming queries
(q24/q36/q58/q66) — the r17 q58 protocol, reusable. Runs the query's
exact body (warm run first), then dumps each progress event's
durationMs breakdown (addBatch / walCommit / commitOffsets /
stateOperators commit times) so 'slow stream' decomposes into
scheduling vs state-store vs python-fold cost.

    python devtools/profile_stream.py q58 [q24 ...]
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

_PROGRESS: list = []


def _install_listener(spark) -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            _PROGRESS.clear()

        def onQueryProgress(self, event):
            _PROGRESS.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (session_builder(master=f"local[{cpus}]",
                             shuffle_partitions=cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    _install_listener(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import datasketches_spark_spark.operators  # noqa: F401
        import datasketches_spark_spark.sketches  # noqa: F401
        yield from batches

    warm = spark.range(cpus * 10).repartition(cpus)
    warm.mapInPandas(_warm, warm.schema).selectExpr("count(*)").collect()

    qs = entrymod.queries()
    for pat in sys.argv[1:]:
        for name, fn in qs.items():
            if pat not in name:
                continue
            fn(spark, sf_dir).collect()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            print(f"\n=== {name}: wall {wall:.2f}s, "
                  f"{len(_PROGRESS)} progress events ===")
            for ev in list(_PROGRESS):
                d = ev.get("durationMs", {})
                so = ev.get("stateOperators", [])
                st = {k: so[0].get(k) for k in
                      ("commitTimeMs", "timeTakenToUpdateNumRows",
                       "numRowsTotal", "numRowsUpdated")} if so else {}
                print(json.dumps({
                    "batchId": ev.get("batchId"),
                    "numInputRows": ev.get("numInputRows"),
                    "durationMs": d,
                    "state": st,
                }, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
