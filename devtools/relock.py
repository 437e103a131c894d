#!/usr/bin/env python
"""Re-lock bench timings for changed queries under the standard
protocol (BASELINE.md): three ISOLATED sessions, best-of-3 within each
session, lock = max(best_of_session_bests, worst_session_best / 1.9,
0.25). Run with the bench conditions (sf0.1, local[32]).

Always calibrate first: pass ``--calibrate qXX qYY`` with queries whose
code did NOT change this round; if their measured/lock ratios are far
from 1.0 the box is hot/cold and locks taken now would mislead.

Usage:
  python devtools/relock.py [--sf-dir DIR] [--calibrate qA qB] qNN ...
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _session():
    from datasketches_spark_spark.sources import session_builder
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (session_builder(master=f"local[{cpus}]",
                             shuffle_partitions=int(cpus))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _best_of_3(spark, fn, sf_dir):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i:i + 2]
    calib = []
    if "--calibrate" in argv:
        i = argv.index("--calibrate")
        j = i + 1
        while j < len(argv) and not argv[j].startswith("--"):
            calib.append(argv[j])
            j += 1
        del argv[i:j]
    names = argv
    if not names:
        print("no queries given", file=sys.stderr)
        sys.exit(2)

    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    base = {}
    bp = os.path.join(HERE, "ENGINE_BASELINE.json")
    if os.path.exists(bp):
        b = json.load(open(bp))
        base = (b.get("parsed") or b).get("queries", {})

    # session 1 does calibration + first measurement of each target;
    # sessions 2 and 3 re-measure targets in fresh JVM-free sessions
    # (getOrCreate after stop() rebuilds the context).
    results = {n: [] for n in names}
    for s in range(3):
        spark = _session()
        if s == 0:
            for c in calib:
                t = _best_of_3(spark, queries[c], sf_dir)
                lock = base.get(c)
                ratio = (t / lock) if lock else float("nan")
                print(f"calibrate {c}: {t:.3f}s vs lock {lock} "
                      f"(ratio {ratio:.2f})")
        for n in names:
            results[n].append(_best_of_3(spark, queries[n], sf_dir))
        spark.stop()

    for n in names:
        r = results[n]
        lock = max(min(r), max(r) / 1.9, 0.25)
        print(f"{n}: sessions {r[0]:.3f} / {r[1]:.3f} / {r[2]:.3f} "
              f"-> lock {lock:.3f} (old {base.get(n)})")


if __name__ == "__main__":
    main()
