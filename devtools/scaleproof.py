#!/usr/bin/env python
"""Scale-proof runner for the quadratic-risk (pair-generation) operators.

Runs q15 (MinHash-LSH), q42 (n-gram Jaccard), q43 (dedup graph), q18
(RHP embedding near-dup) and q54 (IVF index) on the two generated
fixture sets (``devtools/gen_scaleproof.py``: x1 = sf0.1 shape, x10 =
sf1 shape, same distributions, same planted near-dup rate) and records
wall seconds, OUTPUT rows, and TOTAL SHUFFLE WRITE BYTES (parsed from
the Spark event log — task-level Shuffle Bytes Written summed across
every job the query ran).

A linear operator grows ~10x in rows/bytes between x1 and x10; an
accidental all-pairs operator grows ~100x. Each query runs in its OWN
SparkSession so event logs and JVM state cannot bleed between
measurements. Results print as one JSON line per (query, scale); paste
the table into BASELINE.md.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUERIES = ["q15_dedup_minhash", "q42_ngram_jaccard_dedup",
           "q43_dedup_graph", "q18_embedding_neardup",
           "q54_ivf_index_query"]


def shuffle_bytes_from_eventlog(log_dir: str) -> tuple[int, int]:
    """(shuffle_write_bytes, input_bytes) summed over all task ends in
    every event log under ``log_dir``."""
    write = inp = 0
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths += [os.path.join(root, f) for f in files]
    for path in paths:
        opener = gzip.open if path.endswith(".gz") else open
        try:
            with opener(path, "rt", errors="replace") as fh:
                for line in fh:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    ev = json.loads(line)
                    tm = ev.get("Task Metrics") or {}
                    sw = tm.get("Shuffle Write Metrics") or {}
                    write += int(sw.get("Shuffle Bytes Written", 0))
                    im = tm.get("Input Metrics") or {}
                    inp += int(im.get("Bytes Read", 0))
        except Exception:
            pass
    return write, inp


def run_one(qname: str, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod
    log_dir = tempfile.mkdtemp(prefix="dss_scaleproof_log_")
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.dir", f"file://{log_dir}")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import datasketches_spark_spark as dss
        dss.install(spark)
        fn = entrymod.queries()[qname]
        t0 = time.time()
        rows = len(fn(spark, sf_dir).collect())
        wall = time.time() - t0
    finally:
        spark.stop()
    time.sleep(1.0)  # let the event log flush+close
    sw, inp = shuffle_bytes_from_eventlog(log_dir)
    return {"query": qname, "sf_dir": os.path.basename(sf_dir),
            "wall_s": round(wall, 2), "out_rows": rows,
            "shuffle_write_mb": round(sw / 1e6, 2),
            "input_mb": round(inp / 1e6, 2)}


def main():
    base = os.path.join(HERE, ".scaleproof")
    results = []
    only = set(sys.argv[1:])
    for q in QUERIES:
        if only and q not in only:
            continue
        for tag in ("x1", "x10"):
            r = run_one(q, os.path.join(base, tag))
            results.append(r)
            print(json.dumps(r), flush=True)
    by_q = {}
    for r in results:
        by_q.setdefault(r["query"], {})[r["sf_dir"]] = r
    for q, d in by_q.items():
        if "x1" in d and "x10" in d:
            a, b = d["x1"], d["x10"]
            print(json.dumps({
                "query": q,
                "wall_ratio": round(b["wall_s"] / max(a["wall_s"], 1e-9), 2),
                "rows_ratio": round(b["out_rows"] / max(a["out_rows"], 1), 2),
                "shuffle_ratio": round(
                    b["shuffle_write_mb"]
                    / max(a["shuffle_write_mb"], 1e-9), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
