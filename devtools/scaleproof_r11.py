#!/usr/bin/env python
"""Round-11 scale proof: the operators added/redesigned this round —
layout-proof ``pack_sequences``, the ``aodwire`` two-phase aggregate,
and ``session_summaries``' batch path — measured at x1 and x10 corpus
scale (the ``.scaleproof`` fixtures) with wall seconds, output rows and
total shuffle-write bytes from the event log (the
``devtools/scaleproof.py`` methodology: one SparkSession per
measurement, linear operators grow ~10x between the points).

HISTORICAL NOTE (round 13): several ops here end in a bare
.count(), which lets Catalyst prune computed columns and measure
the wrong plan (the r12 domain_curation FLAT artifact). The
hazard-class ops were re-measured with consumed outputs in
devtools/scaleproof_r13.py, whose runner REFUSES bare counts —
use that file for new proofs; this one is kept as the original
record.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from devtools.scaleproof import shuffle_bytes_from_eventlog  # noqa: E402


def run_op(name, fn, scale_dir):
    from datasketches_spark_spark.sources import session_builder
    log_dir = tempfile.mkdtemp()
    spark = (session_builder(master="local[32]", shuffle_partitions=32)
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", log_dir)
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.compress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    rows = fn(spark, scale_dir)
    wall = time.perf_counter() - t0
    spark.stop()
    time.sleep(1.0)
    shuf, inp = shuffle_bytes_from_eventlog(log_dir)
    print(json.dumps({"op": name, "scale": os.path.basename(scale_dir),
                      "wall_s": round(wall, 2), "rows": rows,
                      "shuffle_mb": round(shuf / 1e6, 2),
                      "input_mb": round(inp / 1e6, 2)}), flush=True)


def op_pack(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions.text import token_count
    from datasketches_spark_spark.operators import pack_sequences
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    sized = docs.select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences(sized, 2048).count()


def op_aodwire(spark, d):
    import datasketches_spark_spark as dss
    dss.install(spark)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    docs.selectExpr("lang", "source", "length(text) AS n_chars") \
        .createOrReplaceTempView("documents")
    out = dss.sql(spark, """
        WITH s AS (
          SELECT lang, approx_tuple_accumulate_wire(source,
                   CAST(n_chars AS DOUBLE)) AS st
          FROM documents GROUP BY lang
        )
        SELECT lang, approx_tuple_estimate(st) AS e FROM s""")
    return out.count()


def op_sessions(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.streaming import session_summaries
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    # deterministic synthetic event times: one event per doc, ~40s apart
    # per lang, so ~2% of gaps exceed the 30-minute session gap
    ev = docs.select(
        F.col("lang").alias("k"), F.col("doc_id").alias("u"),
        F.col("doc_id").cast("double").alias("v"),
        F.timestamp_millis(
            (F.col("doc_id") % 99991) * 40_000
            + (F.col("doc_id") % 37) * 60_000).alias("ts"))
    out = session_summaries(ev, ["k"], ("u", "v"), "ts", "30 minutes",
                            family="tuple")
    return out.count()


def main():
    for op, fn in [("pack_sequences", op_pack),
                   ("aodwire_two_phase", op_aodwire),
                   ("session_summaries_batch", op_sessions)]:
        for scale in ("x1", "x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
