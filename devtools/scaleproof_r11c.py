#!/usr/bin/env python
"""Round-11 third-wave scale proof: ``dsir_weights``, the BPE
lifecycle, ``dedup_lines`` and ``mine_hard_negatives`` at x1 and x10
corpus scale (the ``.scaleproof`` fixtures; scaleproof_r11.py
methodology — one SparkSession per measurement, shuffle-write bytes
from the event log; a linear operator grows ~10x between the points).

HISTORICAL NOTE (round 13): several ops here end in a bare
.count(), which lets Catalyst prune computed columns and measure
the wrong plan (the r12 domain_curation FLAT artifact). The
hazard-class ops were re-measured with consumed outputs in
devtools/scaleproof_r13.py, whose runner REFUSES bare counts —
use that file for new proofs; this one is kept as the original
record.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from devtools.scaleproof_r11 import run_op  # noqa: E402


def op_dsir(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import dsir_weights
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    return dsir_weights(docs, "doc_id", "text",
                        F.col("lang") == "en", buckets=256).count()


def op_bpe(spark, d):
    from datasketches_spark_spark.operators import bpe_encode, train_bpe
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    merges = train_bpe(docs, "text", num_merges=60)
    return bpe_encode(docs, "doc_id", "text", merges).count()


def op_lines(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import dedup_lines
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    # synthetic line structure: 12-token segments (the demo-gate shape)
    toks = F.split(F.col("text"), " ")
    n = F.ceil(F.size(toks) / F.lit(12.0)).cast("int")
    seg = docs.select("doc_id", F.array_join(F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " ")),
        "\n").alias("t"))
    return dedup_lines(seg, "doc_id", "t").count()


def op_hardneg(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import mine_hard_negatives
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    qs = [("q1", "spark window merge"), ("q2", "customer order join"),
          ("q3", "stream filter vector hash")]
    pos = None
    for i, (qid, _) in enumerate(qs):
        p = (docs.where(F.col("doc_id") % 97 == i)
             .select(F.lit(qid).alias("query_id"), "doc_id"))
        pos = p if pos is None else pos.unionByName(p)
    return mine_hard_negatives(docs, "doc_id", "text", qs, pos,
                               k=10).count()


def main():
    for op, fn in [("dsir_weights", op_dsir),
                   ("bpe_train_encode", op_bpe),
                   ("dedup_lines", op_lines),
                   ("hard_negatives", op_hardneg)]:
        for scale in ("x1", "x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
