#!/usr/bin/env python
"""Round-11 continuation scale proof: ``bm25_topk`` and
``duplicated_spans`` at x1 and x10 corpus scale (the ``.scaleproof``
fixtures; same methodology as scaleproof_r11.py — one SparkSession per
measurement, shuffle-write bytes from the event log; a linear operator
grows ~10x between the points).

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


def op_bm25(spark, d):
    from datasketches_spark_spark.operators import bm25_topk
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    qs = [("q1", "spark window merge"), ("q2", "customer order join"),
          ("q3", "stream filter vector hash")]
    return bm25_topk(docs, "doc_id", "text", qs, k=10).count()


def op_spans(spark, d):
    from datasketches_spark_spark.operators import duplicated_spans
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    # hash64: the production shuffle key (16 B); the exact-string form
    # is the oracle-gate variant and only changes key WIDTH, not row
    # counts or plan shape
    return duplicated_spans(docs, "doc_id", "text", k=8,
                            hash64=True).count()


def op_lm(spark, d):
    from datasketches_spark_spark.operators import (perplexity_score,
                                                    train_bigram_lm)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    uni, bi = train_bigram_lm(docs, "text")
    return perplexity_score(docs, "doc_id", "text", uni, bi).count()


def op_text_index(spark, d):
    import tempfile
    from datasketches_spark_spark.operators import (build_text_index,
                                                    query_text_index)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    path = tempfile.mkdtemp() + "/idx"
    build_text_index(docs, "doc_id", "text", path, num_buckets=16)
    qs = [("q1", "spark window merge"), ("q2", "customer order join")]
    return query_text_index(spark, path, qs, k=10).count()


def op_semdedup(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import semantic_dedup_drops
    emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    # k scales with sqrt(n) (the paper's cost model) so cluster sizes —
    # and the quadratic-in-cluster pair volume — stay bounded
    n = emb.count()
    k = max(8, int(n ** 0.5 / 2))
    cents = emb.orderBy("vec_id").limit(k)
    return semantic_dedup_drops(emb, cents, eps=0.95).count()


def main():
    for op, fn in [("bm25_topk", op_bm25),
                   ("duplicated_spans", op_spans),
                   ("bigram_lm_score", op_lm),
                   ("text_index_build_query", op_text_index),
                   ("semantic_dedup", op_semdedup)]:
        for scale in ("x1", "x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
