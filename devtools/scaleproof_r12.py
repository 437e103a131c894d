#!/usr/bin/env python
"""Round-12 scale proof: Bloom prefilter dedup, domain curation,
trigram LM scoring, the Gopher rule filter, and the NB classifier at
x1 and x10 corpus scale (the ``.scaleproof`` fixtures; methodology of
``devtools/scaleproof.py`` — one SparkSession per measurement,
shuffle-write bytes from the event log; a linear operator grows ~10x
between the points, a broadcast/scan-stage operator stays flat).

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


def op_bloom_prefilter(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import bloom_prefilter_match
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    # incoming: half carry-over (re-keyed corpus docs), half new
    carry = (corpus.where(F.col("doc_id") % 20 == 1)
             .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                     "text"))
    fresh = (docs.where(F.col("doc_id") % 10 == 0)
             .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                     F.concat("text", F.lit(" NEW")).alias("text")))
    return bloom_prefilter_match(carry.unionByName(fresh), corpus,
                                 "doc_id", text_col="text").count()


def op_domain_curation(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import (
        cap_per_domain, domain_drop_list, domain_stats, filter_by_domain)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    stats = domain_stats(docs, "source", "doc_id", "text")
    drops = domain_drop_list(stats, blocklist=("src2",),
                             min_pass_frac=0.05)
    kept = filter_by_domain(docs, "source", drops)
    return cap_per_domain(kept, "source", 100,
                          [F.col("n_chars").desc(), "doc_id"]).count()


def op_trigram(spark, d):
    from datasketches_spark_spark.operators import (
        perplexity_score_trigram, train_trigram_lm)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    uni, bi, tri = train_trigram_lm(docs, "text")
    return perplexity_score_trigram(docs, "doc_id", "text",
                                    uni, bi, tri).count()


def op_gopher(spark, d):
    from datasketches_spark_spark.functions.quality_rules import (
        filter_gopher)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    return filter_gopher(docs, "text", min_words=20).count()


def op_nb_classifier(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import (
        score_token_classifier, train_token_classifier)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    wts, model = train_token_classifier(docs, "text",
                                        F.col("lang") == "en")
    return score_token_classifier(docs, "doc_id", "text",
                                  wts, model).count()


def op_global_shuffle(spark, d):
    # sum(shuffle_pos) forces every position through the plan — a bare
    # count() lets Catalyst prune the window/join entirely
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import global_shuffle
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    out = global_shuffle(docs.select("doc_id"), "doc_id", seed=1)
    n = out.count()
    assert out.agg(F.sum("shuffle_pos")).collect()[0][0] == \
        n * (n - 1) // 2
    return n


def op_bloomwire_agg(spark, d):
    from datasketches_spark_spark.operators import sketch_accumulate
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    return sketch_accumulate(docs, ["lang"], "doc_id",
                             family="bloomwire", expected_items=100_000,
                             fpp=0.01, item_type="long").count()


def main():
    for op, fn in [("bloom_prefilter_match", op_bloom_prefilter),
                   ("domain_curation", op_domain_curation),
                   ("trigram_lm_score", op_trigram),
                   ("gopher_filter", op_gopher),
                   ("nb_classifier", op_nb_classifier),
                   ("global_shuffle", op_global_shuffle),
                   ("bloomwire_grouped_agg", op_bloomwire_agg)]:
        for scale in ("x1", "x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
