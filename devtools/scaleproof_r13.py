#!/usr/bin/env python
"""Round-13 scale proofs: the pruning-hazard re-audit.

The r12 verdict proved that a scale proof ending in a bare ``.count()``
can measure the WRONG plan: Catalyst prunes computed columns nobody
consumes (the domain_stats ``countDistinct`` vanished under
``.count()``, recording a FLAT shuffle for a plan that actually grows
linearly). This runner REFUSES bare counts: every op must return
``consume(df, *cols)`` — a checksum aggregate (``sum(xxhash64(...))``)
over the operator's computed output columns, which forces every one of
them through the executed plan — plus the row count. Ops whose output
ROWS already depend on the computed columns (filters, top-k, dedup
drops) are safe with counts, but they go through ``consume`` anyway so
the convention has no exceptions.

Re-measured here (hazard class — prior rows in doubt):
  pack_sequences, aodwire_agg, session_summaries   (r11 bare counts)
  bigram_lm, dsir, bpe_encode                      (r11b/c bare counts)
  trigram_lm, nb_classifier, bloomwire_grouped_agg (r12 bare counts)
  domain_stats exact vs theta                      (r12 verdict finding)
plus the new rows:
  domain_stats_exact   — expected ~linear shuffle (the exactness floor)
  domain_stats_theta   — expected ~flat (state-carrying exchange)
  cap_per_domain_skew  — one mega-domain holding ~50% of docs; the
                         partial WindowGroupLimit must keep the
                         exchange O(cap x partitions), not O(docs)

Methodology unchanged from devtools/scaleproof.py: one SparkSession per
measurement, shuffle-write bytes from the event log, x1 vs x10 fixtures
(.scaleproof/, devtools/gen_scaleproof.py).
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


def consume(df, *cols):
    """Aggregate a layout-independent checksum over ``cols`` — every
    listed column is forced through the executed plan (Catalyst cannot
    prune what the final aggregate reads), and ``sum`` is insensitive
    to row order. Returns the dict the runner requires."""
    from pyspark.sql import functions as F
    if not cols:
        raise ValueError("consume() needs the computed columns")
    row = df.agg(
        F.sum(F.xxhash64(*[F.col(c) for c in cols])
              .cast("decimal(38,0)")).alias("inv"),
        F.count(F.lit(1)).alias("rows")).collect()[0]
    return {"rows": int(row["rows"]),
            "invariant": int(row["inv"]) if row["inv"] is not None else 0}


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
    res = fn(spark, scale_dir)
    wall = time.perf_counter() - t0
    spark.stop()
    if not (isinstance(res, dict) and "invariant" in res and "rows" in res):
        raise TypeError(
            f"{name}: scale proofs must return consume(df, *computed_cols)"
            " — a bare count lets Catalyst prune the computed columns and"
            " measure the wrong plan (the r12 domain_stats artifact)")
    time.sleep(1.0)
    shuf, inp = shuffle_bytes_from_eventlog(log_dir)
    print(json.dumps({"op": name, "scale": os.path.basename(scale_dir),
                      "wall_s": round(wall, 2), "rows": res["rows"],
                      "invariant": res["invariant"],
                      "shuffle_mb": round(shuf / 1e6, 2),
                      "input_mb": round(inp / 1e6, 2)}), flush=True)


# ---------------------------------------------------------------- r13 rows

def op_domain_stats_exact(spark, d):
    from datasketches_spark_spark.operators import domain_stats
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    stats = domain_stats(docs, "source", "doc_id", "text")
    return consume(stats, "n_docs", "n_unique", "n_tokens", "pass_frac")


def op_domain_stats_theta(spark, d):
    # ndv_k=256 so the per-domain states SATURATE at fixture scale:
    # theta states grow with NDV only until k (the sub-k exact regime —
    # at default k=4096 the x1/x10 fixtures sit entirely below it and
    # the measurement would show the ramp, not the plateau). The scale
    # claim is O(domains x min(NDV, k)) per partition; production keys
    # saturate k, so the plateau is the honest 100 TB shape.
    from datasketches_spark_spark.operators import domain_stats
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    stats = domain_stats(docs, "source", "doc_id", "text", ndv="theta",
                         ndv_k=256)
    return consume(stats, "n_docs", "n_unique", "n_tokens", "pass_frac")


def op_domain_curation(spark, d):
    # the r12 end-to-end row, corrected: the drop list now includes a
    # dup_frac rule so the NDV genuinely feeds the pipeline, and the
    # capped output is consumed (id + order key), not bare-counted
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import (
        cap_per_domain, domain_drop_list, domain_stats, filter_by_domain)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    stats = domain_stats(docs, "source", "doc_id", "text", ndv="theta",
                         ndv_k=256)  # saturate at fixture scale (see above)
    drops = domain_drop_list(stats, blocklist=("src2",),
                             min_pass_frac=0.05, max_dup_frac=0.98)
    kept = filter_by_domain(docs, "source", drops)
    capped = cap_per_domain(kept, "source", 100,
                            [F.col("n_chars").desc(), "doc_id"])
    return consume(capped, "doc_id", "n_chars")


def op_cap_skew(spark, d):
    # stretch: one mega-domain holds ~50% of docs; the partial
    # WindowGroupLimit below the exchange must bound the shuffle by
    # O(cap x partitions) regardless of the skew
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import cap_per_domain
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    skewed = docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, F.lit("megahost"))
                   .otherwise(F.col("source")))
    capped = cap_per_domain(skewed, "source", 100,
                            [F.col("n_chars").desc(), "doc_id"])
    return consume(capped, "doc_id", "source", "n_chars")


def op_pack(spark, d):
    from datasketches_spark_spark.functions.text import token_count
    from datasketches_spark_spark.operators import pack_sequences
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    sized = docs.select("doc_id", token_count("text").alias("n_tokens"))
    out = pack_sequences(sized, 2048)
    return consume(out, "seq_id", "piece_start", "piece_end", "seq_offset")


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
    return consume(out, "e")


def op_sessions(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.streaming import session_summaries
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    ev = docs.select(
        F.col("lang").alias("k"), F.col("doc_id").alias("u"),
        F.col("doc_id").cast("double").alias("v"),
        F.timestamp_millis(
            (F.col("doc_id") % 99991) * 40_000
            + (F.col("doc_id") % 37) * 60_000).alias("ts"))
    out = session_summaries(ev, ["k"], ("u", "v"), "ts", "30 minutes",
                            family="tuple")
    return consume(out, *[c for c in out.columns if c != "k"])


def op_bigram_lm(spark, d):
    from datasketches_spark_spark.operators import (
        perplexity_score, train_bigram_lm)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    uni, bi = train_bigram_lm(docs, "text")
    out = perplexity_score(docs, "doc_id", "text", uni, bi)
    return consume(out, "avg_nll", "ppl", "n_oov_terms")


def op_trigram(spark, d):
    from datasketches_spark_spark.operators import (
        perplexity_score_trigram, train_trigram_lm)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    uni, bi, tri = train_trigram_lm(docs, "text")
    out = perplexity_score_trigram(docs, "doc_id", "text", uni, bi, tri)
    return consume(out, "avg_nll", "ppl")


def op_nb_classifier(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import (
        score_token_classifier, train_token_classifier)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    wts, model = train_token_classifier(docs, "text",
                                        F.col("lang") == "en")
    out = score_token_classifier(docs, "doc_id", "text", wts, model)
    return consume(out, "score_micro", "pred")


def op_dsir(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import dsir_weights
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    out = dsir_weights(docs, "doc_id", "text",
                       F.col("lang") == "en", buckets=256)
    return consume(out, "log_w", "score", "n_pos")


def op_bpe(spark, d):
    from datasketches_spark_spark.operators import bpe_encode, train_bpe
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    merges = train_bpe(docs, "text", num_merges=50)
    out = bpe_encode(docs, "doc_id", "text", merges)
    return consume(out, "n_tokens", "tokens")


def op_bloomwire_agg(spark, d):
    from datasketches_spark_spark.operators import sketch_accumulate
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    out = sketch_accumulate(docs, ["lang"], "doc_id",
                            family="bloomwire", expected_items=100_000,
                            fpp=0.01, item_type="long")
    return consume(out, "state")


OPS = [("domain_stats_exact", op_domain_stats_exact),
       ("domain_stats_theta", op_domain_stats_theta),
       ("domain_curation", op_domain_curation),
       ("cap_per_domain_skew", op_cap_skew),
       ("pack_sequences", op_pack),
       ("aodwire_agg", op_aodwire),
       ("session_summaries", op_sessions),
       ("bigram_lm_score", op_bigram_lm),
       ("trigram_lm_score", op_trigram),
       ("nb_classifier", op_nb_classifier),
       ("dsir_weights", op_dsir),
       ("bpe_encode", op_bpe),
       ("bloomwire_grouped_agg", op_bloomwire_agg)]


def main():
    only = set(sys.argv[1:])
    for op, fn in OPS:
        if only and op not in only:
            continue
        for scale in ("x1", "x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
