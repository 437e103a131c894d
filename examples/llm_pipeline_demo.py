#!/usr/bin/env python
"""End-to-end LLM training-data curation pipeline on the fixture corpus.

One pass through every curation stage the engine provides, in the order a
real 100 TB pipeline runs them — each stage is a pure DataFrame transform,
so the whole pipeline is ONE lazy plan family Catalyst can optimize:

1. PII redaction (regex chain, per-row);
2. language ID + quality scoring incl. Gopher repetition filters
   (pure Column expressions);
3. quality gate (drop low-quality / repetitive docs before any
   expensive stage);
4. exact dedup (content fingerprint groupBy);
5. near-dup removal: MinHash-LSH pairs -> connected components ->
   keep-longest drop list -> anti-join;
6. token-budget mix construction per language (greedy-prefix window);
7. corpus summary with sketch aggregates (NDV, percentiles, top sources).

Run: python examples/llm_pipeline_demo.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import datasketches_spark_spark as dss  # noqa: E402
from datasketches_spark_spark import functions as dsf  # noqa: E402
from datasketches_spark_spark.functions.redact import (  # noqa: E402
    redact_pii)
from datasketches_spark_spark.functions.text import (  # noqa: E402
    doc_fingerprint, lang_id, quality_features, repetition_fractions,
    repetition_struct, token_count)
from datasketches_spark_spark.operators import (
    pack_sequences,  # noqa: E402
    budget_select, dedup_drop_list, minhash_dedup_pairs)
from datasketches_spark_spark.sources import (  # noqa: E402
    read_table, session_builder)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (session_builder(master="local[8]", shuffle_partitions=8)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    dss.install(spark)

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"[0] raw corpus: {n0} docs")

    # 1. PII scrub first, so nothing downstream (dedup shingles, the mix,
    # the stored corpus) ever sees a raw address
    docs = docs.withColumn("text", redact_pii("text"))

    # 2-3. language ID + quality/repetition gate (everything JVM-side;
    # the repetition struct lands in a column so it evaluates once)
    q = quality_features("text")
    scored = docs.select(
        "*", lang_id("text").alias("lang_pred"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["mean_token_len"].alias("mean_token_len"),
        token_count("text").alias("toks"),
        repetition_struct("text").alias("rep"))
    rep = repetition_fractions(F.col("rep"))
    gated = (scored
             .withColumn("top_bigram_frac", rep["top_bigram_frac"])
             .where((F.col("toks") >= 5)
                    & (F.col("mean_token_len") < 20)
                    & (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
                       < 0.5))
             .drop("rep"))
    n1 = gated.count()
    print(f"[1] after quality+repetition gate: {n1} docs (-{n0 - n1})")

    # 3. exact dedup: keep the first doc of every identical-content group
    w_first = F.min("doc_id").over(Window.partitionBy("fp"))
    exact = (gated.withColumn("fp", doc_fingerprint("text"))
             .withColumn("keep", w_first)
             .where(F.col("doc_id") == F.col("keep"))
             .drop("fp", "keep"))
    n2 = exact.count()
    print(f"[2] after exact dedup: {n2} docs (-{n1 - n2})")

    # 4. near-dup removal: pairs -> components -> keep-longest -> anti-join
    pairs = minhash_dedup_pairs(exact, "doc_id", "text", threshold=0.5)
    drops = dedup_drop_list(exact, pairs, "doc_id", prefer_col="n_chars")
    deduped = exact.join(drops, "doc_id", "left_anti")
    n3 = deduped.count()
    print(f"[3] after near-dup removal: {n3} docs (-{n2 - n3})")

    # 4b. span-level duplication audit (round 11): how much text
    # survives doc-level dedup yet is still verbatim-duplicated across
    # documents (the Lee-et-al signal a span-removal pass would cut)
    from datasketches_spark_spark.operators import duplicated_spans
    sp = (duplicated_spans(deduped, "doc_id", "text", k=8, hash64=True)
          .agg(F.count("*").alias("spans"),
               F.sum(F.col("span_end") - F.col("span_start"))
               .alias("dup_toks")).first())
    print(f"[3b] residual duplicated spans: {sp.spans} spans, "
          f"{sp.dup_toks or 0} tokens")

    # 4c. LM quality scores (round 11): add-k bigram perplexity — the
    # CCNet-style filter; here just the distribution tails
    from datasketches_spark_spark.operators import (perplexity_score,
                                                    train_bigram_lm)
    uni, bi = train_bigram_lm(deduped, "text")
    ppl = perplexity_score(deduped, "doc_id", "text", uni, bi)
    pq = ppl.agg(dsf.approx_percentile_ex("ppl", 0.5).alias("p50"),
                 dsf.approx_percentile_ex("ppl", 0.95).alias("p95")).first()
    print(f"[3c] perplexity p50 {pq.p50:.1f} / p95 {pq.p95:.1f} "
          f"(filter threshold would sit between)")

    # 5. token-budget mix: largest docs per language, <= 5000 tokens each
    mix = budget_select(deduped, "toks", ["n_chars", "doc_id"], 5000,
                        strata_col="lang")
    print("[4] training mix per language:")
    for r in (mix.groupBy("lang")
              .agg(F.count("*").alias("docs"),
                   F.sum("toks").alias("tokens")).orderBy("lang").collect()):
        print(f"      {r.lang}: {r.docs} docs, {r.tokens} tokens")

    # 5b. temperature rebalancing (round 11): what a p^0.3 mixture
    # implies for sampling weights and per-language epochs at a 100k
    # token budget
    from datasketches_spark_spark.operators import mixture_weights
    print("[4b] p^0.3 mixture weights (100k-token budget):")
    for r in (mixture_weights(deduped, "lang", "toks", alpha=0.3,
                              budget=100_000).orderBy("lang").collect()):
        print(f"      {r.lang}: share {r.share:.3f} -> weight "
              f"{r.weight:.3f}, {r.epochs:.2f} epochs")

    # 6. sketch summary of the final mix — incl. the round-9 tuple
    # sketch: source-level NDV + per-source row/token predicates from
    # ONE state (no re-scan for the segment question)
    summary = mix.agg(
        dsf.approx_count_distinct_ex("source").alias("ndv_sources"),
        dsf.approx_percentile_ex("toks", 0.5).alias("p50_tokens"),
        dsf.approx_percentile_ex("toks", 0.95).alias("p95_tokens"),
        dsf.approx_tuple_segment_estimate(
            dsf.approx_tuple_accumulate("source", "toks"), 2)
        .alias("seg")).first()
    print(f"[5] mix summary: {summary.ndv_sources} distinct sources, "
          f"median {summary.p50_tokens:.0f} tokens, "
          f"p95 {summary.p95_tokens:.0f} tokens; "
          f"{summary.seg.keys} sources contribute >= 2 docs "
          f"({summary.seg.value_sum:.0f} tokens)")

    # 7. pack the mix into fixed 512-token training sequences (round 9:
    # distributed concat-and-chunk plan — each doc knows its sequence,
    # span and offset; the tokenize-and-write stage can now run
    # embarrassingly parallel)
    plan = pack_sequences(
        mix.select("doc_id", F.col("toks").alias("n_tokens")), 512)
    stats = plan.agg(
        F.countDistinct("seq_id").alias("seqs"),
        F.count("*").alias("pieces"),
        F.sum(F.col("piece_end") - F.col("piece_start")).alias("toks")
    ).first()
    print(f"[6] packed into {stats.seqs} sequences of 512 tokens "
          f"({stats.pieces} doc pieces, {stats.toks} tokens)")
    spark.stop()


if __name__ == "__main__":
    main()
