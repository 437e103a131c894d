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

    # 2b. rule-suite audit + domain curation (round 12): the published
    # Gopher/C4 thresholds per doc, then source-level stats -> drop
    # rules -> per-source cap (the C4/RefinedWeb stage)
    from datasketches_spark_spark.functions.quality_rules import (
        gopher_flags, gopher_struct)
    gs = gated.withColumn("_g", gopher_struct(F.col("text")))
    gf = gopher_flags(F.col("_g"))
    n_pass = gs.where(gf["passes"]).count()
    print(f"[1b] Gopher/C4 rule suite: {n_pass}/{n1} docs pass all "
          f"8 published rules (audit only at this corpus size)")
    from datasketches_spark_spark.operators import (
        cap_per_domain, domain_drop_list, domain_stats, filter_by_domain)
    stats = domain_stats(gated, "source", "doc_id", "text")
    drops = domain_drop_list(stats, max_dup_frac=0.5, min_docs=2)
    gated = cap_per_domain(
        filter_by_domain(gated, "source", drops), "source", 1000,
        [F.col("n_chars").desc(), F.col("doc_id")])
    n1b = gated.count()
    print(f"[1c] after domain curation (dup/min-size rules, 1000-doc "
          f"source cap): {n1b} docs (-{n1 - n1b})")

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

    # 4a'. incremental recrawl (round 12): simulate the NEXT snapshot
    # arriving — the whole raw corpus again. The Bloom prefilter answers
    # "which incoming docs did we already keep?" from one broadcastable
    # constant-size state (no shuffle of the kept corpus), exactly.
    from datasketches_spark_spark.operators import bloom_prefilter_match
    recrawl = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                          "text")
    carried = bloom_prefilter_match(recrawl, deduped, "doc_id",
                                    text_col="text", fpp=0.001).count()
    print(f"[3a] recrawl simulation: {carried}/{n0} incoming docs are "
          f"exact carry-over (Bloom prefilter + exact verify; the "
          f"near-dup machinery only sees the remainder)")

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

    # 4d. interpolated trigram LM (round 12): the higher-order scorer;
    # its tails tighten vs the bigram on in-domain text
    from datasketches_spark_spark.operators import (
        perplexity_score_trigram, train_trigram_lm)
    u3, b3, t3 = train_trigram_lm(deduped, "text")
    p3 = (perplexity_score_trigram(deduped, "doc_id", "text", u3, b3, t3)
          .agg(dsf.approx_percentile_ex("ppl", 0.5).alias("p50"),
               dsf.approx_percentile_ex("ppl", 0.95).alias("p95")).first())
    print(f"[3d] trigram (JM-interpolated) perplexity p50 {p3.p50:.1f} "
          f"/ p95 {p3.p95:.1f}")

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

    # 6b. epoch-1 training order (round 12): deterministic global
    # shuffle — reproducible across runs/engines, no global sort
    from datasketches_spark_spark.operators import (epoch_seed,
                                                    global_shuffle)
    ordered = global_shuffle(mix, "doc_id", seed=epoch_seed(42, 1))
    head = (ordered.orderBy("shuffle_pos").limit(3)
            .select("doc_id", "shuffle_pos").collect())
    print("[5b] epoch-1 order head:",
          [(r.doc_id, r.shuffle_pos) for r in head])

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
