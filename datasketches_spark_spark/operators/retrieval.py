"""Lexical retrieval over a document corpus: distributed Okapi BM25.

A training-data pipeline uses lexical retrieval for targeted corpus
audits (which documents match a probe query), retrieval-based
decontamination (find near-verbatim benchmark hits that n-gram overlap
misses when tokenization differs), and quality-targeted sampling
(upweight documents matching seed queries).  The reference engine has
no retrieval surface; this module is extension-frontier, built
Spark-first.

Scale design (the 100 TB shape):

- The corpus token stream is pruned to QUERY terms map-side: the
  distinct query-term table is broadcast and the explode -> join runs
  inside one scan stage, so the only corpus-sized work is the scan
  itself.  Everything that shuffles afterwards is MATCH-bounded
  (rows <= matching docs x query terms), not corpus-bounded.
- Document frequencies are computed with a window over the term-grouped
  match table (one small exchange keyed by term) instead of a second
  aggregate branch — a join against a derived df table would re-execute
  the corpus scan (the q55 self-join lesson).
- Corpus size and average document length need their own pass (documents
  with zero matching terms still count toward N and avgdl); that pass is
  a column-pruned count/avg scan, the cheapest possible full pass.
- Top-k per query plans as WindowGroupLimit: each map task forwards at
  most k rows per query before the final exchange.

Scores are rounded to 6 decimals BEFORE ranking so that independent
engines (Spark, DuckDB) rank identically despite summation-order float
noise; ties break on ascending document id.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = ["bm25_topk", "build_text_index", "mine_hard_negatives",
           "query_text_index"]


def _spread(df: DataFrame, checkpoint: bool = False) -> DataFrame:
    """Round-robin a low-parallelism scan across the session's cores.

    The fixture tables are single parquet files, so the tokenize ->
    explode -> partial-aggregate chain otherwise runs as ONE task while
    the rest of the box idles (guide §2.5, input skew: one unsplittable
    input). A real-scale corpus scan already has at least
    ``defaultParallelism`` splits, in which case this is a no-op — the
    repartition only fires when the scan is narrower than the session's
    cores, and only tiny projected rows cross the exchange (callers
    project first).

    ``checkpoint=True`` additionally materializes the spread result so
    a MULTI-pass consumer (bm25's stats + match passes) does not pay
    the exchange once per pass; it only applies when the repartition
    actually fired, so a real-scale corpus is never checkpointed."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        out = df.repartition(par)
        return out.localCheckpoint() if checkpoint else out
    return df


def _query_terms(queries: Sequence[tuple[str, str]]) -> list[tuple[str, str]]:
    """(query_id, term) rows, distinct terms per query, driver-side.

    Queries are a user-supplied dimension (a handful of strings), so
    tokenizing them on the driver is bounded by construction.
    """
    rows = []
    for qid, qtext in queries:
        seen = dict.fromkeys(t for t in qtext.split(" ") if t)
        rows.extend((qid, t) for t in seen)
    if not rows:
        raise ValueError("bm25_topk: empty query set")
    return rows


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str | None,
    queries: Sequence[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is a sequence of ``(query_id, query_text)``; query text
    is whitespace-tokenized with duplicate terms dropped (binary query
    term frequency — the common BM25 simplification).  The idf is the
    non-negative variant ``ln(1 + (N - df + 0.5) / (df + 0.5))``.

    ``tokens_col`` (r18, guide §1.2/§2.4): the corpus is ALREADY
    tokenized — ``docs[tokens_col]`` holds the token array and
    ``text_col`` is ignored.  Callers that feed several corpus passes
    (bm25 + an index build + n-gram legs) tokenize once into a
    materialized column and share it, instead of re-splitting the
    corpus inside every consumer.  Values are identical by
    construction: the token arrays are the same ``tokenize`` output,
    just bound to a column instead of inlined per pass.

    Returns ``(query_id, doc_id, rank, score)`` with ``rank`` dense from
    1 per query, ordered by rounded score desc, then doc id.
    """
    spark = docs.sparkSession
    from ..sources import arrow_local_df
    qt = arrow_local_df(spark, _query_terms(queries),
                        "query_id string, term string")

    # Both passes tokenize the corpus; project to the two columns they
    # need and spread a too-narrow scan across the cores (r18, §2.5).
    # With tokens_col the projection is the pre-tokenized array and the
    # checkpoint is normally a no-op (the caller's materialized table
    # already spans the cores).
    if tokens_col is not None:
        src = _spread(docs.select(F.col(id_col).alias("doc_id"),
                                  F.col(tokens_col).alias("_tk")),
                      checkpoint=True)
        toks = F.col("_tk")
    else:
        src = _spread(docs.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias("_text")),
                      checkpoint=True)
        toks = tokenize("_text")

    # Pass 1 (corpus stats): zero-match documents still count toward N
    # and avgdl, so this cannot be derived from the match table.
    stats = src.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"))

    # Pass 2: tokenize -> explode -> broadcast-prune to query terms.
    # The join is map-side (BroadcastHashJoin), so no corpus row
    # survives to a shuffle unless it matches a query term.
    matched = (src
               .select("doc_id", toks.alias("_toks"))
               .select("doc_id", F.size("_toks").alias("dl"),
                       F.explode("_toks").alias("term"))
               .join(F.broadcast(qt.select("term").distinct()), "term"))

    tf = matched.groupBy("doc_id", "term", "dl").agg(
        F.count("*").alias("tf"))

    # Document frequency via a window over the (doc, term) table — one
    # exchange keyed on term over match-bounded rows, no second corpus
    # scan.  tf already holds one row per (doc, term), so a plain
    # count(*) is the distinct-document count.
    dfw = Window.partitionBy("term")
    tf = tf.withColumn("df", F.count("*").over(dfw))

    scored = (tf
              .join(F.broadcast(qt), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn(
                  "idf",
                  F.log(F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))))
              .withColumn(
                  "contrib",
                  F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                  / (F.col("tf")
                     + F.lit(k1) * (F.lit(1.0 - b)
                                    + F.lit(b) * F.col("dl")
                                    / F.col("avgdl"))))
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum("contrib"), round_digits).alias("score")))

    rw = (Window.partitionBy("query_id")
          .orderBy(F.desc("score"), F.asc("doc_id")))
    return (scored
            .withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score"))


def build_text_index(docs: DataFrame, id_col: str, text_col: str | None,
                     path: str, num_buckets: int = 64,
                     tokens_col: str | None = None) -> None:
    """Persist an inverted index for BM25 serving — the text analogue of
    the IVF index lifecycle (build once, partition-pruned probes, the
    corpus never rescans at query time).

    Layout under ``path``:

    - ``postings/`` — ``(term, doc_id, tf, dl, df)`` parquet
      partitioned by ``bucket = pmod(xxhash64(term), num_buckets)``, so
      a probe reads only the bucket directories its query terms hash
      into (static partition pruning, file-level). The per-term
      document frequency ``df`` is PRECOMPUTED at build time and
      denormalized onto each posting row (r18 — probes read it off the
      matched rows instead of joining a second table).
    - ``stats/`` — one row: corpus size and average document length.

    At 100 TB the build is one corpus scan + one (doc, term) aggregate —
    the same shuffle ``bm25_topk`` pays per query, paid once.

    ``tokens_col``: as in :func:`bm25_topk` — the corpus is already
    tokenized, ``text_col`` is ignored, and the build skips its own
    tokenize passes.
    """
    if tokens_col is not None:
        src = _spread(docs.select(F.col(id_col).alias("doc_id"),
                                  F.col(tokens_col).alias("_tk")),
                      checkpoint=True)
        toks = F.col("_tk")
    else:
        src = _spread(docs.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias("_text")),
                      checkpoint=True)
        toks = tokenize("_text")
    tf = (src.select("doc_id",
                     F.size(toks).alias("dl"),
                     F.explode(toks).alias("term"))
          .groupBy("term", "doc_id", "dl")
          .agg(F.count("*").alias("tf"))
          .withColumn("bucket",
                      F.pmod(F.xxhash64("term"), F.lit(num_buckets))))
    # df DENORMALIZED onto each posting row (r18): the df used to be a
    # second parquet table derived by reading the postings back — an
    # extra write job + partitioned-commit + read-back, and a per-term
    # broadcast join at every probe. One window over the term gives the
    # same integer (postings rows per term = documents containing it)
    # in the build pass, and probes read it off the matched rows for
    # free (guide §2.4: one exchange replaces a write+read+join).
    #
    # r18 session 3 (guide §2.4, share one exchange): ``bucket`` is a
    # function of ``term``, so windowing by (bucket, term) counts the
    # same rows as windowing by term — and hash-partitioning on bucket
    # satisfies that window's clustering, so the single
    # ``repartition("bucket")`` exchange (needed anyway for co-located
    # right-sized bucket files, the q54 IVF layout) serves BOTH the df
    # window and the partitioned write. Before: Exchange(term) for the
    # window + Exchange(bucket) for the layout — two full shuffles of
    # the postings table; now one.
    wdf = Window.partitionBy("bucket", "term")
    tf = (tf.repartition("bucket")
          .withColumn("df", F.count("*").over(wdf)))
    tf.write.mode("overwrite") \
        .partitionBy("bucket").parquet(path + "/postings")
    (src.select(F.count("*").alias("n_docs"),
                F.avg(F.size(toks)).alias("avgdl"),
                F.lit(num_buckets).alias("num_buckets"))
     .write.mode("overwrite").parquet(path + "/stats"))


def query_text_index(spark, path: str,
                     queries: Sequence[tuple[str, str]],
                     k: int = 10, k1: float = 1.2, b: float = 0.75,
                     round_digits: int = 6) -> DataFrame:
    """BM25 top-k against a :func:`build_text_index` index — identical
    scores/ranks to :func:`bm25_topk` on the same corpus (same formula,
    same rounding), but the probe reads ONLY the postings buckets the
    query terms hash into: ``PartitionFilters`` prune every other
    bucket directory, so query cost scales with the matched postings,
    not the corpus. No window/aggregate runs over the postings beyond
    the matched terms (df is precomputed at build time)."""
    qrows = _query_terms(queries)
    from ..sources import arrow_local_df
    qt = arrow_local_df(spark, qrows, "query_id string, term string")
    # bucket ids for the probe terms: computed with the SAME hash and
    # modulus Spark used at build time (num_buckets is recorded in the
    # stats table — bucket DIRECTORIES can't be counted because empty
    # buckets leave none), via a terms-sized job (bounded by the query
    # vocabulary)
    terms = sorted({t for _, t in qrows})
    st = spark.read.parquet(path + "/stats").collect()[0]
    nb = st.num_buckets
    tdf = arrow_local_df(spark, [(t,) for t in terms], "term string")
    buckets = [r.bucket for r in tdf.select(
        F.pmod(F.xxhash64("term"), F.lit(nb)).alias("bucket"))
        .distinct().collect()]

    # stats enter the plan as LITERALS (already on the driver from the
    # num_buckets read — one tiny row, the q54 centroid pattern), so the
    # scoring job carries no extra broadcast
    n_docs, avgdl = F.lit(st.n_docs), F.lit(st.avgdl)
    post = (spark.read.parquet(path + "/postings")
            .where(F.col("bucket").isin(buckets)
                   & F.col("term").isin(terms)))
    scored = (post
              .join(F.broadcast(qt), "term")
              .withColumn(
                  "idf",
                  F.log(F.lit(1.0)
                        + (n_docs - F.col("df") + F.lit(0.5))
                        / (F.col("df") + F.lit(0.5))))
              .withColumn(
                  "contrib",
                  F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                  / (F.col("tf")
                     + F.lit(k1) * (F.lit(1.0 - b)
                                    + F.lit(b) * F.col("dl")
                                    / avgdl)))
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum("contrib"), round_digits).alias("score")))
    rw = (Window.partitionBy("query_id")
          .orderBy(F.desc("score"), F.asc("doc_id")))
    return (scored
            .withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score"))



def mine_hard_negatives(docs: DataFrame, id_col: str, text_col: str,
                        queries: Sequence[tuple[str, str]],
                        positives: DataFrame, k: int = 5,
                        depth: int | None = None,
                        k1: float = 1.2, b: float = 0.75,
                        round_digits: int = 6) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training — per
    query, the top-``k`` BM25 documents that are NOT labeled positives
    (the DPR/sentence-transformers recipe: lexically similar but
    unlabeled documents make the hardest contrastive negatives).

    ``positives`` is a DataFrame with columns ``(query_id, doc_id)``
    (the labeled pairs to exclude). Retrieval runs to ``depth``
    candidates per query BEFORE exclusion; the default
    ``k + max(positives per query)`` is the smallest depth that is
    EXACT — after dropping every positive a query can still fill all
    ``k`` negative slots, so the result equals what an unbounded
    retrieval would give (no silent recall loss; the max-positives
    lookup is one aggregate over the labeled pairs, which are
    training-label-sized, not corpus-sized).

    Returns ``(query_id, doc_id, rank, score)`` — ``rank`` re-numbered
    dense from 1 over the surviving negatives, BM25 ordering preserved
    (rounded score desc, doc id tiebreak — the ``bm25_topk``
    convention).
    """
    if depth is None:
        mx = (positives.groupBy("query_id").count()
              .agg(F.max("count")).first()[0])
        depth = k + int(mx or 0)
    if depth < k:
        raise ValueError("depth must be >= k")
    cand = bm25_topk(docs, id_col, text_col, queries, k=depth,
                     k1=k1, b=b, round_digits=round_digits)
    neg = cand.join(positives.select("query_id", "doc_id").distinct(),
                    ["query_id", "doc_id"], "left_anti")
    rw = (Window.partitionBy("query_id")
          .orderBy(F.desc("score"), F.asc("doc_id")))
    return (neg.withColumn("rank", F.row_number().over(rw))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score"))
