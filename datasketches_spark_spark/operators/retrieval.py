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

__all__ = ["bm25_topk"]


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
    text_col: str,
    queries: Sequence[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    ``queries`` is a sequence of ``(query_id, query_text)``; query text
    is whitespace-tokenized with duplicate terms dropped (binary query
    term frequency — the common BM25 simplification).  The idf is the
    non-negative variant ``ln(1 + (N - df + 0.5) / (df + 0.5))``.

    Returns ``(query_id, doc_id, rank, score)`` with ``rank`` dense from
    1 per query, ordered by rounded score desc, then doc id.
    """
    spark = docs.sparkSession
    qt = spark.createDataFrame(_query_terms(queries),
                               "query_id string, term string")

    # Pass 1 (corpus stats): zero-match documents still count toward N
    # and avgdl, so this cannot be derived from the match table.
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokenize(text_col))).alias("avgdl"))

    # Pass 2: tokenize -> explode -> broadcast-prune to query terms.
    # The join is map-side (BroadcastHashJoin), so no corpus row
    # survives to a shuffle unless it matches a query term.
    matched = (docs
               .select(F.col(id_col).alias("doc_id"),
                       tokenize(text_col).alias("_toks"))
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
