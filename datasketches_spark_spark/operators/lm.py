"""Statistical n-gram language-model scoring — the CCNet-style quality
filter: train a smoothed bigram LM on a reference corpus, score every
document's per-token negative log-likelihood / perplexity, then filter
or bucket on the score (low-perplexity ≈ fluent reference-like text,
high ≈ gibberish/boilerplate/wrong-language).  The classical pipeline
uses a Wikipedia-trained KenLM; this is the same decision surface with
a deterministic, engine-replayable model (add-k smoothed bigrams), so
two independent engines produce bit-identical scores.

Lifecycle mirrors the IVF index (build once, score many):
``train_bigram_lm`` produces two small DataFrames of counts — persist
them like any dimension table — and ``perplexity_score`` joins a corpus
against them.

Scale design (the 100 TB shape):

- TRAIN: two aggregates over the reference corpus (unigram + bigram
  counts) — each is map-side-combined (partial HashAggregate before the
  exchange), so the shuffles carry vocabulary-bounded count rows, not
  the token stream. The reference corpus is typically a curated slice,
  orders of magnitude smaller than the corpus being scored.
- SCORE: one scan of the scored corpus; the exploded bigram stream
  joins the two count tables on the gram key. Small LMs broadcast (AQE
  decides); a web-scale LM table makes these honest hash joins where
  the exchanged volume is the token stream — the unavoidable cost of
  per-token lookup. The per-document reduce is a map-side-combinable
  sum, and nothing ever self-joins or rescans.

Smoothing: add-k over the observed vocabulary,
``P(w_i | w_{i-1}) = (c2 + k) / (c1(w_{i-1}) + k * V)``; the first
token scores against the unigram distribution
``(c1 + k) / (total + k * V)``. Unseen words/bigrams get the same
formula with zero counts (backed off through the LEFT joins), so
scores are defined for every document, including out-of-vocabulary
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngrams, tokenize

__all__ = ["train_bigram_lm", "perplexity_score"]


def train_bigram_lm(df: DataFrame, text_col: str) -> tuple[DataFrame,
                                                           DataFrame]:
    """Count tables for an add-k bigram LM over ``text_col``.

    Returns ``(unigrams, bigrams)``: ``(w, c1)`` and ``(bg, c2)`` with
    the bigram key space-joined (the ``ngrams`` convention). Persist
    them (parquet/cache) when scoring repeatedly — they are the model.
    """
    toks = tokenize(text_col)
    uni = (df.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count("*").alias("c1")))
    bi = (df.select(F.explode(ngrams(tokenize(text_col), 2)).alias("bg"))
          .groupBy("bg").agg(F.count("*").alias("c2")))
    return uni, bi


def perplexity_score(docs: DataFrame, id_col: str, text_col: str,
                     unigrams: DataFrame, bigrams: DataFrame,
                     k: float = 0.5,
                     round_digits: int = 6) -> DataFrame:
    """Per-document NLL and perplexity under the add-k bigram LM.

    Returns ``(id, n_tokens, n_oov_terms, avg_nll, ppl)`` for documents
    with at least one token: ``avg_nll`` is the mean negative natural
    log-probability per token (first token from the unigram
    distribution, the rest from smoothed bigrams), ``ppl`` its exp,
    ``n_oov_terms`` the number of terms that backed off to a zero count
    (unseen word or unseen bigram — the CCNet-style OOV signal).
    Both floats round to ``round_digits`` AFTER all arithmetic so
    independent engines agree bit-for-bit.
    """
    stats = unigrams.agg(F.count("*").alias("_v"),
                         F.sum("c1").alias("_tot"))
    kk = F.lit(float(k))

    toks = tokenize(text_col)
    first = (docs.select(F.col(id_col).alias("_id"),
                         F.element_at(toks, 1).alias("w"))
             .where(F.col("w").isNotNull())
             .join(unigrams, "w", "left")
             .crossJoin(F.broadcast(stats))
             .select("_id",
                     (-F.log((F.coalesce(F.col("c1"), F.lit(0)) + kk)
                             / (F.col("_tot") + kk * F.col("_v"))))
                     .alias("nll"),
                     F.coalesce(F.col("c1"), F.lit(0)).alias("_c")))

    prev = F.substring_index(F.col("bg"), " ", 1)
    rest = (docs.select(F.col(id_col).alias("_id"),
                        F.explode(ngrams(tokenize(text_col), 2))
                        .alias("bg"))
            .join(bigrams, "bg", "left")
            .select("_id", prev.alias("w"),
                    F.coalesce(F.col("c2"), F.lit(0)).alias("c2"))
            .join(unigrams, "w", "left")
            .crossJoin(F.broadcast(stats))
            .select("_id",
                    (-F.log((F.col("c2") + kk)
                            / (F.coalesce(F.col("c1"), F.lit(0))
                               + kk * F.col("_v")))).alias("nll"),
                    F.col("c2").alias("_c")))

    terms = first.unionByName(rest)
    return (terms.groupBy("_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.when(F.col("_c") == 0, 1).otherwise(0))
                 .alias("n_oov_terms"),
                 F.sum("nll").alias("_nll"))
            .select(F.col("_id").alias(id_col),
                    F.col("n_tokens"),
                    F.col("n_oov_terms").cast("long").alias("n_oov_terms"),
                    F.round(F.col("_nll") / F.col("n_tokens"),
                            round_digits).alias("avg_nll"),
                    F.round(F.exp(F.col("_nll") / F.col("n_tokens")),
                            round_digits).alias("ppl")))
