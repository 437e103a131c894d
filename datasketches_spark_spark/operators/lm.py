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

__all__ = ["train_bigram_lm", "perplexity_score",
           "train_trigram_lm", "perplexity_score_trigram"]


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
    # r18: bind the token array before ngrams — its two slice
    # references otherwise each inline the split and re-tokenize the
    # document (the ngrams docstring's CSE caveat; guide §1.2)
    bi = (df.select(tokenize(text_col).alias("_tk"))
          .select(F.explode(ngrams(F.col("_tk"), 2)).alias("bg"))
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
                        tokenize(text_col).alias("_tk"))
            .select("_id", F.explode(ngrams(F.col("_tk"), 2)).alias("bg"))
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


def train_trigram_lm(df: DataFrame, text_col: str
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables for an interpolated trigram LM: ``(unigrams,
    bigrams, trigrams)`` = ``(w, c1)``, ``(bg, c2)``, ``(tg, c3)`` with
    space-joined gram keys. Same two-aggregate physics as
    :func:`train_bigram_lm`, plus one more vocabulary-bounded shuffle
    for the trigram table."""
    uni, bi = train_bigram_lm(df, text_col)
    tri = (df.select(tokenize(text_col).alias("_tk"))
           .select(F.explode(ngrams(F.col("_tk"), 3)).alias("tg"))
           .groupBy("tg").agg(F.count("*").alias("c3")))
    return uni, bi, tri


def perplexity_score_trigram(docs: DataFrame, id_col: str, text_col: str,
                             unigrams: DataFrame, bigrams: DataFrame,
                             trigrams: DataFrame, k: float = 0.5,
                             lambdas: tuple[float, float, float]
                             = (0.5, 0.3, 0.2),
                             round_digits: int = 6) -> DataFrame:
    """Per-document NLL/perplexity under a Jelinek-Mercer interpolated
    trigram LM: position 1 scores the unigram distribution, position 2
    the bigram+unigram mixture (trigram mass folded into the bigram
    term), positions >= 3 the full
    ``l3*P3(c|ab) + l2*P2(c|b) + l1*P1(c)`` mixture, every component
    add-k smoothed like :func:`perplexity_score`. Output schema matches
    the bigram scorer: ``(id, n_tokens, n_oov_terms, avg_nll, ppl)``;
    ``n_oov_terms`` counts positions whose HIGHEST-order count was zero
    (the backoff signal). Floats round to ``round_digits`` AFTER all
    arithmetic; the ln/mixture expression tree is kept in a fixed
    shape (per-component probability, then weighted sum, then one
    ``ln``) so an independent SQL engine replays scores bit-for-bit.

    Scale: one scan of the scored corpus exploded once per order; each
    stream hash-joins the count tables on its gram key (broadcast when
    the model is small); the per-document reduce is map-side
    combinable. Nothing rescans or self-joins.
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    if abs(l1 + l2 + l3 - 1.0) > 1e-9:
        raise ValueError("lambdas must sum to 1")
    stats = unigrams.agg(F.count("*").alias("_v"),
                         F.sum("c1").alias("_tot"))
    kk = F.lit(float(k))

    def p1(c1col):
        return ((F.coalesce(c1col, F.lit(0)) + kk)
                / (F.col("_tot") + kk * F.col("_v")))

    def pcond(num_c, den_c):
        return ((F.coalesce(num_c, F.lit(0)) + kk)
                / (F.coalesce(den_c, F.lit(0)) + kk * F.col("_v")))

    toks = tokenize(text_col)

    # position 1: unigram distribution (try_element_at: zero-token
    # docs produce null and drop out, matching the bigram scorer's
    # at-least-one-token contract without an ANSI array error)
    first = (docs.select(F.col(id_col).alias("_id"),
                         F.try_element_at(toks, F.lit(1)).alias("w"))
             .where(F.col("w").isNotNull())
             .join(unigrams, "w", "left")
             .crossJoin(F.broadcast(stats))
             .select("_id", (-F.log(p1(F.col("c1")))).alias("nll"),
                     F.coalesce(F.col("c1"), F.lit(0)).alias("_c")))

    # position 2: (l3+l2)*P2(w2|w1) + l1*P1(w2) on the FIRST bigram
    u_w = unigrams.select(F.col("w").alias("_w"), F.col("c1").alias("_c1w"))
    u_prev = unigrams.select(F.col("w").alias("_pw"),
                             F.col("c1").alias("_c1p"))
    second = (docs.select(F.col(id_col).alias("_id"),
                          F.try_element_at(ngrams(toks, 2), F.lit(1))
                          .alias("bg"))
              .where(F.col("bg").isNotNull())
              .join(bigrams, "bg", "left")
              .select("_id", F.col("c2"),
                      F.substring_index(F.col("bg"), " ", 1).alias("_pw"),
                      F.substring_index(F.col("bg"), " ", -1).alias("_w"))
              .join(u_prev, "_pw", "left").join(u_w, "_w", "left")
              .crossJoin(F.broadcast(stats))
              .select("_id",
                      (-F.log(F.lit(l3 + l2)
                              * pcond(F.col("c2"), F.col("_c1p"))
                              + F.lit(l1) * p1(F.col("_c1w"))))
                      .alias("nll"),
                      F.coalesce(F.col("c2"), F.lit(0)).alias("_c")))

    # positions >= 3: l3*P3(c|ab) + l2*P2(c|b) + l1*P1(c)
    tg = F.col("tg")
    ctx_ab = F.substring_index(tg, " ", 2)                  # "a b"
    gram_bc = F.substring_index(tg, " ", -2)                # "b c"
    w_b = F.substring_index(gram_bc, " ", 1)                # "b"
    w_c = F.substring_index(tg, " ", -1)                    # "c"
    bi_ab = bigrams.select(F.col("bg").alias("_ab"),
                           F.col("c2").alias("_c2ab"))
    bi_bc = bigrams.select(F.col("bg").alias("_bc"),
                           F.col("c2").alias("_c2bc"))
    u_b = unigrams.select(F.col("w").alias("_b"), F.col("c1").alias("_c1b"))
    u_c = unigrams.select(F.col("w").alias("_cw"),
                          F.col("c1").alias("_c1c"))
    rest = (docs.select(F.col(id_col).alias("_id"),
                        tokenize(text_col).alias("_tk"))
            .select("_id", F.explode(ngrams(F.col("_tk"), 3)).alias("tg"))
            .select("_id", "tg", ctx_ab.alias("_ab"),
                    gram_bc.alias("_bc"), w_b.alias("_b"),
                    w_c.alias("_cw"))
            .join(trigrams, "tg", "left")
            .join(bi_ab, "_ab", "left").join(bi_bc, "_bc", "left")
            .join(u_b, "_b", "left").join(u_c, "_cw", "left")
            .crossJoin(F.broadcast(stats))
            .select("_id",
                    (-F.log(F.lit(l3) * pcond(F.col("c3"), F.col("_c2ab"))
                            + F.lit(l2) * pcond(F.col("_c2bc"),
                                                F.col("_c1b"))
                            + F.lit(l1) * p1(F.col("_c1c"))))
                    .alias("nll"),
                    F.coalesce(F.col("c3"), F.lit(0)).alias("_c")))

    terms = first.unionByName(second).unionByName(rest)
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
