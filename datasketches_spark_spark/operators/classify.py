"""Token-level Naive-Bayes document classifier — the fasttext-class
linear quality/language scorer every large pretraining pipeline runs
(CCNet trains a fasttext quality classifier; LLaMA filters on one), in
a form whose TRAINING and SCORING are both exactly replayable by an
independent SQL engine.

Extension beyond the reference (which exposes only sketch functions).

Why Naive Bayes and not logistic regression: NB's fit is closed-form
relational algebra — token counts per class plus log-ratios — so the
whole train-then-score pipeline stays inside deterministic DataFrame
ops and can sit behind a rows+schema+hash oracle gate. A gradient fit
(MLlib) is neither order- nor partitioning-deterministic, which makes
it unverifiable at the bit level by design.

Fixed-point trick for bit-stable scores: per-token log-likelihood-ratio
weights are quantized to integer micro-units (``round(w * quant)`` as
BIGINT) at train time, and a document's score is the INTEGER sum of its
token weights plus the prior. Integer addition is associative and
commutative, so the score is invariant to partition layout, AQE
re-planning, and aggregation order — none of the float-summation
caveats the perplexity scorer (``operators/lm.py``) has to manage.

Scale shape (the 100 TB design):

* training is one exploded ``groupBy(token)`` (map-side combined; key
  cardinality = vocabulary, not corpus) plus an O(1) totals collect;
* the weights table is vocabulary-bounded, so scoring BROADCASTS it —
  the corpus never shuffles to be scored; per-document integer sums
  are map-side combinable behind the one ``groupBy(id)``.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TokenClassifierModel(NamedTuple):
    """Driver-side scalars of a trained classifier (the vocabulary
    weights live in the companion DataFrame)."""
    prior_micro: int      # round((ln d1 - ln d0) * quant)
    default_micro: int    # OOV weight: round((ln(n0+V) - ln(n1+V)) * quant)
    quant: int
    n_pos_docs: int
    n_neg_docs: int
    vocab_size: int


def _toks(text_col: str):
    return F.filter(F.split(F.col(text_col), " "),
                    lambda x: x != F.lit(""))


def train_token_classifier(df: DataFrame, text_col: str, label_col,
                           quant: int = 1_000_000
                           ) -> tuple[DataFrame, TokenClassifierModel]:
    """Fit multinomial NB with add-one smoothing: ``label_col`` (boolean
    Column or column name) marks the positive class. Returns
    ``(weights, model)`` where ``weights`` is ``(token, w_micro)`` —
    one BIGINT micro-unit log-likelihood ratio per vocabulary token —
    and ``model`` carries the O(1) scalars.

    The weight expression is kept as four separate ``ln`` terms (never
    ``ln`` of a ratio) so an oracle writing the same four-term tree
    reproduces every double bit-for-bit before quantization."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    tok = (df.select(lab.cast("boolean").alias("_pos"),
                     F.explode(_toks(text_col)).alias("_w")))
    cnt = (tok.groupBy("_w")
           .agg(F.sum(F.when(F.col("_pos"), 1).otherwise(0))
                .cast("long").alias("_c1"),
                F.sum(F.when(~F.col("_pos"), 1).otherwise(0))
                .cast("long").alias("_c0"))
           # vocabulary-bounded; materialized so the totals collect, the
           # weights table, and every scorer consuming the weights do
           # not each re-run the corpus explode (three full scans
           # observed in the q21 plan — guide §2.4 / §5 "caching")
           .localCheckpoint())
    # O(1) totals: class token totals + vocabulary size + doc counts
    tot = cnt.agg(F.sum("_c1").alias("n1"), F.sum("_c0").alias("n0"),
                  F.count("*").alias("v")).collect()[0]
    dc = df.agg(
        F.sum(lab.cast("boolean").cast("int")).alias("d1"),
        F.sum((~lab.cast("boolean")).cast("int")).alias("d0")).collect()[0]
    n1, n0, v = int(tot.n1 or 0), int(tot.n0 or 0), int(tot.v)
    d1, d0 = int(dc.d1 or 0), int(dc.d0 or 0)
    if min(d1, d0) == 0:
        raise ValueError("training data must contain both classes")

    import math
    prior_micro = int(round((math.log(d1) - math.log(d0)) * quant))
    default_micro = int(round(
        (math.log(n0 + v) - math.log(n1 + v)) * quant))
    w = (F.log((F.col("_c1") + 1).cast("double"))
         - F.log(F.lit(float(n1 + v)))
         - F.log((F.col("_c0") + 1).cast("double"))
         + F.log(F.lit(float(n0 + v))))
    weights = cnt.select(
        F.col("_w").alias("token"),
        F.round(w * quant, 0).cast("long").alias("w_micro"))
    model = TokenClassifierModel(prior_micro, default_micro, quant,
                                 d1, d0, v)
    return weights, model


def score_token_classifier(df: DataFrame, id_col: str, text_col: str,
                           weights: DataFrame,
                           model: TokenClassifierModel,
                           broadcast_weights: bool = True) -> DataFrame:
    """Score documents against a trained classifier. Returns one row per
    input document::

        (id, n_tokens, n_oov, score_micro, score, pred)

    ``score_micro`` is the exact BIGINT ``prior + sum(w_micro)``;
    ``score = score_micro / quant`` (one division — exact parity);
    ``pred = score_micro > 0``. Zero-token documents score the bare
    prior. ``broadcast_weights=True`` is the 100 TB path (vocabulary-
    bounded build side; the corpus never shuffles to be joined)."""
    w = F.broadcast(weights) if broadcast_weights else weights
    tok = (df.select(F.col(id_col).alias("_id"),
                     F.explode_outer(_toks(text_col)).alias("token")))
    joined = tok.join(w, "token", "left")
    scored = (joined.groupBy("_id")
              .agg(F.count("token").alias("n_tokens"),
                   F.sum(F.when(F.col("token").isNotNull()
                                & F.col("w_micro").isNull(), 1)
                         .otherwise(0)).cast("long").alias("n_oov"),
                   (F.coalesce(
                       F.sum(F.when(F.col("token").isNotNull(),
                                    F.coalesce(F.col("w_micro"),
                                               F.lit(model.default_micro)))
                             .otherwise(0)), F.lit(0))
                    + F.lit(model.prior_micro)).cast("long")
                   .alias("score_micro")))
    return scored.select(
        F.col("_id").alias(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_oov", "score_micro",
        (F.col("score_micro").cast("double") / model.quant).alias("score"),
        (F.col("score_micro") > 0).alias("pred"))
