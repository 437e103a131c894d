"""Distributed sampling operators for training-data curation.

A 100 TB corpus is curated by sampling as much as by dedup: uniform
subsets for eval splits, weight-proportional subsets for quality-aware
mixing, per-stratum quotas for balanced domains. These are the Spark-first
re-expressions of the DataSketches *sampling* family's capability
(reservoir / VarOpt — the one sketch family the reference repo does not
wrap), built so the heavy path never shuffles the corpus:

* :func:`reservoir_sample` — uniform k without replacement. Implemented
  as global top-k over a random key: Catalyst plans ``ORDER BY rand
  LIMIT k`` as ``TakeOrderedAndProject``, which keeps a k-row heap PER
  PARTITION and merges only ``k × partitions`` rows on the driver — the
  distributed-reservoir merge, with no full shuffle and no skew
  sensitivity.
* :func:`weighted_sample` — weight-proportional k without replacement
  (Efraimidis–Spirakis A-ES: key ``u^(1/w)``, equivalently order by
  ``-ln(u)/w`` ascending; VarOpt-class semantics). Same top-k physics.
* :func:`stratified_sample` — per-stratum FRACTIONS via one scan-side
  filter on ``rand`` (no shuffle at all; Bernoulli per row, like
  ``DataFrame.sampleBy`` but for any number of strata from a dict).
* :func:`stratified_sample_exact` — exact per-stratum k via window
  ``row_number`` over ``rand``. Catalyst plans the rank filter as
  ``WindowGroupLimit`` with a PARTIAL pass before the exchange (visible
  in ``docs/PLANS.md`` q30), so each map task forwards at most
  ``k × strata`` rows — the shuffle is bounded by quota, not corpus
  size. ``prefilter_fraction`` additionally Bernoulli-thins each
  stratum before ranking (``validate=True`` asserts no quota
  shortfall), useful when per-partition stratum counts are still huge.

Determinism: every operator takes ``seed``; ``F.rand(seed)`` is
deterministic per (row, partition) for a fixed input partitioning, so
reruns on the same data+layout reproduce the same sample.

Data SELECTION (deciding which documents deserve the budget, not just
how to draw them) lives here too: :func:`budget_select` (greedy
quota-prefix mix), :func:`mixture_weights` (p_i^alpha temperature
rebalancing), and :func:`dsir_weights` (DSIR hashed n-gram importance
weights — rank raw documents by target-domain likelihood ratio).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ngrams, tokenize

_RAND = "_dss_rand"


def reservoir_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Uniform random k-row sample without replacement.

    Equivalent to a distributed reservoir: per-partition top-k heaps over
    a uniform key, merged on the driver (``TakeOrderedAndProject`` —
    verify with ``.explain()``; no exchange appears).
    """
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    out = (df.withColumn(_RAND, F.rand(seed))
             .orderBy(_RAND)
             .limit(k)
             .drop(_RAND))
    return out


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    seed: int = 42) -> DataFrame:
    """Weight-proportional k-row sample without replacement (A-ES).

    Rows with non-positive / null weight are excluded (zero-weight rows
    can never be drawn). Inclusion probability is proportional to weight
    in the without-replacement sense of Efraimidis–Spirakis: order by
    ``-ln(u)/w`` ascending and take k.
    """
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    # -ln(u)/w: smallest keys win; u in (0,1] via 1-rand to avoid ln(0).
    key = -F.log(F.lit(1.0) - F.rand(seed)) / w
    return (df.where(w.isNotNull() & (w > 0))
              .withColumn(_RAND, key)
              .orderBy(_RAND)
              .limit(k)
              .drop(_RAND))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict | float,
                      seed: int = 42) -> DataFrame:
    """Bernoulli per-stratum sampling — shuffle-free (scan-side filter).

    ``fractions`` is either one float for every stratum or a dict
    ``{stratum_value: fraction}`` (strata missing from the dict are
    dropped, like ``DataFrame.sampleBy``).
    """
    if isinstance(fractions, dict):
        if not fractions:
            raise ValueError("fractions dict must not be empty")
        for v, f in fractions.items():
            if not (0.0 <= f <= 1.0):
                raise ValueError(f"fraction for {v!r} must be in [0,1], got {f}")
        frac = None
        col = F.col(strata_col)
        for v, f in fractions.items():
            cond = F.when(col == F.lit(v), F.lit(float(f)))
            frac = cond if frac is None else frac.when(col == F.lit(v),
                                                       F.lit(float(f)))
        frac = frac.otherwise(F.lit(-1.0))  # unlisted strata never pass
    else:
        if not (0.0 <= fractions <= 1.0):
            raise ValueError(f"fraction must be in [0,1], got {fractions}")
        frac = F.lit(float(fractions))
    return df.where(F.rand(seed) < frac)


def stratified_sample_exact(df: DataFrame, strata_col: str, k: int,
                            seed: int = 42,
                            prefilter_fraction: float | None = None,
                            validate: bool = False) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, uniformly.

    Costs one hash shuffle on the stratum key (window ``row_number`` over
    a random order). ``prefilter_fraction`` Bernoulli-thins each stratum
    BEFORE the shuffle — at 100 TB with million-row strata and k in the
    hundreds, thinning to e.g. ``100*k/est_stratum_size`` shrinks the
    shuffle by orders of magnitude. With thinning the per-stratum count
    is exact only while every stratum retains ≥ k rows (w.h.p. for
    sensible fractions); ``validate=True`` asserts that cheaply from the
    sampled result itself (any stratum returning < k rows while the
    unthinned stratum had ≥ k indicates over-thinning).
    """
    if k <= 0:
        raise ValueError(f"sample size k must be positive, got {k}")
    base = df
    if prefilter_fraction is not None:
        if not (0.0 < prefilter_fraction <= 1.0):
            raise ValueError(
                f"prefilter_fraction must be in (0,1], got {prefilter_fraction}")
        # Guard seed independence: the thinning draw must not correlate
        # with the ranking draw, or thinning biases the sample.
        base = base.where(F.rand(seed + 1) < F.lit(float(prefilter_fraction)))
    win = Window.partitionBy(strata_col).orderBy(F.rand(seed))
    out = (base.withColumn(_RAND, F.row_number().over(win))
               .where(F.col(_RAND) <= k)
               .drop(_RAND))
    if validate and prefilter_fraction is not None:
        short = (out.groupBy(strata_col).count()
                    .where(F.col("count") < k)
                    .join(df.groupBy(strata_col).count()
                            .where(F.col("count") >= k),
                          strata_col, "inner")
                    .limit(1).count())
        if short:
            raise ValueError(
                "prefilter_fraction thinned at least one stratum below k; "
                "raise the fraction or skip prefiltering")
    return out


def budget_select(df: DataFrame, budget_col: str, order_col,
                  budget: int, strata_col: str | None = None,
                  ascending: bool = False) -> DataFrame:
    """Select rows best-first until a per-stratum BUDGET is filled — the
    training-mix construction step: "take the highest-quality documents
    per language until each language contributes <= N tokens".

    Rows are ordered by ``order_col`` (descending by default: best
    first; ties broken by the budget column then arbitrarily-but-
    deterministically by the full row hash is NOT needed — callers who
    need determinism order by a unique column) within each stratum, and
    a row is kept while the running total of ``budget_col`` INCLUDING
    the row stays within ``budget``. The first over-budget row and
    everything after it are dropped: every kept prefix is the maximal
    prefix whose sum is <= budget. Selection is greedy-prefix, not
    knapsack — the industry-standard mix builder.

    Plan shape: one hash exchange on the stratum + per-partition sort,
    then a running-sum window and a filter — no self-joins, no driver
    state. The window is the unavoidable per-stratum sequential scan;
    skewed strata cost their own row count, nothing cross-stratum.
    With ``strata_col=None`` the whole frame is one stratum (single
    partition for the window — use strata at scale).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    cols = order_col if isinstance(order_col, (list, tuple)) else [order_col]
    first = cols[0] if not isinstance(cols[0], str) else F.col(cols[0])
    first = first.asc() if ascending else first.desc()
    # trailing order columns are TIE-BREAKERS (always ascending): pass a
    # unique one to make the kept prefix deterministic across runs
    rest = [F.col(c).asc() if isinstance(c, str) else c.asc()
            for c in cols[1:]]
    part = Window.partitionBy(strata_col) if strata_col else \
        Window.partitionBy()
    w = (part.orderBy(first, *rest)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.sum(F.col(budget_col)).over(w)
    return (df.withColumn("_dss_running", running)
            .where(F.col("_dss_running") <= budget)
            .drop("_dss_running"))


def mixture_weights(df: DataFrame, strata_col: str, mass_col,
                    alpha: float = 0.3, budget: float | None = None,
                    round_digits: int = 6) -> DataFrame:
    """Temperature-scaled training-mixture weights per stratum — the
    standard multilingual/multi-domain rebalancing rule (sampling
    probability proportional to ``mass ** alpha``; alpha=1 keeps the
    natural distribution, alpha->0 approaches uniform — the p_i^alpha
    renormalization of the multilingual-pretraining literature, also the
    shape DoReMi-style reweighting plugs into).

    Per stratum, from the total ``mass_col`` (e.g. token count):

    - ``share``  — natural mass fraction p_i
    - ``weight`` — temperature-scaled sampling weight
      p_i^alpha / sum_j p_j^alpha
    - ``epochs`` — with a token ``budget`` B: B * weight / mass, the
      repetition factor each stratum sustains under the mix (how many
      passes over stratum i the budget implies; omitted as 0.0 when no
      budget is given)

    Plan shape: one partial+final aggregate on the stratum (map-side
    combine), then window sums over the STRATUM-dimension rows (a
    handful — languages, sources), so the post-aggregate windows are
    free at any corpus scale. Values round to ``round_digits`` so
    independent engines agree bit-for-bit.
    """
    mass = F.col(mass_col) if isinstance(mass_col, str) else mass_col
    agg = df.groupBy(strata_col).agg(F.sum(mass).alias("mass"))
    wall = Window.partitionBy()
    powed = F.pow(F.col("mass").cast("double"), F.lit(float(alpha)))
    share = F.col("mass") / F.sum("mass").over(wall)
    weight = powed / F.sum(powed).over(wall)
    out = agg.select(
        F.col(strata_col), F.col("mass").cast("long").alias("mass"),
        F.round(share, round_digits).alias("share"),
        F.round(weight, round_digits).alias("weight"))
    if budget is not None:
        ep = F.round(F.lit(float(budget)) * F.col("weight")
                     / F.col("mass"), round_digits)
    else:
        ep = F.lit(0.0)
    return out.withColumn("epochs", ep)


def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 target_col, buckets: int = 256, smoothing: float = 0.5,
                 round_digits: int = 6) -> DataFrame:
    """DSIR hashed n-gram importance weights (Xie et al., "Data
    Selection for Language Models via Importance Resampling",
    NeurIPS 2023) — the data-selection rule that scores every raw
    document by how target-domain-like it is, so a pretraining mix can
    resample raw web text toward a curated target (Wikipedia, books, a
    domain corpus) WITHOUT training a classifier.

    Features are unigrams + adjacent word bigrams hashed into
    ``buckets`` cells with the PORTABLE md5-prefix hash (the
    ``simhash_expr`` convention — any SQL engine reproduces the
    bucketing exactly). Two bag-of-buckets multinomials are fit with
    add-``smoothing`` over the hashed vocabulary:

    - ``p_t`` from the rows where ``target_col`` is true (the target
      domain sample),
    - ``p_r`` from ALL rows (the raw pool).

    Each document scores ``log w(x) = sum_f ln p_t[h(f)] / p_r[h(f)]``
    over its feature OCCURRENCES (repeats count, per the paper's
    bag-of-ngrams likelihood), plus the length-normalized
    ``score = log_w / n_feats`` for length-robust ranking.

    Scale design (the 100 TB shape): one explode scan fits BOTH
    distributions in a single map-side-combined aggregate (conditional
    sums), producing a ``buckets``-row table — bounded by the hash
    width, not the corpus; a second explode scan broadcast-joins that
    table and reduces per document (map-side-combinable sum). The
    corpus itself never shuffles; the only exchanged volumes are the
    bucket table and the per-document partial sums.

    Float determinism: the log-likelihood-ratio expression tree is
    plain ``ln((c+s)/(T+s*B))`` differences — an independent engine
    replaying the identical tree agrees bit-for-bit after the final
    ``round(.., round_digits)`` (applied AFTER the per-document sum).

    Returns ``(id, n_feats, n_pos, log_w, score)``: ``n_pos`` counts
    the feature occurrences with a positive log-ratio (target-evidence
    tokens — an order-independent integer gate on every term's sign).
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    s = F.lit(float(smoothing))
    nb = F.lit(float(buckets))

    # r18: bind the token array to a named column first — Catalyst
    # inlines `tokenize(text)` into every reference (here the unigram
    # leg AND the n+2 slice references inside ngrams), re-splitting each
    # document several times per row; one bound column splits once
    # (guide §1.2 per-task work; the ngrams docstring's CSE caveat).
    feats = F.concat(F.col("_tk"), ngrams(F.col("_tk"), 2))
    exploded = (df.select(F.col(id_col).alias("_id"), tgt.alias("_t"),
                          tokenize(text_col).alias("_tk"))
                .select("_id", "_t", F.explode(feats).alias("f")))
    exploded = exploded.withColumn(
        "b", F.pmod(F.conv(F.substring(F.md5("f"), 1, 15), 16, 10)
                    .cast("long"), F.lit(buckets)))

    wall = Window.partitionBy()
    bt = (exploded.groupBy("b")
          .agg(F.count("*").alias("cr"),
               F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"))
          .select("b",
                  (F.log((F.col("ct") + s)
                         / (F.sum("ct").over(wall) + s * nb))
                   - F.log((F.col("cr") + s)
                           / (F.sum("cr").over(wall) + s * nb)))
                  .alias("llr")))

    return (exploded.join(F.broadcast(bt), "b")
            .groupBy("_id")
            .agg(F.count("*").alias("n_feats"),
                 F.sum(F.when(F.col("llr") > 0, 1).otherwise(0))
                 .alias("n_pos"),
                 F.sum("llr").alias("_lw"))
            .select(F.col("_id").alias(id_col),
                    F.col("n_feats"),
                    F.col("n_pos").cast("long").alias("n_pos"),
                    F.round(F.col("_lw"), round_digits).alias("log_w"),
                    F.round(F.col("_lw") / F.col("n_feats"),
                            round_digits).alias("score")))
