"""Sampling operators: exact-regime identity, plan shape (the reservoir
path must be TakeOrdered partial top-k, not a sort shuffle), statistical
sanity at fixed seeds, and the stratified quota contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators import (
    reservoir_sample,
    stratified_sample,
    stratified_sample_exact,
    weighted_sample,
)


@pytest.fixture(scope="module")
def pop(spark):
    # 10k rows, 4 partitions, strata a..e with skewed sizes
    df = spark.range(0, 10_000, 1, 4).select(
        F.col("id"),
        (F.col("id") % 100).alias("v"),
        F.element_at(
            F.array(*[F.lit(s) for s in "aaabbc"]),
            (F.col("id") % 6 + 1).cast("int")).alias("stratum"),
        (F.col("id") % 10 + 1).cast("double").alias("w"))
    df.cache().count()
    return df


class TestReservoir:
    def test_exact_regime_is_identity(self, pop):
        got = reservoir_sample(pop, 20_000, seed=7)
        assert got.count() == 10_000
        assert got.columns == pop.columns

    def test_sample_size_and_uniqueness(self, pop):
        rows = reservoir_sample(pop, 500, seed=7).select("id").collect()
        ids = [r["id"] for r in rows]
        assert len(ids) == 500 and len(set(ids)) == 500

    def test_deterministic_for_seed(self, pop):
        a = sorted(r["id"] for r in reservoir_sample(pop, 200, seed=9)
                   .select("id").collect())
        b = sorted(r["id"] for r in reservoir_sample(pop, 200, seed=9)
                   .select("id").collect())
        c = sorted(r["id"] for r in reservoir_sample(pop, 200, seed=10)
                   .select("id").collect())
        assert a == b and a != c

    def test_plan_is_partial_topk_no_exchange(self, pop):
        plan = reservoir_sample(pop, 100)._jdf.queryExecution() \
                                         .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan

    def test_uniformity(self, pop):
        # mean of uniform ids 0..9999 is ~5000; for n=2000 the SE of the
        # sample mean is sigma/sqrt(n) ~ 2887/44.7 ~ 65. Allow 5 SE.
        got = reservoir_sample(pop, 2_000, seed=3).agg(
            F.avg("id").alias("m")).collect()[0]["m"]
        assert abs(got - 4999.5) < 5 * 65

    def test_k_validation(self, pop):
        with pytest.raises(ValueError, match="positive"):
            reservoir_sample(pop, 0)


class TestWeighted:
    def test_exact_regime_keeps_positive_weights_only(self, pop):
        df = pop.withColumn(
            "w2", F.when(F.col("id") < 100, F.lit(None).cast("double"))
                   .when(F.col("id") < 200, F.lit(0.0))
                   .otherwise(F.lit(1.0)))
        got = weighted_sample(df, 20_000, "w2", seed=5)
        assert got.count() == 9_800

    def test_weight_proportionality(self, pop):
        # weights 1..10; E[w of sampled] > E[w of population] = 5.5, and
        # for A-ES with k<<N the sampled-weight mean approaches
        # E[w^2]/E[w] = 38.5/5.5 = 7.0. Allow a generous band.
        got = weighted_sample(pop, 1_000, "w", seed=11).agg(
            F.avg("w").alias("m")).collect()[0]["m"]
        assert 6.3 < got < 7.7

    def test_plan_is_partial_topk_no_exchange(self, pop):
        plan = weighted_sample(pop, 100, "w")._jdf.queryExecution() \
                                             .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan


class TestStratified:
    def test_fraction_no_shuffle(self, pop):
        plan = stratified_sample(pop, "stratum", 0.5)._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_fraction_dict_drops_unlisted(self, pop):
        got = stratified_sample(pop, "stratum", {"a": 1.0, "b": 0.0}, seed=2)
        counts = {r["stratum"]: r["count"] for r in
                  got.groupBy("stratum").count().collect()}
        assert set(counts) == {"a"}
        assert counts["a"] == 5_001  # residues 0-2 of 10k rows

    def test_fraction_statistics(self, pop):
        n = stratified_sample(pop, "stratum", 0.3, seed=4).count()
        # Binomial(10000, 0.3): sd ~ 46; allow 5 sd
        assert abs(n - 3_000) < 5 * 46

    def test_exact_quota_per_stratum(self, pop):
        got = stratified_sample_exact(pop, "stratum", 50, seed=6)
        counts = {r["stratum"]: r["count"] for r in
                  got.groupBy("stratum").count().collect()}
        assert counts == {"a": 50, "b": 50, "c": 50}

    def test_exact_quota_caps_at_stratum_size(self, pop):
        small = pop.where((F.col("stratum") != "c") | (F.col("id") < 60))
        got = stratified_sample_exact(small, "stratum", 1_000, seed=6)
        counts = {r["stratum"]: r["count"] for r in
                  got.groupBy("stratum").count().collect()}
        # stratum c: only ids < 60 with id%6==5 -> 10 rows
        assert counts["c"] == 10
        assert counts["a"] == 1_000 and counts["b"] == 1_000

    def test_prefilter_keeps_quota_and_validates(self, pop):
        got = stratified_sample_exact(pop, "stratum", 20, seed=8,
                                      prefilter_fraction=0.2, validate=True)
        counts = {r["stratum"]: r["count"] for r in
                  got.groupBy("stratum").count().collect()}
        assert counts == {"a": 20, "b": 20, "c": 20}

    def test_overthinned_prefilter_raises(self, pop):
        # c has ~1667 rows; 0.001 keeps ~1.7 rows << k=50 -> must raise
        with pytest.raises(ValueError, match="thinned"):
            stratified_sample_exact(pop, "stratum", 50, seed=8,
                                    prefilter_fraction=0.001, validate=True)

    def test_fraction_validation(self, pop):
        with pytest.raises(ValueError, match=r"\[0,1\]"):
            stratified_sample(pop, "stratum", 1.5)
        with pytest.raises(ValueError, match=r"\[0,1\]"):
            stratified_sample(pop, "stratum", {"a": -0.1})
        with pytest.raises(ValueError, match="empty"):
            stratified_sample(pop, "stratum", {})


class TestBudgetSelect:
    def test_greedy_prefix_per_stratum(self, spark):
        from datasketches_spark_spark.operators import budget_select
        rows = [
            # lang, id, quality, tokens
            ("en", 1, 9.0, 40), ("en", 2, 8.0, 50), ("en", 3, 7.0, 30),
            ("en", 4, 6.0, 100),
            ("fr", 5, 5.0, 80), ("fr", 6, 4.0, 10), ("fr", 7, 3.0, 20),
        ]
        df = spark.createDataFrame(rows, ["lang", "id", "q", "toks"])
        got = sorted(r.id for r in budget_select(
            df, "toks", ["q", "id"], 100, strata_col="lang").collect())
        # en best-first: 40, +50=90 ok, +30=120 over -> stop at id 2
        # fr: 80, +10=90 ok, +20=110 over -> ids 5,6
        assert got == [1, 2, 5, 6]

    def test_first_row_over_budget_drops_stratum(self, spark):
        from datasketches_spark_spark.operators import budget_select
        df = spark.createDataFrame([("en", 1, 1.0, 500)],
                                   ["lang", "id", "q", "toks"])
        assert budget_select(df, "toks", ["q", "id"], 100,
                             strata_col="lang").collect() == []

    def test_ascending_order_and_no_strata(self, spark):
        from datasketches_spark_spark.operators import budget_select
        df = spark.createDataFrame(
            [(1, 10.0, 60), (2, 1.0, 60), (3, 5.0, 60)],
            ["id", "cost", "toks"])
        got = sorted(r.id for r in budget_select(
            df, "toks", ["cost", "id"], 120, ascending=True).collect())
        assert got == [2, 3]   # cheapest-first until 120 tokens

    def test_bad_budget_raises(self, spark):
        from datasketches_spark_spark.operators import budget_select
        df = spark.createDataFrame([(1, 1)], ["id", "toks"])
        import pytest as _pytest
        with _pytest.raises(ValueError):
            budget_select(df, "toks", "id", 0)


class TestBudgetSelectNulls:
    def test_null_budget_rows_cost_zero(self, spark):
        # SQL sum() skips nulls: a null-cost row is kept for free and
        # does not poison the running total of later rows — pinned so a
        # refactor to a different running-sum cannot change it silently
        from datasketches_spark_spark.operators import budget_select
        df = spark.createDataFrame(
            [(1, 9.0, 60), (2, 8.0, None), (3, 7.0, 50), (4, 6.0, 20)],
            "id long, q double, toks long")
        got = sorted(r.id for r in budget_select(
            df, "toks", ["q", "id"], 110).collect())
        assert got == [1, 2, 3]   # 60, +0, +50=110, +20 over


class TestMixtureWeights:
    def test_matches_scalar_formula(self, spark):
        from datasketches_spark_spark.operators import mixture_weights
        rows = [("en", 100), ("de", 50), ("fr", 10)]
        df = spark.createDataFrame(
            [(l, 1) for l, n in rows for _ in range(n)], ["lang", "one"])
        got = {r.lang: (r.mass, r.share, r.weight, r.epochs)
               for r in mixture_weights(df, "lang", "one", alpha=0.5,
                                        budget=1000).collect()}
        tot = sum(n for _, n in rows)
        ptot = sum(n ** 0.5 for _, n in rows)
        for lang, n in rows:
            m, sh, w, ep = got[lang]
            assert m == n
            assert sh == round(n / tot, 6)
            assert w == round(n ** 0.5 / ptot, 6)
            assert ep == round(1000 * w / n, 6)

    def test_alpha_one_keeps_natural_shares(self, spark):
        from datasketches_spark_spark.operators import mixture_weights
        df = spark.createDataFrame(
            [("a", 30), ("b", 70)], ["s", "mass"])
        got = {r.s: (r.share, r.weight)
               for r in mixture_weights(df, "s", "mass",
                                        alpha=1.0).collect()}
        assert got["a"] == (0.3, 0.3)
        assert got["b"] == (0.7, 0.7)

    def test_no_budget_zero_epochs(self, spark):
        from datasketches_spark_spark.operators import mixture_weights
        df = spark.createDataFrame([("a", 5)], ["s", "m"])
        assert mixture_weights(df, "s", "m").collect()[0].epochs == 0.0


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.7, 1.0])
def test_mixture_weights_invariants(spark, alpha):
    """Weights are a distribution at every temperature; alpha=0 is
    uniform, alpha=1 the natural shares."""
    from datasketches_spark_spark.operators import mixture_weights
    df = spark.createDataFrame(
        [("a", 10), ("b", 90), ("c", 400)], ["s", "m"])
    rows = mixture_weights(df, "s", "m", alpha=alpha).collect()
    ws = {r.s: r.weight for r in rows}
    assert abs(sum(ws.values()) - 1.0) < 1e-5
    if alpha == 0.0:
        assert all(abs(w - 1 / 3) < 1e-5 for w in ws.values())
    if alpha == 1.0:
        assert abs(ws["c"] - 0.8) < 1e-5
    # monotone: more mass never gets a smaller weight
    assert ws["a"] <= ws["b"] <= ws["c"]


class TestDsirWeights:
    """DSIR hashed n-gram importance weights (sampling.py::dsir_weights)
    pinned against a pure-Python scalar model on randomized corpora —
    the same feature hashing, smoothing, and log-ratio arithmetic
    computed row-at-a-time, so any distributed-plan mistake (lost
    occurrences, wrong distribution totals, order-dependent rounding)
    shows up as a float mismatch."""

    @staticmethod
    def _scalar(rows, target_langs, buckets, s=0.5):
        import collections
        import hashlib
        import math

        def bucket(f):
            return int(hashlib.md5(f.encode()).hexdigest()[:15],
                       16) % buckets

        cr = collections.Counter()
        ct = collections.Counter()
        featmap = {}
        for did, lang, text in rows:
            toks = [t for t in text.split(" ") if t]
            feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            bs = [bucket(f) for f in feats]
            featmap[did] = bs
            for b in bs:
                cr[b] += 1
                if lang in target_langs:
                    ct[b] += 1
        tr, tt = sum(cr.values()), sum(ct.values())
        out = {}
        for did, bs in featmap.items():
            if not bs:
                continue
            lw = npos = 0
            for b in bs:
                v = (math.log((ct[b] + s) / (tt + s * buckets))
                     - math.log((cr[b] + s) / (tr + s * buckets)))
                lw += v
                npos += v > 0
            out[did] = (len(bs), npos, round(lw, 6),
                        round(lw / len(bs), 6))
        return out

    def test_matches_scalar_model_randomized(self, spark):
        import random
        rnd = random.Random(1107)
        vocab_t = ["alpha", "beta", "gamma", "delta"]
        vocab_r = ["zap", "qux", "mog", "fizz", "alpha"]
        rows = []
        for i in range(120):
            tgt = i % 3 == 0
            vocab = vocab_t if tgt else vocab_r
            n = rnd.randint(0, 30)
            text = " ".join(rnd.choice(vocab) for _ in range(n))
            rows.append((i, "en" if tgt else "xx", text))
        from datasketches_spark_spark.operators import dsir_weights
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        got = {r.doc_id: (r.n_feats, r.n_pos, r.log_w, r.score)
               for r in dsir_weights(df, "doc_id", "text",
                                     F.col("lang") == "en",
                                     buckets=32).collect()}
        exp = self._scalar(rows, {"en"}, 32)
        assert got == exp
        # empty documents produce no features and no row
        assert all(rows[d][2] != "" for d in got)

    def test_target_docs_score_higher(self, spark):
        """Separated vocabularies: every target doc must outscore every
        raw-only doc (the selection property the operator exists for)."""
        import random
        rnd = random.Random(7)
        rows = [(i, "en" if i < 20 else "xx",
                 " ".join(rnd.choice(
                     ["wiki", "book", "prose"] if i < 20 else
                     ["spam", "junk", "ads"]) for _ in range(25)))
                for i in range(40)]
        from datasketches_spark_spark.operators import dsir_weights
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        sc = {r.doc_id: r.score
              for r in dsir_weights(df, "doc_id", "text",
                                    F.col("lang") == "en",
                                    buckets=64).collect()}
        assert min(sc[i] for i in range(20)) \
            > max(sc[i] for i in range(20, 40))

    def test_bad_buckets_raises(self, spark):
        from datasketches_spark_spark.operators import dsir_weights
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            dsir_weights(df, "doc_id", "text", F.lit(True), buckets=1)
