"""Gopher/C4 heuristic filter rules (functions/quality_rules.py) and
the fixed-point Naive-Bayes token classifier (operators/classify.py)."""

import math

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.quality_rules import (
    GOPHER_DEFAULTS, filter_gopher, gopher_flags, gopher_metrics,
    gopher_struct)
from datasketches_spark_spark.operators import (
    score_token_classifier, train_token_classifier)

GOOD = ("the quick brown fox jumps over a lazy dog and then it runs "
        "off to the woods for a while before it comes back again to "
        "rest in the shade of a big old tree near the quiet river "
        "bank where it naps for most of the warm afternoon hours")


def _flags(spark, text, **thr):
    df = spark.createDataFrame([(text,)], ["text"]) \
        .withColumn("g", gopher_struct(F.col("text")))
    fl = gopher_flags(F.col("g"), **thr)
    row = df.select(*[v.alias(k) for k, v in fl.items()]).collect()[0]
    return row.asDict()


class TestGopherRules:
    def test_good_doc_passes(self, spark):
        f = _flags(spark, GOOD)
        assert f["passes"] and f["n_failed"] == 0

    def test_short_doc_fails_word_count(self, spark):
        f = _flags(spark, "too short to keep")
        assert f["bad_word_count"] and not f["passes"]

    def test_symbol_ratio(self, spark):
        f = _flags(spark, GOOD + " " + "# # # # # # # # #")
        assert f["bad_symbol_ratio"]
        # ellipsis counts as ONE symbol per occurrence (3 chars / 3)
        g = _flags(spark, GOOD.replace("the", "the..."))
        assert g["bad_symbol_ratio"]

    def test_stopword_floor(self, spark):
        text = " ".join(["zulu"] * 60)
        f = _flags(spark, text)
        assert f["bad_stopwords"]
        assert not _flags(spark, GOOD)["bad_stopwords"]

    def test_alpha_word_frac(self, spark):
        text = GOOD + " " + " ".join(["123"] * 40)
        assert _flags(spark, text)["bad_alpha_frac"]

    def test_bullet_and_ellipsis_lines(self, spark):
        bullets = "\n".join(["- item one here"] * 10)
        assert _flags(spark, bullets)["bad_bullet_lines"]
        dots = "\n".join(["this line trails off..."] * 10)
        assert _flags(spark, dots)["bad_ellipsis_lines"]
        assert not _flags(spark, GOOD)["bad_bullet_lines"]

    def test_c4_blocklist(self, spark):
        for bad in ("function() { return 1 }",
                    "Lorem Ipsum dolor sit amet",
                    "please enable JavaScript to continue"):
            assert _flags(spark, GOOD + " " + bad)["c4_blocked"]
        assert not _flags(spark, GOOD)["c4_blocked"]

    def test_threshold_override(self, spark):
        f = _flags(spark, "five words are here now", min_words=3)
        assert not f["bad_word_count"]

    def test_metrics_are_exact_ratios(self, spark):
        df = spark.createDataFrame([("ab abc abcd",)], ["text"]) \
            .withColumn("g", gopher_struct(F.col("text")))
        m = gopher_metrics(F.col("g"))
        row = df.select(m["mean_word_len"].alias("mwl"),
                        m["alpha_word_frac"].alias("awf")).collect()[0]
        assert row.mwl == 9 / 3 and row.awf == 1.0

    def test_filter_gopher_partitions_corpus(self, spark):
        df = spark.createDataFrame(
            [(1, GOOD), (2, "too short"), (3, GOOD + " { code }")],
            ["doc_id", "text"])
        kept = {r.doc_id for r in
                filter_gopher(df, "text").collect()}
        dropped = {r.doc_id for r in
                   filter_gopher(df, "text", keep=False).collect()}
        assert kept == {1} and dropped == {2, 3}
        assert GOPHER_DEFAULTS["min_words"] == 50


class TestTokenClassifier:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, "spark sql shuffle join scan " +
                 ("fast " * (i % 3)), True) for i in range(10)]
        rows += [(100 + i, "der die das und ist " +
                  ("zu " * (i % 3)), False) for i in range(8)]
        return spark.createDataFrame(rows, ["doc_id", "text", "pos"])

    def test_weights_match_closed_form(self, corpus):
        wts, model = train_token_classifier(corpus, "text", "pos")
        w = {r.token: r.w_micro for r in wts.collect()}
        # recompute expected weight for 'spark' by hand
        toks = [(r.text.split(), r.pos) for r in corpus.collect()]
        c1 = sum(t.count("spark") for t, p in toks if p)
        c0 = sum(t.count("spark") for t, p in toks if not p)
        n1 = sum(len(t) for t, p in toks if p)
        n0 = sum(len(t) for t, p in toks if not p)
        v = len({x for t, _ in toks for x in t})
        want = round((math.log(c1 + 1) - math.log(n1 + v)
                      - math.log(c0 + 1) + math.log(n0 + v)) * 1e6)
        assert w["spark"] == want
        assert model.vocab_size == v
        assert model.n_pos_docs == 10 and model.n_neg_docs == 8

    def test_score_is_integer_sum(self, corpus):
        wts, model = train_token_classifier(corpus, "text", "pos")
        out = score_token_classifier(corpus, "doc_id", "text",
                                     wts, model)
        w = {r.token: r.w_micro for r in wts.collect()}
        for r in out.collect():
            text = {x.doc_id: x.text for x in corpus.collect()}[r.doc_id]
            toks = [t for t in text.split(" ") if t]
            want = model.prior_micro + sum(
                w.get(t, model.default_micro) for t in toks)
            assert r.score_micro == want
            assert r.score == want / model.quant
            assert r.pred == (want > 0)
            assert r.n_tokens == len(toks)

    def test_separates_classes(self, corpus):
        wts, model = train_token_classifier(corpus, "text", "pos")
        out = {r.doc_id: r.pred for r in
               score_token_classifier(corpus, "doc_id", "text",
                                      wts, model).collect()}
        assert all(out[i] for i in range(10))
        assert not any(out[100 + i] for i in range(8))

    def test_oov_counted_not_crashing(self, spark, corpus):
        wts, model = train_token_classifier(corpus, "text", "pos")
        probe = spark.createDataFrame(
            [(1, "spark qqq zzz"), (2, "")], ["doc_id", "text"])
        out = {r.doc_id: r for r in
               score_token_classifier(probe, "doc_id", "text",
                                      wts, model).collect()}
        assert out[1].n_oov == 2 and out[1].n_tokens == 3
        # zero-token doc survives with the bare prior
        assert out[2].n_tokens == 0
        assert out[2].score_micro == model.prior_micro

    def test_single_class_raises(self, spark):
        df = spark.createDataFrame([(1, "a b", True)],
                                   ["doc_id", "text", "pos"])
        with pytest.raises(ValueError):
            train_token_classifier(df, "text", "pos")

    def test_broadcast_plan(self, corpus):
        wts, model = train_token_classifier(corpus, "text", "pos")
        out = score_token_classifier(corpus, "doc_id", "text",
                                     wts, model)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
