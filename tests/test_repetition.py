"""Repetition-feature contracts on hand-built documents."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.text import repetition_features


def _feats(spark, text):
    df = spark.createDataFrame([Row(t=text)], "t string")
    r = repetition_features("t")
    return df.select(*[v.alias(k) for k, v in r.items()]).collect()[0]


def test_no_repetition(spark):
    r = _feats(spark, "a b c d")
    assert (r.n_tokens, r.n_distinct) == (4, 4)
    assert r.dup_token_frac == 0.0
    assert r.dup_bigram_frac == 0.0
    assert r.top_bigram_n == 1 and r.top_bigram_frac == 1.0 / 3.0


def test_full_repetition(spark):
    r = _feats(spark, "x x x x")
    assert (r.n_tokens, r.n_distinct) == (4, 1)
    assert r.dup_token_frac == 0.75
    # bigrams: ["x x"] * 3 -> all duplicates past the first
    assert r.top_bigram_n == 3 and r.top_bigram_frac == 1.0
    assert r.dup_bigram_frac == 2.0 / 3.0


def test_dominant_bigram(spark):
    r = _feats(spark, "a b a b c")
    # bigrams: "a b","b a","a b","b c" -> top is "a b" twice over 4
    assert r.top_bigram_n == 2
    assert r.top_bigram_frac == 0.5


def test_degenerate_docs(spark):
    one = _feats(spark, "solo")
    assert (one.n_tokens, one.n_distinct) == (1, 1)
    assert one.dup_token_frac == 0.0
    # no bigrams: NULL fractions, not division errors
    assert one.top_bigram_n is None and one.top_bigram_frac is None
    assert one.dup_bigram_frac is None

    empty = _feats(spark, "")
    assert empty.n_tokens == 0
    assert empty.dup_token_frac is None


def test_shuffle_free_plan(spark):
    df = spark.createDataFrame([Row(t="a b c")])
    r = repetition_features("t")
    out = df.select(*[v.alias(k) for k, v in r.items()])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan


def test_null_text_propagates_null(spark):
    from datasketches_spark_spark.functions.text import (
        repetition_fractions, repetition_struct)
    df = spark.createDataFrame([Row(t=None)], "t string")
    base = df.select(repetition_struct("t").alias("r"))
    row = base.collect()[0].r
    assert row.n_tokens is None and row.top_bigram_n is None
    fr = repetition_fractions(F.col("r"))
    assert base.select(fr["dup_token_frac"].alias("d")).collect()[0].d is None
