"""Readability metrics (functions/quality_rules.py::readability_*)
and meta-content extraction (functions/html.py::html_meta_content):
counts match hand-derivations, metric formulas match the published
Flesch constants, and both stay scan-stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.html import html_meta_content
from datasketches_spark_spark.functions.quality_rules import (
    readability_metrics, readability_struct)


def _counts(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    r = df.select(readability_struct("t").alias("r")) \
        .select("r.words", "r.sentences", "r.syllables").collect()[0]
    return r.words, r.sentences, r.syllables


class TestReadabilityCounts:
    @pytest.mark.parametrize("text,words,sents,syls", [
        # "the cat sat." -> 3 words, 1 sentence, 3 one-group words
        ("the cat sat.", 3, 1, 3),
        # silent-e rule: "date" 1, "tea" 1, "audio" au-dio = 2
        ("date tea audio", 3, 1, 4),
        # sentence runs: "..." is ONE boundary run; punctuation is
        # stripped before the vowel scan ("one..." = 1 syllable)
        ("one... two! three?", 3, 3, 3),
        # no(1) terminal(3) punctuation(3) here(1: silent e)
        ("no terminal punctuation here", 4, 1, 8),
        # every word >= 1 syllable even with no vowels
        ("hm tsk", 2, 1, 2),
        ("", 0, 1, 0),
    ])
    def test_hand_counts(self, spark, text, words, sents, syls):
        assert _counts(spark, text) == (words, sents, syls)

    def test_flesch_formula(self, spark):
        df = spark.createDataFrame([("the cat sat on the mat.",)],
                                   ["t"])
        bound = df.withColumn("r", readability_struct("t"))
        m = readability_metrics(F.col("r"))
        row = bound.select(
            m["flesch_reading_ease"].alias("fre"),
            m["fk_grade_level"].alias("fk")).collect()[0]
        # 6 words, 1 sentence, 6 syllables
        fre = 206.835 - 1.015 * 6.0 - 84.6 * 1.0
        fk = 0.39 * 6.0 + 11.8 * 1.0 - 15.59
        assert abs(row.fre - fre) < 1e-9
        assert abs(row.fk - fk) < 1e-9

    def test_empty_doc_is_null_not_nan(self, spark):
        df = spark.createDataFrame([("",)], ["t"])
        bound = df.withColumn("r", readability_struct("t"))
        m = readability_metrics(F.col("r"))
        row = bound.select(
            m["flesch_reading_ease"].alias("fre")).collect()[0]
        assert row.fre is None

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("x y.",)], ["t"])
        bound = df.withColumn("r", readability_struct("t"))
        out = bound.select(
            readability_metrics(F.col("r"))["fk_grade_level"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()


class TestHtmlMetaContent:
    def _one(self, spark, html, name):
        df = spark.createDataFrame([(html,)], ["h"])
        return df.select(
            html_meta_content("h", name).alias("v")).collect()[0].v

    @pytest.mark.parametrize("html,name,want", [
        ('<meta name="description" content="A page about cats.">',
         "description", "A page about cats."),
        ("<META NAME='Keywords' CONTENT='a, b'>", "keywords", "a, b"),
        ('<meta property="og:title" content="The &amp; Title"/>',
         "og:title", "The & Title"),
        # reversed attribute order
        ('<meta content="rev order" name="description">',
         "description", "rev order"),
        ('<meta content=unquoted name="robots"/>',
         "robots", "unquoted"),
        ("<p>no meta at all</p>", "description", None),
        # name must match exactly, not a prefix
        ('<meta name="description2" content="x">', "description",
         None),
    ])
    def test_cases(self, spark, html, name, want):
        assert self._one(spark, html, name) == want

    def test_og_pair(self, spark):
        html = ('<head><meta property="og:title" content="T"/>'
                '<meta property="og:description" content="D"/></head>')
        df = spark.createDataFrame([(html,)], ["h"])
        r = df.select(
            html_meta_content("h", "og:title").alias("t"),
            html_meta_content("h", "og:description").alias("d")) \
            .collect()[0]
        assert (r.t, r.d) == ("T", "D")

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("<meta name=a content=b>",)],
                                   ["h"])
        out = df.select(html_meta_content("h", "a"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()
