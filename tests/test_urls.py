"""URL canonicalization functions (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_registered_domain,
)


def _one(spark, url, col):
    df = spark.createDataFrame([(url,)], ["u"])
    return df.select(col.alias("v")).collect()[0].v


CANON_CASES = [
    # tracking params dropped, survivors sorted, www + default port off,
    # fragment off, trailing slash off
    ("http://WWW.Site.com:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://site.com/a/b?a=1&b=2"),
    # https default port; userinfo preserved; path slashes collapse only
    # at the tail
    ("https://user@sub.shop.co.uk:443/p//", "https://user@sub.shop.co.uk/p"),
    # only-tracking query drops the '?' entirely
    ("HTTPS://Example.COM/path?gclid=1", "https://example.com/path"),
    # already canonical: fixed point
    ("https://example.com/path?a=1&b=2", "https://example.com/path?a=1&b=2"),
    # non-default port preserved; non-http scheme untouched by port rules
    ("ftp://Files.example.org:21/x", "ftp://files.example.org:21/x"),
    # ref is tracking
    ("https://example.com/?ref=abc", "https://example.com"),
]


class TestCanonicalize:
    @pytest.mark.parametrize("url,want", CANON_CASES)
    def test_cases(self, spark, url, want):
        assert _one(spark, url, canonicalize_url("u")) == want

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], ["u"])
        once = df.select(canonicalize_url("u").alias("u"))
        twice = once.select(canonicalize_url("u").alias("u"))
        assert [r.u for r in once.collect()] == \
            [r.u for r in twice.collect()]

    def test_variants_collapse_for_dedup(self, spark):
        variants = ["https://WWW.news.com:443/a?utm_source=t&x=1#top",
                    "https://news.com/a?x=1",
                    "https://news.com/a/?x=1&fbclid=99"]
        df = spark.createDataFrame([(u,) for u in variants], ["u"])
        n = (df.select(canonicalize_url("u").alias("c"))
             .distinct().count())
        assert n == 1

    def test_no_scheme_passthrough_host_null(self, spark):
        assert _one(spark, "not a url", url_host("u")) is None


class TestHostAndDomain:
    @pytest.mark.parametrize("url,host,rd", [
        ("https://a.b.Example.COM/x", "a.b.example.com", "example.com"),
        ("http://sub.shop.co.uk/", "sub.shop.co.uk", "shop.co.uk"),
        ("http://co.uk/", "co.uk", "co.uk"),
        ("http://localhost:8080/x", "localhost", "localhost"),
        ("https://user:pw@secure.example.com/x",
         "secure.example.com", "example.com"),
    ])
    def test_cases(self, spark, url, host, rd):
        assert _one(spark, url, url_host("u")) == host
        assert _one(spark, url, url_registered_domain("u")) == rd

    def test_custom_suffixes(self, spark):
        got = _one(spark, "https://a.b.my.suffix/x",
                   url_registered_domain("u", multi_suffixes=("my.suffix",)))
        assert got == "b.my.suffix"

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("https://a.example.com/x?b=1",)],
                                   ["u"])
        out = df.select(canonicalize_url("u"), url_registered_domain("u"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "pythonUDF" not in plan.lower()
