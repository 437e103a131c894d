"""PII redaction: pattern behavior, ordering, subsetting, count coherence."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.redact import (
    PII_PATTERNS, pii_counts, redact_pii)


def _one(spark, text, **kw):
    df = spark.createDataFrame([Row(t=text)])
    return df.select(redact_pii("t", **kw).alias("r")).collect()[0].r


def test_each_kind(spark):
    assert _one(spark, "mail bob.smith+x@ex-corp.io now") == "mail <EMAIL> now"
    assert _one(spark, "see https://ex.com/a?b=1 ok") == "see <URL> ok"
    assert _one(spark, "host 192.168.0.1 up") == "host <IP> up"
    assert _one(spark, "call +1-555-0100 now") == "call <PHONE> now"
    # spaces between digit runs are part of one phone match by design
    assert _one(spark, "call +1-555-0100 42") == "call <PHONE>"


def test_order_url_swallows_email_and_ip(spark):
    # an email-looking or IP-looking substring inside a URL is one <URL>
    assert _one(spark, "x http://a@b.co/10.0.0.1 y") == "x <URL> y"


def test_phone_runs_after_ip(spark):
    # the IP's digits are consumed by <IP>, not re-matched as a phone
    assert _one(spark, "10.0.0.1 then 555-0100-999") == "<IP> then <PHONE>"


def test_multiple_matches_and_clean_text(spark):
    assert _one(spark, "a@b.co c@d.io") == "<EMAIL> <EMAIL>"
    clean = "no pii here just words"
    assert _one(spark, clean) == clean


def test_kinds_subset(spark):
    t = "a@b.co and 10.0.0.1"
    assert _one(spark, t, kinds=["EMAIL"]) == "<EMAIL> and 10.0.0.1"
    with pytest.raises(ValueError, match="unknown"):
        redact_pii("t", kinds=["SSN"])


def test_counts_match_replacements(spark):
    """For every kind, n replacements observed == the reported count."""
    df = spark.createDataFrame(
        [Row(t="u@v.co w@x.io https://y.z 1.2.3.4 +1-555-0100-42")])
    c = pii_counts(F.col("t"))
    row = df.select(redact_pii("t").alias("r"),
                    *[c[tag].alias(tag) for tag, _ in PII_PATTERNS]
                    ).collect()[0]
    for tag, _ in PII_PATTERNS:
        assert row.r.count(f"<{tag}>") == row[tag], tag
    assert (row.URL, row.EMAIL, row.IP, row.PHONE) == (1, 2, 1, 1)


def test_null_passthrough(spark):
    df = spark.createDataFrame([Row(t=None)], "t string")
    assert df.select(redact_pii("t").alias("r")).collect()[0].r is None
