"""Plan-shape locks for round-18 optimizations.

These pin the STRUCTURE the optimizations bought (values are covered by
the oracle-gated tests): token arrays bound once per row before ngram
explosion, and driver-built local relations landing as Arrow-backed
plans instead of pickled Python RDDs.
"""

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.sources import arrow_local_df


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


@pytest.fixture()
def docs_df(tables):
    return tables["documents"]


def test_dsir_plan_tokenizes_once_per_scan(spark, docs_df):
    from datasketches_spark_spark.operators import dsir_weights
    dw = dsir_weights(docs_df, "doc_id", "text",
                      F.col("lang") == "en", buckets=64)
    # two explode scans (bucket table + per-doc reduce), each splitting
    # the document exactly once — the inline form re-split per ngram
    # slice reference (10 split( nodes before the r18 binding)
    assert _plan(dw).count("split(") == 2


def test_bigram_lm_plan_tokenizes_once(spark, docs_df):
    from datasketches_spark_spark.operators import train_bigram_lm
    _, bi = train_bigram_lm(docs_df, "text")
    assert _plan(bi).count("split(") == 1


def test_arrow_local_df_is_not_python_rdd_backed(spark):
    rows = [("a", b"\x01", [1.0, 2.0]), ("b", None, None)]
    ddl = "k string, payload binary, v array<double>"
    df = arrow_local_df(spark, rows, ddl)
    plan = _plan(df)
    # the pickled-tuple path plans as "Scan ExistingRDD" and re-runs a
    # Python deserialization job per action; the Arrow path must not
    assert "ExistingRDD" not in plan
    assert df.schema == spark.createDataFrame(rows, ddl).schema
    assert [tuple(r) for r in df.collect()] == \
        [tuple(r) for r in spark.createDataFrame(rows, ddl).collect()]


def test_classifier_weights_do_not_reexecute_corpus_explode(spark, docs_df):
    from datasketches_spark_spark.operators import train_token_classifier
    wts, model = train_token_classifier(docs_df, "text",
                                        F.col("lang") == "en")
    # the count table is localCheckpoint-ed inside train: consumers plan
    # from the materialized rows, not the corpus scan
    assert "Scan parquet" not in _plan(wts)
    assert "split(" not in _plan(wts)
