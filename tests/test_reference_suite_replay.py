"""Replay of the reference's own end-to-end suite
(``ApproximateQuerySuite.scala``): its literal VALUES queries, its
expected answers.

Quantile expectations use the DataSketches v2 exclusive rank rule the
reference inherits; the engine reproduces them under
``spark.sql.dataSketches.quantiles.rankRule = exclusive`` (the default
``disc`` rule matches SQL ``quantile_disc`` and the driver's DuckDB
oracle instead — see ``sketches/kll.py`` module docstring).

Deliberately NOT replayed:
* ``bit_length(summaries)`` asserts — engine states are this engine's
  wire format (sizes differ by design; export to DataSketches bytes is
  ``compat``'s job and golden-byte-tested there);
* ``approx_pmf_estimate`` over the windowed summary — the reference's
  split points omit ``getMinValue`` (``quantileSketches.scala:100-103``:
  ``(1 until numSplits).map(_ * splitSize)``), so its bins are anchored
  at 0 rather than the min; its expected ``[0.0, 1.0]`` encodes that
  bug. This engine anchors bins at the min (the evident intent), and
  q04's DuckDB oracle pins that behavior;
* the windowed ``where`` filters — their expected rows are timezone-
  sensitive (session-local ``window()`` boundaries vs string timestamp
  comparison).
"""

from __future__ import annotations

import pytest

import datasketches_spark_spark as dss
from datasketches_spark_spark import conf as dconf


@pytest.fixture()
def exclusive_rule(spark):
    spark.conf.set(dconf.QUANTILE_RANK_RULE_KEY, "exclusive")
    dss.install(spark)
    yield spark
    spark.conf.unset(dconf.QUANTILE_RANK_RULE_KEY)
    dss.install(spark)


class TestApproximateQuerySuiteReplay:
    # ApproximateQuerySuite.scala:32-49
    @pytest.mark.parametrize("impl", ["KLL", "REQ"])
    def test_percentile_values(self, exclusive_rule, impl):
        spark = exclusive_rule
        spark.conf.set(dconf.QUANTILE_IMPL_KEY, impl)
        dss.install(spark)
        try:
            (r1,) = spark.sql(
                "SELECT approx_percentile_ex_array(c, array(0.5, 0.4, 0.1)) "
                "AS q FROM VALUES (0), (1), (2), (null), (10) AS t(c)"
            ).collect()
            assert r1["q"] == [2.0, 1.0, 0.0]
            (r2,) = spark.sql(
                "SELECT approx_percentile_ex(c, 0.5) AS q "
                "FROM VALUES (0), (6), (7), (null), (9), (10) AS t(c)"
            ).collect()
            assert r2["q"] == 7.0
        finally:
            spark.conf.unset(dconf.QUANTILE_IMPL_KEY)
            dss.install(spark)

    # ApproximateQuerySuite.scala:86-103 (KLL/REQ/MERGEABLE same answer)
    def test_percentile_all_impls(self, exclusive_rule):
        spark = exclusive_rule
        for fn in ("approx_percentile_kll", "approx_percentile_req",
                   "approx_percentile_mergeable"):
            (row,) = spark.sql(
                f"SELECT {fn}(c, 0.5) AS q "
                "FROM VALUES (0), (1), (2), (null), (10) AS t(c)").collect()
            assert row["q"] == 2.0, fn

    # ApproximateQuerySuite.scala:105-147 — the summary workflow on the
    # same VALUES, minus the timezone-sensitive window filter: accumulate
    # per date, combine all, estimate. Expected answers recomputed under
    # the exclusive rule over the full 10-value stream.
    def test_mergeable_percentile_summary_workflow(self, exclusive_rule):
        spark = exclusive_rule
        spark.conf.set(dconf.QUANTILE_IMPL_KEY, "MERGEABLE")
        dss.install(spark)
        try:
            spark.sql("""
                CREATE OR REPLACE TEMPORARY VIEW ref_t AS SELECT * FROM VALUES
                  (date("2021-01-01"), 1.0), (date("2021-01-01"), 1.0),
                  (date("2021-01-01"), 2.0), (date("2021-01-02"), 3.0),
                  (date("2021-01-02"), 2.0), (date("2021-01-02"), 1.0),
                  (date("2021-01-02"), null), (date("2021-01-03"), 3.0),
                  (date("2021-01-03"), 3.0), (date("2021-01-03"), 2.0),
                  (date("2021-01-04"), 1.0)
                AS t(date, v)""")
            (row,) = spark.sql("""
                SELECT approx_percentile_estimate(merged, 0.95) AS p95,
                       approx_percentile_estimate_array(
                           merged, array(0.05, 0.50, 0.95)) AS qs
                FROM (SELECT approx_percentile_combine(st) AS merged
                      FROM (SELECT date, approx_percentile_accumulate(v) AS st
                            FROM ref_t GROUP BY date))""").collect()
            # stream = {1.0 x4, 2.0 x3, 3.0 x3}, n=10, exclusive rule:
            # floor(p*10) -> p95: idx 9 -> 3.0; p05: idx 0 -> 1.0;
            # p50: idx 5 -> 2.0
            assert row["p95"] == 3.0
            assert row["qs"] == [1.0, 2.0, 3.0]
        finally:
            spark.conf.unset(dconf.QUANTILE_IMPL_KEY)
            dss.install(spark)

    # ApproximateQuerySuite.scala:202-219
    def test_freqitems_values(self, spark):
        dss.install(spark)
        (row,) = spark.sql(
            "SELECT approx_freqitems(c) AS top FROM VALUES "
            "('a'), ('a'), ('b'), (null), ('c'), ('a') AS t(c)").collect()
        # reference expects a:3, c:1, b:1 (its tie order is a hash-map
        # artifact; compare as a multiset)
        assert {(e["item"], e["estimated"]) for e in row["top"]} == {
            ("a", 3), ("b", 1), ("c", 1)}

        (row2,) = spark.sql(
            "SELECT approx_freqitems_long(CAST(c AS LONG)) AS top "
            "FROM VALUES (1), (1), (2), (null), (3), (1) AS t(c)").collect()
        assert {(e["item"], e["estimated"]) for e in row2["top"]} == {
            (1, 3), (2, 1), (3, 1)}

    # ApproximateQuerySuite.scala:262-279
    def test_distinct_count_values(self, spark):
        dss.install(spark)
        for fn in ("approx_count_distinct_ex", "approx_count_distinct_cpc",
                   "approx_count_distinct_theta"):
            (r1,) = spark.sql(
                f"SELECT {fn}(c) AS ndv FROM VALUES "
                "('a'), ('a'), ('b'), (null), ('b'), ('c') AS t(c)").collect()
            assert r1["ndv"] == 3, fn
            for t in ("TINYINT", "SHORT", "INT", "LONG", "STRING"):
                (r2,) = spark.sql(
                    f"SELECT {fn}(CAST(c AS {t})) AS ndv FROM VALUES "
                    "(1), (1), (2), (null), (2), (3) AS t(c)").collect()
                assert r2["ndv"] == 3, (fn, t)

    # ApproximateQuerySuite.scala:281-318 — distinct summary workflow
    def test_mergeable_distinct_summary_workflow(self, spark):
        dss.install(spark)
        spark.sql("""
            CREATE OR REPLACE TEMPORARY VIEW ref_d AS SELECT * FROM VALUES
              (date("2021-01-01"), 'a'), (date("2021-01-01"), 'a'),
              (date("2021-01-01"), 'a'), (date("2021-01-02"), 'b'),
              (date("2021-01-02"), 'a'), (date("2021-01-02"), 'b'),
              (date("2021-01-02"), null), (date("2021-01-03"), 'b'),
              (date("2021-01-03"), 'a'), (date("2021-01-03"), 'c'),
              (date("2021-01-04"), 'a')
            AS t(date, v)""")
        (row,) = spark.sql("""
            SELECT approx_count_distinct_estimate(
                     approx_count_distinct_combine(st)) AS ndv
            FROM (SELECT date, approx_count_distinct_accumulate(v) AS st
                  FROM ref_d GROUP BY date)""").collect()
        assert row["ndv"] == 3

    # default rule stays disc: the same literal query answers like
    # quantile_disc (the oracle contract), NOT like the reference
    def test_disc_rule_default_differs_documentedly(self, spark):
        dss.install(spark)
        (row,) = spark.sql(
            "SELECT approx_percentile_ex(c, 0.5) AS q "
            "FROM VALUES (0), (1), (2), (null), (10) AS t(c)").collect()
        assert row["q"] == 1.0  # rank max(ceil(0.5*4),1)=2 -> sorted[2nd]
