"""End-to-end tests of the 18 sketch functions on Spark.

Ports the reference's ApproximateQuerySuite patterns
(``ApproximateQuerySuite.scala``): small inline datasets with nulls checked
against exact answers (sketches are exact on tiny inputs), the
accumulate -> combine -> estimate pipeline over time windows, and
error-handling rules.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import datasketches_spark_spark as dss
from datasketches_spark_spark import functions as dsf


@pytest.fixture(scope="module", autouse=True)
def installed(spark):
    dss.install(spark)


@pytest.fixture(scope="module")
def smalldf(spark):
    # mirrors ApproximateQuerySuite.scala:32-50 style: values with nulls
    data = [(None,), (1.0,), (2.0,), (3.0,), (4.0,), (5.0,), (6.0,),
            (7.0,), (8.0,), (9.0,), (10.0,), (None,)]
    return spark.createDataFrame(data, "v double")


class TestQuantiles:
    def test_direct_scalar(self, smalldf):
        for fn in (dsf.approx_percentile_ex, dsf.approx_percentile_kll,
                   dsf.approx_percentile_req, dsf.approx_percentile_mergeable):
            row = smalldf.agg(fn("v", 0.5).alias("p")).collect()[0]
            assert row.p == 5.0, fn.__name__

    def test_direct_array(self, smalldf):
        row = smalldf.agg(
            dsf.approx_percentile_ex("v", [0.1, 0.5, 0.95]).alias("p")).collect()[0]
        assert row.p == [1.0, 5.0, 10.0]

    def test_output_type_preservation(self, spark):
        # reference: output type follows input type (ApproximateQuerySuite.scala:52-65)
        df = spark.createDataFrame([(i,) for i in range(1, 11)], "v int")
        row = df.agg(dsf.approx_percentile_ex("v", 0.5, output_type="int")
                     .alias("p")).collect()[0]
        assert row.p == 5 and isinstance(row.p, int)

    def test_empty_input_returns_null(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "v double")
        assert df.agg(dsf.approx_percentile_ex("v", 0.5).alias("p")).collect()[0].p is None

    def test_invalid_percentage_raises_eagerly(self, smalldf):
        with pytest.raises(ValueError, match="between 0.0 and 1.0"):
            dsf.approx_percentile_ex("v", 1.5)
        with pytest.raises(ValueError, match="numeric"):
            dsf.approx_percentile_ex("v", "half")

    def test_sql_path_invalid_args_name_the_function(self, spark, smalldf):
        """Registered-UDF path: out-of-range args fail the query with the
        SQL function named (first-row validation — the reference raises
        AnalysisException at analysis, quantileSketches.scala:176-194;
        dss.sql() gets the true eager timing)."""
        import datasketches_spark_spark as dss
        dss.install(spark)
        smalldf.createOrReplaceTempView("val_t")
        with pytest.raises(Exception, match="approx_percentile_kll.*between"):
            spark.sql(
                "SELECT approx_percentile_kll(v, 1.5) FROM val_t").collect()
        with pytest.raises(Exception,
                           match="approx_pmf_estimate.*greater than 1"):
            spark.sql("""
                WITH s AS (SELECT approx_percentile_accumulate(v) AS st
                           FROM val_t)
                SELECT approx_pmf_estimate(st, 1) FROM s""").collect()

    def test_accumulate_combine_estimate(self, smalldf):
        acc = smalldf.agg(dsf.approx_percentile_accumulate("v").alias("state"))
        merged = acc.agg(dsf.approx_percentile_combine("state").alias("m"))
        row = merged.select(
            dsf.approx_percentile_estimate("m", 0.5).alias("p50"),
            dsf.approx_percentile_estimate("m", [0.1, 1.0]).alias("ps"),
            dsf.approx_pmf_estimate("m", 3).alias("pmf"),
        ).collect()[0]
        assert row.p50 == 5.0
        assert row.ps == [1.0, 10.0]
        assert len(row.pmf) == 3 and abs(sum(row.pmf) - 1.0) < 1e-12

    def test_estimate_null_and_corrupt(self, spark):
        df = spark.createDataFrame([(None,), (b"garbage",)], "state binary")
        rows = df.select(dsf.approx_percentile_estimate("state", 0.5).alias("p")).collect()
        assert [r.p for r in rows] == [None, None]

    def test_combine_raises_on_corrupt(self, spark):
        df = spark.createDataFrame([(b"garbage",)], "state binary")
        with pytest.raises(Exception):
            df.agg(dsf.approx_percentile_combine("state").alias("m")).collect()

    def test_invalid_num_splits(self, smalldf):
        with pytest.raises(ValueError, match="greater than 1"):
            dsf.approx_pmf_estimate("state", 1)

    def test_sql_registration(self, spark, smalldf):
        smalldf.createOrReplaceTempView("tiny")
        r = spark.sql("""
            SELECT approx_percentile_ex(v, 0.5) AS p,
                   approx_percentile_ex_array(v, array(0.1, 0.95)) AS ps
            FROM tiny""").collect()[0]
        assert r.p == 5.0 and r.ps == [1.0, 10.0]
        r2 = spark.sql("""
            WITH s AS (SELECT approx_percentile_accumulate(v) AS st FROM tiny),
                 m AS (SELECT approx_percentile_combine(st) AS m FROM s)
            SELECT approx_percentile_estimate(m, 0.5) AS p,
                   approx_pmf_estimate(m, 3) AS pmf FROM m""").collect()[0]
        assert r2.p == 5.0 and len(r2.pmf) == 3


class TestFreqItems:
    def test_direct_string(self, spark):
        # mirrors ApproximateQuerySuite.scala:202-220
        df = spark.createDataFrame(
            [("a",), ("a",), ("a",), ("b",), ("c",), (None,)], "v string")
        row = df.agg(dsf.approx_freqitems("v").alias("fi")).collect()[0]
        assert [(r.item, r.estimated) for r in row.fi] == [("a", 3), ("b", 1), ("c", 1)]

    def test_direct_long(self, spark):
        df = spark.createDataFrame([(7,), (7,), (8,), (None,)], "v long")
        row = df.agg(dsf.approx_freqitems("v", item_type="long").alias("fi")).collect()[0]
        assert [(r.item, r.estimated) for r in row.fi] == [(7, 2), (8, 1)]

    def test_lifecycle_and_inline(self, spark):
        df = spark.createDataFrame(
            [("g1", "a"), ("g1", "a"), ("g2", "b"), ("g2", "a")], "g string, v string")
        summ = df.groupBy("g").agg(dsf.approx_freqitems_accumulate("v").alias("state"))
        merged = summ.agg(dsf.approx_freqitems_combine("state").alias("m"))
        est = merged.select(dsf.approx_freqitems_estimate("m").alias("fi"))
        exploded = est.select(F.inline("fi")).collect()
        assert [(r.item, r.estimated) for r in exploded] == [("a", 3), ("b", 1)]

    def test_sql(self, spark):
        spark.createDataFrame([("x",), ("x",), ("y",)], "v string") \
            .createOrReplaceTempView("fi_t")
        rows = spark.sql(
            "SELECT inline(approx_freqitems(v)) FROM fi_t").collect()
        assert [(r.item, r.estimated) for r in rows] == [("x", 2), ("y", 1)]


class TestDistinctCount:
    def test_direct_exact_regime(self, spark):
        df = spark.createDataFrame([(i % 100,) for i in range(1000)], "v long")
        for fn in (dsf.approx_count_distinct_ex, dsf.approx_count_distinct_cpc,
                   dsf.approx_count_distinct_hll):
            row = df.agg(fn("v").alias("ndv")).collect()[0]
            assert row.ndv == 100, fn.__name__

    def test_string_input(self, spark):
        df = spark.createDataFrame([(f"u{i % 37}",) for i in range(500)], "v string")
        assert df.agg(dsf.approx_count_distinct_ex("v").alias("n")).collect()[0].n == 37

    def test_lifecycle_theta(self, spark):
        df = spark.createDataFrame(
            [("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3)], "g string, v long")
        summ = df.groupBy("g").agg(
            dsf.approx_count_distinct_accumulate("v").alias("state"))
        merged = summ.agg(dsf.approx_count_distinct_combine("state").alias("m"))
        row = merged.select(
            dsf.approx_count_distinct_estimate("m").alias("ndv")).collect()[0]
        assert row.ndv == 3

    def test_lifecycle_hll_builtin(self, spark):
        df = spark.createDataFrame(
            [("g1", 1), ("g1", 2), ("g2", 2), ("g2", 3)], "g string, v long")
        summ = df.groupBy("g").agg(
            dsf.approx_count_distinct_accumulate("v", impl="HLL").alias("state"))
        merged = summ.agg(
            dsf.approx_count_distinct_combine("state", impl="HLL").alias("m"))
        row = merged.select(
            dsf.approx_count_distinct_estimate("m", impl="HLL").alias("ndv")).collect()[0]
        assert row.ndv == 3

    def test_sql(self, spark):
        spark.createDataFrame([(i % 50,) for i in range(300)], "v long") \
            .createOrReplaceTempView("dc_t")
        r = spark.sql("""
            WITH s AS (SELECT approx_count_distinct_accumulate(CAST(v AS STRING)) AS st
                       FROM dc_t),
                 m AS (SELECT approx_count_distinct_combine(st) AS m FROM s)
            SELECT (SELECT approx_count_distinct_ex(v) FROM dc_t) AS a,
                   approx_count_distinct_estimate(m) AS b
            FROM m""").collect()[0]
        assert r.a == 50 and r.b == 50


class TestTwoPhaseOperator:
    def test_quantile_two_phase_matches_exact(self, spark, tables):
        from datasketches_spark_spark.operators import sketch_accumulate
        li = tables["lineitem"].repartition(8)
        summ = sketch_accumulate(li, ["l_returnflag"], "l_quantity",
                                 family="quantile", impl="MERGEABLE", k=65536)
        est = summ.select(
            "l_returnflag",
            dsf.approx_percentile_estimate("state", 0.5).alias("p50"))
        got = {r.l_returnflag: r.p50 for r in est.collect()}
        exact = {r.l_returnflag: r.p50 for r in li.groupBy("l_returnflag")
                 .agg(F.expr("percentile(l_quantity, 0.5)").alias("p50")).collect()}
        for k, v in exact.items():
            assert abs(got[k] - v) <= 1.0, (k, got[k], v)

    def test_theta_two_phase_exact_regime(self, spark, tables):
        from datasketches_spark_spark.operators import sketch_accumulate
        ev = tables["events"].repartition(8)
        summ = sketch_accumulate(ev, ["event_type"], "user_id", family="theta")
        est = summ.select("event_type",
                          dsf.approx_count_distinct_estimate("state").alias("ndv"))
        got = {r.event_type: r.ndv for r in est.collect()}
        exact = {r.event_type: r.n for r in
                 ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
        assert got == exact

    def test_freq_two_phase(self, spark, tables):
        from datasketches_spark_spark.operators import sketch_accumulate
        li = tables["lineitem"].repartition(8)
        summ = sketch_accumulate(li, [], "l_returnflag", family="freq")
        est = summ.select(dsf.approx_freqitems_estimate("state").alias("fi"))
        items = {r.item: r.estimated for r in est.select(F.inline("fi")).collect()}
        exact = {r.l_returnflag: r.c for r in
                 li.groupBy("l_returnflag").agg(F.count("*").alias("c")).collect()}
        assert items == exact


class TestTwoPhaseOperators:
    def test_sketch_grouped_agg_multi_measure(self, spark, tables):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            distinct_measure, percentile_measure, sketch_grouped_agg)
        li = tables["lineitem"].repartition(16)  # force multi-partition merge
        got = {r["l_returnflag"]: r for r in sketch_grouped_agg(
            li, ["l_returnflag"],
            percentile_measure("p50", "l_quantity", 0.5,
                               impl="MERGEABLE", k=262144),
            distinct_measure("ndv_supp", "l_suppkey", k=16384)).collect()}
        exact = {r["l_returnflag"]: r for r in li.groupBy("l_returnflag").agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50x"),
            F.countDistinct("l_suppkey").alias("ndvx")).collect()}
        for flag, row in got.items():
            assert row["ndv_supp"] == exact[flag]["ndvx"]
            # engine rank rule = value at ceil(p*n); exact percentile
            # interpolates — allow the one-value gap
            assert abs(row["p50"] - exact[flag]["p50x"]) <= 1.0

    def test_sketch_partial_bounded_flush(self, spark, tables):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            sketch_merge, sketch_partial)
        from datasketches_spark_spark import functions as dsf
        ev = tables["events"]
        # max_groups=2 forces repeated mid-partition flushes; phase-2 merge
        # must still produce identical exact-regime results
        partial = sketch_partial(ev, ["event_type"], "user_id",
                                 family="theta", k=16384, max_groups=2)
        merged = sketch_merge(partial, ["event_type"])
        got = {r["event_type"]: r["ndv"] for r in merged.select(
            "event_type",
            dsf.approx_count_distinct_estimate("state").alias("ndv")).collect()}
        exact = {r["event_type"]: r["ndv"] for r in ev.groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("ndv")).collect()}
        assert got == exact

    def test_single_group_map_side_combine(self, spark, tables):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            freqitems_measure, sketch_grouped_agg)
        od = tables["orders"].repartition(8)
        fi = sketch_grouped_agg(od, [],
                                freqitems_measure("fi", "o_orderpriority"))
        got = dict((r["item"], r["estimated"])
                   for r in fi.select(F.inline("fi")).collect())
        exact = dict((r["o_orderpriority"], r["n"])
                     for r in od.groupBy("o_orderpriority")
                     .agg(F.count("*").alias("n")).collect())
        assert got == exact

    def test_sql_hll_name_works_bare(self, spark, tables):
        """The reference registers approx_count_distinct_hll as a plain SQL
        name (shims.scala:32-56) — so does the engine: a GROUPED_AGG UDAF
        over the engine HLL at distinctCnt.hll.lgK, accuracy-equivalent to
        the JVM hll_sketch_agg fast path used by dss.sql/DataFrame."""
        import datasketches_spark_spark as dss
        from datasketches_spark_spark import functions as dsf
        dss.install(spark)
        n = spark.sql(
            "SELECT approx_count_distinct_hll(user_id) AS n FROM events"
        ).collect()[0].n
        jvm = (spark.table("events")
               .agg(dsf.approx_count_distinct_hll("user_id").alias("n"))
               .collect()[0].n)
        assert n > 0 and abs(n - jvm) <= max(3, 0.05 * jvm)
        # the Theta name keeps working
        t = spark.sql(
            "SELECT approx_count_distinct_theta(user_id) AS n FROM events"
        ).collect()[0].n
        assert t > 0


class TestTypePreservation:
    def test_percentile_output_type_matrix(self, spark):
        # reference type matrix (ApproximateQuerySuite.scala:52-65):
        # approx_percentile_ex output type == input column type
        from decimal import Decimal
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg)
        df = spark.createDataFrame(
            [(1, 1, 1, 1.0, 1.0, Decimal("1.00")),
             (2, 2, 2, 2.0, 2.0, Decimal("2.00")),
             (3, 3, 3, 3.0, 3.0, Decimal("3.00"))],
            "c_byte tinyint, c_int int, c_long bigint, c_float float, "
            "c_double double, c_dec decimal(10,2)")
        ms = [percentile_measure(f"p_{c}", c, 0.5, impl="MERGEABLE",
                                 k=1024, preserve_type=True)
              for c in df.columns]
        out = sketch_grouped_agg(df, [], *ms)
        got = dict(out.dtypes)
        assert got == {"p_c_byte": "tinyint", "p_c_int": "int",
                       "p_c_long": "bigint", "p_c_float": "float",
                       "p_c_double": "double", "p_c_dec": "decimal(10,2)"}
        row = out.collect()[0]
        assert row.p_c_int == 2
        assert row.p_c_dec == Decimal("2.00")

    def test_multi_percentage_array_type_preserved(self, spark):
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg)
        df = spark.createDataFrame([(i,) for i in range(1, 101)], "v int")
        out = sketch_grouped_agg(
            df, [], percentile_measure("qs", "v", [0.25, 0.75],
                                       impl="MERGEABLE", k=1024,
                                       preserve_type=True))
        assert dict(out.dtypes)["qs"] == "array<int>"
        assert out.collect()[0].qs == [25, 75]

    def test_estimate_from_state_stays_double(self, spark):
        # reference parity: estimate-from-state is always double
        # (quantileSketches.scala:601-605)
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([(i,) for i in range(1, 11)], "v int")
        st = df.agg(dsf.approx_percentile_accumulate(
            "v", impl="MERGEABLE").alias("s"))
        out = st.select(dsf.approx_percentile_estimate("s", 0.5).alias("e"))
        assert dict(out.dtypes)["e"] == "double"


class TestSources:
    def test_csv_roundtrip(self, spark, tmp_path):
        import os
        from datasketches_spark_spark.sources import read_csv
        p = os.path.join(str(tmp_path), "t.csv")
        with open(p, "w") as f:
            f.write("a;b\n1;x\n2;y\n")
        df = read_csv(spark, p, sep=";")
        assert df.columns == ["a", "b"]
        assert df.count() == 2
        assert dict(df.dtypes)["a"] == "int"  # inferSchema

    def test_write_summary_partitioned(self, spark, tables, tmp_path):
        import os
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.operators import sketch_accumulate
        from datasketches_spark_spark.sources import write_summary
        from pyspark.sql import functions as F
        ev = tables["events"]
        summ = sketch_accumulate(ev, ["event_type"], "user_id",
                                 family="theta", k=16384)
        path = os.path.join(str(tmp_path), "summaries")
        write_summary(summ, path, partition_by=["event_type"])
        back = spark.read.parquet(path)
        # partition-pruned subset re-combines correctly
        one = (back.where(F.col("event_type") == "click")
               .agg(dsf.approx_count_distinct_combine("state").alias("m"))
               .select(dsf.approx_count_distinct_estimate("m").alias("ndv"))
               .collect())
        exact = ev.where("event_type = 'click'") \
                  .agg(F.countDistinct("user_id").alias("n")).collect()
        assert one[0].ndv == exact[0].n


class TestHllTwoPhase:
    def test_hll_measure_accuracy_and_lifecycle(self, spark, tables):
        from pyspark.sql import functions as F
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.operators import (
            distinct_measure, sketch_accumulate, sketch_grouped_agg)
        ev = tables["events"].repartition(8)
        got = {r.event_type: r.ndv for r in sketch_grouped_agg(
            ev, ["event_type"],
            distinct_measure("ndv", "user_id", impl="hll")).collect()}
        exact = {r.event_type: r.n for r in ev.groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("n")).collect()}
        for k, n in exact.items():
            assert abs(got[k] - n) / n < 0.05, (k, got[k], n)  # lgk=12
        # lifecycle: hll states flow through the family-agnostic
        # combine/estimate functions
        summ = sketch_accumulate(ev, ["event_type"], "user_id", family="hll")
        est = (summ.agg(dsf.approx_count_distinct_combine("state").alias("m"))
               .select(dsf.approx_count_distinct_estimate("m").alias("ndv"))
               .collect()[0].ndv)
        total = ev.select("user_id").distinct().count()
        assert abs(est - total) / total < 0.05


class TestWindowStructKeys:
    def test_accumulate_by_time_window_struct(self, spark, tables):
        # the reference's flagship groups by window(...) (README.md:68-100);
        # a struct key arrives in pandas as an unhashable dict — covered by
        # the _iter_groups fallback
        from pyspark.sql import functions as F
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.operators import sketch_accumulate
        ev = tables["events"]
        summ = sketch_accumulate(
            ev.select(F.window("ts", "1 week").alias("window"), "value"),
            ["window"], "value", family="quantile", impl="MERGEABLE",
            k=262_144)
        rows = summ.collect()
        assert len(rows) == ev.select(F.window("ts", "1 week")).distinct().count()
        assert all(r.window.start is not None for r in rows)
        merged = summ.agg(dsf.approx_percentile_combine("state").alias("m"))
        got = merged.select(
            dsf.approx_percentile_estimate("m", 0.5).alias("p50")).collect()[0].p50
        exact = ev.selectExpr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY value) p").collect()[0].p
        assert got == float(exact)


class TestRankCdf:
    def test_rank_and_cdf_exact_regime(self, spark, tables):
        from datasketches_spark_spark import functions as dsf
        from pyspark.sql import functions as F
        li = tables["lineitem"]
        st = li.agg(dsf.approx_percentile_accumulate(
            "l_quantity", impl="MERGEABLE", k=262_144).alias("s"))
        row = st.select(
            dsf.approx_rank_estimate("s", 25).alias("r25"),
            dsf.approx_cdf_estimate("s", [10, 25, 40]).alias("cdf")).collect()[0]
        n = li.count()
        exact_r25 = li.where("l_quantity <= 25").count() / n
        assert row.r25 == pytest.approx(exact_r25)
        assert row.cdf[-1] == 1.0
        assert row.cdf == sorted(row.cdf)  # monotone
        assert row.cdf[1] == pytest.approx(exact_r25)

    def test_rank_inverts_quantile(self, spark, tables):
        from datasketches_spark_spark import functions as dsf
        li = tables["lineitem"]
        st = li.agg(dsf.approx_percentile_accumulate(
            "l_quantity", impl="MERGEABLE", k=262_144).alias("s"))
        q = st.select(dsf.approx_percentile_estimate("s", 0.5).alias("q")
                      ).collect()[0].q
        r = st.select(dsf.approx_rank_estimate("s", q).alias("r")).collect()[0].r
        assert r >= 0.5  # rank of the p50 value covers at least half the mass


def test_sql_approx_join_size(spark, tables):
    """The bare-SQL name computes the exact pair count in exact regime."""
    import datasketches_spark_spark as dss
    dss.install(spark)
    got = spark.sql("""
      WITH st AS (SELECT event_type,
           approx_freqitems_accumulate(CAST(user_id AS STRING)) AS s
           FROM events GROUP BY event_type)
      SELECT approx_join_size(a.s, b.s) AS j
      FROM st a JOIN st b
      ON a.event_type = 'click' AND b.event_type = 'view'
    """).collect()[0].j
    want = spark.sql("""
      WITH c AS (SELECT event_type, user_id, count(*) n
                 FROM events GROUP BY 1, 2)
      SELECT sum(a.n * b.n) AS j FROM c a JOIN c b
      ON a.user_id = b.user_id
      AND a.event_type = 'click' AND b.event_type = 'view'
    """).collect()[0].j
    assert got == want
