"""Approximate-regime accuracy vs exact answers at default sketch sizes —
the engine-side evidence for BASELINE.md's accuracy targets (quantile rank
error ~1%, KMV NDV RSE ~1.6% at k=4096, freq-items NO_FALSE_POSITIVES),
checked against exact Spark aggregates on the sf0.001 fixtures plus
larger synthetic columns."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestQuantileAccuracy:
    def test_default_req_rank_error_on_synthetic_2m(self, spark):
        # BASELINE.md: reference REQ p95 within ~0.5% of exact on 2M rows
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg)
        n = 2_000_000
        df = (spark.range(n)
              .select((F.hash("id") % 1_000_000).cast("double").alias("v")))
        out = sketch_grouped_agg(
            df, [], percentile_measure("p95", "v", 0.95))  # default conf: REQ k=12
        got = out.collect()[0].p95
        exact_rank = (df.where(F.col("v") <= got).count()) / n
        assert abs(exact_rank - 0.95) < 0.01  # <1% rank error at p95

    def test_kll_default_rank_error(self, spark):
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg)
        n = 500_000
        df = (spark.range(n)
              .select((F.hash("id") % 1_000_000).cast("double").alias("v")))
        out = sketch_grouped_agg(
            df, [], percentile_measure("p50", "v", 0.5, impl="KLL"))  # k=200
        got = out.collect()[0].p50
        exact_rank = (df.where(F.col("v") <= got).count()) / n
        assert abs(exact_rank - 0.5) < 0.02


class TestNdvAccuracy:
    def test_kmv_default_rse(self, spark):
        # default k=4096: RSE ~ 1/sqrt(k-2) ~ 1.6%; allow 3 sigma
        from datasketches_spark_spark.operators import (
            distinct_measure, sketch_grouped_agg)
        df = spark.range(500_000).select(F.hash("id").alias("v"))
        nd = df.distinct().count()
        got = sketch_grouped_agg(df, [], distinct_measure("ndv", "v")).collect()[0].ndv
        assert abs(got - nd) / nd < 3 * 0.016

    def test_hll_default_rse(self, spark):
        from datasketches_spark_spark.operators import (
            distinct_measure, sketch_grouped_agg)
        df = spark.range(500_000).select(F.hash("id").alias("v"))
        nd = df.distinct().count()
        got = sketch_grouped_agg(df, [],
                                 distinct_measure("ndv", "v",
                                                  impl="hll")).collect()[0].ndv
        assert abs(got - nd) / nd < 3 * (1.04 / 2 ** 6)  # lgk=12

    def test_cpc_default_path_within_1pct_at_1m_ndv(self, spark):
        """VERDICT r2 gap: the DEFAULT NDV path must deliver CPC-class
        accuracy at reference-default conf. approx_count_distinct_ex with
        conf CPC/lgK=11 now runs the engine HLL at lgk=15 (RSE ~0.57%):
        error on a >=1e6-NDV column must be < 1%."""
        from datasketches_spark_spark import functions as dsf
        df = spark.range(1_200_000).select(F.hash("id").alias("v"))
        nd = df.distinct().count()
        assert nd >= 1_000_000
        got = df.agg(dsf.approx_count_distinct_ex("v").alias("ndv")) \
                .collect()[0].ndv
        assert abs(got - nd) / nd < 0.01, (got, nd)

    def test_cpc_default_path_exact_in_sparse_phase(self, spark):
        from datasketches_spark_spark import functions as dsf
        df = spark.range(3_000).select(F.hash("id").alias("v"))
        nd = df.distinct().count()
        got = df.agg(dsf.approx_count_distinct_ex("v").alias("ndv")) \
                .collect()[0].ndv
        assert got == nd  # sparse coupon phase: exact below 2^(lgk-3)

    def test_cpc_two_phase_operator_within_1pct(self, spark):
        from datasketches_spark_spark import conf
        from datasketches_spark_spark.operators import (
            distinct_measure, sketch_grouped_agg)
        df = spark.range(1_200_000).select(F.hash("id").alias("v"))
        nd = df.distinct().count()
        got = sketch_grouped_agg(
            df, [], distinct_measure("ndv", "v", impl="hll",
                                     lgk=conf.distinct_cpc_lgk())
        ).collect()[0].ndv
        assert abs(got - nd) / nd < 0.01, (got, nd)


class TestFreqNoFalsePositives:
    def test_reported_items_are_true_heavy_hitters(self, spark):
        # zipf-ish skew with cap far below distinct count -> lossy sketch;
        # NO_FALSE_POSITIVES: every reported item's true count must exceed
        # the sketch's max error bound
        from datasketches_spark_spark.operators import (
            freqitems_measure, sketch_grouped_agg)
        df = (spark.range(300_000)
              .select((F.floor(F.pow(F.rand(seed=5), 4) * 5000))
                      .cast("long").alias("v")))
        true = {r.v: r.n for r in
                df.groupBy("v").agg(F.count("*").alias("n")).collect()}
        from datasketches_spark_spark.operators import sketch_accumulate
        from datasketches_spark_spark.sketches import FreqItemsSketch
        out = sketch_grouped_agg(
            df, [], freqitems_measure("fi", "v", item_type="long",
                                      max_map_size=64))
        items = out.select(F.inline("fi")).collect()
        assert 0 < len(items) <= 64
        # the sketch's actual NO_FALSE_POSITIVES contract: an item is
        # reported iff its lower-bound count exceeds the merged max error
        blob = sketch_accumulate(df, [], "v", family="freq",
                                 item_type="long",
                                 max_map_size=64).collect()[0].state
        sk = FreqItemsSketch.deserialize(bytes(blob))
        reported = {r.item for r in items}
        for item in reported:
            assert sk._counts[item] > sk._max_err
            # estimate never under the true count
            assert sk.estimate(item) >= true[item]
        # and the unambiguous heavy hitters are all found: items whose true
        # count exceeds the merged error bound cannot be missed
        for v, c in true.items():
            if c > 2 * sk._max_err:
                assert v in reported, (v, c, sk._max_err)


class TestSkewedGroups:
    def test_two_phase_handles_hot_key(self, spark):
        # 90% of rows in one group: map-side sketching means the hot key
        # ships ~num_partitions states, not 90% of the rows
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg)
        df = (spark.range(400_000)
              .select(F.when(F.col("id") % 10 < 9, F.lit("hot"))
                      .otherwise((F.col("id") % 10).cast("string"))
                      .alias("k"),
                      (F.col("id") % 1000).cast("double").alias("v"))
              .repartition(16))
        out = {r.k: r.p50 for r in sketch_grouped_agg(
            df, ["k"], percentile_measure("p50", "v", 0.5, impl="MERGEABLE",
                                          k=1_048_576)).collect()}
        exact = {r.k: float(r.p) for r in df.groupBy("k").agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
            .alias("p")).collect()}
        assert out == exact  # exact regime even for the hot key


class TestPercentileBounds:
    """approx_percentile_bounds: exact collapse, explicit eps, and the
    default-envelope bracket property in estimation mode."""

    def _state(self, spark, vals, k):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(v=float(x)) for x in vals])
        return df.agg(dsf.approx_percentile_accumulate(
            "v", impl="MERGEABLE", k=k).alias("s")).collect()[0].s

    def _bounds(self, spark, st, p, eps=None):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(s=bytearray(st))])
        return df.select(dsf.approx_percentile_bounds(
            "s", p, eps=eps).alias("b")).collect()[0].b

    def test_exact_regime_collapses_to_point(self, spark):
        vals = list(range(100))
        st = self._state(spark, vals, k=262_144)
        lo, hi = self._bounds(spark, st, 0.5)
        assert lo == hi  # eps defaults to 0 when the sketch is exact

    def test_explicit_eps_shifts_ranks(self, spark):
        vals = list(range(1, 101))  # value == rank percentile * 100
        st = self._state(spark, vals, k=262_144)
        lo, hi = self._bounds(spark, st, 0.5, eps=0.1)
        assert (lo, hi) == (40.0, 60.0)

    def test_estimation_mode_brackets_truth(self, spark):
        import random
        rng = random.Random(3)
        vals = [rng.gauss(0, 1) for _ in range(50_000)]
        st = self._state(spark, vals, k=128)  # estimation mode
        true_p95 = sorted(vals)[int(0.95 * len(vals)) - 1]
        lo, hi = self._bounds(spark, st, 0.95)  # default KLL envelope
        assert lo <= true_p95 <= hi
        assert lo < hi

    def test_null_state_and_corrupt(self, spark):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame(
            [Row(s=None), Row(s=bytearray(b"garbage!"))], "s binary")
        out = [r.b for r in df.select(dsf.approx_percentile_bounds(
            "s", 0.5).alias("b")).collect()]
        assert out == [None, None]


class TestDistinctAndFreqBounds:
    def _theta_state(self, spark, n_rows, k=4096):
        from pyspark.sql import functions as F
        from datasketches_spark_spark import functions as dsf
        df = spark.range(n_rows).select(F.col("id"))
        return df.agg(dsf.approx_count_distinct_accumulate(
            "id", impl="theta", k=k).alias("s")).collect()[0].s

    def _bounds(self, spark, st, num_std=2.0):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(s=bytearray(st))])
        return df.select(dsf.approx_count_distinct_bounds(
            "s", num_std).alias("b")).collect()[0].b

    def test_exact_regime_collapses(self, spark):
        st = self._theta_state(spark, 1000, k=4096)
        assert self._bounds(spark, st) == [1000, 1000]

    def test_estimation_mode_brackets_truth(self, spark):
        n = 200_000
        st = self._theta_state(spark, n, k=4096)
        lo, hi = self._bounds(spark, st)
        assert lo <= n <= hi
        assert lo < hi
        # wider interval at more std devs
        lo3, hi3 = self._bounds(spark, st, num_std=3.0)
        assert lo3 <= lo and hi3 >= hi

    def test_freq_maxerr_exact_and_purged(self, spark):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        small = spark.createDataFrame([Row(v=str(i % 5)) for i in range(50)])
        st = small.agg(dsf.approx_freqitems_accumulate(
            "v", max_map_size=64).alias("s")).collect()[0].s
        df = spark.createDataFrame([Row(s=bytearray(st))])
        assert df.select(dsf.approx_freqitems_maxerr("s").alias("e")) \
            .collect()[0].e == 0
        big = spark.createDataFrame([Row(v=str(i)) for i in range(5000)])
        st2 = big.agg(dsf.approx_freqitems_accumulate(
            "v", max_map_size=8).alias("s")).collect()[0].s
        df2 = spark.createDataFrame([Row(s=bytearray(st2))])
        assert df2.select(dsf.approx_freqitems_maxerr("s").alias("e")) \
            .collect()[0].e > 0


class TestHllBounds:
    def _hll_state(self, spark, n_rows, lgk=15):
        # engine numpy HLL (the CPC-accuracy family), built directly -
        # the SQL surface routes its lgk through conf
        import numpy as np
        from datasketches_spark_spark.sketches.hll import HllSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = HllSketch(lgk=lgk)
        sk.update_hashes(hash_longs(np.arange(n_rows, dtype=np.int64)))
        return sk.serialize()

    def _bounds(self, spark, st, num_std=2.0):
        from pyspark.sql import Row
        from datasketches_spark_spark import functions as dsf
        df = spark.createDataFrame([Row(s=bytearray(st))])
        return df.select(dsf.approx_count_distinct_bounds(
            "s", num_std).alias("b")).collect()[0].b

    def test_sparse_phase_collapses(self, spark):
        st = self._hll_state(spark, 500)
        assert self._bounds(spark, st) == [500, 500]

    def test_dense_brackets_truth(self, spark):
        n = 150_000
        st = self._hll_state(spark, n, lgk=15)
        lo, hi = self._bounds(spark, st)
        assert lo <= n <= hi and lo < hi
