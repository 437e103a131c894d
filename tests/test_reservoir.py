"""Reservoir sketch family: exact-regime identity, Algorithm-R and merge
statistics, serde round-trips, and the Spark accumulate/combine/estimate
lifecycle incl. the two-phase operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.sketches import (
    ITEM_DOUBLE,
    ITEM_LONG,
    ITEM_STR,
    ReservoirSketch,
    deserialize_any,
)


class TestCore:
    def test_exact_regime_keeps_everything(self):
        sk = ReservoirSketch(k=100)
        sk.update_batch(np.arange(60, dtype=np.float64))
        assert sk.is_exact() and sk.n == 60
        assert sk.items() == [float(x) for x in range(60)]

    def test_capacity_bound_and_n(self):
        sk = ReservoirSketch(k=32)
        for _ in range(10):
            sk.update_batch(np.arange(100, dtype=np.float64))
        assert sk.n == 1000 and len(sk.items()) == 32
        assert not sk.is_exact()

    def test_algorithm_r_uniformity(self):
        # Sample 64 of 0..4095 over many independent sketches; the mean of
        # sampled values estimates 2047.5. SE of one sample mean ~
        # (4096/sqrt(12))/8 ~ 148; averaged over 40 trials SE ~ 23.
        means = []
        for t in range(40):
            sk = ReservoirSketch(k=64)
            vals = np.arange(4096, dtype=np.float64)
            rng = np.random.default_rng(t)
            sk.update_batch(rng.permutation(vals))
            means.append(np.mean(sk.items()))
        assert abs(np.mean(means) - 2047.5) < 5 * 23

    def test_merge_exact_regime_is_union(self):
        a = ReservoirSketch(k=100)
        a.update_batch(np.arange(30, dtype=np.float64))
        b = ReservoirSketch(k=100)
        b.update_batch(np.arange(30, 60, dtype=np.float64))
        a.merge(b)
        assert a.n == 60 and a.items() == [float(x) for x in range(60)]

    def test_merge_is_uniform_over_union(self):
        # A holds 0..999, B holds 1000..3999 (3x heavier). After merging
        # k=64 reservoirs, E[fraction from B] = 0.75. Averaged over 40
        # trials: sd of one trial's fraction ~ sqrt(.75*.25/64) ~ 0.054,
        # so the mean is within 5*0.0086.
        fracs = []
        for t in range(40):
            a = ReservoirSketch(k=64)
            rng = np.random.default_rng(100 + t)
            a.update_batch(rng.permutation(np.arange(1000, dtype=np.float64)))
            b = ReservoirSketch(k=64)
            b.update_batch(rng.permutation(
                np.arange(1000, 4000, dtype=np.float64)))
            # decorrelate the deterministic per-instance rng across trials
            a._rng = np.random.default_rng(200 + t)
            a.merge(b)
            items = np.array(a.items())
            assert items.size == 64 and a.n == 4000
            fracs.append(np.mean(items >= 1000))
        assert abs(np.mean(fracs) - 0.75) < 5 * 0.0086

    def test_merge_mismatched_types_raise(self):
        a = ReservoirSketch(k=10, item_type=ITEM_STR)
        b = ReservoirSketch(k=10, item_type=ITEM_LONG)
        b.update(1)
        with pytest.raises(ValueError, match="item types"):
            a.merge(b)

    @pytest.mark.parametrize("item_type,items", [
        (ITEM_DOUBLE, [1.5, -2.25, 1e300]),
        (ITEM_LONG, [2**62, -5, 0]),
        (ITEM_STR, ["b", "ä", ""]),
    ])
    def test_serde_roundtrip(self, item_type, items):
        sk = ReservoirSketch(k=8, item_type=item_type)
        sk.update_batch(np.asarray(items, dtype=object))
        back = deserialize_any(sk.serialize())
        assert isinstance(back, ReservoirSketch)
        assert back.items() == sk.items()
        assert back.n == sk.n and back.k == sk.k

    def test_validation(self):
        with pytest.raises(ValueError, match="positive"):
            ReservoirSketch(k=0)
        with pytest.raises(ValueError, match="item type"):
            ReservoirSketch(k=4, item_type="binary")


class TestSparkSurface:
    def test_sql_lifecycle_exact_regime(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        spark.range(0, 100, 1, 4).select(
            (F.col("id") % 5).alias("g"),
            F.col("id").cast("double").alias("v")
        ).createOrReplaceTempView("resv_t")
        rows = spark.sql("""
            SELECT approx_sample_estimate(approx_sample_combine(st)) AS all_v,
                   approx_sample_stream_size(approx_sample_combine(st)) AS n
            FROM (SELECT g, approx_sample_accumulate(v) AS st
                  FROM resv_t GROUP BY g)
        """).collect()
        (row,) = rows
        assert row["n"] == 100
        assert row["all_v"] == [float(x) for x in range(100)]

    def test_two_phase_sample_measure(self, spark):
        from datasketches_spark_spark.operators import (
            sample_measure, sketch_grouped_agg)
        df = spark.range(0, 300, 1, 8).select(
            (F.col("id") % 3).alias("g"), F.col("id").alias("v"))
        out = sketch_grouped_agg(
            df, ["g"], sample_measure("sample_v", "v", k=1000,
                                      item_type="long")).orderBy("g")
        rows = out.collect()
        assert [r["g"] for r in rows] == [0, 1, 2]
        for r in rows:
            assert r["sample_v"] == sorted(
                x for x in range(300) if x % 3 == r["g"])

    def test_approximate_regime_is_bounded_sample(self, spark):
        from datasketches_spark_spark.operators import (
            sample_measure, sketch_grouped_agg)
        df = spark.range(0, 20_000, 1, 8).select(
            F.lit(1).alias("g"), F.col("id").cast("double").alias("v"))
        (row,) = sketch_grouped_agg(
            df, ["g"], sample_measure("s", "v", k=256)).collect()
        vals = row["s"]
        assert len(vals) == 256 and len(set(vals)) == 256
        # uniform over 0..19999: mean within 5 SE (SE ~ 5774/16 ~ 361)
        assert abs(float(np.mean(vals)) - 9999.5) < 5 * 361

    def test_corrupt_state_null_estimate(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        (row,) = spark.sql(
            "SELECT approx_sample_estimate(CAST('junk' AS BINARY)) AS x"
        ).collect()
        assert row["x"] is None


class TestStreamingReservoir:
    """The stateful streaming operator is family-generic; a reservoir in
    the exact regime must accumulate to the complete per-key multiset
    across micro-batches."""

    def test_streaming_accumulate_exact_regime(self, spark, tmp_path):
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.streaming import (
            await_or_fail, sketch_accumulate_stream)
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        df = spark.range(0, 200, 1, 4).select(
            (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v"))
        df.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = sketch_accumulate_stream(stream, ["g"], "v",
                                       family="reservoir", k=10_000)
        q = (out.writeStream.format("memory").queryName("resv_stream")
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        await_or_fail(q, 120)
        final = spark.sql("""
            SELECT g, state FROM (
              SELECT *, row_number() OVER (
                PARTITION BY g ORDER BY n DESC) rn FROM resv_stream
            ) WHERE rn = 1""")
        rows = final.select(
            "g", dsf.approx_sample_estimate("state").alias("vals"),
            dsf.approx_sample_stream_size("state").alias("n")).collect()
        got = {r["g"]: (r["n"], r["vals"]) for r in rows}
        for g in (0, 1):
            n, vals = got[g]
            assert n == 100
            assert vals == [float(x) for x in range(200) if x % 2 == g]


class TestWeightedReservoir:
    def test_exact_regime_and_weight_filter(self):
        from datasketches_spark_spark.sketches import WeightedReservoirSketch
        sk = WeightedReservoirSketch(k=100)
        sk.update_batch(np.arange(10, dtype=np.float64),
                        np.array([1, 1, 1, 0, -2, np.nan, 1, 1, 1, 1]))
        assert sk.n == 7 and sk.is_exact()
        assert sk.items() == [0.0, 1.0, 2.0, 6.0, 7.0, 8.0, 9.0]
        assert sk.total_weight == 7.0

    def test_merge_is_deterministic_and_commutative(self):
        from datasketches_spark_spark.sketches import (
            WeightedReservoirSketch, deserialize_any)
        a = WeightedReservoirSketch(k=16)
        a.update_batch(np.arange(100, dtype=np.float64), np.ones(100))
        b = WeightedReservoirSketch(k=16)
        b.update_batch(np.arange(100, 200, dtype=np.float64), np.ones(100))
        ab = deserialize_any(a.serialize()).merge(deserialize_any(b.serialize()))
        ba = deserialize_any(b.serialize()).merge(deserialize_any(a.serialize()))
        assert ab.items() == ba.items()        # strict monoid: no merge RNG
        assert ab.n == ba.n == 200
        assert ab.total_weight == 200.0

    def test_weight_proportional_inclusion(self):
        from datasketches_spark_spark.sketches import WeightedReservoirSketch
        # items weight 1 vs weight 9: E[fraction heavy] approaches 0.9 for
        # k << effective N. Keys are a deterministic function of the item
        # VALUES, so independent trials come from disjoint value ranges
        # (offsetting the items), not from reseeding. 40 trials, allow 5 SE.
        fracs = []
        for t in range(40):
            sk = WeightedReservoirSketch(k=50)
            base = float(t) * 1e7
            w = np.concatenate([np.ones(1000), np.full(1000, 9.0)])
            sk.update_batch(base + np.arange(2000, dtype=np.float64), w)
            fracs.append(np.mean(np.array(sk.items()) >= base + 1000))
        se = np.sqrt(0.9 * 0.1 / 50) / np.sqrt(40)
        assert abs(np.mean(fracs) - 0.9) < 5 * se + 0.02

    @pytest.mark.parametrize("item_type,items", [
        (ITEM_DOUBLE, [1.5, -2.25, 1e300]),
        (ITEM_LONG, [2**62, -5, 0]),
        (ITEM_STR, ["b", "ä", ""]),
    ])
    def test_serde_roundtrip(self, item_type, items):
        from datasketches_spark_spark.sketches import (
            WeightedReservoirSketch, deserialize_any)
        sk = WeightedReservoirSketch(k=8, item_type=item_type)
        sk.update_batch(np.asarray(items, dtype=object),
                        np.array([1.0, 2.0, 3.0]))
        back = deserialize_any(sk.serialize())
        assert isinstance(back, WeightedReservoirSketch)
        assert back.items() == sk.items()
        assert back.n == sk.n and back.total_weight == sk.total_weight
        # keys persist: a further merge of the round-tripped state is
        # identical to merging the original
        other = WeightedReservoirSketch(k=8, item_type=item_type)
        assert back.merge(other).items() == sk.items()

    def test_sql_lifecycle_exact_regime(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        spark.range(0, 100, 1, 4).select(
            (F.col("id") % 5).alias("g"),
            F.col("id").alias("v"),
            F.when(F.col("id") < 50, F.lit(0.0))
             .otherwise(F.lit(2.5)).alias("w")
        ).createOrReplaceTempView("wresv_t")
        (row,) = spark.sql("""
            SELECT approx_sample_estimate_long(approx_sample_combine(st))
                     AS kept,
                   approx_sample_stream_size(approx_sample_combine(st)) AS n
            FROM (SELECT g, approx_sample_weighted_accumulate_long(v, w) AS st
                  FROM wresv_t GROUP BY g)
        """).collect()
        assert row["n"] == 50
        assert row["kept"] == list(range(50, 100))


class TestTwoPhaseWeighted:
    def test_weighted_sample_measure_exact_regime(self, spark):
        from datasketches_spark_spark.operators import (
            percentile_measure, sketch_grouped_agg, weighted_sample_measure)
        df = spark.range(0, 300, 1, 8).select(
            (F.col("id") % 3).alias("g"),
            F.col("id").alias("v"),
            F.when(F.col("id") < 150, F.lit(0.0))
             .otherwise(F.lit(1.5)).alias("w"))
        # mixed with a single-column measure in the same one-pass scan
        out = sketch_grouped_agg(
            df, ["g"],
            weighted_sample_measure("kept", "v", "w", k=1000,
                                    item_type="long"),
            percentile_measure("p50", "v", 0.5, impl="MERGEABLE",
                               k=4096)).orderBy("g")
        rows = out.collect()
        assert [r["g"] for r in rows] == [0, 1, 2]
        for r in rows:
            assert r["kept"] == [x for x in range(150, 300) if x % 3 == r["g"]]
            assert r["p50"] is not None

    def test_plan_partial_before_exchange(self, spark):
        import re
        from datasketches_spark_spark.operators import (
            sketch_grouped_agg, weighted_sample_measure)
        df = spark.range(0, 1000, 1, 4).select(
            (F.col("id") % 5).alias("g"), F.col("id").alias("v"),
            F.lit(1.0).alias("w"))
        out = sketch_grouped_agg(
            df, ["g"], weighted_sample_measure("s", "v", "w", k=16))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan


class TestEmptyAggregationContract:
    def test_n_zero_state_estimates_null(self, spark):
        # an all-zero-weight group reaches estimate as an n=0 state via
        # two-phase partials; family contract: empty aggregation -> null
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.sketches import WeightedReservoirSketch
        empty = WeightedReservoirSketch(k=8).serialize()
        df = spark.createDataFrame([(bytearray(empty),)], "st binary")
        (row,) = df.select(
            dsf.approx_sample_estimate("st").alias("items"),
            dsf.approx_sample_stream_size("st").alias("n")).collect()
        assert row["items"] is None and row["n"] is None

class TestPairColumnOperators:
    """(value, weight) column pairs through the single-measure operators."""

    def test_sketch_accumulate_weighted_pair_col(self, spark):
        # single-measure operators accept (value, weight) column pairs too
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.operators import sketch_accumulate
        df = spark.range(0, 200, 1, 4).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("v"),
            F.when(F.col("id") < 100, F.lit(0.0)).otherwise(F.lit(1.0))
             .alias("w"))
        out = sketch_accumulate(df, ["g"], ("v", "w"), family="wreservoir",
                                k=1000, item_type="long")
        rows = out.select("g", dsf.approx_sample_estimate(
            "state", item_type="long").alias("kept")).collect()
        got = {r["g"]: r["kept"] for r in rows}
        for g in (0, 1):
            assert got[g] == [x for x in range(100, 200) if x % 2 == g]

    def test_streaming_weighted_pair_col(self, spark, tmp_path):
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.streaming import (
            await_or_fail, sketch_accumulate_stream)
        src = str(tmp_path / "wsrc")
        ckpt = str(tmp_path / "wckpt")
        df = spark.range(0, 100, 1, 4).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("v"),
            F.when(F.col("id") < 50, F.lit(0.0)).otherwise(F.lit(2.0))
             .alias("w"))
        df.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = sketch_accumulate_stream(stream, ["g"], ("v", "w"),
                                       family="wreservoir", k=1000,
                                       item_type="long")
        q = (out.writeStream.format("memory").queryName("wresv_stream")
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        await_or_fail(q, 120)
        final = spark.sql("""
            SELECT g, state FROM (
              SELECT *, row_number() OVER (
                PARTITION BY g ORDER BY n DESC) rn FROM wresv_stream
            ) WHERE rn = 1""")
        rows = final.select("g", dsf.approx_sample_estimate(
            "state", item_type="long").alias("kept")).collect()
        got = {r["g"]: r["kept"] for r in rows}
        for g in (0, 1):
            assert got[g] == [x for x in range(50, 100) if x % 2 == g]
