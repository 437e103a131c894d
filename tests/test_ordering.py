"""Deterministic global shuffle (operators/ordering.py)."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators import epoch_seed, global_shuffle


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


class TestGlobalShuffle:
    def test_is_a_permutation(self, spark, corpus):
        pos = sorted(r.shuffle_pos for r in
                     global_shuffle(corpus, "doc_id").collect())
        assert pos == list(range(2000))

    def test_layout_invariant(self, spark, corpus):
        a = {r.doc_id: r.shuffle_pos for r in
             global_shuffle(corpus.coalesce(1), "doc_id", seed=7)
             .collect()}
        b = {r.doc_id: r.shuffle_pos for r in
             global_shuffle(corpus.repartition(64), "doc_id", seed=7)
             .collect()}
        assert a == b

    def test_seeds_decorrelate(self, spark, corpus):
        a = {r.doc_id: r.shuffle_pos for r in
             global_shuffle(corpus, "doc_id", seed=0).collect()}
        b = {r.doc_id: r.shuffle_pos for r in
             global_shuffle(corpus, "doc_id", seed=1).collect()}
        same = sum(1 for d in a if a[d] == b[d])
        assert same < 20  # ~ fixed points of a random permutation

    def test_epoch_seed_distinct(self):
        seeds = {epoch_seed(42, e) for e in range(100)}
        assert len(seeds) == 100

    def test_matches_duckdb_global_rownumber(self, spark, corpus, duck=None):
        import duckdb
        got = {r.doc_id: r.shuffle_pos for r in
               global_shuffle(corpus, "doc_id", seed=5).collect()}
        con = duckdb.connect()
        want = dict(con.execute("""
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY md5(CAST(doc_id AS VARCHAR) || ':5'),
                              doc_id) - 1
            FROM range(0, 2000) t(doc_id)""").fetchall())
        assert got == want

    def test_null_ids_excluded(self, spark):
        df = spark.createDataFrame([(1,), (None,), (2,)], ["doc_id"])
        rows = global_shuffle(df, "doc_id").collect()
        assert sorted(r.shuffle_pos for r in rows) == [0, 1]

    def test_no_global_single_partition_exchange(self, spark, corpus):
        out = global_shuffle(corpus.repartition(16), "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "rangepartitioning" not in plan.lower()

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id long")
        assert global_shuffle(df, "doc_id").count() == 0


class TestQuantileRangeLayout:
    """r16: sketch-driven equi-depth layout — boundaries from a
    persisted quantile state replace repartitionByRange's sampling
    pass; bucket ids are pure scan-stage Column arithmetic."""

    def test_boundaries_exact_regime_match_quantile_disc(self):
        import numpy as np
        from datasketches_spark_spark.operators import (
            quantile_boundaries)
        from datasketches_spark_spark.sketches import KllSketch
        sk = KllSketch(k=65536, dtype=np.float64)
        vals = np.arange(1.0, 1001.0)
        sk.update_batch(vals)
        b = quantile_boundaries(sk.serialize(), 4)
        # quantile_disc at 0.25/0.5/0.75 of 1..1000
        assert b == [250.0, 500.0, 750.0]

    def test_bucket_column_and_balance(self, spark):
        import numpy as np
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            quantile_bucket, quantile_boundaries)
        from datasketches_spark_spark.sketches import KllSketch
        rng = np.random.default_rng(7)
        vals = rng.exponential(10.0, 4000)   # skewed on purpose
        sk = KllSketch(k=65536, dtype=np.float64)
        sk.update_batch(vals)
        bounds = quantile_boundaries(sk.serialize(), 8)
        df = spark.createDataFrame([(float(v),) for v in vals],
                                   "v double")
        counts = (df.select(quantile_bucket("v", bounds).alias("b"))
                  .groupBy("b").count().collect())
        got = {r.b: r["count"] for r in counts}
        assert set(got) == set(range(8))
        # equi-depth: every bucket within 2% of n/8 (exact-regime
        # boundaries are exact rank splits; ties only at duplicates)
        for c in got.values():
            assert abs(c - 500) <= 10, got

    def test_layout_partitions_are_contiguous(self, spark):
        import numpy as np
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import (
            quantile_range_layout)
        from datasketches_spark_spark.sketches import KllSketch
        vals = np.arange(0.0, 1000.0)
        sk = KllSketch(k=65536, dtype=np.float64)
        sk.update_batch(vals)
        df = spark.createDataFrame([(float(v),) for v in vals],
                                   "v double").repartition(7)
        out = quantile_range_layout(df, "v", sk.serialize(), 4)
        per = (out.withColumn("p", F.spark_partition_id())
               .groupBy("p").agg(F.min("v").alias("lo"),
                                 F.max("v").alias("hi"),
                                 F.count("*").alias("n"))
               .orderBy("p").collect())
        nonempty = [r for r in per if r.n > 0]
        # ranges must not overlap across partitions (contiguous layout)
        for a, b in zip(nonempty, nonempty[1:]):
            assert a.hi <= b.lo
        assert sum(r.n for r in per) == 1000

    def test_foreign_datasketches_state_accepted(self, spark):
        # boundaries from a REAL datasketches-java KLL image
        jvm = spark._jvm
        jsk = jvm.org.apache.datasketches.kll.KllFloatsSketch \
            .newHeapInstance(4096)
        for i in range(1, 101):
            jsk.update(float(i))
        from datasketches_spark_spark.operators import (
            quantile_boundaries)
        b = quantile_boundaries(bytes(jsk.toByteArray()), 4)
        assert b == [25.0, 50.0, 75.0]


class TestSkewSalt:
    def test_hot_keys_from_state(self):
        from datasketches_spark_spark.operators import (
            hot_keys_from_state)
        from datasketches_spark_spark.sketches import (
            FreqItemsSketch, ITEM_STR)
        sk = FreqItemsSketch(max_map_size=64, item_type=ITEM_STR)
        sk.update_batch(["hot"] * 500 + ["warm"] * 50 +
                        [f"c{i}" for i in range(20)])
        assert hot_keys_from_state(sk.serialize(), 100) == ["hot"]
        assert set(hot_keys_from_state(sk.serialize(), 30)) == \
            {"hot", "warm"}

    def test_two_stage_salted_agg_matches_direct(self, spark):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import skew_salt
        rows = [("hot", i, 1.0) for i in range(1000)] + \
               [(f"k{i % 10}", i, 2.0) for i in range(100)]
        df = spark.createDataFrame(rows, "k string, id long, v double")
        salt = skew_salt("k", ["hot"], 8, F.col("id"))
        partial = (df.groupBy("k", salt.alias("s"))
                   .agg(F.sum("v").alias("ps"),
                        F.count("*").alias("pc")))
        # hot fans out to 8 subkeys, cold keys keep salt 0
        fan = {r.k: r.n for r in partial.groupBy("k")
               .agg(F.count("*").alias("n")).collect()}
        assert fan["hot"] == 8 and all(
            v == 1 for k2, v in fan.items() if k2 != "hot")
        final = {r.k: (r.s, r.c) for r in partial.groupBy("k")
                 .agg(F.sum("ps").alias("s"), F.sum("pc").alias("c"))
                 .collect()}
        direct = {r.k: (r.s, r.c) for r in df.groupBy("k")
                  .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
                  .collect()}
        assert final == direct

    def test_no_hot_keys_is_constant_salt(self, spark):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import skew_salt
        df = spark.createDataFrame([("a", 1)], "k string, id long")
        assert df.select(skew_salt("k", [], 8, F.col("id"))
                         .alias("s")).collect()[0].s == 0


class TestR17Advice:
    def test_skew_salt_null_attribute_folds_to_zero(self, spark):
        # r17 (ADVICE): a NULL salt_from must not split a hot key's
        # rows into a separate null-salt group — coalesces to salt 0.
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import skew_salt
        df = spark.createDataFrame(
            [("hot", None), ("hot", 5), ("cold", None)],
            "k string, id long")
        got = {(r.k, r.id): r.s for r in df.select(
            "k", "id",
            skew_salt("k", ["hot"], 8, F.col("id")).alias("s"))
            .collect()}
        assert got[("hot", None)] == 0       # not NULL
        assert got[("hot", 5)] == 5 % 8
        assert got[("cold", None)] == 0

    def test_quantile_bucket_large_n_array_path(self, spark):
        # r17: >_BUCKET_WHEN_CHAIN_MAX boundaries switch to the flat
        # array+filter form — same semantics, no codegen depth blowup.
        # 4096 boundaries would nest ~4k Add nodes in the when-chain.
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import quantile_bucket
        bounds = [float(i) for i in range(1, 4096)]   # 1..4095
        df = spark.createDataFrame(
            [(0.5,), (1.0,), (1.5,), (2047.2,), (4095.5,), (None,)],
            "v double")
        got = [r.b for r in df.select(
            quantile_bucket("v", bounds).alias("b")).collect()]
        # bucket = count of boundaries strictly below v
        assert got == [0, 0, 1, 2047, 4095, 0]

    def test_quantile_bucket_paths_agree(self, spark):
        # both physical forms give identical ids on the same data
        import numpy as np
        from pyspark.sql import functions as F
        from datasketches_spark_spark.operators import ordering as om
        rng = np.random.default_rng(11)
        vals = [float(v) for v in rng.normal(0, 100, 500)]
        bounds = sorted(float(v) for v in rng.normal(0, 100, 200))
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        old_max = om._BUCKET_WHEN_CHAIN_MAX
        try:
            om._BUCKET_WHEN_CHAIN_MAX = 10_000   # force when-chain
            a = [r.b for r in df.select(
                om.quantile_bucket("v", bounds).alias("b")).collect()]
            om._BUCKET_WHEN_CHAIN_MAX = 0        # force array path
            b = [r.b for r in df.select(
                om.quantile_bucket("v", bounds).alias("b")).collect()]
        finally:
            om._BUCKET_WHEN_CHAIN_MAX = old_max
        assert a == b
