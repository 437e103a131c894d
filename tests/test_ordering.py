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
