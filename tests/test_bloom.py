"""Bloom membership family: sketch core, SQL surface, grouped-agg
family, and the prefilter-then-verify exact incremental dedup."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import datasketches_spark_spark as dss
from datasketches_spark_spark import functions as dsf
from datasketches_spark_spark.sketches import BloomFilter, deserialize_any
from datasketches_spark_spark.sketches.theta import hash_longs


# ------------------------------------------------------------------ core

class TestBloomCore:
    def test_design_sizing(self):
        bf = BloomFilter.design(1000, 0.01)
        # m = -n ln p / ln^2 2 ~ 9585 bits, h ~ 7
        assert 9000 <= bf.m_bits <= 10_000
        assert bf.n_hashes == 7

    def test_no_false_negatives_dense(self):
        bf = BloomFilter.design(1000, 0.01)
        keys = hash_longs(np.arange(1000, dtype=np.int64))
        bf.update_hashes(keys)
        assert bf.contains_hashes(keys).all()

    def test_fpp_envelope(self):
        bf = BloomFilter.design(1000, 0.01)
        bf.update_hashes(hash_longs(np.arange(1000, dtype=np.int64)))
        probe = hash_longs(np.arange(10_000, 60_000, dtype=np.int64))
        fp_rate = bf.contains_hashes(probe).mean()
        # design point 1%: at exactly-n fill the realized rate sits near
        # it; 3x covers the variance of one 50k draw
        assert fp_rate < 0.03
        assert abs(bf.current_fpp() - fp_rate) < 0.01

    def test_union_homomorphism_bitexact(self):
        a_keys = hash_longs(np.arange(0, 500, dtype=np.int64))
        b_keys = hash_longs(np.arange(500, 1000, dtype=np.int64))
        whole = BloomFilter.design(2000, 0.01)
        whole.update_hashes(np.concatenate([a_keys, b_keys]))
        pa, pb = (BloomFilter.design(2000, 0.01) for _ in range(2))
        pa.update_hashes(a_keys)
        pb.update_hashes(b_keys)
        assert pa.merge(pb).serialize() == whole.serialize()

    def test_merge_geometry_mismatch_raises(self):
        with pytest.raises(ValueError, match="geometry"):
            BloomFilter.design(100, 0.01).merge(
                BloomFilter.design(100_000, 0.01))

    def test_serde_roundtrip(self):
        bf = BloomFilter.design(256, 0.05)
        bf.update_hashes(hash_longs(np.arange(100, dtype=np.int64)))
        back = deserialize_any(bf.serialize())
        assert isinstance(back, BloomFilter)
        assert (back.m_bits, back.n_hashes, back.n_updates) == \
            (bf.m_bits, bf.n_hashes, 100)
        assert back.serialize() == bf.serialize()

    def test_corrupt_state_raises(self):
        with pytest.raises(ValueError):
            BloomFilter.deserialize(b"DSSS\x0c\x02short")

    def test_estimate_tracks_ndv(self):
        bf = BloomFilter.design(10_000, 0.01)
        bf.update_hashes(hash_longs(np.arange(3000, dtype=np.int64)))
        # duplicates must not move the estimate
        bf.update_hashes(hash_longs(np.arange(3000, dtype=np.int64)))
        assert abs(bf.estimate() - 3000) / 3000 < 0.05

    @given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=300))
    @settings(max_examples=30, deadline=None)
    def test_no_false_negatives_property(self, xs):
        bf = BloomFilter.design(max(len(xs), 16), 0.01)
        h = hash_longs(np.asarray(xs, dtype=np.int64))
        bf.update_hashes(h)
        assert bf.contains_hashes(h).all()

    @given(st.lists(st.integers(0, 10_000), min_size=1, max_size=200),
           st.lists(st.integers(0, 10_000), min_size=1, max_size=200))
    @settings(max_examples=20, deadline=None)
    def test_merge_order_invariant(self, xs, ys):
        hx = hash_longs(np.asarray(xs, dtype=np.int64))
        hy = hash_longs(np.asarray(ys, dtype=np.int64))
        a, b = BloomFilter.design(500, 0.02), BloomFilter.design(500, 0.02)
        a.update_hashes(hx)
        b.update_hashes(hy)
        assert a.merge(b).serialize() == b.merge(a).serialize()


# ------------------------------------------------------------------ SQL

@pytest.fixture(scope="module", autouse=True)
def _installed(spark):
    dss.install(spark)


class TestBloomSql:
    def test_sql_lifecycle(self, spark):
        rows = spark.sql("""
            SELECT approx_membership_contains(st, 'a') AS hit,
                   approx_membership_contains(st, 'zzz-never') AS miss,
                   approx_membership_estimate(st) AS est,
                   approx_membership_fpp(st) < 0.0001 AS low_fpp
            FROM (SELECT approx_membership_accumulate(k) AS st
                  FROM VALUES ('a'), ('b'), ('a') AS t(k))
        """).collect()[0]
        assert rows.hit is True and rows.miss is False
        assert rows.est == 2 and rows.low_fpp is True

    def test_sql_combine_across_groups(self, spark):
        r = spark.sql("""
            SELECT approx_membership_contains(
                     approx_membership_combine(st), 'x') AS hx,
                   approx_membership_contains(
                     approx_membership_combine(st), 'y') AS hy
            FROM (SELECT p, approx_membership_accumulate(k) AS st
                  FROM VALUES (0, 'x'), (1, 'y') AS t(p, k) GROUP BY p)
        """).collect()[0]
        assert r.hx is True and r.hy is True

    def test_combine_raises_on_corrupt(self, spark):
        df = spark.createDataFrame([(bytearray(b"junkbytes"),)], ["st"])
        df.createOrReplaceTempView("_bad_bloom")
        with pytest.raises(Exception):
            spark.sql("SELECT approx_membership_combine(st) "
                      "FROM _bad_bloom").collect()

    def test_contains_null_value_is_null(self, spark):
        r = spark.sql("""
            SELECT approx_membership_contains(st, CAST(NULL AS STRING)) AS v
            FROM (SELECT approx_membership_accumulate(k) AS st
                  FROM VALUES ('a') AS t(k))
        """).collect()[0]
        assert r.v is None


# ----------------------------------------------------------- grouped agg

class TestBloomGroupedAgg:
    def test_partition_layout_invariant_state(self, spark):
        from datasketches_spark_spark.operators import sketch_accumulate
        df = spark.range(0, 5000).select(
            (F.col("id") % 7).alias("g"), F.col("id").alias("v"))
        one = sketch_accumulate(df.coalesce(1), ["g"], "v",
                                family="bloom", expected_items=2000,
                                fpp=0.01)
        many = sketch_accumulate(df.repartition(64), ["g"], "v",
                                 family="bloom", expected_items=2000,
                                 fpp=0.01)
        a = {r.g: bytes(r.state) for r in one.collect()}
        b = {r.g: bytes(r.state) for r in many.collect()}
        assert a == b  # union homomorphism -> bit-identical states

    def test_grouped_membership_exact(self, spark):
        from datasketches_spark_spark.operators import sketch_accumulate
        df = spark.range(0, 1000).select(
            (F.col("id") % 2).alias("g"), F.col("id").alias("v"))
        st = sketch_accumulate(df, ["g"], "v", family="bloom",
                               expected_items=1000, fpp=0.001)
        probe = st.select(
            "g",
            dsf.approx_membership_contains(F.col("state"),
                                           F.col("g")).alias("has_own"),
            dsf.approx_membership_contains(
                F.col("state"), F.col("g") + 1_000_000).alias("has_far"))
        for r in probe.collect():
            assert r.has_own is True  # g in {0,1}: both values were fed
            assert r.has_far is False


# ------------------------------------------------------- prefilter match

class TestBloomPrefilter:
    def test_matches_exact_semijoin_oracle(self, spark, tables):
        # the sf0.001 fixture has no byte-identical dups, so the
        # incoming batch PLANTS them: re-keyed copies of corpus docs
        # (exact carry-over) mixed with mutated ones (definite-new)
        from datasketches_spark_spark.operators import bloom_prefilter_match
        docs = tables["documents"]
        corpus = docs.where(F.col("doc_id") >= 100)
        carry = (corpus.where(F.col("doc_id") < 200)
                 .select((F.col("doc_id") + 100_000).alias("doc_id"),
                         F.col("text")))
        fresh = (docs.where(F.col("doc_id") < 100)
                 .select((F.col("doc_id") + 200_000).alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" UNIQ")).alias(
                             "text")))
        incoming = carry.unionByName(fresh)
        got = sorted(
            r.doc_id for r in bloom_prefilter_match(
                incoming, corpus, "doc_id", text_col="text").collect())
        want = sorted(r.doc_id + 100_000 for r in
                      corpus.where(F.col("doc_id") < 200).collect())
        assert got == want and len(want) == 100

    def test_prefilter_plan_shape(self, spark, tables):
        """The probe side must NOT carry the state as a column (Arrow
        would re-serialize the MB-scale state per row): the prefilter is
        a plain scan-stage Filter over the broadcast-closure UDF, and
        the only join is the exact verify semi-join."""
        from datasketches_spark_spark.operators import bloom_prefilter_match
        docs = tables["documents"]
        out = bloom_prefilter_match(docs.limit(50), docs, "doc_id",
                                    text_col="text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "LeftSemi" in plan
        assert plan.count("Join") == 1  # verify only

    def test_standing_deployment_single_corpus_scan(self, spark, tables,
                                                    tmp_path):
        """The persisted-fingerprint path (dedup.py scan-budget note):
        persist the corpus fingerprint table + a prebuilt state once;
        every later batch is then ONE corpus-fingerprint scan (the
        exact-verify join) + one incoming scan. Pinned three ways:
        construction with state= runs no Spark job, the executed plan
        scans the fingerprint parquet exactly once, and results equal
        the rebuild-every-batch path."""
        from datasketches_spark_spark.functions.text import doc_fingerprint
        from datasketches_spark_spark.operators import (
            bloom_prefilter_match, build_prefilter_state)
        docs = tables["documents"]
        corpus = docs.where(F.col("doc_id") >= 100)
        fp_path = str(tmp_path / "corpus_fps")
        (corpus.select("doc_id",
                       doc_fingerprint(F.col("text")).alias("fingerprint"))
         .write.mode("overwrite").parquet(fp_path))
        fps = spark.read.parquet(fp_path)
        state = build_prefilter_state(fps, "doc_id",
                                      fingerprint_col="fingerprint",
                                      expected_items=2000)
        # single-relation batch (the typical crawl-batch shape; a UNION
        # probe makes PushdownLeftSemiAntiJoin duplicate the verify
        # build under each branch -- see the operator docstring)
        incoming = (docs.where(F.col("doc_id") < 200)
                    .select(
                        F.when(F.col("doc_id") < 100,
                               F.col("doc_id") + 200_000)
                        .otherwise(F.col("doc_id") + 100_000)
                        .alias("doc_id"),
                        doc_fingerprint(
                            F.when(F.col("doc_id") < 100,
                                   F.concat(F.col("text"),
                                            F.lit(" UNIQ")))
                            .otherwise(F.col("text")))
                        .alias("fingerprint")))
        before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        out = bloom_prefilter_match(incoming, fps, "doc_id",
                                    fingerprint_col="fingerprint",
                                    state=state)
        after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        assert after == before, "state= must not trigger a per-batch job"
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one scan of the persisted fingerprint table (the
        # verify-join build side reads only the single fingerprint
        # column; the plan renderer truncates paths, so pin on the
        # one-column read schema) and one incoming scan
        import re
        fp_scans = re.findall(r"FileScan parquet \[fingerprint#\d+\]",
                              plan)
        assert len(fp_scans) == 1, plan
        assert plan.count("documents.parquet") == 1, plan
        got = sorted(r.doc_id for r in out.collect())
        want = sorted(r.doc_id + 100_000 for r in
                      corpus.where(F.col("doc_id") < 200).collect())
        assert got == want and len(want) == 100

    def test_build_prefilter_state_empty_corpus(self, spark):
        from datasketches_spark_spark.operators import (
            bloom_prefilter_match, build_prefilter_state)
        empty = spark.createDataFrame([], "doc_id long, fp string")
        state = build_prefilter_state(empty, "doc_id",
                                      fingerprint_col="fp")
        incoming = spark.createDataFrame([(1, "aaa")],
                                         "doc_id long, fp string")
        out = bloom_prefilter_match(incoming, empty, "doc_id",
                                    fingerprint_col="fp", state=state)
        assert out.count() == 0
