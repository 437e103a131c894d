"""Apache DataSketches compact-Theta wire interop, validated LIVE against
datasketches-java on Spark's driver classpath (no committed fixtures
needed — the reference implementation itself is the oracle here).

Strongest claims, each asserted byte-for-byte where possible:
parse/serialize round-trips every compact form; union (incl. the
nominal-k theta cap), intersection and a-not-b reproduce Java's
``SetOperation`` results bit-identically; the engine's accumulator
builds compacts byte-identical to Java's in the exact regime; and
mixed-origin set algebra (one side built here, one side built by Java)
is exact over overlapping data.
"""

import numpy as np
import pytest

from datasketches_spark_spark.compat.theta import (ThetaWireAccumulator,
                                                   ThetaWireSketch)


def _jtheta(spark):
    return spark._jvm.org.apache.datasketches.theta


def _build(spark, lo, hi, lgk=12):
    b = _jtheta(spark).UpdateSketch.builder()
    b.setLogNominalEntries(lgk)
    sk = b.build()
    for i in range(lo, hi):
        sk.update(f"it-{i}")
    return sk.compact()


class TestParseSerialize:
    def test_all_forms_roundtrip_byte_exact(self, spark):
        for args in ((0, 0), (0, 1), (0, 3), (0, 10), (0, 9000, 6)):
            c = _build(spark, *args)
            by = bytes(c.toByteArray())
            sk = ThetaWireSketch.parse(by)
            assert abs(sk.estimate() - c.getEstimate()) <= max(
                1, 1e-4 * c.getEstimate()), args
            assert sk.serialize() == by, args

    def test_corrupt_rejected(self):
        with pytest.raises(ValueError):
            ThetaWireSketch.parse(b"\x02\x03\x03")
        with pytest.raises(ValueError):  # wrong family
            ThetaWireSketch.parse(bytes([2, 3, 7, 0, 0, 0x1A, 0, 0]) * 2)
        with pytest.raises(ValueError):  # retained count lies
            ThetaWireSketch.parse(
                bytes([2, 3, 3, 0, 0, 0x1A, 0xCC, 0x93])
                + (99).to_bytes(4, "little") + b"\x00\x80\x3f\x00")


class TestSetOpsVsJava:
    def test_union_exact_regime_byte_exact(self, spark):
        jt = _jtheta(spark)
        a, b = _build(spark, 0, 50), _build(spark, 30, 120)
        u = jt.SetOperation.builder().buildUnion()
        u.union(a)
        u.union(b)
        ours = ThetaWireSketch.parse(bytes(a.toByteArray())).merge(
            ThetaWireSketch.parse(bytes(b.toByteArray())), k=4096)
        assert ours.serialize() == bytes(u.getResult().toByteArray())
        assert ours.estimate() == 120

    def test_union_estimation_regime_byte_exact(self, spark):
        jt = _jtheta(spark)
        a, b = _build(spark, 0, 9000, 6), _build(spark, 5000, 15000, 6)
        u = jt.SetOperation.builder().buildUnion()  # default k=4096
        u.union(a)
        u.union(b)
        ours = ThetaWireSketch.parse(bytes(a.toByteArray())).merge(
            ThetaWireSketch.parse(bytes(b.toByteArray())), k=4096)
        assert ours.serialize() == bytes(u.getResult().toByteArray())

    def test_union_nominal_k_cap_byte_exact(self, spark):
        jt = _jtheta(spark)
        a = _build(spark, 0, 30000, 12)
        b = _build(spark, 20000, 60000, 12)
        bld = jt.SetOperation.builder()
        bld.setLogNominalEntries(6)
        u = bld.buildUnion()
        u.union(a)
        u.union(b)
        ours = ThetaWireSketch.parse(bytes(a.toByteArray())).merge(
            ThetaWireSketch.parse(bytes(b.toByteArray())), k=64)
        assert ours.serialize() == bytes(u.getResult().toByteArray())

    def test_intersection_and_anotb_byte_exact(self, spark):
        jt = _jtheta(spark)
        a, b = _build(spark, 0, 2000, 8), _build(spark, 1000, 4000, 8)
        wa = ThetaWireSketch.parse(bytes(a.toByteArray()))
        wb = ThetaWireSketch.parse(bytes(b.toByteArray()))
        it = jt.SetOperation.builder().buildIntersection()
        it.intersect(a)
        it.intersect(b)
        assert wa.intersect(wb).serialize() == bytes(
            it.getResult().toByteArray())
        anb = jt.SetOperation.builder().buildANotB()
        assert wa.a_not_b(wb).serialize() == bytes(
            anb.aNotB(a, b).toByteArray())

    def test_jaccard_exact_regime(self, spark):
        wa = ThetaWireSketch.parse(
            bytes(_build(spark, 0, 60).toByteArray()))
        wb = ThetaWireSketch.parse(
            bytes(_build(spark, 40, 100).toByteArray()))
        assert wa.jaccard_estimate(wb) == pytest.approx(20 / 100)


class TestAccumulator:
    def test_exact_regime_byte_identical_to_java(self, spark):
        acc = ThetaWireAccumulator(4096)
        acc.update_strings([f"it-{i}" for i in range(10)])
        assert acc.serialize() == bytes(
            _build(spark, 0, 10).toByteArray())

    def test_longs_byte_identical_to_java(self, spark):
        acc = ThetaWireAccumulator(4096)
        acc.update_longs(np.arange(500))
        jsk = _jtheta(spark).UpdateSketch.builder().build()
        for i in range(500):
            jsk.update(i)
        assert acc.serialize() == bytes(jsk.compact().toByteArray())

    def test_mixed_origin_union_exact(self, spark):
        acc = ThetaWireAccumulator(4096)
        acc.update_strings([f"it-{i}" for i in range(10)])
        java_side = ThetaWireSketch.parse(
            bytes(_build(spark, 5, 30).toByteArray()))
        assert acc.merge(java_side, k=4096).estimate() == 30

    def test_estimation_regime_is_valid_kmv(self, spark):
        acc = ThetaWireAccumulator(64)
        acc.update_longs(np.arange(50000))
        est = acc.estimate()
        assert abs(est - 50000) < 50000 * 0.5  # k=64 -> wide but sane
        # and Java can read the state
        jsk = _jtheta(spark).Sketches.wrapCompactSketch(
            spark._jvm.org.apache.datasketches.memory.Memory.wrap(
                bytearray(acc.serialize())))
        assert round(jsk.getEstimate()) == est


class TestSparkSurface:
    def test_sql_lifecycle_and_set_ops(self, spark):
        """accumulate_theta_wire -> combine -> estimate + approx_set_*
        over foreign-theta pairs, all from SQL; exact in the exact
        regime and gated against exact SQL counts."""
        import datasketches_spark_spark as dss
        dss.install(spark)
        rows = [(("g1" if i < 120 else "g2"), f"u{i}")
                for i in range(200)]  # g1: u0..119, g2: u120..199
        rows += [("g2", f"u{i}") for i in range(100, 120)]  # overlap 20
        spark.createDataFrame(rows, "g string, u string") \
            .createOrReplaceTempView("tw_t")
        (row,) = spark.sql("""
            WITH s AS (SELECT g,
                 approx_count_distinct_accumulate_theta_wire(u) AS st
                 FROM tw_t GROUP BY g)
            SELECT
              approx_count_distinct_estimate(
                approx_count_distinct_combine(st)) AS ndv_all,
              (SELECT approx_set_intersection(a.st, b.st)
                 FROM s a, s b WHERE a.g='g1' AND b.g='g2') AS common,
              (SELECT approx_set_difference(a.st, b.st)
                 FROM s a, s b WHERE a.g='g1' AND b.g='g2') AS only_g1
            FROM s""").collect()
        assert row.ndv_all == 200
        assert row.common == 20
        assert row.only_g1 == 100

    def test_mixing_with_engine_kmv_raises_to_null_with_warning(self, spark):
        """Foreign-theta with engine-KMV pairs hit the documented
        cross-hash-space refusal (setop -> null like other corrupt-state
        paths)."""
        import datasketches_spark_spark as dss
        dss.install(spark)
        df = spark.createDataFrame([(f"u{i}",) for i in range(50)],
                                   "u string")
        wire = df.selectExpr(
            "approx_count_distinct_accumulate_theta_wire(u) AS st"
        ).collect()[0].st
        kmv = df.selectExpr(
            "approx_count_distinct_accumulate_theta(u) AS st"
        ).collect()[0].st
        pair = spark.createDataFrame(
            [(bytearray(wire), bytearray(kmv))], "a binary, b binary")
        pair.createOrReplaceTempView("tw_mix_pair")
        (row,) = spark.sql(
            "SELECT approx_set_jaccard(a, b) AS j FROM tw_mix_pair"
        ).collect()
        assert row.j is None
        # while a foreign-with-foreign pair works
        (ok,) = spark.sql(
            "SELECT approx_set_jaccard(a, a) AS j FROM tw_mix_pair"
        ).collect()
        assert ok.j == 1.0

    def test_dss_sql_two_phase_matches_udf(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        spark.createDataFrame(
            [(f"g{i % 3}", f"u{i % 41}") for i in range(400)],
            "g string, u string").createOrReplaceTempView("tw_t2")
        q = ("SELECT g, approx_count_distinct_accumulate_theta_wire(u) "
             "AS st FROM tw_t2 GROUP BY g ORDER BY g")
        got = {r.g: bytes(r.st) for r in dss.sql(spark, q).collect()}
        want = {r.g: bytes(r.st) for r in spark.sql(q).collect()}
        assert got == want  # two-phase partials merge to identical bytes
