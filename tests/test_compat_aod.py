"""Apache DataSketches Tuple/ArrayOfDoubles wire interop, validated LIVE
against datasketches-java on Spark's driver classpath (no committed
fixtures — the reference implementation itself is the oracle, the
``test_compat_theta.py`` pattern).

Claims asserted: parse round-trips every compact form AND updatable
(QuickSelect table) images; engine-serialized compacts heapify in Java
with identical entry sets and estimates (the AoD format has no
ordered-compact dialect, so equality is entry-set + estimate, not byte
order); the accumulator's MurmurHash3 key space matches Java's
``update`` for long and string keys (identical retained sets in the
exact regime); union reproduces Java's ``ArrayOfDoublesUnion``
(per-key elementwise value sums, min-theta); and foreign states flow
through the engine's approx_tuple_estimate / combine SQL surface."""

import numpy as np
import pytest

from datasketches_spark_spark.compat.aod import (AodWireAccumulator,
                                                 AodWireSketch, is_aod)


def _pkg(spark):
    return spark._jvm.org.apache.datasketches.tuple.arrayofdoubles


def _jbuild(spark, pairs, nv=2, lgk=12):
    b = _pkg(spark).ArrayOfDoublesUpdatableSketchBuilder()
    b.setNominalEntries(1 << lgk)
    b.setNumberOfValues(nv)
    sk = b.build()
    gw = spark.sparkContext._gateway
    for k, vals in pairs:
        a = gw.new_array(spark._jvm.double, nv)
        for j, v in enumerate(vals):
            a[j] = float(v)
        if isinstance(k, str):
            sk.update(k, a)
        else:
            sk.update(int(k), a)
    return sk


def _jentries(jsk):
    it = jsk.iterator()
    out = []
    while it.next():
        out.append((np.uint64(it.getKey()), tuple(it.getValues())))
    return sorted(out)


def _eentries(sk):
    return sorted(zip(sk.hashes, map(tuple, sk.values)))


def _heapify(spark, raw):
    mem = spark._jvm.org.apache.datasketches.memory.Memory.wrap(raw)
    return _pkg(spark).ArrayOfDoublesSketches.heapifySketch(mem)


_PAIRS = [(i + 1, [1.0, i * 0.5]) for i in range(20)] + [(5, [1.0, 100.0])]


class TestParse:
    def test_exact_compact_matches_java_entries(self, spark):
        jsk = _jbuild(spark, _PAIRS)
        raw = bytes(jsk.compact().toByteArray())
        assert is_aod(raw)
        sk = AodWireSketch.parse(raw)
        assert _eentries(sk) == _jentries(jsk.compact())
        assert sk.estimate() == 20
        assert sk.is_exact()
        # two-value (count,sum) convention: duplicate key 5 summed
        assert sk.rows_estimate() == 21
        assert sk.sum_estimate() == pytest.approx(
            sum(v[1] for _, v in _PAIRS))

    def test_empty_and_single(self, spark):
        for n in (0, 1):
            jsk = _jbuild(spark, _PAIRS[:n])
            raw = bytes(jsk.compact().toByteArray())
            sk = AodWireSketch.parse(raw)
            assert len(sk.hashes) == n
            assert sk.estimate() == n

    def test_updatable_image_parses(self, spark):
        jsk = _jbuild(spark, _PAIRS)
        sk = AodWireSketch.parse(bytes(jsk.toByteArray()))
        assert _eentries(sk) == _jentries(jsk.compact())

    def test_estimation_mode_matches_java_estimate(self, spark):
        jsk = _jbuild(spark, [(i, [1.0, float(i)])
                              for i in range(1, 5000)], lgk=6)
        sk = AodWireSketch.parse(bytes(jsk.compact().toByteArray()))
        assert not sk.is_exact()
        assert abs(sk.estimate() - jsk.getEstimate()) <= 1

    def test_corrupt_rejected(self):
        with pytest.raises(ValueError):
            AodWireSketch.parse(b"\x01\x01\x09")
        with pytest.raises(ValueError):   # wrong family
            AodWireSketch.parse(bytes([1, 1, 3, 3, 4, 1, 0xCC, 0x93])
                                + b"\xff" * 8)
        with pytest.raises(ValueError):   # count lies
            AodWireSketch.parse(
                bytes([1, 1, 9, 3, 8, 1, 0xCC, 0x93]) + b"\xff" * 7
                + b"\x7f" + (99).to_bytes(4, "little") + b"\x00" * 4)


class TestSerialize:
    def test_java_heapifies_engine_bytes(self, spark):
        jsk = _jbuild(spark, _PAIRS)
        sk = AodWireSketch.parse(bytes(jsk.compact().toByteArray()))
        h = _heapify(spark, sk.serialize())
        assert _jentries(h) == _jentries(jsk.compact())
        assert h.getEstimate() == jsk.getEstimate()

    def test_estimation_image_roundtrip(self, spark):
        jsk = _jbuild(spark, [(i, [1.0, 1.0]) for i in range(3000)], lgk=5)
        sk = AodWireSketch.parse(bytes(jsk.compact().toByteArray()))
        h = _heapify(spark, sk.serialize())
        assert _jentries(h) == _jentries(jsk.compact())
        assert abs(h.getEstimate() - jsk.getEstimate()) < 1e-9

    def test_empty_roundtrip(self, spark):
        sk = AodWireSketch(num_values=3)
        rt = AodWireSketch.parse(sk.serialize())
        assert rt.num_values == 3 and len(rt.hashes) == 0 and rt.is_exact()
        assert _heapify(spark, sk.serialize()).getEstimate() == 0.0


class TestAccumulator:
    def test_long_keys_match_java_hash_space(self, spark):
        keys = np.arange(1, 31, dtype=np.int64)
        vals = keys.astype(np.float64) * 2.5
        acc = AodWireAccumulator(4096)
        acc.update_longs(keys, vals)
        jsk = _jbuild(spark, [(int(k), [1.0, float(v)])
                              for k, v in zip(keys, vals)])
        assert _eentries(acc) == _jentries(jsk.compact())
        assert _heapify(spark, acc.serialize()).getEstimate() == 30.0

    def test_string_keys_match_java_hash_space(self, spark):
        ks, vs = ["alpha", "beta", "gamma"], [1.5, 2.5, 3.5]
        acc = AodWireAccumulator()
        acc.update_strings(ks, vs)
        jsk = _jbuild(spark, list(zip(ks, [[1.0, v] for v in vs])))
        assert _eentries(acc) == _jentries(jsk.compact())

    def test_duplicate_keys_sum(self):
        acc = AodWireAccumulator()
        acc.update_longs(np.array([7, 7, 7]), np.array([1.5, 2.5, 4.0]))
        assert len(acc.hashes) == 1
        assert tuple(acc.values[0]) == (3.0, 8.0)

    def test_saturation_kmv_cut(self):
        acc = AodWireAccumulator(16)
        acc.update_longs(np.arange(1, 1001, dtype=np.int64),
                         np.ones(1000))
        assert len(acc.hashes) == 16
        assert not acc.is_exact()
        est = acc.estimate()
        assert 0.4 * 1000 < est < 2.5 * 1000  # k=16 is deliberately tiny


class TestUnion:
    def test_union_matches_java(self, spark):
        u = (_pkg(spark).ArrayOfDoublesSetOperationBuilder()
             .setNumberOfValues(2).buildUnion())
        s1 = _jbuild(spark, [(i, [1.0, float(i)]) for i in range(100)])
        s2 = _jbuild(spark, [(i, [1.0, float(i)]) for i in range(50, 150)])
        u.union(s1.compact())
        u.union(s2.compact())
        e1 = AodWireSketch.parse(bytes(s1.compact().toByteArray()))
        e2 = AodWireSketch.parse(bytes(s2.compact().toByteArray()))
        e1.merge(e2)
        assert _eentries(e1) == _jentries(u.getResult())

    def test_cross_family_merge_raises(self):
        from datasketches_spark_spark.sketches import TupleSketch
        a = AodWireSketch(num_values=2)
        with pytest.raises(ValueError, match="hash space|AoD"):
            a.merge(TupleSketch())

    def test_num_values_mismatch_raises(self):
        with pytest.raises(ValueError, match="numValues"):
            AodWireSketch(num_values=2).merge(AodWireSketch(num_values=1))


class TestSqlSurface:
    def test_wire_accumulate_estimate_sql(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        df = spark.range(200).selectExpr(
            "concat('u', id % 40) AS k", "CAST(id AS DOUBLE) AS v")
        df.createOrReplaceTempView("aod_t")
        row = spark.sql("""
            SELECT approx_tuple_estimate(
                     approx_tuple_accumulate_wire(k, v)) AS e
            FROM aod_t""").collect()[0].e
        assert row.ndv == 40 and row.rows == 200
        assert row.value_sum == pytest.approx(sum(range(200)))
        # and the state IS a Java-readable AoD image
        raw = spark.sql("""
            SELECT approx_tuple_accumulate_wire_long(id % 7, 1.0) AS st
            FROM range(100)""").collect()[0].st
        assert is_aod(bytes(raw))
        assert _heapify(spark, bytes(raw)).getEstimate() == 7.0

    def test_combine_unions_foreign_states(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        s1 = bytes(_jbuild(spark, [(i, [1.0, 1.0]) for i in range(30)])
                   .compact().toByteArray())
        s2 = bytes(_jbuild(spark, [(i, [1.0, 1.0])
                                   for i in range(20, 50)])
                   .compact().toByteArray())
        pdf = spark.createDataFrame([(s1,), (s2,)], "st binary")
        pdf.createOrReplaceTempView("aod_states")
        row = spark.sql("""
            SELECT approx_tuple_estimate(approx_tuple_combine(st)) AS e
            FROM aod_states""").collect()[0].e
        assert row.ndv == 50 and row.rows == 60

    def test_single_value_state_ndv_only(self, spark):
        jsk = _jbuild(spark, [(i, [2.0]) for i in range(25)], nv=1)
        sk = AodWireSketch.parse(bytes(jsk.compact().toByteArray()))
        assert sk.estimate() == 25
        with pytest.raises(ValueError, match="count, sum"):
            sk.rows_estimate()
