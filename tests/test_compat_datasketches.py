"""Wire-format interop: decode Apache DataSketches states produced by the
reference engine, validated against the reference's own golden byte
vectors (``SketchExpressionSuite.scala:27-85``).

Each vector is the serialized state of the commented reference query; the
expected estimates are the reference suite's own ``checkEvaluation``
targets, so a pass here means a reference user's persisted states yield
the reference's answers through this engine's estimate functions.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.compat import (
    decode_freqitems,
    decode_quantile,
    to_engine_sketch,
    to_engine_state,
)
from datasketches_spark_spark.sketches import (
    FreqItemsSketch,
    KllSketch,
    ReqSketch,
    deserialize_any,
    deserialize_quantile,
)


def _b(signed) -> bytes:
    """Scala Array[Byte] literal (signed) -> python bytes."""
    return bytes(x & 0xFF for x in signed)


# SELECT approx_percentile_accumulate(c) FROM VALUES (0),(1),(2),(10) t(c)
GOLDEN_KLL = _b([5, 1, 15, 0, -56, 0, 8, 0, 4, 0, 0, 0, 0, 0, 0, 0, -56,
                 0, 1, 0, -60, 0, 0, 0, 0, 0, 0, 0, 0, 0, 32, 65, 0, 0, 32,
                 65, 0, 0, 0, 64, 0, 0, -128, 63, 0, 0, 0, 0])
GOLDEN_REQ = _b([2, 1, 17, 56, 12, 0, 1, 4, 0, 0, 0, 0, 0, 0, -128, 63,
                 0, 0, 0, 64, 0, 0, 32, 65])
GOLDEN_MERGEABLE = _b([2, 3, 8, 0, -128, 0, 0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0,
                       0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 36, 64, 0, 0,
                       0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -16, 63, 0, 0, 0,
                       0, 0, 0, 0, 64, 0, 0, 0, 0, 0, 0, 36, 64])
# SELECT approx_freqitems_accumulate(c)
#   FROM VALUES ('a'),('a'),('b'),('c'),('a') t(c)
GOLDEN_FREQ = _b([4, 1, 10, 3, 3, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 5, 0, 0,
                  0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0,
                  0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 1,
                  0, 0, 0, 99, 1, 0, 0, 0, 98, 1, 0, 0, 0, 97])
GOLDEN_CPC = _b([4, 1, 16, 11, 0, 10, -52, -109, 3, 0, 0, 0, 2, 0, 0, 0,
                 -66, 21, 24, 110, 3, 0, 0, 0])

QUANTILE_VECTORS = [
    ("KLL", GOLDEN_KLL),
    ("REQ", GOLDEN_REQ),
    ("MERGEABLE", GOLDEN_MERGEABLE),
]


class TestGoldenVectors:
    @pytest.mark.parametrize("name,blob", QUANTILE_VECTORS)
    def test_quantile_golden(self, name, blob):
        # reference: checkEvaluation(QuantileFromSketchState(bytes, 0.95), 10.0)
        ws = decode_quantile(blob)
        assert ws.n == 4
        assert ws.quantile(0.95) == 10.0
        assert sorted(ws.values.tolist()) == [0.0, 1.0, 2.0, 10.0]
        assert ws.weights.tolist() == [1, 1, 1, 1]

    @pytest.mark.parametrize("name,blob", QUANTILE_VECTORS)
    def test_quantile_through_engine_path(self, name, blob):
        # The estimate UDFs call deserialize_quantile; foreign bytes must
        # resolve through the compat fallback to a working engine sketch.
        sk = deserialize_quantile(blob)
        assert isinstance(sk, KllSketch)
        assert sk.quantiles([0.0, 0.5, 0.95]) == [0.0, 1.0, 10.0]
        assert sk.rank(2.0) == 0.75
        assert sk.pmf(2) == [0.75, 0.25]

    def test_req_maps_to_req_class(self):
        assert isinstance(to_engine_sketch(GOLDEN_REQ), ReqSketch)

    def test_freqitems_golden(self):
        # reference: Array(Row("a", 3L), Row("c", 1L), Row("b", 1L))
        rows = decode_freqitems(GOLDEN_FREQ, "string")
        assert rows[0] == ("a", 3)
        assert sorted(rows[1:]) == [("b", 1), ("c", 1)]
        sk = deserialize_any(GOLDEN_FREQ)
        assert isinstance(sk, FreqItemsSketch)
        assert sk.n == 5
        assert sk.estimate("a") == 3
        assert dict(sk.frequent_items()) == {"a": 3, "b": 1, "c": 1}

    def test_cpc_golden_decodes(self):
        """The reference suite's golden CPC vector
        (``SketchExpressionSuite.scala:75-85``: DistinctCntFromSketchState
        -> 3L) must decode through the engine path. Full format coverage
        lives in ``tests/test_compat_cpc.py``."""
        sk = deserialize_any(GOLDEN_CPC)
        from datasketches_spark_spark.sketches import CpcUnionSketch
        assert isinstance(sk, CpcUnionSketch)
        assert sk.estimate() == 3
        assert sk.num_coupons() == 3
        # engine-envelope round trip preserves the estimate
        assert deserialize_any(sk.serialize()).estimate() == 3


class TestEngineIntegration:
    def test_combine_imported_with_native(self):
        # Merge a reference-persisted KLL state with a native accumulation;
        # total weight must stay exact and quantiles reflect both inputs.
        native = KllSketch(k=200, dtype=np.float32)
        native.update_batch(np.arange(100, 200, dtype=np.float32))
        imported = to_engine_sketch(GOLDEN_KLL)
        merged = imported.merge(native)
        assert merged.n == 104
        assert merged.quantile(0.0) == 0.0
        assert merged.quantile(1.0) == 199.0

    def test_to_engine_state_roundtrip(self):
        blob = to_engine_state(GOLDEN_MERGEABLE)
        sk = deserialize_quantile(blob)
        assert sk.quantiles([0.95]) == [10.0]
        assert sk.dtype == np.dtype("float64")

    def test_corrupt_foreign_bytes_still_raise(self):
        with pytest.raises(ValueError):
            deserialize_quantile(b"\x00\x01\x63\x00\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            deserialize_any(b"\x00\x01\x63\x00\x00\x00\x00\x00")

    def test_truncated_golden_raises_not_garbage(self):
        with pytest.raises(Exception):
            decode_quantile(GOLDEN_KLL[:20])

    def test_estimation_mode_req_structural_vector(self):
        # Hand-built estimation-mode image per the published layout
        # (independent of the engine encoder, so a symmetric encode/decode
        # bug cannot hide): 2 compactors, level 0 = [1,2,3] weight 1,
        # level 1 = [10,20] weight 2 -> n = 7. Flags 0x28 = HRA +
        # LEVEL_ZERO_SORTED, RAW_ITEMS clear, numRawItems 0.
        import struct
        head = struct.pack("<BBBBHBB", 2, 1, 17, 0x28, 12, 2, 0)
        head += struct.pack("<Q", 7)
        head += struct.pack("<ff", 1.0, 20.0)
        c0 = struct.pack("<QfBBHI", 0, 12.0, 0, 3, 0, 3) + \
            struct.pack("<3f", 1.0, 2.0, 3.0)
        c1 = struct.pack("<QfBBHI", 0, 12.0, 1, 3, 0, 2) + \
            struct.pack("<2f", 10.0, 20.0)
        ws = decode_quantile(head + c0 + c1)
        assert ws.n == 7 and int(ws.weights.sum()) == 7
        assert ws.values.tolist() == [1.0, 2.0, 3.0, 10.0, 20.0]
        assert ws.weights.tolist() == [1, 1, 1, 2, 2]
        assert ws.quantile(1.0) == 20.0
        sk = to_engine_sketch(head + c0 + c1)
        assert isinstance(sk, ReqSketch)
        assert sk.n == 7 and sk.quantile(1.0) == 20.0

    def test_estimation_mode_req_weight_mismatch_rejected(self):
        import struct
        head = struct.pack("<BBBBHBB", 2, 1, 17, 0x28, 12, 1, 0)
        head += struct.pack("<Q", 99)                  # wrong n
        head += struct.pack("<ff", 1.0, 3.0)
        c0 = struct.pack("<QfBBHI", 0, 12.0, 0, 3, 0, 3) + \
            struct.pack("<3f", 1.0, 2.0, 3.0)
        with pytest.raises(ValueError, match="retained weight"):
            decode_quantile(head + c0)

    def test_hra_only_flags_are_not_raw_items(self):
        # Regression for the flag-bit fix: bit 3 is HRA (set on every
        # default reference state), NOT raw-items. An HRA estimation-mode
        # image with numRawItems=0 must decode its compactors — the old
        # bit-3 keying returned a silently EMPTY sample for exactly this
        # shape.
        import struct
        head = struct.pack("<BBBBHBB", 2, 1, 17, 0x08, 12, 1, 0)
        head += struct.pack("<Q", 2)
        head += struct.pack("<ff", 4.0, 5.0)
        c0 = struct.pack("<QfBBHI", 0, 12.0, 0, 3, 0, 2) + \
            struct.pack("<2f", 4.0, 5.0)
        ws = decode_quantile(head + c0)
        assert ws.n == 2 and ws.values.tolist() == [4.0, 5.0]


class TestDoublesFlags:
    def test_empty_is_bit_two_not_bit_zero(self):
        # Classic-quantiles preamble: bit 0 = BIG_ENDIAN, bit 2 = EMPTY
        # (ADVICE r3). An empty image flagged 0x04 decodes empty...
        import struct
        empty = struct.pack("<BBBBHH", 1, 3, 8, 0x04, 128, 0)
        ws = decode_quantile(empty + b"\x00" * 8)
        assert ws.n == 0 and ws.values.size == 0

    def test_big_endian_image_refused(self):
        # ...and a big-endian-flagged NON-empty image must raise, not
        # silently struct-parse little-endian (or decode "empty").
        import struct
        head = struct.pack("<BBBBHH", 2, 3, 8, 0x01, 2, 0)
        body = struct.pack("<Q", 1) + struct.pack("<dd", 5.0, 5.0)
        body += struct.pack("<d", 5.0)
        with pytest.raises(ValueError, match="big-endian"):
            decode_quantile(head + body)


class TestMultiLevelDoubles:
    def test_two_level_bit_pattern(self):
        # Construct a compact DoublesSketch image: k=2, n=9 ->
        # base buffer = 1 item (w1), bit pattern 10 -> level 1 block (w4).
        # Retained weight 1 + 2*4 = 9 = n.
        import struct
        k, n = 2, 9
        vals_bb = [7.0]
        vals_lvl1 = [1.0, 5.0]
        head = struct.pack("<BBBBHH", 2, 3, 8, 0, k, 0)
        body = struct.pack("<Q", n) + struct.pack("<dd", 1.0, 7.0)
        body += struct.pack("<d", vals_bb[0])
        body += struct.pack("<dd", *vals_lvl1)
        ws = decode_quantile(head + body)
        assert ws.n == 9
        assert int(ws.weights.sum()) == 9
        assert ws.quantile(1.0) == 7.0
        sk = to_engine_sketch(head + body)
        assert sk.quantiles([1.0]) == [7.0]


# Apache DataSketches HLL wire images, generated ONCE by the DataSketches
# Java library embedded in Spark (hll_sketch_agg) and committed as byte
# literals — the same library the reference wraps
# (distinctCntSketches.scala:57-66), pattern
# SketchExpressionSuite.scala:75-85. They pin the foreign-state sniff
# route (functions/distinctcnt.py::_is_ds_hll -> JVM hll_sketch_estimate):
# if the byte-3 family sniff or Spark's HLL codec ever regresses, these
# literals catch it without re-generating anything.
#
# SELECT hll_sketch_agg(CAST(id AS STRING), 12) FROM range(20)
# -> sparse (LIST) mode image, estimate exactly 20
GOLDEN_HLL_SPARSE = _b([
    3, 1, 7, 12, 5, 0, 0, 9, 20, 0, 0, 0, -64, 127, 85, 6, 0, 0, 0, 0, 105,
    -42, 43, 6, 0, 0, 0, 0, 0, 0, 0, 0, -123, 105, 27, 10, 0, 0, 0, 0, -57,
    -124, -98, 20, 0, 0, 0, 0, -55, 73, 116, 12, -86, -90, 15, 6, 0, 0, 0,
    0, -78, -9, -68, 23, 0, 0, 0, 0, -82, -42, 42, 15, -113, 44, -39, 14,
    0, 0, 0, 0, 0, 0, 0, 0, 82, 73, -11, 7, -45, -15, -111, 5, 0, 0, 0, 0,
    -42, -73, -22, 4, -1, 78, -88, 9, 0, 0, 0, 0, -40, 11, -3, 9, 57, -11,
    -126, 9, 0, 0, 0, 0, -37, 2, 40, 5, -68, -35, -100, 11, 29, 119, 48, 6,
    -2, 82, -110, 12, 31, 83, -78, 5])
GOLDEN_HLL_SPARSE_EST = 20

# SELECT hll_sketch_agg(CAST(id AS STRING), 8) FROM range(10000)
# -> dense HLL_8 mode image, Java estimate 9876 (1.24% error at lgk=8)
GOLDEN_HLL_DENSE = _b([
    10, 1, 7, 8, 0, 0, 0, 10, -94, -43, -15, 36, 6, 74, -61, 64, 0, 0, 0,
    0, 104, -90, 19, 64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    8, 6, 8, 4, 12, 5, 5, 5, 5, 5, 7, 8, 5, 5, 4, 7, 5, 5, 15, 6, 5, 9, 8,
    8, 4, 8, 6, 5, 4, 7, 5, 5, 6, 7, 7, 6, 4, 7, 9, 5, 10, 5, 6, 8, 6, 8,
    6, 5, 10, 9, 6, 5, 4, 9, 5, 5, 7, 5, 13, 6, 6, 5, 6, 3, 7, 6, 5, 6, 6,
    8, 6, 6, 8, 6, 9, 4, 10, 7, 12, 7, 4, 6, 5, 7, 7, 6, 5, 9, 11, 8, 7,
    6, 6, 6, 5, 7, 9, 6, 8, 5, 13, 8, 5, 6, 4, 6, 6, 8, 6, 4, 6, 8, 6, 7,
    7, 6, 10, 8, 5, 7, 7, 8, 7, 6, 6, 7, 6, 6, 5, 10, 6, 7, 4, 8, 5, 7, 7,
    6, 7, 7, 6, 7, 7, 6, 6, 7, 5, 8, 6, 6, 11, 6, 6, 8, 10, 8, 8, 8, 5, 4,
    5, 4, 8, 6, 5, 5, 5, 8, 7, 8, 6, 6, 7, 3, 6, 7, 5, 5, 5, 5, 7, 8, 10,
    7, 5, 4, 7, 9, 4, 5, 8, 10, 5, 7, 8, 4, 6, 5, 6, 5, 5, 6, 5, 9, 6, 10,
    5, 6, 4, 7, 6, 6, 10, 5, 5, 5, 7, 8, 6, 13, 7, 7, 7, 10, 7, 8, 7, 5,
    8, 9, 5, 4, 7, 7, 4, 6, 6, 6, 4, 7, 5, 5, 5, 6, 6, 11, 7, 10, 6, 4, 7,
    7, 6, 8, 4, 6])
GOLDEN_HLL_DENSE_EST = 9876


class TestHllGoldenVectors:
    def test_family_sniff(self):
        from datasketches_spark_spark.compat.datasketches import (
            is_datasketches)
        assert GOLDEN_HLL_SPARSE[2] == 7 and GOLDEN_HLL_DENSE[2] == 7
        assert is_datasketches(GOLDEN_HLL_SPARSE)
        assert is_datasketches(GOLDEN_HLL_DENSE)

    def test_estimate_routes_literal_bytes_to_jvm(self, spark):
        # the engine's estimate function, NOT hll-impl mode: the byte
        # sniff must route these foreign images to the JVM decoder and
        # return the Java estimates
        from pyspark.sql.types import (BinaryType, StringType, StructField,
                                       StructType)
        from datasketches_spark_spark.functions import distinctcnt as D
        schema = StructType([StructField("name", StringType()),
                             StructField("state", BinaryType())])
        df = spark.createDataFrame(
            [("sparse", bytearray(GOLDEN_HLL_SPARSE)),
             ("dense", bytearray(GOLDEN_HLL_DENSE))], schema)
        rows = df.select(
            "name",
            D.approx_count_distinct_estimate("state").alias("ndv")).collect()
        got = {r.name: r.ndv for r in rows}
        assert got == {"sparse": GOLDEN_HLL_SPARSE_EST,
                       "dense": GOLDEN_HLL_DENSE_EST}

    def test_combine_literal_bytes(self, spark):
        # hll_union_agg merges mixed-lgk images (downsampling to the
        # smaller); sparse's 20 strings ("0".."19") are a subset of
        # dense's ("0".."9999"), so the union estimate stays the dense
        # estimate's neighborhood
        from pyspark.sql.types import (BinaryType, StructField, StructType)
        from datasketches_spark_spark.functions import distinctcnt as D
        schema = StructType([StructField("state", BinaryType())])
        df = spark.createDataFrame(
            [(bytearray(GOLDEN_HLL_SPARSE),),
             (bytearray(GOLDEN_HLL_DENSE),)], schema)
        (row,) = (df.agg(D.approx_count_distinct_combine(
                      "state", impl="HLL").alias("m"))
                  .select(D.approx_count_distinct_estimate(
                      "m", impl="HLL").alias("ndv"))
                  .collect())
        assert abs(row.ndv - 10_000) <= 0.05 * 10_000

    def test_engine_side_decode_still_refuses_with_guidance(self):
        # driver-side decode of HLL bytes stays an explicit redirect to
        # the JVM surface (no parallel python HLL codec)
        with pytest.raises(NotImplementedError, match="hll_sketch_estimate"):
            to_engine_sketch(GOLDEN_HLL_SPARSE)


class TestSparkSurface:
    """Reference-persisted states through the engine's Spark estimate
    functions — the end-to-end migration path."""

    def test_estimate_imported_states(self, spark):
        from pyspark.sql.types import BinaryType, StringType, StructField, StructType
        from datasketches_spark_spark.functions import quantiles as Q
        from datasketches_spark_spark.functions import freqitems as FI

        schema = StructType([StructField("impl", StringType()),
                             StructField("state", BinaryType())])
        df = spark.createDataFrame(
            [(n, bytearray(b)) for n, b in QUANTILE_VECTORS], schema)
        rows = (df.select("impl",
                          Q.approx_percentile_estimate("state", 0.95)
                           .alias("p95"))
                  .collect())
        assert {r["impl"]: r["p95"] for r in rows} == {
            "KLL": 10.0, "REQ": 10.0, "MERGEABLE": 10.0}

        fdf = spark.createDataFrame(
            [("freq", bytearray(GOLDEN_FREQ))], schema)
        (item_rows,) = fdf.select(
            FI.approx_freqitems_estimate("state").alias("items")).collect()
        assert {r["item"]: r["estimated"] for r in item_rows["items"]} == {
            "a": 3, "b": 1, "c": 1}

    def test_sql_estimate_imported_state(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        spark.createDataFrame(
            [(bytearray(GOLDEN_KLL),)], "state binary"
        ).createOrReplaceTempView("imported_states")
        (row,) = spark.sql(
            "SELECT approx_percentile_estimate(state, 0.95) AS p95 "
            "FROM imported_states").collect()
        assert row["p95"] == 10.0

    def test_bulk_import_then_combine(self, spark):
        import datasketches_spark_spark as dss
        from datasketches_spark_spark.compat import import_datasketches_state

        dss.install(spark)
        df = spark.createDataFrame(
            [(bytearray(GOLDEN_KLL),), (bytearray(GOLDEN_KLL),)],
            "state binary")
        converted = df.select(
            import_datasketches_state("state").alias("state"))
        converted.createOrReplaceTempView("migrated_states")
        (row,) = spark.sql(
            "SELECT approx_percentile_estimate("
            "  approx_percentile_combine(state), 0.5) AS p50 "
            "FROM migrated_states").collect()
        assert row["p50"] == 1.0

        df.createOrReplaceTempView("reference_states")
        (sql_row,) = spark.sql(
            "SELECT approx_percentile_estimate("
            "  import_datasketches_state(state), 0.95) AS p95 "
            "FROM reference_states LIMIT 1").collect()
        assert sql_row["p95"] == 10.0


class TestForeignHllRouting:
    """Apache DataSketches HLL states (the reference's accumulate output
    under sketchImpl=HLL; any HLL_4/6/8 image) need no conversion —
    estimate auto-routes them to Spark's JVM hll_sketch_estimate and
    combine(impl='HLL') merges them with hll_union_agg."""

    def test_estimate_auto_routes_mixed_table(self, spark):
        from datasketches_spark_spark import functions as dsf
        from datasketches_spark_spark.sketches import ThetaSketch
        foreign = (spark.range(0, 1000)
                   .agg(F.hll_sketch_agg("id").alias("s"))
                   .collect()[0].s)
        assert bytes(foreign)[2] == 7  # DataSketches HLL family id
        th = ThetaSketch(k=4096)
        th.update_longs(np.arange(500, dtype=np.int64))
        df = spark.createDataFrame(
            [("ds_hll", bytearray(foreign)),
             ("engine", bytearray(th.serialize()))],
            "kind string, state binary")
        rows = {r.kind: r.ndv for r in df.select(
            "kind",
            dsf.approx_count_distinct_estimate("state").alias("ndv"))
            .collect()}
        assert rows["engine"] == 500            # theta exact regime
        assert abs(rows["ds_hll"] - 1000) <= 30  # HLL at default lgk

    def test_combine_foreign_states_jvm(self, spark):
        from datasketches_spark_spark import functions as dsf
        halves = [
            spark.range(lo, hi).agg(F.hll_sketch_agg("id").alias("s"))
            .collect()[0].s
            for lo, hi in ((0, 600), (400, 1000))]
        df = spark.createDataFrame([(bytearray(b),) for b in halves],
                                   "state binary")
        got = df.agg(dsf.approx_count_distinct_estimate(
            dsf.approx_count_distinct_combine("state", impl="HLL"))
            .alias("ndv")).collect()[0].ndv
        assert abs(got - 1000) <= 30

    def test_hll_family_conversion_raises_with_guidance(self):
        fake = bytes([2, 1, 7, 12, 0, 0, 0, 0]) + b"\x00" * 8
        with pytest.raises(NotImplementedError, match="hll_sketch_estimate"):
            to_engine_sketch(fake)


class TestMultiLevelKll:
    def test_two_level_layout(self):
        # Hand-built compact KLL-floats image: k=20, n=12, two levels.
        # Retained: 4 items at level 0 (weight 1) + 4 at level 1 (weight 2)
        # -> total weight 4 + 8 = 12 = n. Levels array stores absolute
        # positions [12, 16]; items serialize from levels[0].
        import struct
        header = struct.pack("<BBBBHBB", 5, 1, 15, 0, 20, 8, 0)
        header += struct.pack("<Q", 12)               # n
        header += struct.pack("<HBB", 20, 2, 0)       # minK, numLevels, pad
        header += struct.pack("<ii", 12, 16)          # levels
        header += struct.pack("<ff", 0.0, 90.0)       # min, max
        lvl0 = [5.0, 1.0, 9.0, 3.0]                   # weight 1
        lvl1 = [10.0, 90.0, 30.0, 50.0]               # weight 2
        blob = header + struct.pack("<8f", *(lvl0 + lvl1))
        ws = decode_quantile(blob)
        assert ws.n == 12 and int(ws.weights.sum()) == 12
        assert sorted(ws.weights.tolist()) == [1, 1, 1, 1, 2, 2, 2, 2]
        assert ws.quantile(1.0) == 90.0
        sk = deserialize_quantile(blob)
        # the image's STORED exact min (0.0) wins over the retained
        # minimum (1.0): compaction may have dropped the true extreme,
        # so rank-0 answers must come from the serialized min/max
        # (r15 verdict finding)
        assert sk.quantiles([0.0, 1.0]) == [0.0, 90.0]
        assert sk.min_value == 0.0 and sk.max_value == 90.0
        assert sk.n == 12

    def test_weight_mismatch_rejected(self):
        import struct
        header = struct.pack("<BBBBHBB", 5, 1, 15, 0, 20, 8, 0)
        header += struct.pack("<Q", 99)               # wrong n
        header += struct.pack("<HBB", 20, 1, 0)
        header += struct.pack("<i", 16)
        header += struct.pack("<ff", 0.0, 3.0)
        blob = header + struct.pack("<4f", 0.0, 1.0, 2.0, 3.0)
        with pytest.raises(ValueError, match="retained weight"):
            decode_quantile(blob)


class TestExport:
    """The EXPORT direction: exact-regime engine states encode to
    DataSketches wire bytes, byte-identical to the reference suite's
    golden vectors for the same input streams."""

    def test_kll_export_matches_golden_bytes(self):
        from datasketches_spark_spark.compat.datasketches import (
            encode_kll_floats)
        sk = KllSketch(k=200, dtype=np.float32)
        sk.update_batch(np.array([0, 1, 2, 10], np.float32))
        assert encode_kll_floats(sk) == GOLDEN_KLL

    def test_req_export_matches_golden_bytes(self):
        from datasketches_spark_spark.compat.datasketches import (
            encode_req_floats)
        sk = ReqSketch(k=12)
        sk.update_batch(np.array([0, 1, 2, 10], np.float32))
        assert encode_req_floats(sk) == GOLDEN_REQ

    def test_mergeable_export_matches_golden_bytes(self):
        from datasketches_spark_spark.compat.datasketches import (
            encode_doubles)
        sk = KllSketch(k=128, dtype=np.float64)
        sk.update_batch(np.array([0, 1, 2, 10], np.float64))
        assert encode_doubles(sk) == GOLDEN_MERGEABLE

    def test_export_import_roundtrip(self):
        from datasketches_spark_spark.compat import to_datasketches_state
        sk = KllSketch(k=64, dtype=np.float32)
        sk.update_batch(np.arange(40, dtype=np.float32))
        wire = to_datasketches_state(sk.serialize())
        back = deserialize_quantile(wire)          # import path reads it
        assert back.quantiles([0.0, 0.5, 1.0]) == [0.0, 19.0, 39.0]

    def test_freq_export_preserves_estimates(self):
        from datasketches_spark_spark.compat import to_datasketches_state
        from datasketches_spark_spark.compat.datasketches import (
            decode_freqitems)
        sk = FreqItemsSketch(max_map_size=8)
        sk.update_batch(list("aaabbc") * 10)
        wire = to_datasketches_state(sk.serialize())
        rows = dict(decode_freqitems(wire, "string"))
        assert rows == {"a": 30, "b": 20, "c": 10}

    def test_compacted_kll_state_exports_multilevel_image(self):
        # compacted KLL float32 states export the multi-level compact
        # form and round-trip: weights sum to n exactly, quantiles equal
        # the engine sketch's own, import rebuilds a KllSketch, and
        # re-export is byte-identical (deterministic)
        from datasketches_spark_spark.compat import to_datasketches_state
        from datasketches_spark_spark.compat.datasketches import (
            decode_quantile)
        rng = np.random.default_rng(11)
        vals = rng.permutation(np.arange(20_000, dtype=np.float32))
        sk = KllSketch(k=200, dtype=np.float32)
        sk.update_batch(vals)
        assert not sk.is_exact()
        wire = to_datasketches_state(sk.serialize())
        assert wire[2] == 15 and wire[18] > 1      # KLL, multi-level
        ws = decode_quantile(wire)
        assert ws.n == 20_000 and int(ws.weights.sum()) == 20_000
        for p in (0.01, 0.5, 0.99):
            assert ws.quantile(p) == sk.quantile(p)
            assert abs(ws.quantile(p) - p * 20_000) <= 0.03 * 20_000
        back = deserialize_quantile(wire)
        assert isinstance(back, KllSketch) and back.n == 20_000
        assert back.quantile(0.5) == sk.quantile(0.5)
        assert to_datasketches_state(back.serialize()) == wire

    def test_compacted_doubles_state_still_refuses_export(self):
        # the classic DoublesSketch layout is rigid (k-item blocks per
        # set bit of n/2k) — engine float64 states past the base-buffer
        # regime cannot be expressed in it, so the refusal stays
        from datasketches_spark_spark.compat import to_datasketches_state
        sk = KllSketch(k=128, dtype=np.float64)
        sk.update_batch(np.arange(10_000, dtype=np.float64))
        assert not sk.is_exact()
        with pytest.raises(NotImplementedError, match="exact-regime"):
            to_datasketches_state(sk.serialize())

    def test_compacted_req_state_exports_estimation_image(self):
        # REQ compacted states export as the estimation-mode image and
        # round-trip: weights sum to n exactly, high-rank quantiles (where
        # REQ concentrates accuracy) land within tight relative error, and
        # the import path rebuilds a native ReqSketch.
        from datasketches_spark_spark.compat import to_datasketches_state
        from datasketches_spark_spark.compat.datasketches import (
            decode_quantile)
        rng = np.random.default_rng(3)
        vals = rng.permutation(np.arange(20_000, dtype=np.float32))
        sk = ReqSketch(k=12)
        sk.update_batch(vals)
        assert not sk.is_exact()
        wire = to_datasketches_state(sk.serialize())
        assert wire[2] == 17 and not (wire[3] & 0x10)  # REQ, not raw
        ws = decode_quantile(wire)
        assert ws.n == 20_000 and int(ws.weights.sum()) == 20_000
        # decode must reproduce the engine sketch's own estimates exactly
        # (same retained multiset), and those estimates must be near truth
        # at high ranks
        for p in (0.9, 0.99, 0.999, 1.0):
            assert ws.quantile(p) == sk.quantile(p)
            assert abs(ws.quantile(p) - p * 20_000) <= 0.02 * 20_000
        back = deserialize_quantile(wire)
        assert isinstance(back, ReqSketch)
        assert back.n == 20_000
        assert back.quantile(0.99) == sk.quantile(0.99)
        # determinism: re-exporting the imported sketch is byte-identical
        assert to_datasketches_state(back.serialize()) == wire

    def test_exact_req_past_u8_limit_exports_estimation_image(self):
        # 0 < n <= 255 is the raw-items ceiling (numRawItems is a u8);
        # an exact-regime state past it must take the estimation-mode
        # form, not fail.
        from datasketches_spark_spark.compat.datasketches import (
            decode_quantile, encode_req_floats)
        sk = ReqSketch(k=100)      # per-level cap 600: exact at n=400
        sk.update_batch(np.arange(400, dtype=np.float32))
        assert sk.is_exact()
        wire = encode_req_floats(sk)
        assert not (wire[3] & 0x10)
        ws = decode_quantile(wire)
        assert ws.n == 400 and ws.weights.tolist() == [1] * 400
        assert ws.quantile(0.5) == 199.0  # disc rule: rank ceil(0.5*400)

    def test_theta_state_refuses_export_with_guidance(self):
        from datasketches_spark_spark.compat import to_datasketches_state
        from datasketches_spark_spark.sketches import ThetaSketch
        from datasketches_spark_spark.sketches.theta import hash_longs
        sk = ThetaSketch(k=64)
        sk.update_hashes(hash_longs(np.arange(10, dtype=np.int64)))
        with pytest.raises(NotImplementedError, match="hll_sketch_agg"):
            to_datasketches_state(sk.serialize())

    def test_sql_export_function(self, spark):
        import datasketches_spark_spark as dss
        dss.install(spark)
        spark.range(0, 50, 1, 2).select(
            F.col("id").cast("double").alias("v")
        ).createOrReplaceTempView("exp_t")
        spark.conf.set("spark.sql.dataSketches.quantiles.sketchImpl",
                       "MERGEABLE")
        spark.conf.set("spark.sql.dataSketches.quantiles.mergeable.k", "4096")
        dss.install(spark)
        try:
            (row,) = spark.sql("""
                SELECT export_datasketches_state(
                         approx_percentile_accumulate(v)) AS wire
                FROM exp_t""").collect()
            wire = bytes(row["wire"])
            assert wire[2] == 8  # classic DoublesSketch family id
            assert deserialize_quantile(wire).quantiles([1.0]) == [49.0]
        finally:
            spark.conf.unset("spark.sql.dataSketches.quantiles.sketchImpl")
            spark.conf.unset("spark.sql.dataSketches.quantiles.mergeable.k")
            dss.install(spark)


class TestEstimationRegimeExportLive:
    """Round 13: estimation-mode wire EXPORT validated LIVE against the
    datasketches-java bundled with PySpark (the bloomwire.py pattern).
    The r12 multi-level KLL image anchored its levels array at 0; the
    library expects ABSOLUTE positions inside its
    computeTotalItemCapacity(k, m, numLevels) items array (filled top-
    down), so Java heapify read past the buffer — caught and fixed by
    these tests."""

    @staticmethod
    def _jmem(spark, data: bytes):
        return spark._jvm.org.apache.datasketches.memory.Memory.wrap(
            bytearray(data))

    @pytest.mark.parametrize("k,n", [(200, 500), (200, 5000),
                                     (200, 100_000), (128, 3000),
                                     (256, 20_000), (200, 201),
                                     (16, 1000)])
    def test_kll_multilevel_heapifies_in_java(self, spark, k, n):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state, to_engine_sketch)
        from datasketches_spark_spark.sketches.kll import KllSketch
        sk = KllSketch(k=k)
        vals = np.random.RandomState(7).normal(0, 1, n).astype(np.float32)
        sk.update_batch(vals.astype(np.float64))
        assert not sk.is_exact()  # the regime under test
        exported = to_datasketches_state(sk.serialize())
        jsk = spark._jvm.org.apache.datasketches.kll.KllFloatsSketch \
            .heapify(self._jmem(spark, exported))
        assert jsk.getN() == n
        for p in (0.01, 0.1, 0.5, 0.9, 0.99):
            assert abs(jsk.getQuantile(p) - sk.quantiles([p])[0]) < 1e-6
        # full circle: java re-serializes, the engine re-imports
        back = to_engine_sketch(bytes(jsk.toByteArray()))
        assert back.n == n
        for p in (0.1, 0.5, 0.9):
            assert abs(back.quantiles([p])[0] - sk.quantiles([p])[0]) \
                < 1e-6

    @pytest.mark.parametrize("k,n", [(12, 300), (12, 5000), (24, 50_000)])
    def test_req_estimation_heapifies_in_java(self, spark, k, n):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state)
        from datasketches_spark_spark.sketches.req import ReqSketch
        sk = ReqSketch(k=k)
        vals = np.random.RandomState(11).normal(0, 1, n).astype(np.float32)
        sk.update_batch(vals.astype(np.float64))
        exported = to_datasketches_state(sk.serialize())
        jsk = spark._jvm.org.apache.datasketches.req.ReqSketch \
            .heapify(self._jmem(spark, exported))
        assert jsk.getN() == n
        for p in (0.1, 0.5, 0.9, 0.99):
            assert abs(jsk.getQuantile(p) - sk.quantiles([p])[0]) < 1e-6

    def test_kll_capacity_matches_java_layout(self, spark):
        """Pin _kll_total_capacity against the library's own byte
        layout: for a Java-built sketch, the serialized retained region
        plus levels[0] must equal the computed capacity."""
        import struct

        from datasketches_spark_spark.compat.datasketches import (
            _kll_total_capacity)
        jvm = spark._jvm
        for k, n in [(200, 5000), (128, 3000), (64, 100_000)]:
            jsk = jvm.org.apache.datasketches.kll.KllFloatsSketch \
                .newHeapInstance(k)
            rnd = 1234567
            for i in range(n):
                rnd = (rnd * 1103515245 + 12345) % (1 << 31)
                jsk.update(float(rnd % 100_000))
            blob = bytes(jsk.toByteArray())
            num_levels = blob[18]
            lvl0 = struct.unpack("<i", blob[20:24])[0]
            retained = (len(blob) - (20 + 4 * num_levels + 8)) // 4
            assert _kll_total_capacity(k, 8, num_levels) == \
                lvl0 + retained, (k, n)


class TestExportLiveDoublesAndFreq:
    """Live-Java validation for the remaining export encoders (round
    13): classic DoublesSketch and frequent-items (strings + longs)
    images produced by to_datasketches_state must heapify in the
    bundled datasketches-java with the engine's answers."""

    def test_doubles_export_heapifies(self, spark):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state)
        from datasketches_spark_spark.sketches.kll import KllSketch
        jvm = spark._jvm
        # base-buffer regime only: estimation-mode DoublesSketch export
        # remains a documented refusal (its rigid k-item block layout
        # cannot express engine level sizes); the estimation-regime
        # target is the KLL-floats image above
        for k, n in [(128, 100), (128, 127), (32_768, 50)]:
            sk = KllSketch(k=k, dtype=np.float64)
            sk.update_batch(np.arange(n, dtype=np.float64) * 1.5)
            blob = to_datasketches_state(sk.serialize())
            jd = jvm.org.apache.datasketches.quantiles.DoublesSketch \
                .heapify(jvm.org.apache.datasketches.memory.Memory
                         .wrap(bytearray(blob)))
            assert jd.getN() == n
            for p in (0.1, 0.5, 0.9):
                assert jd.getQuantile(p) == sk.quantiles([p])[0]

    def test_freq_exports_heapify(self, spark):
        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state)
        from datasketches_spark_spark.sketches.freq import (
            ITEM_LONG, ITEM_STR, FreqItemsSketch)
        jvm = spark._jvm
        mem = jvm.org.apache.datasketches.memory.Memory
        fs = FreqItemsSketch(max_map_size=64, item_type=ITEM_STR)
        fs.update_batch([f"k{i % 7}" for i in range(1000)])
        jf = jvm.org.apache.datasketches.frequencies.ItemsSketch \
            .getInstance(
                mem.wrap(bytearray(to_datasketches_state(fs.serialize()))),
                jvm.org.apache.datasketches.common.ArrayOfStringsSerDe())
        for i in range(7):
            # exact regime (7 items in a 64-slot map): estimates equal
            # true counts on both sides
            assert jf.getEstimate(f"k{i}") == fs.estimate(f"k{i}")
        fl = FreqItemsSketch(max_map_size=64, item_type=ITEM_LONG)
        fl.update_batch([i % 5 for i in range(500)])
        jl = jvm.org.apache.datasketches.frequencies.LongsSketch \
            .getInstance(
                mem.wrap(bytearray(to_datasketches_state(fl.serialize()))))
        for i in range(5):
            assert jl.getEstimate(i) == fl.estimate(i) == 100


class TestExactExtremaWireLive:
    """r15 verdict #7: the min/max wire fields must stay EXACT through
    both interop directions in the estimation regime — DataSketches
    KLL/REQ serialize exact stream extrema, and the engine now tracks
    them (sketches/kll.py serde v3)."""

    @staticmethod
    def _jmem(spark, data: bytes):
        return spark._jvm.org.apache.datasketches.memory.Memory.wrap(
            bytearray(data))

    def test_kll_export_carries_exact_extrema_to_java(self, spark):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state)
        from datasketches_spark_spark.sketches.kll import KllSketch
        sk = KllSketch(k=32)
        # single extreme outliers in a long uniform stream: compaction
        # is near-certain to drop them from the retained set
        vals = np.concatenate([[-1e6], np.random.RandomState(3)
                               .uniform(0, 1, 20_000), [1e6]])
        sk.update_batch(vals)
        assert not sk.is_exact()
        jsk = spark._jvm.org.apache.datasketches.kll.KllFloatsSketch \
            .heapify(self._jmem(spark,
                                to_datasketches_state(sk.serialize())))
        assert jsk.getMinItem() == np.float32(-1e6)
        assert jsk.getMaxItem() == np.float32(1e6)

    def test_kll_import_consumes_java_exact_extrema(self, spark):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_engine_sketch)
        jvm = spark._jvm
        jsk = jvm.org.apache.datasketches.kll.KllFloatsSketch \
            .newHeapInstance(32)
        jsk.update(float(-1e6))
        rnd = 99
        for _ in range(20_000):
            rnd = (rnd * 1103515245 + 12345) % (1 << 31)
            jsk.update(float(rnd % 1000))
        jsk.update(float(1e6))
        back = to_engine_sketch(bytes(jsk.toByteArray()))
        # engine answers rank-0/1 from the image's STORED exact
        # extrema, not the retained items (which likely dropped them)
        assert back.quantile(0.0) == np.float32(-1e6)
        assert back.quantile(1.0) == np.float32(1e6)
        assert back.min_value == np.float32(-1e6)
        assert back.max_value == np.float32(1e6)

    def test_req_export_carries_exact_extrema_to_java(self, spark):
        import numpy as np

        from datasketches_spark_spark.compat.datasketches import (
            to_datasketches_state)
        from datasketches_spark_spark.sketches.req import ReqSketch
        sk = ReqSketch(k=8)
        vals = np.concatenate([[-5e5], np.random.RandomState(5)
                               .uniform(0, 1, 10_000), [5e5]])
        sk.update_batch(vals)
        assert not sk.is_exact()
        jsk = spark._jvm.org.apache.datasketches.req.ReqSketch \
            .heapify(self._jmem(spark,
                                to_datasketches_state(sk.serialize())))
        assert jsk.getMinItem() == np.float32(-5e5)
        assert jsk.getMaxItem() == np.float32(5e5)
