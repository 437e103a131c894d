"""Z-order layout (operators/ordering.py::zorder_key/zorder_layout):
the interleave matches a python bit-reference exactly, Z-order's
locality property holds (every quadrant bounds every dimension), the
layout pass produces range-disjoint sorted partitions, and the key is
pure scan-stage arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators.ordering import (zorder_key,
                                                         zorder_layout)


def _ref_interleave(vals, bits):
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + i)
    return out


class TestZorderKey:
    def test_matches_bit_reference_2d(self, spark):
        rows = [(x, y) for x in (0, 1, 5, 255, 1023)
                for y in (0, 2, 7, 512, 1023)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = {(r.x, r.y): r.z for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=10).alias("z"))
            .collect()}
        for x, y in rows:
            assert got[(x, y)] == _ref_interleave([x, y], 10), (x, y)

    def test_matches_bit_reference_3d(self, spark):
        rows = [(3, 9, 1000), (0, 0, 0), (2047, 13, 512)]
        df = spark.createDataFrame(rows, ["a", "b", "c"])
        got = [r.z for r in df.select(
            zorder_key(["a", "b", "c"], bits=11).alias("z")).collect()]
        want = [_ref_interleave(list(v), 11) for v in rows]
        assert got == want

    def test_clamps_out_of_range(self, spark):
        df = spark.createDataFrame([(-5, 1 << 40)], ["x", "y"])
        z = df.select(zorder_key(["x", "y"], bits=10).alias("z")) \
            .collect()[0].z
        assert z == _ref_interleave([0, 1023], 10)

    def test_validations(self):
        with pytest.raises(ValueError, match="2 or 3"):
            zorder_key(["a"])
        with pytest.raises(ValueError, match="signed long"):
            zorder_key(["a", "b", "c"], bits=22)

    def test_quadrant_locality(self, spark):
        # THE Z-order property: bucketing by the key's high bits
        # bounds EVERY dimension within each bucket — this is what
        # makes parquet min/max stats prune on any filtered column
        bits, drop = 6, 8          # 64x64 grid, 16 top-level buckets
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"))
        z = grid.select("x", "y",
                        zorder_key(["x", "y"], bits=bits).alias("z"))
        spans = (z.groupBy(F.shiftright("z", drop).alias("bucket"))
                 .agg((F.max("x") - F.min("x")).alias("sx"),
                      (F.max("y") - F.min("y")).alias("sy"),
                      F.count("*").alias("n"))
                 .collect())
        assert len(spans) == 16
        for r in spans:
            assert r.n == 256                      # even quadrants
            assert r.sx <= 15 and r.sy <= 15       # 1/4 of each range

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([(1, 2)], ["x", "y"])
        plan = df.select(zorder_key(["x", "y"], 10)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()


class TestZorderLayout:
    def test_partitions_are_key_range_disjoint(self, spark):
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"))
        laid = zorder_layout(df, ["x", "y"], bits=6, num_files=8)
        assert "_zkey" not in laid.columns
        ranges = (laid
                  .withColumn("z", zorder_key(["x", "y"], bits=6))
                  .withColumn("pid", F.spark_partition_id())
                  .groupBy("pid")
                  .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
                  .orderBy("lo").collect())
        assert len(ranges) >= 2
        for a, b in zip(ranges, ranges[1:]):
            assert a.hi <= b.lo        # disjoint, ordered ranges
        total = laid.count()
        assert total == 4096
