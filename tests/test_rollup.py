"""Persisted sketch rollups: states survive a parquet round-trip and
merge to the same answer as the direct aggregate (q52's contract)."""

from pyspark.sql import functions as F

from datasketches_spark_spark import functions as dsf
from datasketches_spark_spark.operators.sketch_agg import sketch_accumulate
from datasketches_spark_spark.sources import read_table


def test_parquet_roundtrip_preserves_estimates(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    qs = sketch_accumulate(ev.select(day, "value"), ["day"], "value",
                           family="quantile", impl="MERGEABLE", k=262144)
    path = str(tmp_path / "rollup")
    qs.write.parquet(path)
    roll = spark.read.parquet(path)

    def answer(df):
        m = df.agg(dsf.approx_percentile_combine("state").alias("m"))
        return m.select(
            dsf.approx_percentile_estimate("m", 0.5).alias("p50")
        ).collect()[0].p50

    assert answer(roll) == answer(qs)

    # subset merges too: the persisted table answers window queries alone
    win = F.col("day") < "2024-01-15"
    assert answer(roll.where(win)) == answer(qs.where(win))
