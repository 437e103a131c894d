"""SketchRollup lifecycle: build, incremental refresh, compact, re-group."""

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators import SketchRollup
from datasketches_spark_spark.operators.sketch_agg import (
    distinct_measure, percentile_measure)
from datasketches_spark_spark.sources import read_table


def _events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type", "value", "user_id")


def _rollup(tmp_path):
    return SketchRollup(
        str(tmp_path / "roll"), ["day", "event_type"],
        [percentile_measure("p50", "value", 0.5,
                            impl="MERGEABLE", k=262_144),
         distinct_measure("ndv", "user_id", k=16_384)])


def test_refresh_equals_full_build(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    # split by parity so the SAME (day, type) groups appear in both
    # halves - the refresh really appends partials for existing groups
    inc = _rollup(tmp_path / "a")
    inc.build(ev.where(F.col("user_id") % 2 == 0))
    inc.refresh(ev.where(F.col("user_id") % 2 == 1))
    full = _rollup(tmp_path / "b")
    full.build(ev)
    got = sorted(map(tuple, inc.estimate(
        spark, group_by=["event_type"]).collect()))
    want = sorted(map(tuple, full.estimate(
        spark, group_by=["event_type"]).collect()))
    assert got == want
    # appended partials: more state rows than groups until compaction
    n_groups = full.states(spark).count()
    assert inc.states(spark).count() > n_groups


def test_compact_preserves_answers_and_shrinks(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    roll = _rollup(tmp_path)
    roll.build(ev.where(F.col("user_id") % 2 == 0))
    roll.refresh(ev.where(F.col("user_id") % 2 == 1))
    before = sorted(map(tuple, roll.estimate(spark).collect()))
    n_before = roll.states(spark).count()
    roll.compact(spark)
    after = sorted(map(tuple, roll.estimate(spark).collect()))
    assert after == before
    assert roll.states(spark).count() < n_before


def test_regroup_subset_and_filter(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    roll = _rollup(tmp_path)
    roll.build(ev)
    win = (F.col("day") >= "2024-01-08") & (F.col("day") < "2024-01-22")
    got = {r.event_type: (r.p50, r.ndv) for r in roll.estimate(
        spark, where=win, group_by=["event_type"]).collect()}
    raw = ev.where(win)
    want = {r.event_type: (r.p50, r.ndv) for r in raw.groupBy("event_type")
            .agg(F.expr("percentile(value, 0.5)").alias("_ignore"),
                 F.countDistinct("user_id").alias("ndv"),
                 F.expr("percentile_approx(value, 0.5)").alias("_i2"),
                 F.median("value").alias("_i3"),
                 F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
                 .alias("p50")).select("event_type", "p50", "ndv").collect()}
    assert got == want


def test_bad_group_by_and_empty_keys(tmp_path):
    with pytest.raises(ValueError, match="at least one key"):
        SketchRollup(str(tmp_path), [], [])
    roll = _rollup(tmp_path)
    with pytest.raises(ValueError, match="group_by"):
        roll.query(None, group_by=["nope"])


def test_streaming_states_merge_into_batch_rollup(spark, sf_dir, tmp_path):
    """One wire format everywhere: states written by the STREAMING
    summary sink append into a batch-built SketchRollup and merge to the
    same answer as batch-accumulating all the data."""
    import shutil
    from datasketches_spark_spark.streaming import (
        await_or_fail, streaming_summary_sink)

    ev = _events(spark, sf_dir).select("event_type", "value")
    first = ev.where(F.col("value") < 100)
    rest = ev.where(F.col("value") >= 100)

    roll = SketchRollup(
        str(tmp_path / "roll"), ["event_type"],
        [percentile_measure("p50", "value", 0.5,
                            impl="MERGEABLE", k=262_144)])
    roll.build(first)

    # stream the remainder through the foreachBatch summary sink
    src = str(tmp_path / "src")
    rest.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(rest.schema).parquet(src)
    sink_path = str(tmp_path / "sink")
    writer = streaming_summary_sink(
        stream, ["event_type"], "value", family="quantile",
        impl="MERGEABLE", k=262_144,
        path=sink_path, checkpoint=str(tmp_path / "ckpt"))
    await_or_fail(writer.trigger(availableNow=True).start(), 300)

    # streaming states append into the rollup table verbatim (same wire
    # format; only the column naming differs)
    (spark.read.parquet(sink_path)
     .select("event_type", F.col("state").alias("p50__state"))
     .write.mode("append").parquet(roll.path))

    got = {r.event_type: r.p50 for r in roll.estimate(spark).collect()}
    full = SketchRollup(str(tmp_path / "full"), ["event_type"],
                        roll.measures)
    full.build(ev)
    want = {r.event_type: r.p50 for r in full.estimate(spark).collect()}
    assert got == want


def test_sql_over_rollup_states(spark, sf_dir, tmp_path):
    """A rollup table registered as a view is queryable from plain
    spark.sql with the installed estimate/combine functions — the SQL
    serving surface over materialized states."""
    import datasketches_spark_spark as dss
    dss.install(spark)
    ev = _events(spark, sf_dir)
    roll = _rollup(tmp_path)
    roll.build(ev)
    roll.states(spark).createOrReplaceTempView("rollup_states")
    got = {r.event_type: (r.p50, r.ndv) for r in spark.sql("""
        SELECT event_type,
               approx_percentile_estimate(
                 approx_percentile_combine(p50__state), 0.5) AS p50,
               approx_count_distinct_estimate(
                 approx_count_distinct_combine(ndv__state)) AS ndv
        FROM rollup_states
        WHERE day >= '2024-01-08' AND day < '2024-01-22'
        GROUP BY event_type
    """).collect()}
    win = (F.col("day") >= "2024-01-08") & (F.col("day") < "2024-01-22")
    want = {r.event_type: (r.p50, r.ndv) for r in roll.estimate(
        spark, where=win, group_by=["event_type"]).collect()}
    assert got == want and len(got) == 5
