"""Fetch scheduling (operators/frontier.py, r15): per-host polite
sequencing with the robots_crawl_delay dimension broadcast."""

from pyspark.sql import functions as F

from datasketches_spark_spark.operators import schedule_fetches


class TestScheduleFetches:
    def _frontier(self, spark):
        rows = [(f"https://h{i % 3}.ex.com/p/{i:02d}",) for i in range(12)]
        rows.append(("not a url",))
        return spark.createDataFrame(rows, "url string")

    def test_default_delay_sequencing(self, spark):
        got = schedule_fetches(self._frontier(spark)).collect()
        by_host = {}
        for r in got:
            by_host.setdefault(r.host, []).append(r)
        for h in ("h0.ex.com", "h1.ex.com", "h2.ex.com"):
            rs = sorted(by_host[h], key=lambda r: r.seq)
            assert [r.seq for r in rs] == [1, 2, 3, 4]
            assert [r.eta_s for r in rs] == [0.0, 1.0, 2.0, 3.0]
            # deterministic order: by url string
            assert [r.url for r in rs] == sorted(r.url for r in rs)
        assert by_host[None][0].host is None   # unparseable, still out

    def test_crawl_delay_dimension_broadcast(self, spark):
        delays = spark.createDataFrame(
            [("h0.ex.com", 10.0), ("h1.ex.com", None)],
            "host string, crawl_delay double")
        out = schedule_fetches(self._frontier(spark), delays,
                               default_delay=2.0)
        # plan BEFORE execution: after collect AQE prints the initial
        # plan again under the final one and the count doubles
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan     # dim never shuffles corpus
        assert plan.count("Exchange hashpartitioning") == 1  # the window
        got = {(r.host, r.seq): r.eta_s for r in out.collect()}
        assert got[("h0.ex.com", 3)] == 20.0   # declared delay
        assert got[("h1.ex.com", 3)] == 4.0    # null -> default
        assert got[("h2.ex.com", 3)] == 4.0    # absent -> default

    def test_reruns_identical(self, spark):
        f = self._frontier(spark).repartition(7)
        a = sorted(map(tuple, schedule_fetches(f).collect()))
        b = sorted(map(tuple, schedule_fetches(f).collect()))
        assert a == b

    def test_wave_filter(self, spark):
        out = schedule_fetches(self._frontier(spark))
        first_wave = out.where("eta_s < 2.0")
        assert first_wave.count() == 3 * 2 + 1   # 2 per host + null-host
