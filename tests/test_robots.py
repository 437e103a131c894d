"""robots.txt evaluation (functions/robots.py, r14): RFC 9309 group
selection, longest-match precedence, wildcard/$ anchoring, the
broadcast verdict plan, and sitemap listing (robots + XML)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions import (
    parse_robots,
    parse_robots_text,
    robots_allowed,
    robots_sitemaps,
    sitemap_locs,
)

ROBOTS = """
# example file
User-agent: googlebot
Disallow: /nogoogle/

User-agent: *
Allow: /p
Disallow: /
Sitemap: https://ex.com/sitemap.xml

User-agent: foobot
Disallow: /foo*bar$
Allow: /foo
"""


class TestKernel:
    def test_group_selection(self):
        rules, sm = parse_robots_text(ROBOTS, "mybot")
        assert rules == [("/p", True), ("/", False)]
        assert sm == ["https://ex.com/sitemap.xml"]
        assert parse_robots_text(ROBOTS, "GoogleBot")[0] == \
            [("/nogoogle/", False)]
        assert parse_robots_text(ROBOTS, "foobot")[0] == \
            [("/foo*bar$", False), ("/foo", True)]

    def test_shared_ua_lines_one_group(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots_text(txt, "b")[0] == [("/x", False)]
        assert parse_robots_text(txt, "a")[0] == [("/x", False)]

    def test_orphan_rules_and_empty_disallow(self):
        # rules before any User-agent belong to no group; an empty
        # Disallow value is a no-op (allow everything)
        txt = "Disallow: /x\nUser-agent: *\nDisallow:\n"
        assert parse_robots_text(txt)[0] == []

    def test_new_group_after_rules(self):
        txt = ("User-agent: *\nDisallow: /a\n"
               "User-agent: z\nDisallow: /z\n")
        assert parse_robots_text(txt)[0] == [("/a", False)]
        assert parse_robots_text(txt, "z")[0] == [("/z", False)]


class TestVerdicts:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(
            [("ex.com", ROBOTS),
             ("open.com", "User-agent: x\nDisallow: /")],
            "host string, text string")

    def test_rfc_precedence(self, spark, docs):
        rules = parse_robots(docs, "host", "text", user_agent="mybot")
        urls = spark.createDataFrame([
            (1, "https://ex.com/p/page"),   # Allow /p beats Disallow /
            (2, "https://ex.com/q"),        # Disallow /
            (3, "https://ex.com/"),         # Disallow /
            (4, "https://open.com/a"),      # no group for mybot
            (5, "https://nohost.com/a"),    # host absent
            (6, "https://ex.com/p"),        # exact Allow
        ], "id long, url string")
        got = {r.id: r.allowed
               for r in robots_allowed(urls, rules).collect()}
        assert got == {1: True, 2: False, 3: False, 4: True, 5: True,
                       6: True}

    def test_wildcard_and_anchor(self, spark, docs):
        rules = parse_robots(docs, "host", "text", user_agent="foobot")
        urls = spark.createDataFrame([
            (1, "https://ex.com/foo/x/bar"),      # /foo*bar$ blocks
            (2, "https://ex.com/foo/x/bar?y=1"),  # $ anchor misses
            (3, "https://ex.com/foobar"),         # longer rule blocks
            (4, "https://ex.com/foo"),            # Allow /foo
            (5, "https://ex.com/other"),          # no match
        ], "id long, url string")
        got = {r.id: r.allowed
               for r in robots_allowed(urls, rules).collect()}
        assert got == {1: False, 2: True, 3: False, 4: True, 5: True}

    def test_allow_beats_disallow_on_tie(self, spark):
        docs = spark.createDataFrame(
            [("t.com", "User-agent: *\nAllow: /page\nDisallow: /page")],
            "host string, text string")
        rules = parse_robots(docs, "host", "text")
        urls = spark.createDataFrame([(1, "https://t.com/page")],
                                     "id long, url string")
        assert robots_allowed(urls, rules).collect()[0].allowed is True

    def test_multiplicity_preserved(self, spark, docs):
        rules = parse_robots(docs, "host", "text")
        urls = spark.createDataFrame(
            [(1, "https://ex.com/q")] * 3, "id long, url string")
        out = robots_allowed(urls, rules).collect()
        assert len(out) == 3 and all(not r.allowed for r in out)

    def test_plan_broadcasts_rules_corpus_never_shuffles(self, spark,
                                                         docs):
        rules = parse_robots(docs, "host", "text")
        urls = spark.createDataFrame([(1, "https://ex.com/q")],
                                     "id long, url string")
        plan = robots_allowed(urls, rules) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan
        # the ONLY hash exchange is the rules-side per-host array
        # aggregation (dimension-sized); the URL side is scan -> join
        # -> per-row HOF verdict with no shuffle and no aggregate
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "__rid" not in plan

    def test_duckdb_replays_prefix_rules(self, spark, docs):
        """Oracle recipe: wildcard-free rules are prefix predicates —
        DuckDB recomputes every verdict with starts_with + argmax."""
        import duckdb
        rules = parse_robots(docs, "host", "text", user_agent="mybot")
        urls = spark.createDataFrame(
            [(i, f"https://ex.com/{p}") for i, p in enumerate(
                ["p/a", "p", "q", "", "pp", "x/y?z=1"])],
            "id long, url string")
        got = {(r.id,): r.allowed
               for r in robots_allowed(urls, rules).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE rules AS SELECT * FROM (VALUES "
                    + ",".join(f"('{p}', {a})" for p, a in
                               [("/p", True), ("/", False)])
                    + ") t(rule_path, allow)")
        con.execute("CREATE TABLE urls AS SELECT * FROM (VALUES "
                    + ",".join(
                        f"({i}, '/{p.split('?')[0] and p or ''}')"
                        for i, p in enumerate(
                            ["p/a", "p", "q", "", "pp", "x/y?z=1"]))
                    + ") t(id, path)")
        want = {tuple(r[:1]): r[1] for r in con.execute("""
            SELECT id, coalesce(arg_max(allow,
                     length(rule_path) * 2 + CAST(allow AS INT))
                   FILTER (starts_with(path, rule_path)), TRUE)
            FROM urls LEFT JOIN rules ON TRUE
            GROUP BY id""").fetchall()}
        assert {k[0]: v for k, v in got.items()} == \
            {k[0]: v for k, v in want.items()}


class TestSitemaps:
    def test_robots_sitemaps(self, spark):
        docs = spark.createDataFrame(
            [("ex.com", ROBOTS), ("n.com", "User-agent: *\n")],
            "host string, text string")
        got = [(r.host, r.sitemap_url)
               for r in robots_sitemaps(docs, "host", "text").collect()]
        assert got == [("ex.com", "https://ex.com/sitemap.xml")]

    def test_sitemap_locs_column(self, spark):
        xml = ("<?xml version='1.0'?><urlset>"
               "<url><loc> https://a.com/p?x=1&amp;y=2 </loc></url>"
               "<url><LOC>https://b.com/&lt;odd&gt;</LOC></url>"
               "</urlset>")
        df = spark.createDataFrame([(xml,)], "x string")
        (row,) = df.select(sitemap_locs("x").alias("u")).collect()
        assert list(row.u) == ["https://a.com/p?x=1&y=2",
                               "https://b.com/<odd>"]
        plan = df.select(sitemap_locs("x")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "pythonUDF" not in plan.lower()


class TestCrawlDelay:
    """r15: robots_crawl_delay — group-scoped Crawl-delay extraction."""

    TXT = """# politeness
User-agent: fastbot
Crawl-delay: 0.5
Disallow: /private/

User-agent: *
Crawl-delay: 10
Crawl-delay: 20
Disallow: /tmp/

User-agent: rudebot
Crawl-delay: nonsense
Crawl-delay: -3
Disallow: /
"""

    def _df(self, spark):
        return spark.createDataFrame(
            [("a.com", self.TXT), ("b.com", "User-agent: *\nDisallow:")],
            "host string, text string")

    def test_group_selection_and_first_wins(self, spark):
        from datasketches_spark_spark.functions import robots_crawl_delay
        df = self._df(spark)
        star = {r.host: r.crawl_delay
                for r in robots_crawl_delay(df, "host", "text").collect()}
        assert star["a.com"] == 10.0      # first value in the * group
        assert star["b.com"] is None      # no delay declared
        fast = {r.host: r.crawl_delay
                for r in robots_crawl_delay(
                    df, "host", "text", user_agent="FastBot").collect()}
        assert fast["a.com"] == 0.5       # own group beats *

    def test_malformed_values_ignored_fall_to_star(self, spark):
        from datasketches_spark_spark.functions import robots_crawl_delay
        got = {r.host: r.crawl_delay
               for r in robots_crawl_delay(
                   self._df(spark), "host", "text",
                   user_agent="rudebot").collect()}
        assert got["a.com"] is None       # both rudebot values invalid

    def test_default_delay(self, spark):
        from datasketches_spark_spark.functions import robots_crawl_delay
        got = {r.host: r.crawl_delay
               for r in robots_crawl_delay(
                   self._df(spark), "host", "text",
                   default_delay=1.0).collect()}
        assert got["b.com"] == 1.0 and got["a.com"] == 10.0

    def test_crawl_delay_closes_ua_header(self, spark):
        """A Crawl-delay line after User-agent lines is a group-member
        line: a following User-agent starts a NEW group (RFC 9309
        group-header semantics applied to the extension)."""
        from datasketches_spark_spark.functions import (
            parse_robots, robots_crawl_delay)
        txt = ("User-agent: a\nCrawl-delay: 2\n"
               "User-agent: b\nDisallow: /x\n")
        df = spark.createDataFrame([("h", txt)], "host string, text string")
        da = robots_crawl_delay(df, "host", "text", user_agent="a").collect()
        db = robots_crawl_delay(df, "host", "text", user_agent="b").collect()
        assert da[0].crawl_delay == 2.0 and db[0].crawl_delay is None
        # and agent b's group (not a's) owns the Disallow
        ra = parse_robots(df, "host", "text", user_agent="a").collect()
        rb = parse_robots(df, "host", "text", user_agent="b").collect()
        assert [r.rule_path for r in ra] == []
        assert [r.rule_path for r in rb] == ["/x"]
