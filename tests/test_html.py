"""HTML -> text extraction (functions/html.py): the documented
contract case-by-case, the end-to-end WARC -> http_body -> html_to_text
chain, and the scan-stage plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions import html_title, html_to_text


def _one(spark, html: str, col) -> str | None:
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(col.alias("v")).collect()[0].v


CASES = [
    # tags strip; block boundaries become newlines; inline tags spaces
    ("<html><body><p>Hello <b>world</b></p><p>Second</p></body></html>",
     "Hello world\nSecond"),
    # scripts/styles/comments/head vanish WITH their content
    ("<head><title>T</title><style>p{color:red}</style></head>"
     "<body><script>var x = '<p>not text</p>';</script>Visible</body>",
     "Visible"),
    ("<body>a<!-- hidden <b>bold</b> -->b</body>", "a b"),
    ("<body><noscript>enable js</noscript>ok</body>", "ok"),
    # entities, incl. the &amp;lt; double-escape ordering rule
    ("<p>Tom &amp; Jerry &lt;3 &quot;cheese&quot; &apos;n&apos; "
     "crackers&nbsp;here</p>", "Tom & Jerry <3 \"cheese\" 'n' "
     "crackers here"),
    ("<p>&amp;lt;literal&amp;gt;</p>", "&lt;literal&gt;"),
    # line breaks and whitespace collapse
    ("<div>one</div>\n\n\n<div>two<br>three</div>", "one\ntwo\nthree"),
    ("<p>  spaced \t out  </p>", "spaced out"),
    # self-closing and attribute-heavy tags
    ('<p class="x" data-y="1>2">attr</p>', "2\">attr"),
    ('<img src="a.png"/>after', "after"),
]


class TestHtmlToText:
    @pytest.mark.parametrize("html,want", CASES)
    def test_contract(self, spark, html, want):
        assert _one(spark, html, html_to_text("h")) == want

    def test_title(self, spark):
        assert _one(spark, "<head><title> A &amp; B </title></head>",
                    html_title("h")) == "A & B"
        assert _one(spark, "<body>no title</body>",
                    html_title("h")) is None

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("<p>x</p>",)], ["h"])
        out = df.select(html_to_text("h"), html_title("h"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "pythonUDF" not in plan.lower()


class TestWarcChain:
    def test_warc_response_to_text(self, spark, tmp_path):
        """The full ingestion chain: WARC response record -> HTTP body
        -> visible text -> the engine's fingerprint."""
        import os

        from datasketches_spark_spark.functions import (
            http_body, http_status, http_text)
        from datasketches_spark_spark.functions.text import doc_fingerprint
        from datasketches_spark_spark.operators.warc import read_warc
        html = ("<html><head><title>Page</title></head><body>"
                "<p>alpha beta</p><p>gamma</p></body></html>")
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                   + html.encode())
        rec = ("WARC/1.0\r\nWARC-Type: response\r\n"
               "WARC-Target-URI: <https://ex.com/a>\r\n"
               "WARC-Date: 2026-08-15T00:00:00Z\r\n"
               "WARC-Record-ID: <urn:uuid:1>\r\n"
               "Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n"
               ).encode() + payload + b"\r\n\r\n"
        d = str(tmp_path / "w")
        os.makedirs(d)
        with open(os.path.join(d, "x.warc"), "wb") as fh:
            fh.write(rec)
        out = (read_warc(spark, d, types=("response",))
               .select(http_text("payload").alias("m"))
               .where(http_status("m") == 200)
               .select(html_to_text(http_body("m")).alias("text"))
               .select("text", doc_fingerprint(F.col("text"))
                       .alias("fp"))
               .collect())
        assert len(out) == 1
        assert out[0].text == "alpha beta\ngamma"
        assert out[0].fp is not None and len(out[0].fp) == 32


class TestNumericRefs:
    """r14: &#NN; / &#xHH; decode as pure Column exprs (VERDICT r13
    'Next round' #3). Oracle: python's html.unescape (full HTML5
    semantics) on the numeric-ref subset."""

    NUMERIC_CASES = [
        "a &#60;tag&#62; and &#8217;quote&#8217;",
        "hex &#x2019; upper &#X201C; astral &#x1F600;",
        "w1252 remap &#146;s &#150; dash &#128; euro &#153;tm",
        "runs &#65;&#66;&#67; tail &#33;",
        "&#160;leading nbsp-as-numeric",
        "mixed &#x48;&#101;llo &#119;orld",
    ]

    @pytest.mark.parametrize("s", NUMERIC_CASES)
    def test_matches_html_unescape(self, spark, s):
        import html as pyhtml
        from datasketches_spark_spark.functions import (
            html_decode_numeric_refs)
        got = _one(spark, s, html_decode_numeric_refs("h"))
        assert got == pyhtml.unescape(s)

    def test_invalid_codes_keep_literal(self, spark):
        from datasketches_spark_spark.functions import (
            html_decode_numeric_refs)
        s = "keep &#0; &#xD800; &#1114112; literal"
        assert _one(spark, s, html_decode_numeric_refs("h")) == s

    def test_amp_escape_ordering_holds(self, spark):
        # &amp;#60; must surface as the literal text "&#60;", never "<"
        assert _one(spark, "<p>&amp;#60;</p>", html_to_text("h")) == \
            "&#60;"
        assert _one(spark, "<p>It&#8217;s &#x263A;</p>",
                    html_to_text("h")) == "It’s ☺"

    def test_null_and_refless_passthrough(self, spark):
        from datasketches_spark_spark.functions import (
            html_decode_numeric_refs)
        df = spark.createDataFrame([(None,), ("plain",)], "h string")
        got = [r.v for r in df.select(
            html_decode_numeric_refs("h").alias("v")).collect()]
        assert got == [None, "plain"]

    def test_still_pure_expressions(self, spark):
        from datasketches_spark_spark.functions import (
            html_decode_numeric_refs)
        df = spark.createDataFrame([("x &#65;",)], ["h"])
        plan = df.select(html_decode_numeric_refs("h")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonUDF" not in plan.lower()

    def test_duckdb_replays_the_decode(self, spark):
        """The oracle-gate recipe: an independent engine reproduces the
        decode with chr() — full-value comparison."""
        import duckdb
        rows = [(i, f"v&#{65 + i};w&#x{0x2018 + i:x};") for i in range(8)]
        df = spark.createDataFrame(rows, "id long, s string")
        from datasketches_spark_spark.functions import (
            html_decode_numeric_refs)
        got = {r.id: r.v for r in df.select(
            "id", html_decode_numeric_refs("s").alias("v")).collect()}
        want = {i: duckdb.sql(
            f"SELECT 'v' || chr(65 + {i}) || 'w' || chr({0x2018} + {i})"
        ).fetchone()[0] for i in range(8)}
        assert got == want


class TestMetaCharset:
    """r14: in-markup charset declarations — the fallback when the
    Content-Type header omits the charset."""

    @pytest.mark.parametrize("html,want", [
        ('<head><meta charset="UTF-8"></head>', "utf-8"),
        ("<meta charset=windows-1252>", "windows-1252"),
        ("<META CHARSET='ISO-8859-1'/>", "iso-8859-1"),
        ('<meta http-equiv="Content-Type" '
         'content="text/html; charset=Shift_JIS">', "shift_jis"),
        ("<meta name='x' content='charset=not-this'>", None),
        ("<p>no meta</p>", None),
    ])
    def test_cases(self, spark, html, want):
        from datasketches_spark_spark.functions import html_meta_charset
        assert _one(spark, html, html_meta_charset("h")) == want

    def test_pure_expressions(self, spark):
        from datasketches_spark_spark.functions import html_meta_charset
        df = spark.createDataFrame([("<meta charset=utf-8>",)], ["h"])
        plan = df.select(html_meta_charset("h")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "pythonUDF" not in plan.lower()


class TestMainContent:
    """r15: block segmentation + boilerplate features
    (html_blocks / html_main_text) — the main-content-extraction
    primitive between WET-style html_to_text and the quality stack."""

    PAGE = (
        "<html><head><title>T</title><style>p{}</style></head><body>"
        # nav: long enough to pass min_chars, dropped ONLY by density
        "<div id='nav'>"
        "<a href='/a'>Home page navigation link text here</a> | "
        "<a href='/b'>About the company page link text</a> | "
        "<a href='/c'>Contact and support page link text</a></div>"
        # article: two long prose paragraphs, one with an inline link
        "<p>This opening paragraph carries the actual article prose, "
        "long enough to clear the default eighty character floor with "
        "room to spare for the test.</p>"
        "<p>The second paragraph also reads like prose and keeps one "
        "inline <a href='/ref'>reference</a> without tripping the "
        "density threshold because the text around it dominates.</p>"
        # footer: plain but short -> dropped ONLY by length
        "<div>Copyright footer.</div>"
        "</body></html>")

    def _blocks(self, spark, html):
        from datasketches_spark_spark.functions import html_blocks
        df = spark.createDataFrame([(html,)], ["h"])
        return (df.select(F.explode(html_blocks("h")).alias("b"))
                .select("b.text", "b.char_len", "b.word_count",
                        "b.link_density").collect())

    def test_segmentation_and_features(self, spark):
        rows = self._blocks(spark, self.PAGE)
        assert len(rows) == 4          # nav, p1, p2, footer (head gone)
        nav, p1, p2, foot = rows
        assert nav.text.startswith("Home page navigation")
        assert nav.link_density > 0.9          # separators only
        assert p1.link_density == 0.0
        assert 0.0 < p2.link_density < 0.15    # one short inline link
        assert foot.text == "Copyright footer."
        for r in rows:
            assert r.char_len == len(r.text)
            assert r.word_count == len(r.text.split(" "))

    def test_main_text_keeps_prose_only(self, spark):
        from datasketches_spark_spark.functions import html_main_text
        got = _one(spark, self.PAGE, html_main_text("h"))
        paras = got.split("\n")
        assert len(paras) == 2
        assert paras[0].startswith("This opening paragraph")
        assert "inline reference without tripping" in paras[1]
        assert "Home page" not in got and "Copyright" not in got

    def test_thresholds_are_knobs(self, spark):
        from datasketches_spark_spark.functions import html_main_text
        # min_chars=1 + density cap 1.0 keeps everything
        all_in = _one(spark, self.PAGE,
                      html_main_text("h", min_chars=1,
                                     max_link_density=1.0))
        assert len(all_in.split("\n")) == 4
        # impossible thresholds -> empty string, not null
        none_in = _one(spark, self.PAGE,
                       html_main_text("h", min_chars=10_000))
        assert none_in == ""

    def test_entities_decode_in_block_text(self, spark):
        from datasketches_spark_spark.functions import html_blocks
        rows = self._blocks(
            spark, "<p>Tom &amp; Jerry &#8212; friends&nbsp;4ever</p>")
        assert rows[0].text == "Tom & Jerry — friends 4ever"
        assert rows[0].char_len == len(rows[0].text)

    def test_empty_blocks_dropped(self, spark):
        rows = self._blocks(
            spark, "<div></div><div>  </div><p>x</p><br><hr>")
        assert [r.text for r in rows] == ["x"]

    def test_scan_stage_only(self, spark):
        from datasketches_spark_spark.functions import html_main_text
        df = spark.createDataFrame([("<p>x</p>",)], ["h"])
        out = df.select(html_main_text("h"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()

    def test_block_wrapping_anchor_is_link_dense(self, spark):
        # HTML5-legal card/nav pattern: <a> wrapping a <div> — the
        # block pass must NOT split through the anchor, or the card
        # scores density 0 and passes as prose (r15 review finding)
        card = ("<body><a href='/promo'><div>Promoted teaser text "
                "well over eighty characters of navigation chrome "
                "that links somewhere else entirely.</div></a>"
                "<p>Real article paragraph that is long enough to "
                "clear the default floor and contains no links at "
                "all, just prose.</p></body>")
        rows = self._blocks(spark, card)
        texts = {r.text[:15]: r.link_density for r in rows}
        assert texts["Promoted teaser"] > 0.9
        assert texts["Real article pa"] == 0.0
        from datasketches_spark_spark.functions import html_main_text
        got = _one(spark, card, html_main_text("h"))
        assert got.startswith("Real article")
        assert "Promoted" not in got


class TestJsonLd:
    def test_full_jsonld_article(self, spark):
        import json
        from datasketches_spark_spark.functions import (
            html_article_meta, html_jsonld)
        ld = json.dumps({
            "@type": "NewsArticle", "headline": "JSON Headline",
            "author": {"@type": "Person", "name": "Jo Writer"},
            "datePublished": "2024-03-01",
            "publisher": {"name": "The Paper"},
            "description": "ld desc"})
        page = ('<html><head><title>T1</title><script '
                'type="application/ld+json">' + ld
                + '</script></head><body>x</body></html>')
        df = spark.createDataFrame([(page,)], "h string")
        m = df.select(html_article_meta("h").alias("m")) \
              .collect()[0]["m"]
        assert m.asDict() == {
            "title": "JSON Headline", "author": "Jo Writer",
            "date_published": "2024-03-01",
            "publisher": "The Paper", "description": "ld desc"}
        j = df.select(html_jsonld("h").alias("j")).collect()[0]["j"]
        assert json.loads(j)["headline"] == "JSON Headline"

    def test_fallback_chain_og_then_title(self, spark):
        from datasketches_spark_spark.functions import (
            html_article_meta)
        pages = [
            # no JSON-LD: og:title + meta description win
            ('<html><head><title>Fallback</title>'
             '<meta property="og:title" content="OG Title">'
             '<meta name="description" content="meta desc">'
             '</head></html>'),
            # nothing but <title>
            '<html><head><title>Only Title</title></head></html>',
        ]
        df = spark.createDataFrame([(p,) for p in pages], "h string")
        got = [r["m"].asDict() for r in
               df.select(html_article_meta("h").alias("m")).collect()]
        assert got[0]["title"] == "OG Title"
        assert got[0]["description"] == "meta desc"
        assert got[1]["title"] == "Only Title"
        assert got[1]["author"] is None

    def test_plain_string_author(self, spark):
        from datasketches_spark_spark.functions import (
            html_article_meta)
        page = ('<html><head><script type="application/ld+json">'
                '{"headline": "H", "author": "Plain Author"}'
                '</script></head></html>')
        df = spark.createDataFrame([(page,)], "h string")
        m = df.select(html_article_meta("h").alias("m")) \
              .collect()[0]["m"]
        assert m["author"] == "Plain Author"

    def test_scan_stage_only(self, spark):
        from datasketches_spark_spark.functions import (
            html_article_meta)
        df = spark.createDataFrame([("<html></html>",)], "h string")
        plan = df.select(html_article_meta("h").alias("m")) \
                 ._jdf.queryExecution().executedPlan().toString()
        assert "pythonudf" not in plan.lower()


class TestPageSignals:
    def test_canonical_both_attribute_orders(self, spark):
        from datasketches_spark_spark.functions import (
            html_canonical_url)
        pages = [
            ('<html><head><link rel="canonical" '
             'href="https://e.com/a?x=1&amp;y=2"></head></html>'),
            ('<html><head><link href="https://e.com/b" '
             'rel="canonical"></head></html>'),
            '<html><head></head></html>',
        ]
        df = spark.createDataFrame([(p,) for p in pages], "h string")
        got = [r["c"] for r in
               df.select(html_canonical_url("h").alias("c"))
                 .collect()]
        assert got == ["https://e.com/a?x=1&y=2",
                       "https://e.com/b", None]

    def test_noindex_tokens(self, spark):
        from datasketches_spark_spark.functions import html_noindex
        cases = [
            ('<meta name="robots" content="noindex, follow">', True),
            ('<meta name="robots" content="none">', True),
            ('<meta name="robots" content="index, nofollow">',
             False),
            # 'noindexing' must not match the noindex token
            ('<meta name="robots" content="noindexing">', False),
            ("", False),
        ]
        df = spark.createDataFrame(
            [("<html><head>%s</head></html>" % c,) for c, _ in cases],
            "h string")
        got = [r["n"] for r in
               df.select(html_noindex("h").alias("n")).collect()]
        assert got == [want for _, want in cases]

    def test_feed_autodiscovery(self, spark):
        from datasketches_spark_spark.functions import html_feed_links
        page = ('<html><head>'
                '<link rel="alternate" type="application/rss+xml" '
                'href="/feed.xml">'
                '<link type="application/atom+xml" '
                'href="https://e.com/atom">'
                '<link rel="stylesheet" href="/style.css">'
                '</head></html>')
        df = spark.createDataFrame([(page,)], "h string")
        got = df.select(html_feed_links("h").alias("f")) \
                .collect()[0]["f"]
        assert got == ["/feed.xml", "https://e.com/atom"]

    def test_scan_stage_only(self, spark):
        from datasketches_spark_spark.functions import (
            html_canonical_url, html_feed_links, html_noindex)
        df = spark.createDataFrame([("<html></html>",)], "h string")
        plan = df.select(html_canonical_url("h"), html_noindex("h"),
                         html_feed_links("h")) \
                 ._jdf.queryExecution().executedPlan().toString()
        assert "pythonudf" not in plan.lower()
