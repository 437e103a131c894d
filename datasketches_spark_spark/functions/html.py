"""HTML -> text extraction as pure JVM expressions — the WET step.

Completes the crawl ingestion chain: ``read_warc`` (response records)
-> ``http_body`` -> ``html_to_text`` -> the quality/dedup/LM stack.
Everything is a fixed chain of case-insensitive/dotall
``regexp_replace`` steps (scan-stage, no Python row path, no shuffle),
each one individually replayable by an independent SQL engine — the
full-value oracle-gate recipe.

Extraction contract (documented, deliberately boilerplate-simple — a
layout-aware extractor like trafilatura is a model/heuristic, not an
expression):

1. drop ``<!-- -->`` comments, ``<script>``/``<style>``/``<noscript>``
   blocks (with their content), and ``<head>`` entirely;
2. turn block-level closers/openers (``p, div, li, tr, table, h1-h6,
   br, section, article``) into newlines;
3. strip every remaining tag;
4. decode entities in ONE split pass over the union pattern (r15):
   numeric character references (``&#NN;`` / ``&#xHH;`` — full
   code-point range incl. the HTML5 windows-1252 remap of 0x80-0x9F)
   and the named entities crawl text actually contains
   (``lt gt quot apos nbsp amp``), each decoded TERMINALLY against
   the original text (HTML5 §13.2.5: replacement text never
   re-parses — ``&amp;lt;`` and ``&#38;lt;`` BOTH decode to the
   literal ``&lt;``, ``&amp;#60;`` to the literal ``&#60;``);
5. collapse runs of spaces/tabs to one space, newline runs to one
   newline (block boundaries become single separators), and strip
   leading/trailing whitespace.
"""

from __future__ import annotations

import re as _re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_to_text", "html_title", "html_decode_numeric_refs",
           "html_links", "html_meta_charset", "html_blocks",
           "html_main_text", "html_meta_content", "html_jsonld",
           "html_article_meta", "html_canonical_url",
           "html_noindex", "html_feed_links"]

_BLOCK_TAGS = ("p|div|li|ul|ol|tr|td|th|table|h[1-6]|br|hr|section|"
               "article|header|footer|blockquote|pre")


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


# HTML5 §13.2.5.80: numeric references in 0x80-0x9F are windows-1252
# code points, not C1 controls — crawl HTML leans on this constantly
# (&#146; is an apostrophe). Self-mapping holes (81 8D 8F 90 9D) omitted.
_C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6,
    0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152,
    0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C,
    0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}

_NCR_BODY = r"[0-9]{1,7}|[xX][0-9a-fA-F]{1,6}"


def _ncr_char(tok: Column) -> Column:
    """NCR body (``NN`` / ``xHH`` — no ``&#``/`;`) -> its character;
    invalid codes keep their LITERAL ``&#tok;`` text."""
    is_hex = tok.rlike("^[xX]")
    cp = F.when(
        is_hex,
        F.conv(F.substring(tok, 2, 16), 16, 10).cast("long")) \
        .otherwise(tok.cast("long"))
    cp = reduce(lambda acc, kv: acc.when(cp == kv[0], kv[1]),
                _C1_REMAP.items(),
                F.when(cp.isNull(), None)).otherwise(cp)
    valid = cp.isNotNull() & (cp >= 1) & (cp <= 0x10FFFF) & \
        ~cp.between(0xD800, 0xDFFF)
    ch = F.decode(F.unhex(F.lpad(F.hex(cp), 8, "0")), "UTF-32")
    return F.when(valid, ch) \
        .otherwise(F.concat(F.lit("&#"), tok, F.lit(";")))


def html_decode_numeric_refs(col) -> Column:
    """Decode numeric character references — ``&#NN;`` (decimal) and
    ``&#xHH;`` (hex) — as PURE Column expressions: split the string on
    the reference pattern, turn each captured code into its character
    (``conv`` for hex, ``hex -> unhex -> decode UTF-32`` for the
    code point — full astral range, no surrogate arithmetic), and
    zip the literal segments back together. No Python row path, fully
    replayable by an independent engine (``chr`` in DuckDB).

    Spec-faithful edges: 0x80-0x9F remap through windows-1252
    (HTML5 rule — ``&#146;`` is ``'``, not a C1 control); NUL,
    surrogates, and out-of-range codes keep their LITERAL ``&#...;``
    text (never a silent drop — dedup/LM fingerprints prefer a stable
    token over a vanished one)."""
    s = _col(col)
    parts = F.split(s, rf"&#(?:{_NCR_BODY});", -1)
    toks = F.regexp_extract_all(s, F.lit(rf"&#({_NCR_BODY});"), 1)
    return F.array_join(
        F.zip_with(parts, F.transform(toks, _ncr_char),
                   lambda p, d: F.concat(p, F.coalesce(d, F.lit("")))),
        "")


# the one split pattern of the combined entity pass: a numeric
# reference body OR one of the named entities crawl text actually
# contains (named matching case-insensitive, as before)
_ENT_BODY = rf"#(?:{_NCR_BODY})|(?i:lt|gt|quot|apos|nbsp|amp)"


def _decode_entities(s: Column) -> Column:
    """ONE split pass over the union pattern (numeric refs + named
    entities), each token decoded TERMINALLY — HTML5 character
    references never re-parse (§13.2.5: the replacement text is
    plain text). Sequential-replace orderings get some mirror case
    wrong: numeric-first turned ``&#38;lt;`` into ``<`` (the decoded
    ``&`` re-parsed by the later named pass); named-first would do
    the same to ``&amp;#60;``. Splitting once decodes each reference
    against the ORIGINAL text only: ``&#38;lt;`` -> literal ``&lt;``,
    ``&amp;#60;`` -> literal ``&#60;``."""

    def _ent(tok: Column) -> Column:
        low = F.lower(tok)
        named = (F.when(low == "lt", "<")
                  .when(low == "gt", ">")
                  .when(low == "quot", "\"")
                  .when(low == "apos", "'")
                  .when(low == "nbsp", " ")
                  .when(low == "amp", "&"))
        return F.when(tok.startswith("#"),
                      _ncr_char(F.substring(tok, 2, 2_147_483_647))) \
            .otherwise(named)

    parts = F.split(s, rf"&(?:{_ENT_BODY});", -1)
    toks = F.regexp_extract_all(s, F.lit(rf"&({_ENT_BODY});"), 1)
    return F.array_join(
        F.zip_with(parts, F.transform(toks, _ent),
                   lambda p, d: F.concat(p, F.coalesce(d, F.lit("")))),
        "")


def html_to_text(col) -> Column:
    """Visible text of an HTML document (module-docstring contract)."""
    s = _col(col)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(
        s, r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    s = F.regexp_replace(
        s, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = _decode_entities(s)
    s = F.regexp_replace(s, r"[ \t]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    # NOT F.trim: Spark's trim strips spaces only, not newlines
    return F.regexp_replace(s, r"^\s+|\s+$", "")


def _clean_fragment(t: Column) -> Column:
    """Markup fragment -> visible text: strip tags, decode entities,
    collapse whitespace, trim — the per-block half of the
    :func:`html_to_text` contract (block boundaries are gone by
    construction here; the caller segmented on them)."""
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    t = _decode_entities(t)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def html_blocks(col) -> Column:
    """Block-level segmentation with boilerplate features —
    ``array<struct<text, char_len, word_count, link_density>>``.

    The MAIN-CONTENT-EXTRACTION primitive (the step between WET-style
    :func:`html_to_text` and the quality/dedup stack: crawl pages are
    mostly navigation/footer chrome, and LLM corpora want the article
    body). Segmentation and features follow the Boilerpipe/jusText
    family (Kohlschutter et al., WSDM 2010 — shallow per-block text
    features separate content from boilerplate) but the contract here
    is deliberately deterministic and documented:

    1. comments, ``script``/``style``/``noscript`` (with content) and
       ``<head>`` are dropped;
    2. the document splits into blocks on block-level tag boundaries
       (the :func:`html_to_text` newline set);
    3. each block's ``text`` is its visible text (tags stripped,
       entities decoded terminally, whitespace collapsed, trimmed);
       empty blocks are dropped;
    4. ``char_len``/``word_count`` measure that text;
       ``link_density`` = anchor-text characters / block characters
       (anchor text extracted from ``<a>...</a>`` spans before the
       tag strip; tags stripped + whitespace collapsed but NOT
       entity-decoded — the numerator counts a reference at its
       literal length, slightly overestimating density for
       entity-heavy anchors, a deliberate trade of one expression
       tree for a heuristic the thresholds absorb; capped at 1.0).

    Pure Column expressions end to end (split + transform/filter HOFs
    + the shared entity pass) — scan-stage, no Python row path, no
    shuffle; each rule is independently replayable by another SQL
    engine, which is what the demo gate does."""
    s = _col(col)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(
        s, r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    # HTML5-legal block-wrapping anchors (<a><div>card/nav text</div>
    # </a>) must not be SPLIT by the block pass — the opener and
    # closer would land in different blocks, the per-block anchor
    # regexp would match nothing, and a 100%-link card would score
    # density 0 and pass as prose. Neutralize block tags INSIDE each
    # anchor span (one split/extract/zip pass) so the whole anchor
    # stays in one block and its text counts as link text.
    anchor_pat = r"(?is)(<a\b[^>]*>.*?</a\s*>)"
    seg = F.split(s, anchor_pat, -1)
    anchors = F.regexp_extract_all(s, F.lit(anchor_pat), 1)
    s = F.array_join(
        F.zip_with(
            seg,
            F.transform(anchors, lambda a: F.regexp_replace(
                a, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", " ")),
            lambda p, a: F.concat(p, F.coalesce(a, F.lit("")))),
        "")
    raw = F.split(s, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", -1)

    def _visible_len(t: Column) -> Column:
        t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
        t = F.regexp_replace(t, r"\s+", " ")
        return F.length(F.regexp_replace(t, r"^\s+|\s+$", ""))

    def _feats(b: Column) -> Column:
        text = _clean_fragment(b)
        link_toks = F.regexp_extract_all(
            b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1)
        link_chars = F.aggregate(
            F.transform(link_toks, _visible_len),
            F.lit(0), lambda acc, x: acc + x)
        char_len = F.length(text)
        words = F.when(char_len == 0, F.lit(0)) \
            .otherwise(F.size(F.split(text, " ")))
        density = F.when(
            char_len == 0, F.lit(1.0)).otherwise(
            F.least(F.lit(1.0),
                    link_chars.cast("double") / char_len))
        return F.struct(text.alias("text"),
                        char_len.alias("char_len"),
                        words.alias("word_count"),
                        density.cast("double").alias("link_density"))

    return F.filter(F.transform(raw, _feats),
                    lambda st: st["char_len"] > 0)


def html_main_text(col, min_chars: int = 80,
                   max_link_density: float = 0.33) -> Column:
    """Main content of an HTML page: the :func:`html_blocks` blocks
    that look like prose — at least ``min_chars`` visible characters
    AND anchor-text density at most ``max_link_density`` (the
    Boilerpipe operating point: navigation/footer chrome is short
    and/or link-saturated; article paragraphs are long and mostly
    plain) — joined with newlines in document order. Empty string when
    no block qualifies (filterable). Thresholds are plan-time
    literals; the whole thing is one scan-stage Column expression."""
    blocks = html_blocks(col)
    keep = F.filter(
        blocks,
        lambda b: (b["char_len"] >= F.lit(int(min_chars)))
        & (b["link_density"] <= F.lit(float(max_link_density))))
    return F.array_join(F.transform(keep, lambda b: b["text"]), "\n")


def html_links(col) -> Column:
    """``href`` targets of ``<a>`` elements as an array column (r15)
    — the LINK-GRAPH / frontier-expansion step: explode, resolve each
    against the record's base URL with
    ``functions.urls.url_resolve(target_uri, link)``, key by
    ``url_surt_key``, and the crawl frontier grows. Pure Column exprs:
    one ``regexp_extract_all`` over quoted/unquoted attribute forms,
    quote strip, the one-pass entity decode (``&amp;`` inside hrefs is
    ubiquitous), trim; non-navigational targets
    (``javascript:``/``mailto:``/``data:``/``tel:`` and
    fragment-only) are filtered out."""
    s = _col(col)
    toks = F.regexp_extract_all(
        s, F.lit(r"(?is)<a\b[^>]*?\shref\s*=\s*"
                 r"(\"[^\"]*\"|'[^']*'|[^\s>]+)"), 1)

    def _clean(t: Column) -> Column:
        t = F.regexp_replace(t, r"^[\"']|[\"']$", "")
        return F.trim(_decode_entities(t))

    return F.filter(
        F.transform(toks, _clean),
        lambda u: (u != "")
        & ~F.lower(u).rlike(r"^(javascript|mailto|data|tel):")
        & ~u.startswith("#"))


def html_meta_charset(col) -> Column:
    """Charset declared INSIDE an HTML document (lowercased) — either
    ``<meta charset=...>`` or the legacy ``<meta http-equiv=
    "Content-Type" content="...; charset=...">`` form; null when
    absent. The fallback step of the crawl decode chain: real
    responses often omit the charset from the Content-Type header
    (``http_charset`` null) and declare it only in markup — probe the
    body bytes decoded as latin-1, then re-decode with the winner."""
    s = _col(col)
    # `charset` must sit directly after whitespace or ';' — an own
    # attribute (<meta charset=...>) or the charset parameter of a
    # Content-Type value ("text/html; charset=..."); a quote before it
    # (content='charset=junk') disqualifies the match
    direct = F.regexp_extract(
        s, r"(?is)<meta\s(?:[^>]*?[\s;])?charset\s*=\s*[\"']?"
           r"([\w.:-]+)", 1)
    cs = F.lower(direct)
    return F.when(cs == "", None).otherwise(cs)


def html_meta_content(col, name: str) -> Column:
    """``content`` of a ``<meta name=...>`` / ``<meta property=...>``
    element (entity-decoded, trimmed; null when absent) — the
    document-metadata step of the crawl chain: ``og:title`` /
    ``og:description`` / ``description`` / ``keywords`` carry the
    page's self-description, which pipelines keep alongside the
    extracted text. ``name`` is a literal python string escaped into
    the pattern at plan time (case-insensitive match, both attribute
    orders: name-then-content and content-then-name). Pure Column
    regexp — scan-stage, replayable."""
    s = _col(col)
    nm = _re.escape(name)
    # the name value must TERMINATE (quote, or delimiter for the
    # unquoted form) — 'description' must not match 'description2'
    nm_val = rf"(?:\"{nm}\"|'{nm}'|{nm}(?=[\s/>]))"
    attr = r"(?:[^>]*?\s)?"     # attributes may precede immediately
    # name= (or property=) before content=
    fwd = F.regexp_extract(
        s, rf"(?is)<meta\s{attr}(?:name|property)\s*=\s*{nm_val}"
           rf"[^>]*?\scontent\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]+)",
        1)
    # content= before name= (real pages ship both orders)
    rev = F.regexp_extract(
        s, rf"(?is)<meta\s{attr}content\s*=\s*"
           rf"(\"[^\"]*\"|'[^']*'|[^\s>]+)"
           rf"[^>]*?\s(?:name|property)\s*=\s*{nm_val}",
        1)
    v = F.when(fwd != "", fwd).otherwise(rev)
    v = F.trim(_decode_entities(
        F.regexp_replace(v, r"^[\"']|[\"']$", "")))
    return F.when(v == "", None).otherwise(v)


def html_title(col) -> Column:
    """``<title>`` content (entity-decoded, trimmed); null if absent."""
    s = _col(col)
    t = F.regexp_extract(s, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    t = F.trim(_decode_entities(t))
    return F.when(t == "", None).otherwise(t)


def html_canonical_url(col) -> Column:
    """The ``<link rel="canonical" href=...>`` URL (either attribute
    order; entity-decoded; null when absent) — the page's OWN dedup
    signal: crawl pipelines collapse URL variants onto it before any
    content hashing. Pure Column regexp — scan-stage, replayable."""
    s = _col(col)
    fwd = F.regexp_extract(
        s, r"(?is)<link[^>]*rel\s*=\s*[\"']canonical[\"']"
           r"[^>]*href\s*=\s*[\"']([^\"']*)", 1)
    rev = F.regexp_extract(
        s, r"(?is)<link[^>]*href\s*=\s*[\"']([^\"']*)[\"']"
           r"[^>]*rel\s*=\s*[\"']canonical[\"']", 1)
    v = F.trim(_decode_entities(
        F.when(fwd != "", fwd).otherwise(rev)))
    return F.when(v == "", None).otherwise(v)


def html_noindex(col) -> Column:
    """True when the page's robots meta directive carries
    ``noindex`` or ``none`` (the ``none`` token means
    noindex+nofollow) — the page asked to stay out of indexes, and
    training-data pipelines honor the same signal. False when the
    directive is absent or permissive; null for null input."""
    s = _col(col)
    robots = F.lower(F.coalesce(
        html_meta_content(s, "robots"), F.lit("")))
    v = robots.rlike(r"(?:^|[\s,])(?:noindex|none)(?:$|[\s,])")
    return F.when(s.isNull(), F.lit(None).cast("boolean")) \
        .otherwise(v)


def html_feed_links(col) -> Column:
    """Feed AUTODISCOVERY: the ``href`` of every ``<link
    type="application/rss+xml">`` / ``atom+xml`` element as an array
    (document order, entity-decoded) — how crawlers find the feed
    :func:`~datasketches_spark_spark.functions.urls.feed_entries`
    then parses. Pure Column exprs."""
    s = _col(col)
    links = F.regexp_extract_all(
        s, F.lit(r"(?is)<link\b[^>]*"
                 r"type\s*=\s*[\"']application/(?:rss|atom)\+xml"
                 r"[\"'][^>]*>"), 0)
    hrefs = F.transform(
        links,
        lambda el: F.trim(_decode_entities(F.regexp_extract(
            el, r"(?is)href\s*=\s*[\"']([^\"']*)", 1))))
    return F.filter(hrefs, lambda h: h != "")


def html_jsonld(col) -> Column:
    """The first ``<script type="application/ld+json">`` body — the
    schema.org structured-data block modern pages carry (articles:
    headline/author/datePublished). Returned raw (a JSON string) for
    ``get_json_object`` downstream; null when the page has none.
    Pure Column regexp — scan-stage, replayable."""
    s = _col(col)
    j = F.regexp_extract(
        s, r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json"
           r"[\"'][^>]*>(.*?)</script\s*>", 1)
    j = F.trim(j)
    return F.when(j == "", None).otherwise(j)


def html_article_meta(col) -> Column:
    """Article-level provenance as one struct — the web-page
    counterpart of ``operators/mediameta.py``'s uniform record:
    ``(title, author, date_published, publisher, description)``.
    JSON-LD is the primary source (``$.headline``, ``$.author.name``
    with the plain-string ``$.author`` fallback, ``$.datePublished``,
    ``$.publisher.name``); OpenGraph/meta tags and ``<title>`` fill
    what JSON-LD leaves empty. Every leg is a JVM expression
    (``regexp_extract`` + ``get_json_object``) — no Python row path,
    each field replayable relationally."""
    s = _col(col)
    j = html_jsonld(s)
    author = F.coalesce(F.get_json_object(j, "$.author.name"),
                        F.get_json_object(j, "$.author"))
    return F.struct(
        F.coalesce(F.get_json_object(j, "$.headline"),
                   html_meta_content(s, "og:title"),
                   html_title(s)).alias("title"),
        author.alias("author"),
        F.get_json_object(j, "$.datePublished")
         .alias("date_published"),
        F.coalesce(F.get_json_object(j, "$.publisher.name"),
                   F.get_json_object(j, "$.publisher"))
         .alias("publisher"),
        F.coalesce(F.get_json_object(j, "$.description"),
                   html_meta_content(s, "og:description"),
                   html_meta_content(s, "description"))
         .alias("description"),
    )
