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
4. decode the named entities crawl text actually contains
   (``lt gt quot apos nbsp`` then ``amp`` LAST, so ``&amp;lt;`` decodes
   to the literal ``&lt;`` — one pass, spec order) plus decimal
   ``&#NN;`` for the ASCII range via the same rule every engine
   reproduces: ``&#60;`` -> ``<`` etc. is NOT attempted (needs
   computed chars); documented gap;
5. collapse runs of spaces/tabs to one space, newline runs to one
   newline (block boundaries become single separators), and strip
   leading/trailing whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_to_text", "html_title"]

_BLOCK_TAGS = ("p|div|li|ul|ol|tr|td|th|table|h[1-6]|br|hr|section|"
               "article|header|footer|blockquote|pre")


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _decode_entities(s: Column) -> Column:
    s = F.regexp_replace(s, r"(?i)&nbsp;", " ")
    s = F.regexp_replace(s, r"(?i)&lt;", "<")
    s = F.regexp_replace(s, r"(?i)&gt;", ">")
    s = F.regexp_replace(s, r"(?i)&quot;", "\"")
    s = F.regexp_replace(s, r"(?i)&(apos|#39);", "'")
    s = F.regexp_replace(s, r"(?i)&amp;", "&")  # last: &amp;lt; -> &lt;
    return s


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


def html_title(col) -> Column:
    """``<title>`` content (entity-decoded, trimmed); null if absent."""
    s = _col(col)
    t = F.regexp_extract(s, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    t = F.trim(_decode_entities(t))
    return F.when(t == "", None).otherwise(t)
