"""HTTP-message Column helpers for WARC *response* records.

``operators/warc.py`` hands a response record's payload back exactly as
captured: an HTTP/1.x status line + header block + body. These helpers
split that message with pure JVM string expressions (scan-stage, no
Python row path) so the HTML/body bytes flow into the text pipeline the
same way conversion/WET records do.

Decoding convention: ``http_text`` decodes the binary payload as
ISO-8859-1 — a lossless byte<->char bijection, so header parsing is
exact and the BODY can be re-encoded byte-identically regardless of
the page's real charset (re-encode with ``F.encode(body, 'ISO-8859-1')``
and decode per the Content-Type charset downstream when needed).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def http_text(payload) -> Column:
    """Binary HTTP payload -> string, losslessly (ISO-8859-1)."""
    return F.decode(_col(payload), "ISO-8859-1")


def http_status(msg) -> Column:
    """Status code of an HTTP/1.x message string (null if not HTTP)."""
    s = _col(msg)
    code = F.regexp_extract(s, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
    return F.when(code == "", None).otherwise(code.cast("int"))


def http_header(msg, name: str) -> Column:
    """First value of header ``name`` (case-insensitive; null when
    absent). ``name`` is a literal python string, escaped into the
    pattern at plan time. The match is restricted to the HEADER block
    (everything before the first CRLF CRLF): a ``Name: value``-shaped
    line inside the body — common in HTML/text payloads quoting
    headers — must not produce a false value."""
    s = _col(msg)
    head = F.substring_index(s, "\r\n\r\n", 1)
    pat = r"(?i)(?:^|\r\n)" + re.escape(name) + r":[ \t]*([^\r\n]*)"
    v = F.regexp_extract(head, pat, 1)
    return F.when(v == "", None).otherwise(v)


def http_body(msg) -> Column:
    """Everything after the first blank line (CRLF CRLF) — the entity
    body as captured; null when the message has no header/body split."""
    s = _col(msg)
    pos = F.instr(s, "\r\n\r\n")
    return F.when(pos == 0, F.lit(None).cast("string")) \
        .otherwise(F.substring(s, pos + F.lit(4), F.lit(2_147_483_647)))
