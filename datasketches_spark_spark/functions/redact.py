"""PII redaction — pure-JVM regexp scrubbing for training-data pipelines.

Emails, URLs, IPv4 addresses and phone-like digit runs are replaced by
typed placeholder tags. Everything is a chain of ``regexp_replace`` /
``regexp_count`` Column expressions: no Python in the hot path, fully
inside whole-stage codegen, embarrassingly parallel at any scale (per-row,
zero shuffle).

Pattern notes — every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB, the correctness oracle): character
classes, bounded repetition and ``\\b`` word boundaries only; no
lookaround, no backreferences. Order matters and is fixed: URLs first
(so an address inside a URL is swallowed by ``<URL>``), then emails,
then IPv4, then phone runs (so digits consumed by earlier passes cannot
re-match).

No reference analog (`/root/reference` is sketch functions only); this is
the scrubbing stage of the LLM-data-pipeline north star (SURVEY.md §2c).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (tag, pattern) in application order — public, so callers can subset.
PII_PATTERNS: list[tuple[str, str]] = [
    ("URL", r"https?://[^\s]+"),
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+?\d[\d\- ]{7,}\d"),
]

_TAGS = [t for t, _ in PII_PATTERNS]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(col, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with its ``<TAG>`` placeholder.

    ``kinds`` restricts to a subset of ``["URL", "EMAIL", "IP", "PHONE"]``
    (application order is always the canonical one above).
    """
    kinds = _TAGS if kinds is None else kinds
    unknown = set(kinds) - set(_TAGS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = _col(col)
    for tag, pat in PII_PATTERNS:
        if tag in kinds:
            out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(col) -> dict[str, Column]:
    """Match counts per kind, evaluated in the same canonical order on the
    progressively-redacted text (so counts sum consistently with what
    :func:`redact_pii` replaces — an email inside a URL counts once, as a
    URL)."""
    out = _col(col)
    counts: dict[str, Column] = {}
    for tag, pat in PII_PATTERNS:
        counts[tag] = F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return counts
