"""Heuristic document-quality filter rules — the Gopher (Rae et al.
2021, "Scaling Language Models: ... Gopher", §A1.1) and C4 (Raffel et
al. 2020, JMLR) rule families every large-scale pretraining corpus is
cleaned with, as pure Column expressions.

Extension beyond the reference (maropu/datasketches-spark exposes only
sketch functions; corpus curation has no counterpart there) — this is
the rule-based complement to the statistical filters already in the
engine (``operators/lm.py`` perplexity, ``operators/classify.py``
Naive-Bayes scoring).

Design rules shared with ``functions/text.py``:

* everything is a JVM-side expression (zero Python row path, full
  whole-stage codegen) — at 100 TB these run inside the scan stage
  with no shuffle at all;
* every surfaced ratio is a single integer-over-integer double
  division, so an independent SQL engine replays the values
  bit-identically;
* the counting work is bundled in ONE struct (``gopher_struct``) the
  caller binds to a named column before fanning out ratios/flags —
  the HOF re-evaluation hazard documented at
  ``text.py::repetition_struct``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import STOPWORDS, _col as _col_q, tokenize

# Gopher §A1.1 thresholds (word-level rules; the line-level rules take
# their thresholds from the same table).
GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.80,
    "min_stopword_hits": 2,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
}

# C4 blocklist: any occurrence drops the document (Raffel et al. §2.2 —
# the curly brace targets leaked source code, "lorem ipsum" templating,
# "javascript" the enable-JS boilerplate).
C4_BLOCKLIST = ("{", "lorem ipsum", "javascript")


def gopher_struct(col, sep: str = " ") -> Column:
    """All counting work for the Gopher/C4 rules as ONE struct: bind it
    to a named column (``.select(gopher_struct("text").alias("g"))``)
    then derive ratios/flags from the bound column so the token array
    is materialized once per row, not once per output expression."""
    toks = F.filter(tokenize(col, sep), lambda x: x != F.lit(""))
    lines = F.split(col, "\n")
    lower = F.lower(col)
    return F.struct(
        F.size(toks).alias("n_words"),
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
        .alias("total_word_len"),
        # '#' occurrences + '...' occurrences (Gopher's symbol set)
        (F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
         + (F.length(col)
            - F.length(F.replace(col, F.lit("..."), F.lit("")))) / 3)
        .cast("long").alias("n_symbols"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
        .alias("n_alpha_words"),
        F.size(F.filter(
            F.array(*[F.lit(w) for w in sorted(STOPWORDS["en"])]),
            lambda w: F.array_contains(toks, w))).alias("stopword_hits"),
        F.size(lines).alias("n_lines"),
        F.size(F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]")))
        .alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda ln: ln.rlike(r"\.\.\.\s*$")))
        .alias("n_ellipsis_lines"),
        F.greatest(*[
            F.when(lower.contains(b.lower()), 1).otherwise(0)
            for b in C4_BLOCKLIST]).cast("long").alias("c4_blocked"),
    )


def gopher_metrics(g: Column) -> dict[str, Column]:
    """Ratios from a bound ``gopher_struct`` column — each one integer
    division, exact across engines."""
    n = g["n_words"].cast("double")
    return {
        "n_words": g["n_words"],
        "mean_word_len": g["total_word_len"].cast("double") / n,
        "symbol_word_ratio": g["n_symbols"].cast("double") / n,
        "alpha_word_frac": g["n_alpha_words"].cast("double") / n,
        "stopword_hits": g["stopword_hits"],
        "bullet_line_frac":
            g["n_bullet_lines"].cast("double")
            / g["n_lines"].cast("double"),
        "ellipsis_line_frac":
            g["n_ellipsis_lines"].cast("double")
            / g["n_lines"].cast("double"),
    }


def gopher_flags(g: Column, **thresholds) -> dict[str, Column]:
    """Per-rule boolean Columns (True = rule VIOLATED) plus ``n_failed``
    and ``passes`` from a bound ``gopher_struct`` column. Thresholds
    default to the published Gopher values (``GOPHER_DEFAULTS``)."""
    t = {**GOPHER_DEFAULTS, **thresholds}
    m = gopher_metrics(g)
    flags = {
        "bad_word_count": (m["n_words"] < t["min_words"])
        | (m["n_words"] > t["max_words"]),
        "bad_mean_word_len": (m["mean_word_len"] < t["min_mean_word_len"])
        | (m["mean_word_len"] > t["max_mean_word_len"]),
        "bad_symbol_ratio": m["symbol_word_ratio"]
        > t["max_symbol_word_ratio"],
        "bad_alpha_frac": m["alpha_word_frac"] < t["min_alpha_word_frac"],
        "bad_stopwords": m["stopword_hits"] < t["min_stopword_hits"],
        "bad_bullet_lines": m["bullet_line_frac"]
        > t["max_bullet_line_frac"],
        "bad_ellipsis_lines": m["ellipsis_line_frac"]
        > t["max_ellipsis_line_frac"],
        "c4_blocked": g["c4_blocked"] == 1,
    }
    n_failed = sum(f.cast("int") for f in flags.values())
    return {**flags, "n_failed": n_failed.cast("long"),
            "passes": n_failed == 0}


def filter_gopher(df, text_col: str, keep: bool = True,
                  **thresholds):
    """Apply the rule suite as a corpus filter: ``keep=True`` returns
    the passing documents (the curated corpus), ``keep=False`` the
    rejects (for audit). One scan-stage predicate — no shuffle, no
    Python, survives any scale the scan survives."""
    bound = df.withColumn("_g", gopher_struct(F.col(text_col)))
    flags = gopher_flags(F.col("_g"), **thresholds)
    pred = flags["passes"] if keep else ~flags["passes"]
    return bound.where(pred).drop("_g")


# ------------------------------------------------------- readability

def _syllable_count(words: Column) -> Column:
    """Heuristic syllable count: vowel-group runs per word
    (``[aeiouy]+`` case-insensitive), minimum 1 per word, minus one
    for a silent trailing 'e' on multi-group words ("date" = 1, "tea"
    = 1, "audio" = 2). The classic Flesch implementation heuristic —
    documented, deterministic, and replayable with the same two
    regexes in any engine."""
    def per_word(w: Column) -> Column:
        # syllables live in the LETTERS — strip attached punctuation
        # ("one..." is one word, not a longer vowel sequence)
        letters = F.lower(F.regexp_replace(w, r"[^A-Za-z]+", ""))
        groups = F.regexp_count(letters, F.lit(r"[aeiouy]+"))
        silent_e = (letters.rlike(r"[^aeiouy]e$")
                    & (groups > 1)).cast("int")
        return F.greatest(groups - silent_e, F.lit(1))
    return F.aggregate(F.transform(words, per_word), F.lit(0),
                       lambda acc, x: acc + x)


def readability_struct(col, sep: str = " ") -> Column:
    """Counting pass for readability metrics — ONE struct with
    ``words`` / ``sentences`` / ``syllables`` / ``chars`` (bind it to
    a named column before fanning out, the ``gopher_struct``
    convention). Sentences = runs of ``.!?`` (minimum 1 so empty/
    fragment docs don't divide by zero); syllables per the
    vowel-group heuristic. All pure Column expressions."""
    s = _col_q(col)
    words = F.filter(F.split(s, sep), lambda w: w != "")
    sentences = F.greatest(
        F.regexp_count(s, F.lit(r"[.!?]+")), F.lit(1))
    return F.struct(
        F.size(words).cast("long").alias("words"),
        sentences.cast("long").alias("sentences"),
        _syllable_count(words).cast("long").alias("syllables"),
        F.length(s).cast("long").alias("chars"))


def readability_metrics(r: Column) -> dict[str, Column]:
    """Flesch Reading Ease and Flesch-Kincaid Grade Level from a
    bound :func:`readability_struct` column — the standard
    pretraining-corpus readability filters (drop both the unreadable
    and the trivially-templated tails). Each metric is one
    double expression over the struct's integer counts, so an
    independent engine replays it bit-identically. Zero-word docs
    yield null metrics (filterable)."""
    w = r["words"].cast("double")
    st = r["sentences"].cast("double")
    sy = r["syllables"].cast("double")
    empty = r["words"] == 0
    fre = (F.lit(206.835) - F.lit(1.015) * (w / st)
           - F.lit(84.6) * (sy / w))
    fkgl = (F.lit(0.39) * (w / st) + F.lit(11.8) * (sy / w)
            - F.lit(15.59))
    return {
        "flesch_reading_ease": F.when(empty, None).otherwise(fre),
        "fk_grade_level": F.when(empty, None).otherwise(fkgl),
        "words_per_sentence": F.when(empty, None).otherwise(w / st),
        "syllables_per_word": F.when(empty, None).otherwise(sy / w),
    }
