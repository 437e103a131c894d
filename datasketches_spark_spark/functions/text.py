"""Text-analysis functions for large-scale document pipelines.

All functions here return Column expressions built from
``pyspark.sql.functions`` built-ins (split / transform / filter / aggregate
/ hash), so they run JVM-side inside whole-stage codegen — no Python in the
hot path. They compose with the sketch operators (e.g. token-count
quantiles via ``percentile_measure``, top-k n-grams via
``freqitems_measure``) for the aggregate views.

These extend the reference's surface (it has no text operators); they are
the "text analysis" component of the LLM-data-pipeline north star:
tokenization, token statistics, n-grams, quality scoring, language ID and
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal public stopword lists (top function words per language) for the
# n-gram-free language-ID heuristic. Deterministic and tiny on purpose: the
# heuristic is argmax of stopword hits with a fixed tie-break order.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de"],
    "zh": ["de", "shi", "bu", "le", "wo", "ni", "ta"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # tie-break priority


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize(col, sep: str = " ") -> Column:
    """Whitespace tokenization; empty tokens dropped (robust to runs of
    separators)."""
    toks = F.split(_col(col), sep)
    return F.filter(toks, lambda x: x != F.lit(""))


def token_count(col, sep: str = " ") -> Column:
    return F.size(tokenize(col, sep))


def ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """Word n-grams of a token array (JVM-side: zip of n shifted slices +
    concat per zipped row). Returns an array of space-joined n-grams;
    empty array when the document has fewer than n tokens.

    Why slices and not ``element_at(tokens, i)`` per gram: Catalyst
    inlines the ``tokens`` expression (often ``filter(split(text))``)
    into EVERY reference, and there is no common-subexpression
    elimination inside higher-order-function lambdas — an element_at
    formulation re-tokenizes the document once per gram element,
    O(len^2) per row (measured 20-40x slower on the fixture corpus).
    The zip form references ``tokens`` exactly ``n`` times total."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return tokens
    m = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(tokens, j + 1, m) for j in range(n)])
    return F.transform(
        zipped, lambda s: F.concat_ws(sep, *[s[str(j)] for j in range(n)]))


def shingles(col, n: int = 3, sep: str = " ") -> Column:
    """Distinct word n-gram set of a document — the unit of Jaccard
    similarity for MinHash dedup (``operators/dedup.py``)."""
    return F.array_distinct(ngrams(tokenize(col, sep), n))


def token_set_fingerprint(col, sep: str = " ") -> Column:
    """Deterministic fingerprint of the distinct-token SET — exact dedup of
    documents that use the same vocabulary regardless of order/repetition."""
    return F.md5(F.array_join(F.array_sort(
        F.array_distinct(tokenize(col, sep))), sep))


def doc_fingerprint(col) -> Column:
    """Exact-content fingerprint (md5 of the raw text)."""
    return F.md5(_col(col))


# BPE-ish subword segmentation pattern (ASCII simplification of the GPT-2
# pre-tokenizer): contractions, space-prefixed letter runs, digit runs,
# punctuation runs, residual whitespace. Counting matches approximates a
# subword-tokenizer's token count without a vocab.
BPE_ISH_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def subword_token_count(col) -> Column:
    """Approximate subword (BPE-style) token count via regexp_count — a
    JVM-side stand-in for tokenizer-based counting when the real tokenizer
    can't run inside the row path."""
    return F.regexp_count(_col(col), F.lit(BPE_ISH_PATTERN))


def stopword_hits(tokens: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda x: x.isin(*sw)))


def lang_id(col, sep: str = " ") -> Column:
    """Heuristic language ID: argmax of stopword hits over LANG_ORDER with
    fixed tie-break (earlier language wins ties). Pure expression — at 100 TB
    this is a per-row map with no shuffle."""
    toks = tokenize(col, sep)
    scores = [(lang, stopword_hits(toks, lang)) for lang in LANG_ORDER]
    best = F.greatest(*[s for _, s in scores])
    # first language (in priority order) reaching `best` wins ties
    result = F.lit("und")
    for lang, score in reversed(scores):
        result = F.when(score == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


def repetition_features(col, sep: str = " ") -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", §A1.1 repetition filters) as pure Column
    expressions:

    * ``n_tokens`` / ``n_distinct`` — token totals.
    * ``dup_token_frac`` — fraction of tokens that are repeats of an
      earlier token, ``(n - distinct) / n``.
    * ``dup_bigram_frac`` — same for adjacent word bigrams.
    * ``top_bigram_n`` — occurrence count of the most frequent bigram.
    * ``top_bigram_frac`` — that count over total bigrams (the "top n-gram
      fraction" filter).

    ``top_bigram_n`` scans the bigram array once per DISTINCT bigram —
    O(d·m) per row, bounded by the document length, shuffle-free; at
    100 TB this stays a per-row map stage. Fractions are one integer
    division each, so they reproduce bit-identically in any IEEE engine.
    Zero-denominator rows (empty / one-token docs) yield NULL fractions.
    """
    toks = tokenize(col, sep)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    bg = ngrams(toks, 2, sep)
    nb = F.size(bg)
    top_bg = F.when(nb > 0, F.array_max(
        F.transform(F.array_distinct(bg),
                    lambda g: F.size(F.filter(bg, lambda b: b == g)))))
    frac = (lambda num, den:
            F.when(den > 0, num.cast("double") / den.cast("double")))
    return {
        "n_tokens": n,
        "n_distinct": nd,
        "dup_token_frac": frac(n - nd, n),
        "dup_bigram_frac": frac(nb - F.size(F.array_distinct(bg)), nb),
        "top_bigram_n": top_bg,
        "top_bigram_frac": frac(top_bg, nb),
    }


def quality_features(col, sep: str = " ") -> dict[str, Column]:
    """Quality-scoring components as named Column expressions: token count,
    distinct-token ratio, stopword ratio (en), mean token length. All exact
    integer ratios — deterministic across engines."""
    toks = tokenize(col, sep)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    sw = stopword_hits(toks, "en")
    total_len = F.aggregate(toks, F.lit(0),
                            lambda acc, x: acc + F.length(x))
    return {
        "n_tokens": n,
        "distinct_ratio": nd.cast("double") / n.cast("double"),
        "stopword_ratio": sw.cast("double") / n.cast("double"),
        "mean_token_len": total_len.cast("double") / n.cast("double"),
    }
