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
    # r15 extension languages — available via lang_id(col, langs=...)
    # (the DEFAULT stays LANG_ORDER so the board query's behavior and
    # its lock are untouched)
    "it": ["il", "di", "che", "e", "la", "per", "un", "una", "non"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "uma"],
    "nl": ["de", "het", "een", "en", "van", "ik", "dat", "niet", "op"],
    "ru": ["и", "в", "не", "на", "что", "с", "это", "как", "он"],
    "id": ["yang", "dan", "di", "itu", "dengan", "ini", "untuk",
           "dari", "tidak"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # tie-break priority
# priority order when callers opt into the full set
LANG_ORDER_WIDE = LANG_ORDER + ["it", "pt", "nl", "ru", "id"]


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


def token_shingles(tokens: Column, n: int = 3) -> Column:
    """:func:`shingles` over an ALREADY-TOKENIZED array column. Catalyst
    inlines ``tokenize`` into each of the ``n`` slice references inside
    :func:`ngrams` (see its CSE caveat), re-splitting the document n
    times per row; callers on hot corpus-sized paths bind the token
    array to a named column first and shingle through this form (r18,
    guide §1.2). Identical values by construction — the expression tree
    below ``tokenize`` is unchanged."""
    return F.array_distinct(ngrams(tokens, n))


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


def lang_id(col, sep: str = " ", langs: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of stopword hits with fixed
    tie-break (earlier language wins ties). Pure expression — at
    100 TB this is a per-row map with no shuffle. ``langs`` selects
    the candidate set in priority order (default ``LANG_ORDER``, the
    original five; pass ``LANG_ORDER_WIDE`` for the r15 ten-language
    set — the cost is one more array filter per extra language,
    inside the same scan)."""
    order = list(langs) if langs is not None else LANG_ORDER
    if not order:
        raise ValueError("langs must name at least one language")
    unknown = set(order) - set(STOPWORDS)
    if unknown:
        raise ValueError(f"no stopword list for {sorted(unknown)}")
    toks = tokenize(col, sep)
    scores = [(lang, stopword_hits(toks, lang)) for lang in order]
    # F.greatest requires >= 2 columns; a one-language set is legal
    best = (scores[0][1] if len(scores) == 1
            else F.greatest(*[s for _, s in scores]))
    # first language (in priority order) reaching `best` wins ties
    result = F.lit("und")
    for lang, score in reversed(scores):
        result = F.when(score == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


# Unicode script/block ranges (public: Unicode Standard, Blocks.txt)
# for script-level language signals — whitespace-free scripts (CJK,
# Thai) defeat the stopword heuristic entirely, and one regexp count
# per script is a pure Column expression any engine replays.
SCRIPT_RANGES = {
    "latin": "A-Za-z\u00c0-\u024f",
    "cyrillic": "\u0400-\u04ff",
    "greek": "\u0370-\u03ff",
    "arabic": "\u0600-\u06ff",
    "hebrew": "\u0590-\u05ff",
    "devanagari": "\u0900-\u097f",
    "hangul": "\uac00-\ud7af\u1100-\u11ff\u3130-\u318f",
    "hiragana": "\u3040-\u309f",
    "katakana": "\u30a0-\u30ff",
    "cjk": "\u4e00-\u9fff\u3400-\u4dbf",
    "thai": "\u0e00-\u0e7f",
}
SCRIPT_ORDER = list(SCRIPT_RANGES)      # tie-break priority


def script_counts(col) -> Column:
    """Per-script character counts as ONE struct column (bind it to a
    named column before fanning out, the ``gopher_struct``
    convention): for each entry of ``SCRIPT_RANGES``, the number of
    characters in that range — computed as ``length(s) -
    length(regexp_replace(s, '[range]', ''))``, a pure JVM expression
    pair per script."""
    s = _col(col)
    total = F.length(s)
    fields = []
    for name, rng in SCRIPT_RANGES.items():
        kept = F.length(F.regexp_replace(s, f"[{rng}]", ""))
        fields.append((total - kept).cast("long").alias(name))
    return F.struct(*fields)


def dominant_script(col) -> Column:
    """Name of the script with the most characters (``SCRIPT_ORDER``
    tie-break, earlier wins); ``'und'`` when no script character at
    all. The routing signal for script-specific pipelines."""
    c = script_counts(col)
    scores = [(name, c[name]) for name in SCRIPT_ORDER]
    best = F.greatest(*[v for _, v in scores])
    result = F.lit("und")
    for name, v in reversed(scores):
        result = F.when(v == best, F.lit(name)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("und"))


def lang_id_cjk(col, min_chars: int = 1) -> Column:
    """CJK language disambiguation — the classic script rule
    stopwords cannot express (none of ja/ko/zh uses spaces): ANY kana
    -> ``ja`` (Japanese text always mixes kana with ideographs),
    else ANY hangul -> ``ko``, else >= ``min_chars`` ideographs ->
    ``zh``; null otherwise (not a CJK document — fall back to
    :func:`lang_id`). Pure Column expressions; the demo gate replays
    the rule relationally."""
    c = script_counts(col)
    kana = c["hiragana"] + c["katakana"]
    return (F.when(kana > 0, "ja")
            .when(c["hangul"] > 0, "ko")
            .when(c["cjk"] >= int(min_chars), "zh")
            .otherwise(F.lit(None).cast("string")))


def split_sentences(col) -> Column:
    """Sentence segmentation as a pure Column expression — the
    chunking/decontamination unit between character offsets and
    whole documents: maximal runs of non-terminator text plus their
    terminating ``.!?`` run, trimmed, empties dropped. Deliberately
    abbreviation-blind (``"Dr. Smith"`` splits — a lexicon-free
    deterministic contract both engines replay identically;
    extractive quality beats silent divergence for dedup keys).
    Trailing unterminated text is a sentence."""
    s = _col(col)
    toks = F.regexp_extract_all(
        s, F.lit(r"[^.!?]+(?:[.!?]+|$)|[.!?]+"), 0)
    # NB: not F.transform(toks, F.trim) — trim's optional second
    # parameter makes transform pass the ELEMENT INDEX as the trim
    # character set
    return F.filter(F.transform(toks, lambda x: F.trim(x)),
                    lambda x: x != "")


def winnow_fingerprints_expr(col, k: int = 16, window: int = 4) -> Column:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03) as a pure
    Column expression with a PORTABLE gram hash — the first 15 hex chars
    of md5, so any SQL engine reproduces the fingerprint set exactly
    (the DuckDB oracle for the winnowing SEMANTICS; the numpy
    `operators/dedup.py::winnow_fingerprints` path keeps its faster
    engine hash and a rows-only gate).

    Character ``k``-grams -> 60-bit md5-prefix hash -> min per sliding
    ``window`` -> sorted distinct array. O(n·window) per row, JVM-side,
    shuffle-free; documents shorter than ``k`` yield an empty array,
    NULL propagates. Hash and min arrays are bound as lambda variables
    (see `repetition_struct`'s evaluation-cost note)."""
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")

    def build(t):
        n_grams = F.length(t) - (k - 1)
        hs_expr = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.conv(F.substring(F.md5(t.substr(i, F.lit(k))),
                                         1, 15), 16, 10).cast("long"))

        def mins(hs):
            few = F.array(F.array_min(hs))
            many = F.transform(
                F.sequence(F.lit(0), F.size(hs) - window),
                lambda j: F.array_min(F.slice(hs, j + 1, window)))
            return F.when(F.size(hs) < window, few).otherwise(many)

        return F.when(n_grams < 1, F.array().cast("array<bigint>")) \
            .otherwise(F.array_sort(F.array_distinct(F.element_at(
                F.transform(F.array(hs_expr), mins), 1))))

    return F.element_at(
        F.transform(F.array(_col(col)),
                    lambda t: F.when(t.isNotNull(), build(t))), 1)


def normalize_text(col, case: bool = True, collapse_ws: bool = True,
                   strip_punct: bool = False) -> Column:
    """Canonical text form for normalization-invariant dedup: lowercase
    (``case``), whitespace runs collapsed to single spaces + trimmed
    (``collapse_ws``), optional ASCII punctuation removal
    (``strip_punct``). Pure ``lower``/``regexp_replace``/``trim``
    chain — per-row, codegen, zero shuffle. Compose with
    `doc_fingerprint` for dedup that ignores case/spacing variants."""
    out = _col(col)
    if case:
        out = F.lower(out)
    if strip_punct:
        out = F.regexp_replace(out, r"[!-/:-@\[-`{-~]", "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


# Invisible code points that survive naive cleaning and defeat
# fingerprint dedup: the soft hyphen (U+00AD), zero-width
# spaces/joiners (U+200B-200D, U+2060), bidi marks and
# embedding/override/isolate controls (U+200E/200F, U+202A-202E,
# U+2066-2069), and the BOM-as-ZWNBSP (U+FEFF). Built from code
# points (the characters themselves are invisible in source/diffs);
# literal characters in the compiled pattern are portable across
# Java regex and RE2 — no escape-dialect divergence.
_INVISIBLE_CLASS = "[" + "".join(map(chr, [
    0x00AD, 0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0x2060,
    *range(0x202A, 0x202F), *range(0x2066, 0x206A), 0xFEFF])) + "]"


def strip_invisible(col) -> Column:
    """Remove invisible code points (zero-width spaces/joiners, bidi
    controls, soft hyphens, BOM) — the characters that make two
    visually identical documents hash differently and slip through
    exact/fingerprint dedup. Pure ``regexp_replace`` (scan-stage,
    codegen); compose with :func:`normalize_text` /
    :func:`unicode_normalize` ahead of ``doc_fingerprint``."""
    return F.regexp_replace(_col(col), _INVISIBLE_CLASS, "")


def unicode_normalize(col, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15) — ``NFC``/``NFKC``/``NFD``/
    ``NFKD``. Canonically equivalent text (precomposed ``é`` vs
    ``e`` + combining acute) must fingerprint identically or dedup
    misses real duplicates; NFKC additionally folds compatibility
    forms (fullwidth ASCII, ligatures) the way LLM-corpus cleaners
    do. Normalization is a codepoint-table computation, not an
    expression, so this is ONE Arrow-batched pass
    (``unicodedata.normalize`` over each batch) — scan-stage, no
    shuffle. NFC output is independently replayable (DuckDB
    ``nfc_normalize`` — the demo gate does); the other forms pin to
    the same UCD tables via pytest."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def norm(p):
        import unicodedata
        return p.map(lambda s: None if s is None
                     else unicodedata.normalize(form, s))

    norm.__annotations__ = {"p": pd.Series, "return": pd.Series}
    return pandas_udf(norm, StringType())(_col(col))


def simhash_expr(col, sep: str = " ", bits: int = 60) -> Column:
    """SimHash signature (Charikar, STOC'02) as a pure Column expression
    with the PORTABLE md5-prefix token hash: per token, each of ``bits``
    hash bits votes +1/-1; the signature bit is 1 where the sum is
    positive. Returned as a ``bits``-char '0'/'1' string (MSB first) —
    a bit string, not an integer, so no engine hits bigint/double
    precision edges and any SQL engine reproduces it exactly (q69's
    DuckDB oracle). The numpy `operators/dedup.py` SimHash keeps the
    faster engine hash for the dedup path; THIS form is the
    cross-engine-verifiable semantics.

    Duplicate tokens vote once per occurrence; ties (even token counts)
    resolve to 0. NULL text propagates; empty text is all zeros."""
    if not (1 <= bits <= 60):
        raise ValueError("bits must be in [1, 60] (15 hex chars of md5)")

    def hv_of(x):
        return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")

    def votes_of(x):
        return F.element_at(
            F.transform(F.array(hv_of(x)), lambda hv: F.array(
                *[F.when(hv.bitwiseAND(F.lit(1 << b)) != 0,
                         F.lit(1)).otherwise(F.lit(-1))
                  for b in range(bits)])), 1)

    counts = F.aggregate(
        tokenize(col, sep), F.array_repeat(F.lit(0), bits),
        lambda acc, x: F.zip_with(acc, votes_of(x), lambda a, c: a + c))
    sig = F.element_at(
        F.transform(F.array(counts), lambda cnt: F.concat(
            *[F.when(F.element_at(cnt, bits - j) > 0,
                     F.lit("1")).otherwise(F.lit("0"))
              for j in range(bits)])), 1)
    return F.when(_col(col).isNotNull(), sig)


def chunk_tokens(col, size: int, overlap: int = 0,
                 sep: str = " ") -> Column:
    """Split a document into token chunks of ``size`` with ``overlap``
    tokens shared between consecutive chunks — the chunking stage of an
    embedding pipeline, as a pure Column expression (per-row, no
    shuffle, no Python).

    Chunk ``i`` covers tokens ``[i*(size-overlap), i*(size-overlap)+size)``;
    the last chunk may be shorter; documents with <= ``size`` tokens yield
    one chunk; empty documents yield an empty array. The token array is
    bound as a lambda variable (see `repetition_struct`'s evaluation-cost
    note), so tokenization runs once per row regardless of chunk count.
    """
    if size < 1:
        raise ValueError("size must be >= 1")
    if not (0 <= overlap < size):
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    step = size - overlap

    def build(t):
        n = F.size(t)
        n_chunks = F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int"),
            F.lit(1))
        # sequence(0, -1) would produce a DESCENDING range, so the empty
        # document is special-cased to an empty array
        return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(sep, F.slice(t, i * step + 1, size))))

    return F.when(
        _col(col).isNotNull(),
        F.element_at(F.transform(F.array(tokenize(col, sep)), build), 1))


def _max_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e. the
    max multiplicity of any element — in one aggregate pass."""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(sorted_arr, zero, step, lambda a: a["best"])


def repetition_struct(col, sep: str = " ") -> Column:
    """Repetition counters as ONE struct column: ``n_tokens``,
    ``n_distinct``, ``n_bigrams``, ``n_distinct_bigrams``,
    ``top_bigram_n``.

    Evaluation-cost note (why the scoped-lambda shape): higher-order
    functions run interpreted (CodegenFallback) and a lambda's argument
    expression is re-evaluated on every reference, so naming the token
    and bigram arrays as lambda VARIABLES — ``transform(array(x),
    v -> ...)`` — is what guarantees each array is built once per row.
    The top-bigram count is a sort + one run-length aggregate pass,
    O(m log m) per document instead of the O(d·m) rescan of a
    count-each-distinct formulation (measured 40x on the fixture corpus).
    Select THIS struct into a named column first and expand its fields in
    a second projection: the struct is non-cheap, so CollapseProject
    keeps the single evaluation.
    """
    def with_bigrams(t):
        def build(bg):
            nb = F.size(bg)
            return F.struct(
                F.size(t).alias("n_tokens"),
                F.size(F.array_distinct(t)).alias("n_distinct"),
                nb.alias("n_bigrams"),
                F.size(F.array_distinct(bg)).alias("n_distinct_bigrams"),
                F.when(nb > 0, _max_run(F.array_sort(bg)))
                 .alias("top_bigram_n"))
        return F.element_at(F.transform(F.array(ngrams(t, 2, sep)),
                                        build), 1)
    return F.element_at(F.transform(F.array(tokenize(col, sep)),
                                    with_bigrams), 1)


def repetition_fractions(r: Column) -> dict[str, Column]:
    """Gopher-style fractions (Rae et al. 2021, §A1.1 repetition filters)
    derived from a :func:`repetition_struct` column ``r``:
    ``dup_token_frac`` (tokens that repeat an earlier token),
    ``dup_bigram_frac``, ``top_bigram_frac``. Single integer divisions —
    bit-identical in any IEEE engine; NULL on zero denominators."""
    frac = (lambda num, den:
            F.when(den > 0, num.cast("double") / den.cast("double")))
    return {
        "dup_token_frac": frac(r["n_tokens"] - r["n_distinct"],
                               r["n_tokens"]),
        "dup_bigram_frac": frac(r["n_bigrams"] - r["n_distinct_bigrams"],
                                r["n_bigrams"]),
        "top_bigram_frac": frac(r["top_bigram_n"], r["n_bigrams"]),
    }


def repetition_features(col, sep: str = " ") -> dict[str, Column]:
    """Flat convenience view of :func:`repetition_struct` +
    :func:`repetition_fractions` — fine for selecting a FEW fields.
    Selecting many fields through this dict duplicates the struct
    expression per output column (HOFs are interpreted, so nothing
    CSEs them); for full-width output, select ``repetition_struct``
    into a column first and expand in a second projection (q51's
    shape)."""
    r = repetition_struct(col, sep)
    fr = repetition_fractions(r)
    return {
        "n_tokens": r["n_tokens"],
        "n_distinct": r["n_distinct"],
        "dup_token_frac": fr["dup_token_frac"],
        "dup_bigram_frac": fr["dup_bigram_frac"],
        "top_bigram_n": r["top_bigram_n"],
        "top_bigram_frac": fr["top_bigram_frac"],
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
