"""Unicode normalization + invisible-char stripping
(functions/text.py::unicode_normalize / strip_invisible): canonical
equivalence folds to one fingerprint, NFC replays in DuckDB, and the
zero-width adversary class strips identically in both engines.

Every non-ASCII test string is built from explicit escapes — the
whole point of these characters is that an editor can't see them.
"""

from __future__ import annotations

import re
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.functions import (strip_invisible,
                                                unicode_normalize)


def _one(spark, s: str, col) -> str | None:
    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(col.alias("v")).collect()[0].v


PRECOMPOSED = "Caf\u00e9 na\u00efve"               # é, ï composed
DECOMPOSED = "Cafe\u0301 nai\u0308ve"              # e+acute, i+diaeresis
FULLWIDTH = "\uff28\uff25\uff2c\uff2c\uff2f"       # fullwidth HELLO


class TestUnicodeNormalize:
    def test_nfc_folds_canonical_equivalence(self, spark):
        assert _one(spark, DECOMPOSED,
                    unicode_normalize("t", "NFC")) == PRECOMPOSED

    def test_nfd_is_the_inverse_direction(self, spark):
        assert _one(spark, PRECOMPOSED,
                    unicode_normalize("t", "NFD")) == DECOMPOSED

    def test_nfkc_folds_compatibility_forms(self, spark):
        assert _one(spark, FULLWIDTH,
                    unicode_normalize("t", "NFKC")) == "HELLO"
        # NFC must NOT touch compatibility forms
        assert _one(spark, FULLWIDTH,
                    unicode_normalize("t", "NFC")) == FULLWIDTH

    def test_matches_duckdb_nfc(self, spark):
        rows = [DECOMPOSED, PRECOMPOSED, FULLWIDTH, "plain ascii",
                "mixed e\u0301\u0323 clusters"]   # reorderable marks
        df = spark.createDataFrame([(s,) for s in rows], ["t"])
        got = [r.v for r in
               df.select(unicode_normalize("t").alias("v")).collect()]
        con = duckdb.connect()
        want = [con.execute("SELECT nfc_normalize(?)",
                            [s]).fetchone()[0] for s in rows]
        assert got == want

    def test_null_propagates_and_bad_form_raises(self, spark):
        df = spark.createDataFrame([(None,)], "t string")
        assert df.select(unicode_normalize("t").alias("v")) \
                 .collect()[0].v is None
        with pytest.raises(ValueError, match="normalization form"):
            unicode_normalize("t", "NFX")

    def test_dedup_motivation(self, spark):
        # the point: canonically equivalent docs must fingerprint
        # identically after normalization
        from datasketches_spark_spark.functions.text import (
            doc_fingerprint)
        df = spark.createDataFrame(
            [(DECOMPOSED,), (PRECOMPOSED,)], ["t"])
        n = df.select(doc_fingerprint(
            unicode_normalize("t")).alias("fp")) \
            .agg(F.countDistinct("fp").alias("n")).collect()[0].n
        assert n == 1
        raw = df.select(doc_fingerprint("t").alias("fp")) \
            .agg(F.countDistinct("fp").alias("n")).collect()[0].n
        assert raw == 2


class TestStripInvisible:
    # soft hyphen, ZWSP, ZWNJ, ZWJ, word joiner, BOM-as-ZWNBSP
    ADVERSARIAL = ("du\u200bpli\u200ccate\u00ad "
                   "te\u2060xt\ufeff\u200d")

    def test_strips_the_class(self, spark):
        assert _one(spark, self.ADVERSARIAL,
                    strip_invisible("t")) == "duplicate text"

    def test_bidi_controls(self, spark):
        s = ("a\u202eb\u202cc\u2066d\u2069e\u200f\u200e"
             "\u202a\u202b\u202d")
        assert _one(spark, s, strip_invisible("t")) == "abcde"

    def test_visible_text_untouched(self, spark):
        s = "Caf\u00e9 \u2014 em\u2013dash 100\u00a0km"  # nbsp kept
        assert _one(spark, s, strip_invisible("t")) == s

    def test_matches_python_reference(self, spark):
        from datasketches_spark_spark.functions.text import (
            _INVISIBLE_CLASS)
        rows = [self.ADVERSARIAL, "plain", "\u200b\u200b", ""]
        df = spark.createDataFrame([(s,) for s in rows], ["t"])
        got = [r.v for r in
               df.select(strip_invisible("t").alias("v")).collect()]
        want = [re.sub(_INVISIBLE_CLASS, "", s) for s in rows]
        assert got == want

    def test_scan_stage_only(self, spark):
        df = spark.createDataFrame([("x",)], ["t"])
        plan = df.select(strip_invisible("t")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()


class TestNormalizationTables:
    """The UDF rides CPython's bundled UCD — pin a few known spec
    mappings so a unicodedata regression is loud."""

    @pytest.mark.parametrize("src,form,want", [
        ("\u212b", "NFC", "\u00c5"),        # ANGSTROM SIGN -> Å
        ("\ufb01", "NFKC", "fi"),           # fi ligature
        ("\u2460", "NFKC", "1"),            # circled digit one
        # canonical ordering + unblocked composition: marks reorder
        # by ccc (dot-below 220 before diaeresis 230), then x still
        # composes with the diaeresis PAST the lower-ccc dot-below
        # (UAX #15 blocking rule) -> U+1E8D + dot-below
        ("x\u0308\u0323", "NFC", "\u1e8d\u0323"),
    ])
    def test_known_mappings(self, spark, src, form, want):
        assert unicodedata.normalize(form, src) == want  # sanity
        df = spark.createDataFrame([(src,)], ["t"])
        got = df.select(unicode_normalize("t", form).alias("v")) \
            .collect()[0].v
        assert got == want


class TestLangIdWide:
    """r15: the ten-language extension set (langs=LANG_ORDER_WIDE);
    the default set and therefore the q22 board behavior/lock are
    untouched."""

    def test_extension_languages_detected(self, spark):
        from datasketches_spark_spark.functions.text import (
            LANG_ORDER_WIDE, STOPWORDS, lang_id)
        rows = [(lg, " ".join(STOPWORDS[lg] * 3))
                for lg in ("it", "pt", "nl", "ru", "id")]
        df = spark.createDataFrame(rows, ["want", "t"])
        got = df.select("want", lang_id(
            "t", langs=LANG_ORDER_WIDE).alias("lang")).collect()
        for r in got:
            assert r.lang == r.want, r

    def test_default_set_unchanged(self, spark):
        from datasketches_spark_spark.functions.text import (
            LANG_ORDER, lang_id)
        assert LANG_ORDER == ["en", "de", "fr", "es", "zh"]
        df = spark.createDataFrame(
            [("il di che e la per un una non",)], ["t"])
        # the default candidate set cannot answer 'it'
        assert df.select(lang_id("t").alias("v")).collect()[0].v != "it"

    def test_unknown_language_raises(self):
        from datasketches_spark_spark.functions.text import lang_id
        import pytest as _pt
        with _pt.raises(ValueError, match="no stopword list"):
            lang_id("t", langs=["en", "xx"])


class TestSplitSentences:
    """r15: lexicon-free deterministic sentence segmentation."""

    @pytest.mark.parametrize("text,want", [
        ("One. Two! Three?", ["One.", "Two!", "Three?"]),
        ("Ellipsis... then more.", ["Ellipsis...", "then more."]),
        ("No terminator at all", ["No terminator at all"]),
        ("Dr. Smith arrived.", ["Dr.", "Smith arrived."]),
        ("", []),
        ("  .  ", ["."]),
    ])
    def test_contract(self, spark, text, want):
        from datasketches_spark_spark.functions.text import (
            split_sentences)
        df = spark.createDataFrame([(text,)], ["t"])
        got = df.select(split_sentences("t").alias("v")) \
            .collect()[0].v
        assert got == want

    def test_scan_stage_only(self, spark):
        from datasketches_spark_spark.functions.text import (
            split_sentences)
        df = spark.createDataFrame([("a. b.",)], ["t"])
        plan = df.select(split_sentences("t")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()

    def test_single_language_set_works(self, spark):
        from datasketches_spark_spark.functions.text import lang_id
        df = spark.createDataFrame([("the cat and the hat",)], ["t"])
        assert df.select(lang_id("t", langs=["en"]).alias("v")) \
                 .collect()[0].v == "en"
        with pytest.raises(ValueError, match="at least one"):
            lang_id("t", langs=[])


class TestScriptFunctions:
    """r15: script_counts / dominant_script / lang_id_cjk — the
    script-level signals whitespace-free languages need."""

    def test_counts_match_python_reference(self, spark):
        import re as _re
        from datasketches_spark_spark.functions.text import (
            SCRIPT_RANGES, script_counts)
        texts = ["abc да あア中",
                 "가각 latin", "", "123 !?"]
        df = spark.createDataFrame([(t,) for t in texts], ["t"])
        rows = df.select(script_counts("t").alias("c")) \
            .select("c.*").collect()
        for t, r in zip(texts, rows):
            for name, rng in SCRIPT_RANGES.items():
                want = len(_re.findall(f"[{rng}]", t))
                assert getattr(r, name) == want, (t, name)

    @pytest.mark.parametrize("text,want", [
        ("日本語のテキスト", "ja"),
        ("한국어 텍스트", "ko"),
        ("这是中文文本", "zh"),
        ("plain latin text", None),
        ("漢字とひらがな", "ja"),
    ])
    def test_cjk_disambiguation(self, spark, text, want):
        from datasketches_spark_spark.functions.text import lang_id_cjk
        df = spark.createDataFrame([(text,)], ["t"])
        assert df.select(lang_id_cjk("t").alias("v")) \
                 .collect()[0].v == want

    def test_dominant_script(self, spark):
        from datasketches_spark_spark.functions.text import (
            dominant_script)
        cases = [("mostly latin д", "latin"),
                 ("далеко x", "cyrillic"),
                 ("12345 !?", "und")]
        df = spark.createDataFrame(cases, ["t", "want"])
        for r in df.select("want",
                           dominant_script("t").alias("got")).collect():
            assert r.got == r.want

    def test_scan_stage_only(self, spark):
        from datasketches_spark_spark.functions.text import (
            dominant_script, lang_id_cjk)
        df = spark.createDataFrame([("x",)], ["t"])
        plan = df.select(lang_id_cjk("t"), dominant_script("t")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "pythonudf" not in plan.lower()
