"""Chunking contracts."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datasketches_spark_spark.functions.text import chunk_tokens


def _chunks(spark, text, size, overlap=0):
    df = spark.createDataFrame([Row(t=text)], "t string")
    return df.select(chunk_tokens("t", size, overlap).alias("c")) \
        .collect()[0].c


def test_overlap_and_exact_cover(spark):
    assert _chunks(spark, "a b c d e f g", 3, 1) == \
        ["a b c", "c d e", "e f g"]
    assert _chunks(spark, "a b c d e f", 3) == ["a b c", "d e f"]
    assert _chunks(spark, "a b c d e f g", 3) == ["a b c", "d e f", "g"]


def test_degenerate(spark):
    assert _chunks(spark, "a b", 5) == ["a b"]       # short doc: 1 chunk
    assert _chunks(spark, "", 3) == []               # empty: no chunks
    assert _chunks(spark, None, 3) is None           # null propagates


def test_every_token_covered_no_loss(spark):
    text = " ".join(f"t{i}" for i in range(97))
    for size, ov in ((10, 0), (10, 3), (7, 6)):
        chunks = _chunks(spark, text, size, ov)
        step = size - ov
        # reconstruction: chunk i contributes its tokens from position
        # i*step; stitching non-overlap prefixes rebuilds the document
        rebuilt = []
        for i, ch in enumerate(chunks):
            toks = ch.split(" ")
            rebuilt.extend(toks if i == 0 else toks[ov:])
        assert rebuilt == text.split(" "), (size, ov)


def test_bad_args(spark):
    with pytest.raises(ValueError, match="size"):
        chunk_tokens("t", 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens("t", 3, overlap=3)


def test_shuffle_free(spark):
    df = spark.createDataFrame([Row(t="a b c")])
    out = df.select(chunk_tokens("t", 2).alias("c"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan


class TestWinnowPortable:
    """Portable-hash winnowing expr vs a python reference."""

    @staticmethod
    def _ref(text, k, window):
        import hashlib
        if len(text) < k:
            return []
        hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:15], 16)
              for i in range(len(text) - k + 1)]
        if len(hs) < window:
            return sorted({min(hs)})
        return sorted({min(hs[j:j + window])
                       for j in range(len(hs) - window + 1)})

    def test_matches_reference_and_shift_invariant(self, spark):
        from datasketches_spark_spark.functions.text import (
            winnow_fingerprints_expr)
        base = "the quick brown fox jumps over the lazy dog again and again"
        texts = [base, "XY " + base, "tiny", ""]
        df = spark.createDataFrame([Row(t=x) for x in texts], "t string")
        out = [r.f for r in df.select(
            winnow_fingerprints_expr("t", k=8, window=3).alias("f"))
            .collect()]
        for got, text in zip(out, texts):
            assert got == self._ref(text, 8, 3), text[:20]
        # winnowing guarantees shared fingerprints under prefix shifts
        shared = set(out[0]) & set(out[1])
        assert len(shared) >= 0.7 * len(out[0])
