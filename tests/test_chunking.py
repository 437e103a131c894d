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


class TestSimhashPortable:
    def test_matches_reference_and_near_dup_property(self, spark):
        import hashlib
        from datasketches_spark_spark.functions.text import simhash_expr

        def ref(text, bits=60):
            toks = [t for t in text.split(" ") if t]
            cnt = [0] * bits
            for t in toks:
                hv = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                for b in range(bits):
                    cnt[b] += 1 if (hv >> b) & 1 else -1
            return "".join("1" if cnt[bits - 1 - j] > 0 else "0"
                           for j in range(bits))

        base = " ".join(f"tok{i}" for i in range(60))
        near = base.replace("tok7", "DIFFERENT")          # 1-token edit
        far = " ".join(f"other{i}" for i in range(60))
        df = spark.createDataFrame(
            [Row(t=x) for x in (base, near, far)], "t string")
        sigs = [r.s for r in df.select(
            simhash_expr("t").alias("s")).collect()]
        assert sigs == [ref(base), ref(near), ref(far)]
        ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
        assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])

    def test_bad_bits(self):
        import pytest
        from datasketches_spark_spark.functions.text import simhash_expr
        with pytest.raises(ValueError, match="bits"):
            simhash_expr("t", bits=64)


class TestNormalizeText:
    def test_components(self, spark):
        from datasketches_spark_spark.functions.text import normalize_text

        def one(text, **kw):
            df = spark.createDataFrame([Row(t=text)], "t string")
            return df.select(
                normalize_text("t", **kw).alias("n")).collect()[0].n

        assert one("  Hello   WORLD  ") == "hello world"
        assert one("MiXeD", case=False) == "MiXeD"
        assert one("a,b.c!", strip_punct=True) == "abc"
        assert one("a \t b\n c") == "a b c"
        assert one(None) is None


def test_pack_sequences_matches_scalar_reference(spark):
    """Distributed prefix-sum packing == the sequential scalar pack, at
    any partition count; giant docs span many sequences; zero-token
    docs drop; every sequence except the tail is exactly full."""
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import pack_sequences
    S = 100
    docs = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        # mix: empty docs, tiny docs, and a few spanning >3 sequences
        "CAST(CASE WHEN id % 50 = 0 THEN 0 "
        "WHEN id % 7 = 0 THEN 350 ELSE 1 + id % 23 END AS long)"
        " AS n_tokens")
    rows = [(r.doc_id, r.n_tokens) for r in docs.orderBy("doc_id").collect()]
    g, exp = 0, []
    for i, n in rows:
        if n == 0:
            continue
        for sq in range(g // S, (g + n - 1) // S + 1):
            exp.append((i, sq, max(0, sq * S - g), min(n, (sq + 1) * S - g),
                        max(0, g - sq * S)))
        g += n
    for parts in (1, 3, 11):
        got = [(r.doc_id, r.seq_id, r.piece_start, r.piece_end,
                r.seq_offset)
               for r in pack_sequences(docs, S, num_partitions=parts)
               .orderBy("doc_id", "seq_id").collect()]
        assert got == exp, f"partitions={parts}"
    out = pack_sequences(docs, S, num_partitions=5)
    full = (out.groupBy("seq_id")
            .agg(F.sum(F.col("piece_end") - F.col("piece_start")).alias("t"))
            .orderBy("seq_id").collect())
    assert all(r.t == S for r in full[:-1]) and full[-1].t <= S
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_pack_sequences_deterministic_under_range_sampling(spark):
    """Regression for the round-9 driver hash mismatch (q26 'pack'): the
    offsets collect and the expand mapInPandas are separate jobs, and
    RangePartitioner RE-SAMPLES per job — with a fat input partition
    (rows >> sampleSizePerPartition) the two jobs could draw different
    boundaries, shifting boundary docs across partitions so
    offsets[pid] was wrong for the expand pass. pack_sequences now
    localCheckpoints the partitioned frame so both jobs read the SAME
    layout. This test forces sampling to engage (one fat partition,
    tiny sample size) and pins: repeated runs identical AND equal to
    the sequential scalar pack."""
    from datasketches_spark_spark.operators import pack_sequences
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10")
    try:
        S = 64
        # one fat partition, 5000 rows, irregular sizes near chunk
        # boundaries so a one-doc shift corrupts every later span
        docs = (spark.range(0, 5000).coalesce(1)
                .selectExpr("id AS doc_id",
                            "CAST(1 + (id * 2654435761) % 97 AS long)"
                            " AS n_tokens"))
        rows = [(r.doc_id, r.n_tokens)
                for r in docs.orderBy("doc_id").collect()]
        g, exp = 0, []
        for i, n in rows:
            for sq in range(g // S, (g + n - 1) // S + 1):
                exp.append((i, sq, max(0, sq * S - g),
                            min(n, (sq + 1) * S - g), max(0, g - sq * S)))
            g += n
        runs = []
        for _ in range(2):
            got = [(r.doc_id, r.seq_id, r.piece_start, r.piece_end,
                    r.seq_offset)
                   for r in pack_sequences(docs, S, num_partitions=16)
                   .orderBy("doc_id", "seq_id").collect()]
            runs.append(got)
        assert runs[0] == exp
        assert runs[1] == exp
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


class TestTrainingShards:
    """The shard sink: deterministic layout, faithful manifest, pruned
    read-back."""

    def _write(self, spark, tmp_path):
        from datasketches_spark_spark.operators import write_training_shards
        docs = spark.createDataFrame(
            [(i, 10 + (i * 7) % 23) for i in range(60)],
            ["doc_id", "n_tokens"])
        path = str(tmp_path / "shards")
        write_training_shards(docs, path, tokens_per_seq=64,
                              seqs_per_shard=3)
        return docs, path

    def test_manifest_matches_recomputation(self, spark, tmp_path):
        from pyspark.sql import functions as F
        docs, path = self._write(spark, tmp_path)
        man = {r.shard_id: (r.n_seqs, r.n_pieces, r.n_tokens)
               for r in spark.read.parquet(path + "/manifest").collect()}
        sh = spark.read.parquet(path + "/shards")
        re = {r.shard_id: (r.ns, r.np, r.nt) for r in
              sh.groupBy("shard_id")
              .agg(F.countDistinct("seq_id").alias("ns"),
                   F.count("*").alias("np"),
                   F.sum(F.col("piece_end") - F.col("piece_start"))
                   .alias("nt")).collect()}
        assert man == re and man
        # token conservation: every input token lands in exactly one piece
        total = sum(v[2] for v in man.values())
        want = sum(r.n_tokens for r in docs.collect())
        assert total == want

    def test_shard_assignment_is_seq_div(self, spark, tmp_path):
        _, path = self._write(spark, tmp_path)
        rows = spark.read.parquet(path + "/shards") \
            .select("shard_id", "seq_id").distinct().collect()
        assert all(r.shard_id == r.seq_id // 3 for r in rows)

    def test_read_back_prunes(self, spark, tmp_path):
        import contextlib
        import io
        from datasketches_spark_spark.operators import read_training_shards
        _, path = self._write(spark, tmp_path)
        sub = read_training_shards(spark, path, shard_ids=[0, 2])
        assert set(r.shard_id for r in sub.collect()) == {0, 2}
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            sub.explain("formatted")
        plan = buf.getvalue()
        pf = [seg.split("]")[0] for seg in
              plan.split("PartitionFilters: [")[1:]]
        assert any("shard_id" in p for p in pf), plan

    def test_custom_id_col_manifest(self, spark, tmp_path):
        # pack_sequences emits 'doc_id' internally; the shard files and
        # the manifest min/max must carry the caller's id column name
        from datasketches_spark_spark.operators import write_training_shards
        docs = spark.createDataFrame(
            [(i, 10 + (i * 7) % 23) for i in range(40)],
            ["item_id", "n_tokens"])
        path = str(tmp_path / "custom")
        write_training_shards(docs, path, tokens_per_seq=64,
                              seqs_per_shard=3, id_col="item_id")
        sh = spark.read.parquet(path + "/shards")
        assert "item_id" in sh.columns and "doc_id" not in sh.columns
        man = spark.read.parquet(path + "/manifest").collect()
        assert man and all(r.min_doc <= r.max_doc for r in man)

    def test_rejects_bad_shard_size(self, spark, tmp_path):
        import pytest as _pt
        from datasketches_spark_spark.operators import write_training_shards
        docs = spark.createDataFrame([(1, 5)], ["doc_id", "n_tokens"])
        with _pt.raises(ValueError):
            write_training_shards(docs, str(tmp_path / "x"), 64, 0)
