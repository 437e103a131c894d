"""BM25 retrieval operator: exactness vs a pure-Python reference, plan
shape, and tie determinism."""

import math

import pytest


def _bm25_reference(corpus, queries, k1=1.2, b=0.75, k=10):
    """Scalar BM25 over {doc_id: text}; mirrors operators/retrieval.py."""
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qtext in queries:
        terms = list(dict.fromkeys(t for t in qtext.split(" ") if t))
        scores = {}
        for d, ts in toks.items():
            s = 0.0
            for term in terms:
                tf = ts.count(term)
                if not tf:
                    continue
                df = sum(1 for other in toks.values() if term in other)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl))
            if s:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, r + 1, s) for r, (d, s) in enumerate(ranked)]
    return out


class TestBM25:
    CORPUS = {
        1: "spark window merge spark table",
        2: "window window window scan",
        3: "merge join order customer",
        4: "the a the a the a the a the a the a the a",
        5: "spark",
    }
    QUERIES = [("qa", "spark window"), ("qb", "merge customer")]

    def _run(self, spark, **kw):
        from datasketches_spark_spark.operators import bm25_topk
        df = spark.createDataFrame(
            [(d, t) for d, t in self.CORPUS.items()], ["doc_id", "text"])
        return bm25_topk(df, "doc_id", "text", self.QUERIES, **kw)

    def test_matches_scalar_reference(self, spark):
        got = {}
        for r in self._run(spark).collect():
            got.setdefault(r.query_id, []).append(
                (r.doc_id, r.rank, r.score))
        for qid in got:
            got[qid].sort(key=lambda t: t[1])
        assert got == _bm25_reference(self.CORPUS, self.QUERIES)

    def test_k_truncates_and_ranks_dense(self, spark):
        out = self._run(spark, k=1).collect()
        by_q = {r.query_id: r for r in out}
        assert set(by_q) == {"qa", "qb"}
        assert all(r.rank == 1 for r in out)

    def test_tie_breaks_on_doc_id(self, spark):
        from datasketches_spark_spark.operators import bm25_topk
        # identical docs -> identical scores -> rank order must follow id
        df = spark.createDataFrame(
            [(9, "x y"), (3, "x y"), (7, "x y")], ["doc_id", "text"])
        got = [(r.doc_id, r.rank)
               for r in bm25_topk(df, "doc_id", "text", [("q", "x")], k=3)
               .orderBy("rank").collect()]
        assert got == [(3, 1), (7, 2), (9, 3)]

    def test_plan_shape(self, spark):
        plan = self._run(spark)._jdf.queryExecution().executedPlan().toString()
        # query-term prune and query attach are broadcast, never shuffled
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
        # per-query top-k compiles to the partial-limit window form
        assert "WindowGroupLimit" in plan

    def test_empty_queries_raise(self, spark):
        from datasketches_spark_spark.operators import bm25_topk
        df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bm25_topk(df, "doc_id", "text", [])


class TestTextIndex:
    """Persisted inverted index: build once, partition-pruned probes."""

    def _build(self, spark, tmp_path):
        from datasketches_spark_spark.operators import build_text_index
        df = spark.createDataFrame(
            [(d, t) for d, t in TestBM25.CORPUS.items()],
            ["doc_id", "text"])
        path = str(tmp_path / "txtidx")
        build_text_index(df, "doc_id", "text", path, num_buckets=8)
        return df, path

    def test_served_equals_direct(self, spark, tmp_path):
        from datasketches_spark_spark.operators import (bm25_topk,
                                                        query_text_index)
        df, path = self._build(spark, tmp_path)
        direct = sorted(tuple(r) for r in bm25_topk(
            df, "doc_id", "text", TestBM25.QUERIES, k=10).collect())
        served = sorted(tuple(r) for r in query_text_index(
            spark, path, TestBM25.QUERIES, k=10).collect())
        assert direct == served and served

    def test_probe_prunes_partitions(self, spark, tmp_path):
        import contextlib
        import io
        from datasketches_spark_spark.operators import query_text_index
        _, path = self._build(spark, tmp_path)
        q = query_text_index(spark, path, [("q", "spark")], k=5)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        plan = buf.getvalue()
        # every postings/df scan prunes on the bucket partition column
        # (single-bucket probes render as `bucket = N`, multi as `IN`)
        pf = [seg.split("]")[0] for seg in
              plan.split("PartitionFilters: [")[1:]]
        assert any("bucket" in p for p in pf), plan
        # the corpus never appears at query time: only the 3 index
        # reads (postings, df, stats; formatted explain lists each scan
        # twice — once in the tree, once in the detail section)
        assert plan.count("Scan parquet") <= 6

    def test_unseen_term_returns_empty(self, spark, tmp_path):
        from datasketches_spark_spark.operators import query_text_index
        _, path = self._build(spark, tmp_path)
        assert query_text_index(
            spark, path, [("q", "zzzznotaword")], k=5).count() == 0


class TestTokensCol:
    """The r18 pre-tokenized fast path (tokens_col=) must be
    row-identical to the text path: same token arrays, same scores,
    same persisted index."""

    def _tok(self, spark):
        from pyspark.sql import functions as F
        from datasketches_spark_spark.functions.text import tokenize
        df = spark.createDataFrame(
            [(d, t) for d, t in TestBM25.CORPUS.items()],
            ["doc_id", "text"])
        return df, df.select("doc_id", tokenize("text").alias("toks"))

    def test_bm25_pretokenized_identical(self, spark):
        from datasketches_spark_spark.operators import bm25_topk
        df, tok = self._tok(spark)
        direct = sorted(tuple(r) for r in bm25_topk(
            df, "doc_id", "text", TestBM25.QUERIES, k=10).collect())
        pre = sorted(tuple(r) for r in bm25_topk(
            tok, "doc_id", None, TestBM25.QUERIES, k=10,
            tokens_col="toks").collect())
        assert direct == pre and pre

    def test_index_pretokenized_identical(self, spark, tmp_path):
        from datasketches_spark_spark.operators import (build_text_index,
                                                        query_text_index)
        df, tok = self._tok(spark)
        p1 = str(tmp_path / "idx_text")
        p2 = str(tmp_path / "idx_tok")
        build_text_index(df, "doc_id", "text", p1, num_buckets=8)
        build_text_index(tok, "doc_id", None, p2, num_buckets=8,
                         tokens_col="toks")
        r1 = sorted(tuple(r) for r in query_text_index(
            spark, p1, TestBM25.QUERIES, k=10).collect())
        r2 = sorted(tuple(r) for r in query_text_index(
            spark, p2, TestBM25.QUERIES, k=10).collect())
        assert r1 == r2 and r1
        # the persisted postings themselves are row-identical
        post1 = sorted(tuple(r) for r in
                       spark.read.parquet(p1 + "/postings").collect())
        post2 = sorted(tuple(r) for r in
                       spark.read.parquet(p2 + "/postings").collect())
        assert post1 == post2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bm25_random_corpus_vs_scalar(spark, seed):
    """Randomized small-vocab corpora against the scalar model — dense
    term collisions, heavy score ties (the tiebreak regime)."""
    import random
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(6)]
    corpus = {d: " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 30)))
              for d in range(15)}
    queries = [("qa", " ".join(rng.sample(vocab, 2))),
               ("qb", " ".join(rng.sample(vocab, 3)))]
    from datasketches_spark_spark.operators import bm25_topk
    df = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], ["doc_id", "text"])
    got = {}
    for r in bm25_topk(df, "doc_id", "text", queries, k=7).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.rank, r.score))
    for q in got:
        got[q].sort(key=lambda t: t[1])
    assert got == _bm25_reference(corpus, queries, k=7)


class TestHardNegatives:
    """mine_hard_negatives: the anti-join drops exactly the labeled
    positives, the exact depth default loses no recall, and the
    re-rank stays dense in BM25 order."""

    CORPUS = {
        1: "spark window merge spark table",
        2: "window window window scan",
        3: "merge join order customer",
        4: "spark window merge",
        5: "spark merge",
        6: "window merge scan",
    }
    QUERIES = [("qa", "spark window merge")]

    def _mine(self, spark, positives, **kw):
        from datasketches_spark_spark.operators import mine_hard_negatives
        docs = spark.createDataFrame(
            [(d, t) for d, t in self.CORPUS.items()], ["doc_id", "text"])
        pos = spark.createDataFrame(positives, ["query_id", "doc_id"])
        return mine_hard_negatives(docs, "doc_id", "text", self.QUERIES,
                                   pos, **kw)

    def test_equals_full_ranking_minus_positives(self, spark):
        from datasketches_spark_spark.operators import bm25_topk
        docs = spark.createDataFrame(
            [(d, t) for d, t in self.CORPUS.items()], ["doc_id", "text"])
        full = [(r.doc_id, r.score) for r in
                bm25_topk(docs, "doc_id", "text", self.QUERIES, k=10)
                .orderBy("rank").collect()]
        pos = [("qa", 1), ("qa", 4)]
        got = [(r.doc_id, r.rank, r.score) for r in
               self._mine(spark, pos, k=3).orderBy("rank").collect()]
        exp = [(d, i + 1, s) for i, (d, s) in
               enumerate([t for t in full if t[0] not in (1, 4)][:3])]
        assert got == exp
        assert [r[1] for r in got] == [1, 2, 3]  # dense re-rank

    def test_positives_for_other_query_not_excluded(self, spark):
        got = {r.doc_id for r in
               self._mine(spark, [("other", 1), ("other", 4)],
                          k=10).collect()}
        assert {1, 4} <= got

    def test_default_depth_is_exact(self, spark):
        # exclude the entire top of the ranking; k slots must still fill
        pos = [("qa", 1), ("qa", 4), ("qa", 5)]
        got = [r.doc_id for r in
               self._mine(spark, pos, k=3).orderBy("rank").collect()]
        assert len(got) == 3 and not ({1, 4, 5} & set(got))

    def test_bad_depth_raises(self, spark):
        with pytest.raises(ValueError):
            self._mine(spark, [("qa", 1)], k=5, depth=2)
