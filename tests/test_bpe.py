"""BPE tokenizer lifecycle (operators/bpe.py) pinned against a scalar
reference implementation — the textbook Sennrich algorithm computed
word-at-a-time in pure Python — on randomized corpora, so distributed
aggregation mistakes (lost counts, nondeterministic tie-breaks,
rank-order inference drift) surface as exact mismatches."""

from __future__ import annotations

import collections
import random

import pytest
from pyspark.sql import functions as F

from datasketches_spark_spark.operators import (
    bpe_encode,
    bpe_vocab,
    train_bpe,
)

EOW = "</w>"


def scalar_train(texts, num_merges, min_pair_count=2):
    """Textbook BPE trainer: full pair recount every round, ties to the
    lexicographically smallest pair."""
    words = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                chars = list(w)
                chars[-1] += EOW
                words[tuple(chars)] += 1
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for sym, c in words.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += c
        best = None
        for p, c in pairs.items():
            if c < min_pair_count:
                continue
            if best is None or c > best[1] or (c == best[1]
                                               and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        fused = pair[0] + pair[1]
        new_words = collections.Counter()
        for sym, c in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == pair[0]
                        and sym[i + 1] == pair[1]):
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


def scalar_encode(text, merges):
    """Sequential replay: apply each merge in rank order across the
    whole word — the canonical definition the rank-based inference in
    bpe_encode must reproduce."""
    out = []
    for w in text.split(" "):
        if not w:
            continue
        sym = list(w)
        sym[-1] += EOW
        for a, b in merges:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i:i + 2] = [a + b]
                else:
                    i += 1
        out.extend(sym)
    return out


def random_corpus(seed, n_docs=60, vocab=None):
    rnd = random.Random(seed)
    vocab = vocab or ["low", "lower", "lowest", "new", "newer", "wide",
                      "wider", "widest", "news", "nest", "", "a", "ab"]
    return [" ".join(rnd.choice(vocab)
                     for _ in range(rnd.randint(0, 25)))
            for _ in range(n_docs)]


@pytest.mark.parametrize("seed", [3, 11, 1107])
def test_train_matches_scalar_randomized(spark, seed):
    texts = random_corpus(seed)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [(r.left, r.right) for r in
           train_bpe(df, "text", num_merges=25).orderBy("rank").collect()]
    assert got == scalar_train(texts, 25)


def test_train_is_partitioning_invariant(spark):
    texts = random_corpus(42, n_docs=100)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    a = [(r.left, r.right) for r in
         train_bpe(df, "text", 15).orderBy("rank").collect()]
    b = [(r.left, r.right) for r in
         train_bpe(df.repartition(13), "text", 15)
         .orderBy("rank").collect()]
    assert a == b and len(a) == 15


@pytest.mark.parametrize("seed", [5, 77])
def test_encode_matches_sequential_replay(spark, seed):
    texts = random_corpus(seed)
    train_df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges_df = train_bpe(train_df, "text", 20)
    merges = [(r.left, r.right)
              for r in merges_df.orderBy("rank").collect()]
    docs = spark.createDataFrame(
        list(enumerate(random_corpus(seed + 1, n_docs=40))),
        ["doc_id", "text"])
    got = {r.doc_id: list(r.tokens)
           for r in bpe_encode(docs, "doc_id", "text",
                               merges_df).collect()}
    for did, text in [(r.doc_id, r.text) for r in docs.collect()]:
        assert got[did] == scalar_encode(text, merges), did


def test_encode_is_lossless_and_counts(spark):
    texts = random_corpus(9)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = train_bpe(df, "text", 12)
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 ["doc_id", "text"])
    for r in bpe_encode(docs, "doc_id", "text", merges).collect():
        text = texts[r.doc_id]
        words = [w for w in text.split(" ") if w]
        assert r.n_words == len(words)
        assert r.n_tokens == len(r.tokens)
        # concatenation restores the marked word stream exactly
        assert "".join(r.tokens) == "".join(w + EOW for w in words)
        # merging never yields more tokens than characters
        assert r.n_tokens <= sum(len(w) for w in words)


def test_merges_reduce_token_count_monotonically(spark):
    texts = random_corpus(21, n_docs=80)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 ["doc_id", "text"])
    last = None
    for n in (1, 5, 15, 30):
        m = train_bpe(df, "text", n)
        tot = (bpe_encode(docs, "doc_id", "text", m)
               .agg(F.sum("n_tokens")).first()[0])
        if last is not None:
            assert tot <= last
        last = tot


def test_vocab_counts_match_encoding(spark):
    texts = random_corpus(31)
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = train_bpe(df, "text", 10)
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 ["doc_id", "text"])
    enc = bpe_encode(docs, "doc_id", "text", merges).collect()
    exp = collections.Counter(t for r in enc for t in r.tokens)
    got = {r.token: r.c for r in bpe_vocab(merges, df, "text").collect()}
    assert got == dict(exp)


def test_min_pair_count_and_exhaustion(spark):
    # every word unique once -> no pair reaches min_pair_count=2
    df = spark.createDataFrame([("abc xyz",)], ["text"])
    assert train_bpe(df, "text", 10).count() == 0
    # min_pair_count=1 merges greedily until single symbols remain
    m = train_bpe(df, "text", 100, min_pair_count=1)
    assert 0 < m.count() <= 4  # 2 merges per 3-char word at most


def test_bad_num_merges_raises(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    with pytest.raises(ValueError):
        train_bpe(df, "text", 0)
