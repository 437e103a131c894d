"""Byte-pair-encoding tokenizer lifecycle — train merges on a corpus,
encode documents, count subword tokens (Sennrich, Haddow & Birch, ACL
2016; the algorithm behind GPT-2/RoBERTa-class vocabularies).

A training-data pipeline needs a REAL subword tokenizer, not just the
whitespace count: packing budgets, mixture weights, and dedup span
lengths are all denominated in model tokens, and a corpus-trained BPE
is the standard way to get them without shipping an external
vocabulary file.

Scale design (the 100 TB shape):

- TRAIN (:func:`train_bpe`): the only corpus-sized work is ONE
  map-side-combined aggregate to the word-type table ``(word, count)``
  — the shuffle carries word TYPES (vocabulary-bounded, tens of
  millions at web scale), never the token stream. The merge loop then
  runs on that table alone: it is inherently sequential (merge ``i+1``
  depends on the counts AFTER merge ``i``), so it happens driver-side
  over the collected type table, guarded by ``max_word_types`` — the
  same bounded-collect contract as the IVF trainer
  (similarity.py::train_ivf_centroids' ``max_train``). The incremental
  pair-count update (only words containing the merged pair are
  re-counted) makes the loop O(affected words) per merge, the
  HF-tokenizers strategy.
- ENCODE (:func:`bpe_encode`): one Arrow-batched ``mapInPandas`` scan
  with the merge ranks BROADCAST as a plain dict (a few MB for 32k
  merges); per-word results are memoized per batch, so the loop runs
  once per word TYPE per batch, not per occurrence. No shuffle at all
  — encoding is embarrassingly parallel.

Determinism: ties in pair frequency break on the LEXICOGRAPHICALLY
SMALLEST ``(left, right)`` pair — pinned so two engines (or two runs on
different partitionings) produce the identical merge list; the
word-count aggregate is integer, so no float order sensitivity exists
anywhere in training.

Word model: whitespace tokens, each suffixed with the end-of-word
marker ``</w>`` as its final symbol (the original Sennrich
formulation), merges never cross word boundaries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokenize

__all__ = ["train_bpe", "bpe_encode", "bpe_vocab"]

_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: its characters, with the
    end-of-word marker fused onto the last character (Sennrich's
    formulation — so 'low' -> ('l','o','w</w>') and word-final units
    are distinct types from word-internal ones)."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + _EOW
    return tuple(chars)


def _train_merges(word_counts: list[tuple[str, int]], num_merges: int,
                  min_pair_count: int) -> list[tuple[str, str]]:
    """The sequential merge loop over the word-type table (driver-side
    by design — see module docstring). Incremental update: after
    merging pair p, only words whose symbol sequence contained p are
    re-counted."""
    words = {}
    for w, c in word_counts:
        sym = _word_symbols(w)
        if sym:
            words[sym] = words.get(sym, 0) + c

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for sym, c in words.items():
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(sym)

    def _apply(sym: tuple[str, ...], pair: tuple[str, str],
               fused: str) -> tuple[str, ...]:
        out = []
        i = 0
        while i < len(sym):
            if (i + 1 < len(sym) and sym[i] == pair[0]
                    and sym[i + 1] == pair[1]):
                out.append(fused)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        return tuple(out)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c < min_pair_count:
                continue
            if best is None or c > best[1] or (c == best[1]
                                               and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        fused = pair[0] + pair[1]
        merges.append(pair)

        affected = pair_words.pop(pair, set())
        pair_counts.pop(pair, None)
        for sym in affected:
            c = words.pop(sym, 0)
            if c == 0:
                continue
            for p in zip(sym, sym[1:]):
                n = pair_counts.get(p)
                if n is not None:
                    n -= c
                    if n <= 0:
                        pair_counts.pop(p, None)
                    else:
                        pair_counts[p] = n
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(sym)
                    if not ws:
                        pair_words.pop(p, None)
            new = _apply(sym, pair, fused)
            words[new] = words.get(new, 0) + c
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(new)
    return merges


def train_bpe(df: DataFrame, text_col: str, num_merges: int,
              min_pair_count: int = 2,
              max_word_types: int = 2_000_000) -> DataFrame:
    """Learn a BPE merge table from a corpus.

    Returns a DataFrame ``(rank, left, right)`` — merge ``rank`` fuses
    adjacent symbols ``left`` + ``right``, ranks apply in order.
    Persist it like any dimension table; it IS the tokenizer.

    ``max_word_types`` bounds the driver-side type table (the corpus
    itself never leaves the cluster — only distinct words and their
    counts). Raising it trades driver memory for vocabulary coverage;
    web-scale corpora typically pre-filter singleton misspellings by
    frequency instead, which the word-count aggregate makes a trivial
    ``HAVING`` clause upstream.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    wc = (df.select(F.explode(tokenize(text_col)).alias("w"))
          .groupBy("w").agg(F.count("*").alias("c"))
          .orderBy(F.col("c").desc(), "w")
          .limit(max_word_types)
          .collect())
    merges = _train_merges([(r.w, r.c) for r in wc], num_merges,
                           min_pair_count)
    spark = df.sparkSession
    schema = T.StructType([
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False)])
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], schema)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list:
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(docs: DataFrame, id_col: str, text_col: str,
               merges: DataFrame) -> DataFrame:
    """Encode each document with a trained merge table.

    Returns ``(id, n_words, n_tokens, tokens)`` where ``tokens`` is the
    subword array (end-of-word markers kept, so
    ``concat(tokens) == concat(words + '</w>')`` — the lossless
    property the tests pin). Applies merges in rank order per word
    (lowest-rank applicable merge first — the standard BPE inference
    rule, which reproduces the training segmentation exactly).

    One mapInPandas scan; the merge table is collected once (it is
    model-sized, not corpus-sized) and shipped to executors inside the
    closure like any broadcast dimension.
    """
    ranks = {(r.left, r.right): r.rank for r in merges.collect()}
    out_schema = T.StructType([
        T.StructField("_id", T.LongType(), True),
        T.StructField("n_words", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("tokens", T.ArrayType(T.StringType()), True)])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, list] = {}
            ids, nw, nt, toks = [], [], [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                words = [w for w in (text or "").split(" ") if w]
                enc: list[str] = []
                for w in words:
                    t = memo.get(w)
                    if t is None:
                        t = _encode_word(w, ranks)
                        memo[w] = t
                    enc.extend(t)
                ids.append(did)
                nw.append(len(words))
                nt.append(len(enc))
                toks.append(enc)
            yield pd.DataFrame({"_id": ids, "n_words": nw,
                                "n_tokens": nt, "tokens": toks})

    src = docs.select(F.col(id_col).cast("long").alias("_id"),
                      F.col(text_col).alias("_text"))
    return (src.mapInPandas(_run, out_schema)
            .select(F.col("_id").alias(id_col), "n_words", "n_tokens",
                    "tokens"))


def bpe_vocab(merges: DataFrame, corpus: DataFrame,
              text_col: str) -> DataFrame:
    """The realized subword vocabulary of ``corpus`` under ``merges``:
    one row per distinct subword with its occurrence count — the table
    a sampling/packing stage sizes embeddings and budgets from. One
    encode scan + one vocabulary-bounded aggregate."""
    enc = bpe_encode(corpus.select(F.monotonically_increasing_id()
                                   .alias("_rid"),
                                   F.col(text_col)),
                     "_rid", text_col, merges)
    return (enc.select(F.explode("tokens").alias("token"))
            .groupBy("token").agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "token"))
