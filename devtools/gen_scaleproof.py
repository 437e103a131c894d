#!/usr/bin/env python
"""Generate scale-proof fixtures for the quadratic-risk operators.

The driver fixtures stop at sf0.1 (5k documents / 2k embeddings), which
cannot demonstrate how the pair-generation operators GROW. This tool
writes two fixture sets from ONE generator with identical distributions
— x1 (the sf0.1 shape) and x10 (the sf1 shape: 50k docs / 20k vectors)
— under ``.scaleproof/`` so `devtools/scaleproof.py` can show that
candidate counts and shuffle volumes scale ~linearly (a quadratic
operator would grow ~100x between the two points).

Distributions are fitted to the real sf0.1 tables (vocabulary + word
frequencies + document lengths + lang/source mixes; embedding dim +
label mix + per-label centers), with a constant 3% planted near-dup
rate at both scales. Deterministic (seeded per scale). Writes ONLY
inside the repo (.scaleproof is gitignored).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scaleproof")

NEAR_DUP_RATE = 0.03
MUTATE_FRAC = 0.10  # tokens replaced in a planted near-dup


def fit_documents():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    vocab = Counter()
    lengths = []
    langs = Counter()
    sources = Counter()
    for text, lang, source in rows:
        toks = text.split()
        vocab.update(toks)
        lengths.append(len(toks))
        langs[lang] += 1
        sources[source] += 1
    words = np.array(list(vocab))
    wp = np.array([vocab[w] for w in words], float)
    wp /= wp.sum()
    return words, wp, np.array(lengths), langs, sources


def gen_documents(n, words, wp, lengths, langs, sources, seed):
    rng = np.random.default_rng(seed)
    lang_v = np.array(list(langs))
    lang_p = np.array([langs[v] for v in lang_v], float)
    lang_p /= lang_p.sum()
    src_v = np.array(list(sources))
    src_p = np.array([sources[v] for v in src_v], float)
    src_p /= src_p.sum()
    texts: list[str] = []
    for i in range(n):
        if texts and rng.random() < NEAR_DUP_RATE:
            base = texts[rng.integers(0, len(texts))].split()
            k = max(1, int(len(base) * MUTATE_FRAC))
            pos = rng.choice(len(base), size=min(k, len(base)),
                             replace=False)
            repl = rng.choice(words, size=len(pos), p=wp)
            toks = list(base)
            for p, r in zip(pos, repl):
                toks[p] = str(r)
            texts.append(" ".join(toks))
        else:
            ln = int(rng.choice(lengths))
            texts.append(" ".join(rng.choice(words, size=ln, p=wp)))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(lang_v, size=n, p=lang_p)),
        "source": pa.array(rng.choice(src_v, size=n, p=src_p)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    return tbl


def fit_embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    labels = np.array([r[1] for r in rows])
    vecs = np.array([r[0] for r in rows], np.float32)
    dim = vecs.shape[1]
    centers = {}
    spreads = {}
    for lb in np.unique(labels):
        m = vecs[labels == lb]
        centers[int(lb)] = m.mean(axis=0)
        spreads[int(lb)] = m.std(axis=0).mean()
    lp = Counter(int(x) for x in labels)
    return dim, centers, spreads, lp


def gen_embeddings(m, dim, centers, spreads, lp, seed):
    rng = np.random.default_rng(seed)
    lb_v = np.array(list(lp))
    lb_p = np.array([lp[v] for v in lb_v], float)
    lb_p /= lb_p.sum()
    out = np.empty((m, dim), np.float32)
    labels = rng.choice(lb_v, size=m, p=lb_p)
    for i in range(m):
        if i and rng.random() < NEAR_DUP_RATE:
            j = rng.integers(0, i)
            out[i] = out[j] + rng.normal(0, 1e-3, dim).astype(np.float32)
            labels[i] = labels[j]
        else:
            lb = int(labels[i])
            out[i] = (centers[lb]
                      + rng.normal(0, spreads[lb], dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(m), pa.int64()),
        "embedding": pa.array(list(out), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    return tbl


def main():
    words, wp, lengths, langs, sources = fit_documents()
    dim, centers, spreads, lp = fit_embeddings()
    for tag, n_docs, n_vecs, seed in [("x1", 5_000, 2_000, 101),
                                      ("x10", 50_000, 20_000, 202)]:
        d = os.path.join(OUT, tag)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            gen_documents(n_docs, words, wp, lengths, langs, sources, seed),
            os.path.join(d, "documents.parquet"))
        pq.write_table(
            gen_embeddings(n_vecs, dim, centers, spreads, lp, seed + 1),
            os.path.join(d, "embeddings.parquet"))
        print(f"wrote {d}: {n_docs} docs, {n_vecs} embeddings")


if __name__ == "__main__":
    sys.exit(main())
