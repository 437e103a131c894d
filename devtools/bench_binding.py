#!/usr/bin/env python
"""Evidence bench for the r18 §1.2 column-binding family
(q14/q17/q27/q42-q45): measure the exact-Jaccard verify pass over a
SYNTHETIC LONG-DOCUMENT corpus, bound (the committed `_exact_jaccard`
shape: token and shingle arrays bound to named columns across stacked
projections) vs inline (the pre-r18 shape: `array_intersect` /
`array_union` each re-evaluate the whole tokenize->ngrams->distinct
chain per reference — four shinglings per pair row where two suffice).

The fixture corpora carry ~40-token documents, where the win is below
box noise; the binding was kept for its measured per-row win at the
document lengths real pipelines carry. This bench pins that claim:

    python devtools/bench_binding.py [--tokens 200] [--pairs 20000] [--n 3]

Results land in BASELINE.md ("§1.2 binding evidence").
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datasketches_spark_spark.sources import session_builder  # noqa: E402


def main() -> None:
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            return int(args[args.index(name) + 1])
        return default

    tokens = opt("--tokens", 200)
    pairs = opt("--pairs", 20_000)
    n_runs = opt("--n", 3)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (session_builder(master=f"local[{cpus}]",
                             shuffle_partitions=cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Deterministic synthetic pair rows: each side is `tokens` words
    # drawn from a ~1000-word vocabulary by a hash mix of (pair, side,
    # position); side b shares every even-position word with side a, so
    # Jaccard is non-trivial.
    def text(side_expr: str) -> str:
        word = (f"concat('w', pmod(xxhash64(id * 7 + ({side_expr}) * 3"
                " + pos * 11), 1000))")
        return (f"array_join(transform(sequence(1, {tokens}), pos -> "
                + word + "), ' ')")

    corpus = spark.range(pairs).select(
        F.col("id").alias("pair_id"),
        F.expr(text("0")).alias("text_a"),
        F.expr(text("CASE WHEN pos % 2 = 0 THEN 0 ELSE 1 END"))
         .alias("text_b"),
    ).localCheckpoint()

    from datasketches_spark_spark.functions.text import (
        token_shingles, tokenize)
    from datasketches_spark_spark.operators.dedup import _exact_jaccard

    def bound():
        return _exact_jaccard(corpus, ["pair_id"], "text_a", "text_b", 3)

    def inline():
        # the pre-r18 shape: shingle chains referenced twice each
        sa = token_shingles(tokenize(F.col("text_a")), 3)
        sb = token_shingles(tokenize(F.col("text_b")), 3)
        jac = (F.size(F.array_intersect(sa, sb)).cast("double")
               / F.size(F.array_union(sa, sb)).cast("double"))
        return corpus.select("pair_id", jac.alias("jaccard"))

    out = {}
    for name, fn in (("bound", bound), ("inline", inline)):
        best = None
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = best
        print(f"{name}: best {best:.3f}s  runs {runs}", flush=True)
    # sanity: identical values
    a = bound().orderBy("pair_id").limit(5).collect()
    b = inline().orderBy("pair_id").limit(5).collect()
    assert [r.jaccard for r in a] == [r.jaccard for r in b], "value drift"
    print(f"tokens={tokens} pairs={pairs}: bound {out['bound']:.3f}s, "
          f"inline {out['inline']:.3f}s "
          f"({out['inline'] / out['bound']:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
