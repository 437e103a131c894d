"""Deterministic global shuffle — the training-order primitive: every
epoch needs a reproducible pseudo-random permutation of the corpus that
two independent runs (or engines) agree on exactly, without a
single-partition global sort bottleneck.

Design (the 100 TB shape, same physics as ``packing.pack_sequences``):

* the permutation key is ``md5(id || ':' || seed)`` — an engine-portable
  string both Spark and any SQL engine order identically byte-wise (an
  oracle replays the whole permutation with one ``row_number()``);
* the global position decomposes as ``offset(bucket) + rank within
  bucket``: the bucket is the key's FIRST TWO HEX CHARS (256 uniform
  buckets, a pure function of the row — layout-proof by construction),
  per-bucket counts are one map-side-combined aggregate, the 256
  offsets cumsum on the driver (O(buckets), not O(rows)) and broadcast
  back, and the within-bucket rank is an ordinary partitioned window —
  no global window, no single-partition exchange anywhere;
* ties cannot exist (``id`` is appended to the window order), so the
  permutation is total and stable under any partitioning.

``epoch_seed`` folds the epoch number into the seed, so epoch E's order
is ``global_shuffle(df, id, seed=epoch_seed(base, E))`` — reshuffling
between epochs is a new key, never a reshuffle of stored data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_shuffle", "epoch_seed"]


def epoch_seed(base_seed: int, epoch: int) -> int:
    """A distinct deterministic seed per epoch (simple affine fold —
    the md5 key does the mixing)."""
    return int(base_seed) * 1_000_003 + int(epoch)


def global_shuffle(df: DataFrame, id_col: str,
                   seed: int = 0,
                   pos_col: str = "shuffle_pos") -> DataFrame:
    """Append ``pos_col``: this row's 0-based position in the
    deterministic pseudo-random permutation keyed by
    ``md5(id || ':' || seed)``. Exactly the positions
    ``0 .. count-1``, reproducible across runs, partitionings, and
    engines (the DuckDB oracle replays it with one ``row_number()``).

    Rows with a null id are excluded (a permutation needs a total key).
    """
    skey = F.md5(F.concat(F.col(id_col).cast("string"),
                          F.lit(f":{int(seed)}")))
    base = (df.where(F.col(id_col).isNotNull())
            .withColumn("_sk", skey)
            .withColumn("_bk", F.substring(F.col("_sk"), 1, 2)))
    counts = base.groupBy("_bk").agg(F.count("*").alias("_n"))
    rows = sorted((r._bk, r._n) for r in counts.collect())  # <= 256
    offsets, acc = [], 0
    for bk, n in rows:
        offsets.append((bk, acc))
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_bk string, _off long")
    w = Window.partitionBy("_bk").orderBy(F.col("_sk"), F.col(id_col))
    return (base.join(F.broadcast(off_df), "_bk")
            .withColumn(pos_col,
                        (F.col("_off") + F.row_number().over(w) - 1)
                        .cast("long"))
            .drop("_sk", "_bk", "_off"))
