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


# ------------------------------------------------------ Z-order layout

def zorder_key(cols, bits: int = 21):
    """Bit-interleaved Z-order (Morton) key over 2-3 integer columns —
    the multi-dimensional DATA-LAYOUT primitive (the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` idea, public: Morton 1966; Delta Lake docs):
    sorting/range-partitioning by this key co-locates rows that are
    close in EVERY dimension, so parquet min/max stats prune scans
    filtered on ANY of the dimensions, not just the leading sort key.
    At 100 TB this is the difference between "predicate on the second
    column reads the whole table" and "reads ~sqrt of it".

    ``cols``: 2 or 3 integer Columns/names. Each value is clamped to
    ``[0, 2^bits)`` (callers bucket/rank skewed or signed dimensions
    first — raw interleave is only as balanced as its inputs);
    ``bits`` defaults to the max that fits a signed long (21 for 3
    dims; up to 31 for 2). Pure Column bit arithmetic (shift/and/or
    terms, whole-stage codegen) — an independent SQL engine replays
    the key with the same formula, which the demo gate does."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cols)
    if n not in (2, 3):
        raise ValueError("zorder_key interleaves 2 or 3 columns")
    if not (1 <= bits * n <= 63):
        raise ValueError(f"bits*dims must fit a signed long "
                         f"(got {bits}*{n})")
    hi = (1 << bits) - 1
    clamped = [F.greatest(F.lit(0),
                          F.least(c.cast("long"), F.lit(hi)))
               for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(clamped):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)),
                            b * n + i))
    return out


def zorder_layout(df: DataFrame, cols, bits: int = 21,
                  num_files: int | None = None) -> DataFrame:
    """Lay a DataFrame out in Z-order: range-partition by
    :func:`zorder_key` (one exchange — the layout pass IS the
    shuffle, paid once at write time) and sort within partitions, so
    a subsequent ``.write.parquet`` produces files whose min/max
    column stats are tight on EVERY interleaved dimension. Read-side
    filter pruning then works for any of the dimensions. Pass
    ``num_files`` to fix the output file count (defaults to the
    session shuffle parallelism)."""
    key = zorder_key(cols, bits).alias("_zkey")
    out = df.withColumn("_zkey", key)
    parts = [num_files] if num_files else []
    return (out.repartitionByRange(*parts, F.col("_zkey"))
            .sortWithinPartitions("_zkey")
            .drop("_zkey"))
