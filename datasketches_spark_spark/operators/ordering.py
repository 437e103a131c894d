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

__all__ = ["global_shuffle", "epoch_seed", "zorder_key",
           "zorder_layout", "quantile_boundaries",
           "quantile_bucket", "quantile_range_layout",
           "hot_keys_from_state", "skew_salt"]


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


# ------------------------------------------- sketch-driven layout (r16)

def quantile_boundaries(state: bytes, num_buckets: int) -> list[float]:
    """Equi-depth split points from a PERSISTED quantile state —
    ``num_buckets - 1`` interior boundaries at ranks i/num_buckets.
    Accepts engine wire bytes OR foreign Apache DataSketches
    KLL/REQ/Doubles images (the ``deserialize_quantile`` fallback).
    Driver-side and O(state): this is how yesterday's rollup state
    sizes today's shuffle — Spark's ``repartitionByRange`` re-SAMPLES
    the input on every write, a full extra scan-and-collect at 100 TB;
    a kilobyte state answers the same question for free."""
    from ..sketches import deserialize_quantile
    if num_buckets < 2:
        raise ValueError("num_buckets must be >= 2")
    sk = deserialize_quantile(bytes(state))
    qs = sk.quantiles([i / num_buckets for i in range(1, num_buckets)])
    if qs is None:
        raise ValueError("empty quantile state has no boundaries")
    return [float(q) for q in qs]


_BUCKET_WHEN_CHAIN_MAX = 128


def quantile_bucket(col, boundaries) -> "F.Column":
    """Equi-depth bucket id (0..len(boundaries)) for a value against
    :func:`quantile_boundaries` splits: the count of boundaries the
    value exceeds. Pure Column arithmetic (whole-stage codegen,
    scan-stage — no shuffle, no UDF); an independent SQL engine
    replays it as a CASE-sum over the same literals.

    Two physical forms with identical semantics: up to
    ``_BUCKET_WHEN_CHAIN_MAX`` boundaries a CASE-sum chain (the
    codegen-friendliest shape at layout-realistic bucket counts);
    above that a FLAT literal array + higher-order ``filter`` +
    ``size`` — the chained sum nests one Add node per boundary and
    blows Catalyst's expression-tree depth / 64 KB codegen-method
    limits in the thousands, while an array literal is breadth, not
    depth (tested at 4096 buckets)."""
    c = F.col(col) if isinstance(col, str) else col
    if len(boundaries) <= _BUCKET_WHEN_CHAIN_MAX:
        total = F.lit(0)
        for b in boundaries:
            total = total + F.when(c > F.lit(float(b)), 1).otherwise(0)
        return total.cast("int")
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda x: c > x)).cast("int")


def quantile_range_layout(df: DataFrame, col, state: bytes,
                          num_buckets: int) -> DataFrame:
    """Range-partition ``df`` into ``num_buckets`` equi-DEPTH
    partitions using boundaries decoded from a persisted quantile
    state: one exchange keyed on the scan-stage bucket id, rows
    sorted within partitions — balanced output files without the
    sampling pass ``repartitionByRange`` would run over the new data.
    The bucket column is dropped from the result."""
    bounds = quantile_boundaries(state, num_buckets)
    c = F.col(col) if isinstance(col, str) else col
    out = df.withColumn("_qbucket", quantile_bucket(c, bounds))
    return (out.repartitionByRange(num_buckets, "_qbucket")
            .sortWithinPartitions("_qbucket", c)
            .drop("_qbucket"))


def hot_keys_from_state(state: bytes, min_count: int,
                        max_keys: int = 1024) -> list:
    """Heavy-hitter keys above ``min_count`` from a persisted
    frequent-items state (engine or foreign DataSketches image) —
    the skew list a salting stage needs, O(state) on the driver.
    Uses the sketch's estimate (an upper bound in the purged regime:
    over-selecting a borderline key costs one redundant salt fan-out,
    never a wrong result)."""
    from ..sketches import deserialize_any
    from ..sketches.freq import FreqItemsSketch
    sk = deserialize_any(bytes(state))
    if not isinstance(sk, FreqItemsSketch):
        raise ValueError("not a frequent-items state")
    hot = [item for item, est in sk.frequent_items()
           if est >= min_count]
    return hot[:max_keys]


def skew_salt(key_col, hot_keys, salts: int, salt_from) -> "F.Column":
    """Salt column for two-stage skew-safe aggregation: keys in
    ``hot_keys`` fan out into ``salts`` deterministic subkeys (from
    the row attribute ``salt_from`` — reproducible, oracle-replayable;
    use ``F.spark_partition_id()`` if no attribute fits), cold keys
    keep salt 0. Pattern::

        salt = skew_salt("k", hot, 16, F.col("id"))
        partial = df.groupBy("k", salt.alias("s")).agg(...partial...)
        final   = partial.groupBy("k").agg(...merge...)

    The hot keys' groups shuffle as ``salts`` state-sized rows instead
    of one straggler partition — the standard salting rewrite, driven
    by a persisted freq-items state (:func:`hot_keys_from_state`)
    instead of a guess. At 100 TB the skew list comes from yesterday's
    rollup; no extra pass over today's data."""
    if salts < 1:
        raise ValueError("salts must be >= 1")
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    s = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    if not hot_keys:
        return F.lit(0)
    # NULL salt_from would otherwise yield a NULL salt and split a hot
    # key's null-attribute rows into their own group: coalesce to 0.
    return (F.when(k.isin(list(hot_keys)),
                   F.coalesce(F.pmod(s.cast("long"),
                                     F.lit(salts)).cast("int"),
                              F.lit(0)))
            .otherwise(F.lit(0)))
