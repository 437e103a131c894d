"""Sequence packing — the concat-and-chunk training-data layout.

GPT-style pretraining packs the corpus into fixed-length token
sequences: concatenate documents in a deterministic order, then cut the
token stream every ``tokens_per_seq`` tokens; a document overlapping a
cut contributes a piece to each side. :func:`pack_sequences` computes
that assignment as a PLAN — one row per (document, sequence) overlap
with the in-document token span — without materializing tokens, so the
expensive tokenize-and-write stage can run embarrassingly parallel
downstream with every worker knowing exactly where its pieces land.

Scale shape (the whole point): the global token offset of every
document is a prefix sum over the corpus order. A bare Spark window
``sum() OVER (ORDER BY id)`` has no PARTITION BY, so Catalyst plans a
SINGLE-partition sort — the classic scale trap. This operator runs the
canonical two-phase distributed prefix sum instead:

  1. split the id domain into explicit range buckets whose boundary
     VALUES are computed once on the driver (``approxQuantile``) and
     embedded as literals — bucket assignment is therefore a PURE
     FUNCTION of the id, so every job and every re-execution of the
     plan agrees on it by construction (no reliance on Spark's
     RangePartitioner, whose per-job boundary re-sampling corrupted
     cross-job offsets in an earlier design);
  2. per-bucket token totals -> one driver collect BOUNDED BY THE
     BUCKET COUNT (not the data) -> cumulative bucket offsets joined
     back via ``F.broadcast``;
  3. within-bucket exclusive prefix sum with a PARTITIONED window
     (each bucket is one window partition — parallel, never global),
     then the chunk-overlap expansion as pure JVM ``sequence`` +
     ``explode`` — zero Python in the row path, whole-stage codegen
     end to end.

Deterministic by construction (the id order IS the corpus order, and
no step depends on physical layout), so the output is exactly
reproducible — and exactly recomputable by a SQL oracle with a window
cumsum at test scale. Boundary quality only affects load balance,
never values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "read_training_shards", "write_training_shards"]


def pack_sequences(docs: DataFrame, tokens_per_seq: int,
                   id_col: str = "doc_id", count_col: str = "n_tokens",
                   num_partitions: int | None = None) -> DataFrame:
    """Pack documents (``id_col`` order, ``count_col`` tokens each) into
    fixed-size sequences of ``tokens_per_seq`` tokens. Returns one row
    per (document, sequence) overlap::

        (doc_id, seq_id, piece_start, piece_end, seq_offset)

    where ``[piece_start, piece_end)`` is the in-document token span of
    the piece and ``seq_offset`` is where the piece begins inside the
    sequence. Zero-token documents are dropped (they occupy no span).
    Ids must be unique (they define the corpus order). ``num_partitions``
    sets the bucket count for the distributed prefix sum (default: the
    session's shuffle parallelism); it affects balance only — the
    output is invariant to it.
    """
    if tokens_per_seq <= 0:
        raise ValueError("tokens_per_seq must be positive")
    s = int(tokens_per_seq)
    spark = docs.sparkSession
    src = (docs.select(F.col(id_col).alias("_id"),
                       F.col(count_col).cast("long").alias("_n"))
           .where(F.col("_n") > 0))

    # phase 1: explicit, literal bucket boundaries — computed ONCE on
    # the driver, then a pure function of _id. approxQuantile is itself
    # sampled, but it runs exactly once per call; whatever boundaries it
    # returns are frozen as literals, so the totals job and the expand
    # job can never disagree (the failure mode of per-job
    # RangePartitioner re-sampling). Non-numeric ids fall back to a
    # single bucket (correct, serial prefix — numeric ids are the
    # corpus-scale contract).
    if num_partitions:
        nb = int(num_partitions)
    else:
        nb = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    bounds: list[float] = []
    if nb > 1:
        try:
            qs = src.stat.approxQuantile(
                "_id", [i / nb for i in range(1, nb)], 1.0 / (4 * nb))
            bounds = sorted(set(float(b) for b in qs))
        except Exception:
            bounds = []
    if bounds:
        bucket = F.aggregate(
            F.lit(bounds), F.lit(0),
            lambda acc, b: acc + F.when(F.col("_id") > b, 1).otherwise(0))
    else:
        bucket = F.lit(0)
    src = src.withColumn("_b", bucket)

    # phase 2: per-bucket totals; driver state is O(buckets)
    totals = src.groupBy("_b").agg(F.sum("_n").alias("tot")).collect()
    acc = 0
    off_rows = []
    for r in sorted(totals, key=lambda r: r._b):
        off_rows.append((int(r._b), acc))
        acc += int(r.tot)
    if not off_rows:
        off_rows = [(0, 0)]
    off = spark.createDataFrame(off_rows, "_b int, _off long")

    # phase 3: within-bucket exclusive prefix sum (partitioned window —
    # one bucket per window partition, parallel) + broadcast offset
    # gives every document its global start _g; the overlap expansion
    # is JVM sequence/explode with exact integer DIV arithmetic.
    w = (Window.partitionBy("_b").orderBy("_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    g = (F.coalesce(F.sum("_n").over(w), F.lit(0)) + F.col("_off"))
    expanded = (src.join(F.broadcast(off), "_b")
                .withColumn("_g", g)
                .withColumn("seq_id", F.explode(F.sequence(
                    F.expr(f"_g DIV {s}"),
                    F.expr(f"(_g + _n - 1) DIV {s}")))))
    return expanded.select(
        F.col("_id").alias("doc_id"),
        F.col("seq_id").cast("long").alias("seq_id"),
        F.greatest(F.lit(0).cast("long"),
                   F.col("seq_id") * s - F.col("_g"))
        .cast("long").alias("piece_start"),
        F.least(F.col("_n"), (F.col("seq_id") + 1) * s - F.col("_g"))
        .cast("long").alias("piece_end"),
        F.greatest(F.lit(0).cast("long"),
                   F.col("_g") - F.col("seq_id") * s)
        .cast("long").alias("seq_offset"))


def write_training_shards(docs: DataFrame, path: str,
                          tokens_per_seq: int, seqs_per_shard: int,
                          id_col: str = "doc_id",
                          count_col: str = "n_tokens",
                          num_partitions: int | None = None) -> None:
    """The training-data SINK: pack the corpus into fixed-length
    sequences (`pack_sequences`), assign sequences to shards of
    ``seqs_per_shard`` (shard = ``seq_id DIV seqs_per_shard`` — pure
    arithmetic on the layout-proof packing, so the shard layout is as
    deterministic as the packing itself), and write:

    - ``shards/`` — the piece table parquet partitioned by ``shard_id``
      (one co-located, right-sized file set per shard directory: the
      downstream tokenize-and-train reader consumes shards
      embarrassingly parallel, each knowing exactly which doc spans at
      which sequence offsets it needs);
    - ``manifest/`` — one row per shard (sequence/piece/token counts,
      doc-id range) — the bookkeeping a training launcher reads
      INSTEAD of listing data files.

    Scale shape: everything is the `pack_sequences` plan plus one
    arithmetic column and a bucket repartition before the write; the
    manifest is a shard-dimension aggregate of the piece table.
    """
    if seqs_per_shard <= 0:
        raise ValueError("seqs_per_shard must be positive")
    packed = pack_sequences(docs, tokens_per_seq, id_col=id_col,
                            count_col=count_col,
                            num_partitions=num_partitions)
    # pack_sequences always emits the id as 'doc_id'; carry the caller's
    # name through the shard files and the manifest aggregate below.
    if id_col != "doc_id":
        packed = packed.withColumnRenamed("doc_id", id_col)
    sh = packed.withColumn(
        "shard_id", (F.col("seq_id") / seqs_per_shard)
        .cast("long"))
    sh.repartition("shard_id").write.mode("overwrite") \
        .partitionBy("shard_id").parquet(path + "/shards")
    man = (docs.sparkSession.read.parquet(path + "/shards")
           .groupBy("shard_id")
           .agg(F.countDistinct("seq_id").alias("n_seqs"),
                F.count("*").alias("n_pieces"),
                F.sum(F.col("piece_end") - F.col("piece_start"))
                .alias("n_tokens"),
                F.min(id_col).alias("min_doc"),
                F.max(id_col).alias("max_doc")))
    man.repartition(1).write.mode("overwrite") \
        .parquet(path + "/manifest")


def read_training_shards(spark, path: str,
                         shard_ids=None) -> DataFrame:
    """Read back shard piece tables; with ``shard_ids`` the scan prunes
    to those shard directories (PartitionFilters — a resumed or
    distributed-across-jobs training run reads only its assignment)."""
    df = spark.read.parquet(path + "/shards")
    if shard_ids is not None:
        df = df.where(F.col("shard_id").isin(list(shard_ids)))
    return df
