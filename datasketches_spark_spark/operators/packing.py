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

  1. range-repartition by id and sort within partitions (the shuffle a
     global order needs anyway — Spark's own orderBy physics);
  2. per-partition token totals -> one driver collect BOUNDED BY THE
     PARTITION COUNT (not the data) -> cumulative partition offsets;
  3. one ``mapInPandas`` pass: local cumsum + broadcast offset gives
     every document its global [start, end) span; the chunk overlap
     expansion is vectorized numpy (repeat/cumsum), emitting
     ~n_docs + n_cut_crossings rows.

Deterministic by construction (the id order IS the corpus order), so
the output is exactly reproducible — and exactly recomputable by a SQL
oracle with a window cumsum at test scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["pack_sequences"]


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
    """
    if tokens_per_seq <= 0:
        raise ValueError("tokens_per_seq must be positive")
    s = int(tokens_per_seq)
    src = (docs.select(F.col(id_col).alias("_id"),
                       F.col(count_col).cast("long").alias("_n"))
           .where(F.col("_n") > 0))
    if num_partitions:
        src = src.repartitionByRange(num_partitions, "_id")
    else:
        src = src.repartitionByRange("_id")
    src = src.sortWithinPartitions("_id").withColumn(
        "_pid", F.spark_partition_id())
    # Pin the partitioning: the totals collect (job 1) and the expand
    # mapInPandas (job 2) MUST see the SAME range boundaries. Without
    # this, each job re-executes repartitionByRange, whose
    # RangePartitioner re-samples per job (reservoir seeded from the
    # fresh RDD id) — when an upstream partition holds more rows than
    # sampleSizePerPartition the two jobs can draw different boundaries,
    # shifting boundary docs across partitions and corrupting every
    # downstream offset while preserving row counts. localCheckpoint
    # materializes the partitioned frame once; both jobs read it. The
    # checkpointed frame is O(rows × 24 B) — the (id, n, pid) plan rows,
    # never tokens — so this holds at corpus scale.
    src = src.localCheckpoint(eager=True)

    # phase 1: per-partition totals; driver state is O(partitions)
    totals = (src.groupBy("_pid")
              .agg(F.sum("_n").alias("tot"), F.min("_id").alias("lo"))
              .collect())
    offsets = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r.lo):
        offsets[r._pid] = acc
        acc += r.tot

    id_type = src.schema["_id"].dataType
    out_schema = StructType([
        StructField("doc_id", id_type),
        StructField("seq_id", LongType()),
        StructField("piece_start", LongType()),
        StructField("piece_end", LongType()),
        StructField("seq_offset", LongType()),
    ])

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one partition = one contiguous id range; batches arrive sorted
        carry = None  # running local token offset across Arrow batches
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is None:
                carry = int(offsets.get(int(pdf["_pid"].iloc[0]), 0))
            n = pdf["_n"].to_numpy(np.int64)
            ends = np.cumsum(n) + carry
            g = ends - n                     # global start per doc
            carry = int(ends[-1])
            first = g // s
            last = (ends - 1) // s
            cnt = (last - first + 1).astype(np.int64)
            rep = np.repeat(np.arange(len(n)), cnt)
            # position of each emitted row within its doc's chunk run
            run0 = np.cumsum(cnt) - cnt
            pos = np.arange(int(cnt.sum()), dtype=np.int64) - run0[rep]
            seq = first[rep] + pos
            gdoc = g[rep]
            ndoc = n[rep]
            p_start = np.maximum(0, seq * s - gdoc)
            p_end = np.minimum(ndoc, (seq + 1) * s - gdoc)
            yield pd.DataFrame({
                "doc_id": pdf["_id"].to_numpy()[rep],
                "seq_id": seq,
                "piece_start": p_start,
                "piece_end": p_end,
                "seq_offset": np.maximum(0, gdoc - seq * s),
            })

    return src.mapInPandas(expand, out_schema)
