"""Similarity search over embedding columns (``array<float>``).

Three operators, one per scale regime:

* ``cosine_topk``      exact brute-force top-k for a SMALL query set: the
                       query matrix rides along as a numpy closure (a
                       broadcast variable in Spark terms), each corpus
                       partition computes a blocked GEMM and emits only its
                       local top-k rows per query, and a final tiny
                       window/row_number pass re-ranks partitions' survivors
                       — the shuffle is (partitions x queries x k) rows, not
                       the corpus.
* ``cosine_pairs``     exact all-pairs above a threshold, as a blocked
                       self-join: the corpus is grouped into blocks of
                       ``block_size`` vectors, block pairs (i <= j) are
                       joined, and one numpy GEMM per block pair emits
                       qualifying pairs. Work is n²/2 — that is what exact
                       demands — but distributed over block pairs with no
                       driver collect and bounded executor memory.
* ``rhp_ann_topk``     approximate: random-hyperplane LSH bucket candidates
                       re-ranked exactly. Sub-linear candidate sets at the
                       cost of recall; the scale path when n² is off the
                       table. Recall is measured in tests, not assumed.

Cosine math is float64 on float32 inputs; outputs expose integer ids/ranks
so results are deterministic under summation-order differences.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64, copy=False)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _id_field(df: DataFrame, col: str) -> StructField:
    return StructField("query_id", df.schema[col].dataType)


def cosine_topk(corpus: DataFrame, queries: list[tuple], k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each (query_id, vector) in
    ``queries`` (a small in-memory list — the ANN baseline's query set).
    Returns ``(query_id, rank, neighbor_id)``; ties break on neighbor id.
    Self-matches (same id) are excluded."""
    if not queries:
        raise ValueError("queries must be non-empty")
    q_ids = np.array([q[0] for q in queries])
    q_mat = _normalize(np.asarray([np.asarray(q[1], dtype=np.float64)
                                   for q in queries]))

    src = corpus.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_v"))
    part_schema = StructType([
        StructField("query_id", src.schema["_nid"].dataType),
        StructField("neighbor_id", src.schema["_nid"].dataType),
        StructField("sim", DoubleType()),
    ])

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, sims_all = [], []
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_nid"].to_numpy()
            mat = _normalize(np.vstack(pdf["_v"].to_numpy()))
            sims_all.append(q_mat @ mat.T)        # (n_q, n_batch)
            ids_all.append(ids)
        if not ids_all:
            return
        sims = np.concatenate(sims_all, axis=1)
        ids = np.concatenate(ids_all)
        keep = min(k + 1, sims.shape[1])          # +1 absorbs a self-match
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], keep - 1)[:keep]
            out_q.extend([q_ids[qi]] * len(idx))
            out_n.extend(ids[idx].tolist())
            out_s.extend(sims[qi][idx].tolist())
        yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                            "sim": out_s})

    local = src.mapInPandas(local_topk, part_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (local.where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def nearest_reference(corpus: DataFrame, reference: DataFrame,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      ref_id_col: str | None = None,
                      max_reference: int = 100_000) -> DataFrame:
    """Top-1 cosine neighbor in a SMALL reference set for EVERY corpus
    row — the embedding-decontamination shape: the benchmark/eval set is
    bounded by definition, so it broadcasts into one mapInPandas GEMM
    pass over the (arbitrarily large) corpus. No shuffle, no self-join;
    corpus cost is one scan regardless of reference size. Returns
    ``(id, ref_id)``; ties break on the smallest reference id.

    ``max_reference`` guards the driver-side collect — decontamination
    against a reference set that doesn't fit one broadcast wants the
    exact n-gram path (`ngram_overlap_flags`) or RHP blocking instead."""
    ref_id_col = ref_id_col or id_col
    rows = reference.select(ref_id_col, vec_col).limit(max_reference + 1) \
        .collect()
    if not rows:
        raise ValueError("reference set is empty")
    if len(rows) > max_reference:
        raise ValueError(
            f"reference set exceeds max_reference={max_reference}; use a "
            "blocked strategy for references this large")
    order = np.argsort(np.array([r[0] for r in rows]))
    rids = np.array([rows[i][0] for i in order])
    rmat = _normalize(np.asarray(
        [np.asarray(rows[i][1], dtype=np.float64) for i in order]))

    src = corpus.select(F.col(id_col).alias("_id"),
                        F.col(vec_col).alias("_v"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("ref_id", src.schema["_id"].dataType),
    ])

    def nearest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize(np.vstack(pdf["_v"].to_numpy()))
            # argmax returns the FIRST max -> smallest ref id on ties
            best = (mat @ rmat.T).argmax(axis=1)
            yield pd.DataFrame({"_id": pdf["_id"].to_numpy(),
                                "ref_id": rids[best]})

    return (src.mapInPandas(nearest, out_schema)
            .withColumnRenamed("_id", id_col))


def rhp_plan(threshold: float, per_pair_miss: float = 1e-9,
             max_tables: int = 64, max_bits: int = 24,
             corpus_size: int | None = None,
             bg_cosine: float = 0.7) -> tuple[int, int]:
    """Auto-tune RHP-LSH banding for an exact-recall-target prefilter.

    For random-hyperplane signatures, a pair at cosine t agrees on one
    bit with probability ``p = 1 - acos(t)/pi`` (Charikar, STOC'02), so
    a b-bit table catches it w.p. ``p^b`` and T tables miss it w.p.
    ``(1 - p^b)^T``. Returns the most selective ``(num_bits,
    num_tables)`` whose miss probability at the CONTRACT threshold is
    <= ``per_pair_miss`` within ``max_tables`` — pairs above the
    threshold are caught with correspondingly higher probability.

    ``corpus_size`` is the scale lever (round-9 scale-proof finding):
    with FIXED bits, BACKGROUND pairs (cosine ~``bg_cosine`` for
    clustered embeddings) collide per table w.p. ``p_bg^bits``, so
    candidate traffic grows ~n^2 * p_bg^bits — measured 36x shuffle at
    10x corpus on the x1/x10 fixtures. Passing n raises the bits floor
    to ``log(n)/log(1/p_bg)`` (expected background collisions per
    vector per table <= 1) and lets the table budget follow, keeping
    candidates ~linear while signature cost grows only with the table
    count (re-measured 36x -> ~linear; see BASELINE.md round 9).

    Raises when no such plan exists: at low thresholds the bit-agreement
    gap over background pairs (p = 0.5 at cosine 0) vanishes, the bits
    budget collapses, and the "prefilter" degenerates to enumerating
    all pairs through a join — strictly worse than the exact blocked
    GEMM. That regime must use ``prefilter=None``."""
    import math
    t = min(max(float(threshold), -1.0), 1.0)
    p_bit = 1.0 - math.acos(t) / math.pi
    if corpus_size and corpus_size > 1 and p_bit < 1.0 \
            and 0.0 < per_pair_miss < 1.0:
        # bits floor for ~linear candidate traffic: expected background
        # collisions per vector per table ~ n * p_bg^bits <= 1. Exactly
        # `need` bits is the sweet spot (more bits only inflate the
        # table count the recall budget demands); degrade toward fewer
        # bits only when recall cannot afford the floor — recall is a
        # correctness contract, linearity a performance one.
        p_bg = 1.0 - math.acos(min(max(bg_cosine, 0.0), 0.999)) / math.pi
        need = math.ceil(math.log(corpus_size) / math.log(1.0 / p_bg))
        cap = max(max_tables, 256)
        for bits in range(min(max(need, 4), 62), 3, -1):
            p_table = p_bit ** bits
            tables = math.ceil(math.log(per_pair_miss)
                               / math.log(1.0 - p_table))
            if tables <= cap:
                return bits, tables
    if 0.0 < per_pair_miss < 1.0 and p_bit < 1.0:
        for bits in range(max_bits, 3, -1):
            p_table = p_bit ** bits
            tables = math.ceil(math.log(per_pair_miss)
                               / math.log(1.0 - p_table))
            if tables <= max_tables:
                return bits, tables
    if p_bit >= 1.0:
        return max_bits, 1  # exact duplicates: any single table catches them
    raise ValueError(
        f"threshold {threshold} is too low for an RHP prefilter: reaching "
        f"per-pair miss <= {per_pair_miss} needs more than {max_tables} "
        "tables even at 4 bits, at which point background pairs collide "
        "almost surely and the candidate set approaches all pairs. Use the "
        "exact blocked path (prefilter=None) for low-threshold pair "
        "enumeration.")


def cosine_pairs(corpus: DataFrame, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 block_size: int = 4096, prefilter: str | None = None,
                 per_pair_miss: float = 1e-9, seed: int = 0xA11CE,
                 max_bucket: int = 4096,
                 corpus_size: int | None = None,
                 bg_cosine: float = 0.7) -> DataFrame:
    """Pairs with cosine >= threshold (id_a < id_b).

    ``prefilter=None`` (default): exact blocked self-join — O(n²/2)
    GEMM work distributed over block pairs, the right contract for LOW
    thresholds where nothing prunes. ``prefilter="rhp"``: banded
    random-hyperplane LSH candidates re-ranked exactly (JVM cosine) —
    the 100-TB path for true near-dup thresholds; ``rhp_plan`` sizes the
    banding so a pair at the contract threshold is missed w.p. <=
    ``per_pair_miss`` (pairs above it far more rarely), and refuses
    thresholds where LSH cannot prune. Candidate buckets larger than
    ``max_bucket`` are dropped (star-expansion guard, as in the MinHash
    dedup operator) — safe for near-dup use because a genuinely huge
    near-identical cluster still pairs up through its other tables."""
    if prefilter == "rhp":
        return _rhp_prefiltered_pairs(corpus, threshold, id_col, vec_col,
                                      per_pair_miss, seed, max_bucket,
                                      corpus_size, bg_cosine)
    if prefilter is not None:
        raise ValueError(f"unknown prefilter {prefilter!r}")
    blocked = (corpus.select(F.col(id_col).alias("_bid"),
                             F.col(vec_col).alias("_v"))
               .withColumn("block", (F.col("_bid") / block_size)
                           .cast("long"))
               .groupBy("block")
               .agg(F.collect_list(F.struct("_bid", "_v")).alias("vs")))
    a = blocked.select(F.col("block").alias("block_a"),
                       F.col("vs").alias("vs_a"))
    b = blocked.select(F.col("block").alias("block_b"),
                       F.col("vs").alias("vs_b"))
    pairs = a.join(b, F.col("block_a") <= F.col("block_b"))

    out_schema = StructType([
        StructField("id_a", corpus.schema[id_col].dataType),
        StructField("id_b", corpus.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def block_gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([r["_bid"] for r in row["vs_a"]])
                mat_a = _normalize(np.vstack([np.asarray(r["_v"])
                                              for r in row["vs_a"]]))
                ids_b = np.array([r["_bid"] for r in row["vs_b"]])
                mat_b = _normalize(np.vstack([np.asarray(r["_v"])
                                              for r in row["vs_b"]]))
                sims = mat_a @ mat_b.T
                ii, jj = np.where(sims >= threshold)
                mask = ids_a[ii] < ids_b[jj]
                ii, jj = ii[mask], jj[mask]
                if len(ii):
                    yield pd.DataFrame({"id_a": ids_a[ii],
                                        "id_b": ids_b[jj],
                                        "cosine": sims[ii, jj]})

    return pairs.mapInPandas(block_gemm, out_schema)


def _rhp_prefiltered_pairs(corpus: DataFrame, threshold: float, id_col: str,
                           vec_col: str, per_pair_miss: float, seed: int,
                           max_bucket: int,
                           corpus_size: int | None = None,
                           bg_cosine: float = 0.7) -> DataFrame:
    """RHP-banded candidates -> exact JVM-cosine re-rank. Same output
    contract as the exact path up to ``per_pair_miss`` recall; work is
    (n x tables) signature rows + bucket-local joins, never a block
    self-join over the corpus.

    Plan notes (kept tight on purpose — this is the hottest similarity
    path): hyperplanes are generated lazily inside the signature UDF from
    the seed, so there is NO driver job to learn the vector dimension and
    no extra corpus scan; the pair dedup is a two-phase aggregate (map-side
    partials inside the explode stage, one exchange); and both re-rank
    joins consume the SAME canonical ``(id, vec)`` projection, so Catalyst
    reuses one corpus subtree instead of planning two differently-aliased
    scans."""
    bits, tables = rhp_plan(threshold, per_pair_miss=per_pair_miss,
                            corpus_size=corpus_size, bg_cosine=bg_cosine)
    # one canonical corpus projection: the signature UDF and BOTH re-rank
    # joins read it, so the (possibly expensive) upstream corpus plan is
    # written once and exchange/scan reuse can kick in
    vp = corpus.select(F.col(id_col).alias("_vid"),
                       F.col(vec_col).cast("array<double>").alias("_vv"))
    # The signature UDF is the compute-heavy stage (tables x bits GEMM
    # per vector) and mapInPandas inherits the SOURCE partitioning — a
    # small-file scan would run it on 1-2 cores while the rest of the
    # cluster idles. Spread it when the upstream is under-partitioned;
    # at real corpus scale the scan already has >= cores partitions and
    # this is a no-op (no exchange added).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if vp.rdd.getNumPartitions() < max(par // 2, 1):
        vp = vp.repartition(par)
    sig = rhp_signatures(vp, num_bits=bits, num_tables=tables,
                         seed=seed, id_col="_vid", vec_col="_vv")
    # One shuffle: group each (table, bucket) and explode its i<j pairs
    # with a pure-JVM nested transform — no self-join, so the signature
    # UDF runs once, and the star-expansion guard is a free size() filter
    # (an over-full near-identical cluster still pairs up via its other
    # tables; max_bucket only bounds the quadratic blowup per bucket).
    buckets = (sig.groupBy("table", "bucket")
               .agg(F.collect_list("_id").alias("ids"))
               .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket)))
    pair_expr = F.flatten(F.expr(
        "transform(ids, (x, i) -> "
        "  transform(slice(ids, i + 2, size(ids)), y -> "
        "    struct(least(x, y) AS id_a, greatest(x, y) AS id_b)))"))
    # .distinct() here IS the fused dedup: Catalyst plans it as a partial
    # HashAggregate in the SAME stage as the explode (each pair crosses the
    # wire once per map partition, not once per colliding table) + one
    # merge exchange — see docs/PLANS.md q18
    cand = (buckets.select(F.explode(pair_expr).alias("p"))
            .select("p.id_a", "p.id_b").distinct())
    scored = (cand
              .join(vp.alias("va"), F.col("id_a") == F.col("va._vid"))
              .join(vp.alias("vb"), F.col("id_b") == F.col("vb._vid"))
              .select("id_a", "id_b",
                      F.col("va._vv").alias("_va"),
                      F.col("vb._vv").alias("_vb")))
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("_va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("_vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (scored.select("id_a", "id_b",
                          (dot / (na * nb)).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def ivf_assign(corpus: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid cell — the IVF
    coarse quantizer. One mapInPandas pass; emits (id, cell)."""
    cmat = _normalize(np.asarray(centroids, dtype=np.float64))
    src = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("cell", IntegerType()),
    ])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize(np.vstack(pdf["_v"].to_numpy()))
            cells = (mat @ cmat.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame({"_id": pdf["_id"].to_numpy(), "cell": cells})

    return src.mapInPandas(assign, out_schema)


def _tag_cells(corpus: DataFrame, cmat: np.ndarray, id_col: str,
               vec_col: str) -> DataFrame:
    """Corpus rows + their IVF ``cell`` in ONE mapInPandas pass.

    r18 (guide §2.4): ``build_ivf_index`` used to run ``ivf_assign``
    and then JOIN the (id, cell) frame back to the corpus on the id —
    at scale that is a full corpus shuffle keyed on the id (the assign
    side is corpus-sized, so it cannot broadcast) plus a second corpus
    scan; at fixture scale it re-executed the Python assign pass
    through both join planning and execution. Tagging in-pass keeps
    every column, adds no shuffle, and assigns each vector exactly
    once. Cell choice is identical to ``ivf_assign`` (argmax = first
    max = smallest cell id on ties)."""
    cols = corpus.columns
    schema = StructType(list(corpus.schema.fields)
                        + [StructField("cell", IntegerType())])

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize(np.vstack(pdf[vec_col].to_numpy()))
            cells = (mat @ cmat.T).argmax(axis=1).astype(np.int32)
            yield pdf.assign(cell=cells)[cols + ["cell"]]

    return corpus.mapInPandas(tag, schema)


def train_ivf_centroids(corpus: DataFrame, num_cells: int = 16,
                        sample_fraction: float = 1.0, iters: int = 10,
                        seed: int = 7, vec_col: str = "embedding",
                        max_train: int = 1_000_000) -> np.ndarray:
    """Spherical k-means on a (sampled) collect of vectors. The training
    sample is deliberately small and driver-side — at 100 TB you train the
    quantizer on a sample, not the corpus; assignment stays fully
    distributed (``ivf_assign``).

    ``max_train`` is an ABSOLUTE row cap on the driver-side collect,
    enforced regardless of ``sample_fraction`` — the default fraction of
    1.0 must never mean "collect 100 TB to the driver". When the cap
    binds, the capped set is a UNIFORM sample: a bare ``limit()`` would
    take the leading partitions (ingest-order / domain-sorted bias —
    k-means centroids trained on one shard of the keyspace), so rows
    above the cap go through a Bernoulli pre-pass sized ~1.05x the cap
    and a random-order trim to exactly ``max_train``. Costs one extra
    count() scan of the vector column; training is a one-off."""
    if max_train < num_cells:
        raise ValueError(
            f"max_train={max_train} must be >= num_cells={num_cells}")
    sample = corpus.select(vec_col)
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    n = sample.count()
    if n > max_train:
        frac = min(1.0, 1.05 * max_train / n)
        sample = (sample.sample(fraction=frac, seed=seed)
                  .orderBy(F.rand(seed)).limit(max_train))
    mat = _normalize(np.vstack([np.asarray(r[0]) for r in sample.collect()]))
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(mat.shape[0], size=num_cells, replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(num_cells):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def _probe_rows(queries: list[tuple], cmat: np.ndarray,
                nprobe: int) -> list[tuple]:
    """(query_id, cell, normalized qvec) rows for each query's ``nprobe``
    nearest centroid cells."""
    q_rows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        v = v / (np.linalg.norm(v) or 1.0)
        probes = np.argsort(-(cmat @ v))[:nprobe]
        for c in probes:
            q_rows.append((int(qid), int(c), [float(x) for x in v]))
    return q_rows


def _probe_and_rank(tagged: DataFrame, q_rows: list[tuple], k: int,
                    id_col: str, vec_col: str) -> DataFrame:
    """Score cell-tagged corpus vectors against the (tiny) probe set and
    keep each query's exact top-k within the probed cells.

    r18 (guide §4.2): the probe set is bounded (queries x nprobe rows),
    so it rides the task closure and each partition scores its vectors
    with ONE numpy GEMM + a per-query local top-(k+1) — replacing the
    broadcast join whose per-candidate JVM higher-order-function cosine
    (queries x candidate rows of fold-evaluated zip_with/aggregate) was
    the probe-side dominator. The local cut selects by the SAME
    (sim desc, neighbor id asc) compound order the global window uses,
    so ties at the cut can never change the final top-k; only
    queries x (k+1) rows per partition reach the exchange."""
    qcells: dict[int, set[int]] = {}
    qvecs: dict[int, list[float]] = {}
    for qid, c, v in q_rows:
        qcells.setdefault(int(qid), set()).add(int(c))
        qvecs[int(qid)] = v
    q_ids = np.array(sorted(qcells))
    q_mat = np.asarray([qvecs[int(q)] for q in q_ids],
                       dtype=np.float64)        # pre-normalized rows
    cell_sets = [np.fromiter(sorted(qcells[int(q)]), dtype=np.int64)
                 for q in q_ids]

    src = tagged.select(F.col(id_col).alias("_nid"),
                        F.col(vec_col).alias("_v"),
                        F.col("cell").cast("long").alias("_c"))
    part_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", src.schema["_nid"].dataType),
        StructField("sim", DoubleType()),
    ])

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, cells_all, sims_all = [], [], []
        for pdf in batches:
            if pdf.empty:
                continue
            ids_all.append(pdf["_nid"].to_numpy())
            cells_all.append(pdf["_c"].to_numpy())
            mat = _normalize(np.vstack(pdf["_v"].to_numpy()))
            sims_all.append(q_mat @ mat.T)        # (n_q, n_batch)
        if not ids_all:
            return
        sims = np.concatenate(sims_all, axis=1)
        ids = np.concatenate(ids_all)
        cells = np.concatenate(cells_all)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            m = np.isin(cells, cell_sets[qi])
            if not m.any():
                continue
            s, nid = sims[qi][m], ids[m]
            keep = min(k + 1, len(s))             # +1 absorbs a self-match
            order = np.lexsort((nid, -s))[:keep]  # sim desc, id asc
            out_q.extend([int(q_ids[qi])] * len(order))
            out_n.extend(nid[order].tolist())
            out_s.extend(s[order].tolist())
        if out_q:
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "sim": out_s})

    local = src.mapInPandas(local_topk, part_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (local.where(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def ivf_ann_topk(corpus: DataFrame, queries: list[tuple],
                 centroids: np.ndarray, k: int = 5, nprobe: int = 4,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: each query probes its ``nprobe`` nearest
    cells and scores only vectors assigned there — the candidate scan is
    n * (nprobe / num_cells) instead of n. Exact re-rank inside the probed
    cells; ties break on neighbor id."""
    cmat = _normalize(np.asarray(centroids, dtype=np.float64))
    tagged = _tag_cells(corpus, cmat, id_col, vec_col)
    return _probe_and_rank(tagged, _probe_rows(queries, cmat, nprobe),
                           k, id_col, vec_col)


def build_ivf_index(corpus: DataFrame, path: str, num_cells: int = 16,
                    iters: int = 10, seed: int = 7,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    **train_kw) -> np.ndarray:
    """Materialize an IVF index on disk: train the coarse quantizer, tag
    every vector with its cell, and persist

    * ``<path>/vectors`` — the corpus partitioned BY CELL, so a probe
      reads only its cells' files (static partition pruning), and
    * ``<path>/centroids`` — the tiny (cell, centroid) table.

    Build once, query forever: at 100 TB the corpus assignment pass runs
    a single time, and every later query touches `nprobe/num_cells` of
    the data by FILE layout, not by filter luck. Returns the centroids."""
    cents = train_ivf_centroids(corpus, num_cells=num_cells, iters=iters,
                                seed=seed, vec_col=vec_col, **train_kw)
    tagged = _tag_cells(corpus, _normalize(np.asarray(cents, np.float64)),
                        id_col, vec_col)
    # co-locate rows by cell before the partitioned write: without this,
    # every shuffle partition writes a file into every cell directory
    # (tasks x cells small files); with it, each cell's rows land in a
    # handful of right-sized files — the layout that makes the probe-side
    # file pruning worth having at 100 TB.
    tagged.repartition("cell").write.mode("overwrite") \
        .partitionBy("cell").parquet(path + "/vectors")
    spark = corpus.sparkSession
    # r18: a pandas (Arrow-backed) local relation — writing a
    # pickled-row list relation to parquet paid a ~5 s cold Python
    # deserialization path on this box; the Arrow path writes in ~0.2 s
    cent_pdf = pd.DataFrame({
        "cell": np.arange(len(cents), dtype=np.int32),
        "centroid": [[float(x) for x in c] for c in cents]})
    spark.createDataFrame(cent_pdf).coalesce(1) \
        .write.mode("overwrite").parquet(path + "/centroids")
    return cents


def refresh_ivf_index(new_vectors: DataFrame, path: str,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """Incremental index update: assign ONLY the new vectors against the
    persisted centroids and append them into the cell-partitioned
    layout. The quantizer is not retrained and existing files are not
    touched — the IVF analog of a rollup refresh. Periodic rebuild
    (`build_ivf_index`) re-balances cells when the data distribution
    drifts; until then queries see old and new vectors identically."""
    spark = new_vectors.sparkSession
    cents = load_ivf_centroids(spark, path)
    tagged = _tag_cells(new_vectors,
                        _normalize(np.asarray(cents, np.float64)),
                        id_col, vec_col)
    tagged.repartition("cell").write.mode("append") \
        .partitionBy("cell").parquet(path + "/vectors")


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    """Centroid matrix of a persisted index, ordered by cell id."""
    rows = (spark.read.parquet(path + "/centroids")
            .orderBy("cell").collect())
    return np.asarray([r.centroid for r in rows], dtype=np.float64)


def query_ivf_index(spark, path: str, queries: list[tuple], k: int = 5,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k against a persisted IVF index WITHOUT re-assigning the
    corpus: load the centroids, compute each query's probe cells, and
    scan only those cells' files (``cell IN (...)`` static partition
    pruning on the partitioned layout). Same exact re-rank and tie-break
    as `ivf_ann_topk`."""
    cmat = load_ivf_centroids(spark, path)
    q_rows = _probe_rows(queries, cmat, nprobe)
    needed = sorted({c for _, c, _ in q_rows})
    tagged = (spark.read.parquet(path + "/vectors")
              .where(F.col("cell").isin(needed)))
    return _probe_and_rank(tagged, q_rows, k, id_col, vec_col)


def rhp_signatures(corpus: DataFrame, num_bits: int = 16, num_tables: int = 8,
                   dim: int | None = None, seed: int = 0xA11CE,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: per table, a ``num_bits``-bit signature whose
    bit b is sign(<v, h_b>). Emits (id, table, bucket) rows.

    ``dim=None`` (default) derives the hyperplanes lazily from the first
    batch's vector width INSIDE the UDF — the seeded generator makes every
    task derive identical planes, so no driver job (and no corpus scan) is
    spent learning the dimension up front."""
    src = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("table", IntegerType()),
        StructField("bucket", LongType()),
    ])
    weights = (1 << np.arange(num_bits, dtype=np.int64))

    def make_flat(d: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((num_tables, num_bits, d))
        return planes.reshape(num_tables * num_bits, d)  # one GEMM, all

    flat_fixed = make_flat(dim) if dim is not None else None

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flat = flat_fixed
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy()
            mat = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
            if flat is None:
                flat = make_flat(mat.shape[1])
            bits = ((mat @ flat.T) > 0).astype(np.int64)
            buckets = bits.reshape(len(ids), num_tables, num_bits) @ weights
            yield pd.DataFrame({
                "_id": np.repeat(ids, num_tables),
                "table": np.tile(np.arange(num_tables, dtype=np.int32),
                                 len(ids)),
                "bucket": buckets.reshape(-1)})

    return src.mapInPandas(build, out_schema)


def rhp_ann_topk(corpus: DataFrame, queries: list[tuple], k: int = 5,
                 num_bits: int = 12, num_tables: int = 8, dim: int = 64,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: LSH-bucket candidates (a query only scores corpus
    vectors sharing a bucket in >= 1 table), re-ranked exactly. Returns
    (query_id, rank, neighbor_id); recall < 1 by construction."""
    rng = np.random.default_rng(0xA11CE)
    planes = rng.standard_normal((num_tables, num_bits, dim))
    weights = (1 << np.arange(num_bits, dtype=np.int64))
    sig = rhp_signatures(corpus, num_bits=num_bits, num_tables=num_tables,
                         dim=dim, id_col=id_col, vec_col=vec_col)

    q_rows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float64)
        for t in range(num_tables):
            bucket = int(((v @ planes[t].T) > 0).astype(np.int64) @ weights)
            q_rows.append((qid, t, bucket, [float(x) for x in v]))
    spark = corpus.sparkSession
    from ..sources import arrow_local_df
    qdf = arrow_local_df(
        spark, q_rows,
        "query_id long, table int, bucket long, qvec array<double>")

    cands = (sig.join(F.broadcast(qdf), ["table", "bucket"])
             .where(F.col("_id") != F.col("query_id"))
             .select("query_id", F.col("_id").alias("neighbor_id"), "qvec")
             .distinct())
    nvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("nvec"))
    dot = F.aggregate(
        F.zip_with("qvec", F.col("nvec").cast("array<double>"),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    qn = F.sqrt(F.aggregate("qvec", F.lit(0.0),
                            lambda acc, x: acc + x * x))
    nn = F.sqrt(F.aggregate(F.col("nvec").cast("array<double>"), F.lit(0.0),
                            lambda acc, x: acc + x * x))
    scored = (cands.join(nvec, "neighbor_id")
              .select("query_id", "neighbor_id",
                      (dot / (qn * nn)).alias("sim")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def semantic_dedup_drops(corpus: DataFrame, centroids: DataFrame,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         eps: float = 0.98, round_digits: int = 6,
                         max_centroids: int = 100_000) -> DataFrame:
    """SemDeDup-style cluster-then-dedup (Abbas et al. 2023,
    arXiv:2303.09540) as a DETERMINISTIC relational rule: assign every
    vector to its nearest centroid, then within each cluster drop any
    vector that has an above-``eps`` cosine neighbor of higher keep
    priority. Priority follows the paper's best-performing "keep the
    point farthest from the centroid" rule, made total and
    engine-replayable: ``u`` outranks ``v`` iff ``u``'s (rounded)
    centroid-cosine is lower, ties on smaller id. Returns one row per
    dropped vector: ``(cluster, id_kept, id_dropped)`` with ``id_kept``
    the highest-priority blocker.

    The caller supplies the centroid table (the paper uses k-means;
    deterministic seeds or `train_ivf_centroids` both work) — it is a
    model input, so the rule itself stays exactly replayable by an
    independent engine: every comparison (assignment argmax, the
    ``eps`` test, priority) happens on cosines ROUNDED to
    ``round_digits``, ties break on ids.

    Scale shape: one broadcast-GEMM mapInPandas pass assigns the corpus
    (no shuffle, the `nearest_reference` machinery); then ONE exchange
    groups each cluster's rows and a chunked numpy GEMM scores its
    pairs in-task (r18 — this replaced a cluster-keyed self-join whose
    per-pair JVM cosine was the dominant cost). Pair compute is sum of
    cluster sizes squared, the SemDeDup cost the paper bounds by
    picking k ~ sqrt(n); the GEMM is chunked so task memory stays
    O(cluster x dim + chunk x cluster), not O(cluster^2).
    """
    rows = centroids.select(id_col, vec_col).limit(max_centroids + 1) \
        .collect()
    if not rows:
        raise ValueError("centroid set is empty")
    if len(rows) > max_centroids:
        raise ValueError("centroid set exceeds max_centroids")
    order = np.argsort(np.array([r[0] for r in rows]))
    cids = np.array([rows[i][0] for i in order])
    cmat = _normalize(np.asarray(
        [np.asarray(rows[i][1], dtype=np.float64) for i in order]))
    rd = round_digits

    src = corpus.select(F.col(id_col).alias("_id"),
                        F.col(vec_col).cast("array<double>").alias("_v"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("cid", src.schema["_id"].dataType),
        StructField("pcos", DoubleType()),
        StructField("_v", src.schema["_v"].dataType),
    ])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _normalize(np.vstack(pdf["_v"].to_numpy()))
            sims = np.round(mat @ cmat.T, rd)
            best = sims.argmax(axis=1)  # first max -> smallest cid on tie
            yield pd.DataFrame({
                "_id": pdf["_id"].to_numpy(),
                "cid": cids[best],
                "pcos": sims[np.arange(len(best)), best],
                "_v": pdf["_v"],
            })

    asg = src.mapInPandas(assign, out_schema)

    # r18 (guide §4.2): the within-cluster pair scoring used to be a
    # self-join on the cluster id evaluating a JVM higher-order-function
    # cosine PER PAIR (sum-of-cluster-sizes-squared rows through the
    # join — ~7.7M HOF evaluations on the fixture, the q18 dominator).
    # Same relational semantics, now computed as one chunked numpy GEMM
    # per cluster: group each cluster's (id, pcos, vec) rows, sort by
    # the keep-priority order (pcos asc, id asc — exactly the old
    # `higher` predicate), and for every column j the first row i < j
    # with round(cos, rd) > eps IS the old min(struct(a_pcos, a_id))
    # blocker. Rounding to ``round_digits`` keeps the values
    # engine-replayable exactly as before (the fixture margins sit far
    # from any rounding boundary, and the oracle re-checks every SF).
    # Compute memory is bounded by the column chunking; the per-cluster
    # row is m x d doubles — the SemDeDup k ~ sqrt(n) sizing the paper
    # (and the docstring above) already assumes.
    drop_schema = StructType([
        StructField("cluster", src.schema["_id"].dataType),
        StructField("id_kept", src.schema["_id"].dataType),
        StructField("id_dropped", src.schema["_id"].dataType),
    ])
    feps = float(eps)

    def cluster_drops(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        chunk = 4096
        for pdf in batches:
            for _, row in pdf.iterrows():
                mem = row["mem"]
                m = len(mem)
                if m < 2:
                    continue
                ids = np.array([r["_id"] for r in mem])
                pcos = np.array([r["pcos"] for r in mem])
                vn = _normalize(np.vstack(
                    [np.asarray(r["_v"], dtype=np.float64) for r in mem]))
                order = np.lexsort((ids, pcos))
                ids_o, vn = ids[order], vn[order]
                kept, dropped = [], []
                for j0 in range(0, m, chunk):
                    j1 = min(j0 + chunk, m)
                    sims = np.round(vn @ vn[j0:j1].T, rd)
                    # strictly-upper mask in priority order: i < j
                    jj = np.arange(j0, j1)
                    mask = (sims > feps) & (np.arange(m)[:, None] < jj)
                    has = mask.any(axis=0)
                    first = mask.argmax(axis=0)
                    kept.append(ids_o[first[has]])
                    dropped.append(ids_o[jj[has]])
                kept = np.concatenate(kept) if kept else np.array([], ids.dtype)
                dropped = (np.concatenate(dropped) if dropped
                           else np.array([], ids.dtype))
                if len(kept):
                    yield pd.DataFrame({
                        "cluster": np.full(len(kept), row["cid"]),
                        "id_kept": kept,
                        "id_dropped": dropped})

    grouped = (asg.groupBy("cid")
               .agg(F.collect_list(F.struct("_id", "pcos", "_v"))
                    .alias("mem"))
               .where(F.size("mem") > 1))
    return grouped.mapInPandas(cluster_drops, drop_schema)
