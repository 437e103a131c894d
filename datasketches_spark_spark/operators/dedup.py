"""Document deduplication operators — exact, MinHash-LSH, SimHash.

The LLM-data-pipeline dedup component. All designs are bucketed, never
all-pairs: candidate generation shuffles on (band, bucket-hash) keys, so the
cost at 100 TB is proportional to true collisions, not n².

Pipeline shapes (all stock DataFrame ops around two narrow pandas UDFs):

* exact dedup         groupBy(fingerprint) — one hash shuffle, JVM-side.
* MinHash-LSH         JVM shingling/xxhash64 -> vectorized numpy minhash
                      (mapInPandas) -> posexplode band buckets ->
                      self-join on (band, bucket) -> exact Jaccard verify
                      (JVM array_intersect/array_union). The verify step
                      makes the output exactly "pairs with J >= t that share
                      a band", and with the default 32 bands x 4 rows the
                      probability a true pair at t=0.8 shares no band is
                      (1-0.8^4)^32 ~ 5e-8 — candidate recall is effectively
                      total, so results match an exact-Jaccard oracle.
* SimHash             64-bit signature from token hashes; Hamming-distance
                      d <= 3 dedup is EXACT by pigeonhole: signatures are
                      split into 4 16-bit chunks and a pair within distance
                      3 must agree on >= 1 chunk, so chunk-equality buckets
                      have perfect recall; popcount(xor) verifies.

No reference implementation exists (the reference is sketch functions
only); the accumulate/combine lifecycle reuse is the engine's own design.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..functions.text import shingles, token_shingles, tokenize
from ..sketches.theta import hash_longs

_U64 = np.uint64


# ------------------------------------------------------------------ exact

def exact_dedup_groups(df: DataFrame, id_col: str,
                       fingerprint: Column) -> DataFrame:
    """Duplicate groups under an exact fingerprint: one row per group with
    >= 2 members — ``(group_id = min id, n_dups)``. Single hash shuffle on
    the fingerprint; fully JVM-side."""
    return (df.select(F.col(id_col), fingerprint.alias("fp"))
            .groupBy("fp")
            .agg(F.min(id_col).alias("group_id"), F.count("*").alias("n_dups"))
            .where(F.col("n_dups") > 1)
            .select("group_id", "n_dups"))


def _exact_jaccard(joined: DataFrame, ids: list[str], a_col: str,
                   b_col: str, n: int) -> DataFrame:
    """Exact string-shingle Jaccard over candidate-pair rows carrying
    both texts. Binds each side's token array, then its shingle array,
    to NAMED columns across stacked projections (r18, guide §1.2):
    inline, `array_intersect`/`array_union` each re-evaluated the whole
    tokenize->ngrams->distinct chain per reference — four shinglings
    per pair row where two suffice (Catalyst has no CSE across
    references to a non-cheap expression unless it is column-bound).
    Values are bit-identical: the expression tree per evaluation is
    unchanged, only the evaluation count drops."""
    tk = joined.select(*ids, tokenize(F.col(a_col)).alias("_tka"),
                       tokenize(F.col(b_col)).alias("_tkb"))
    sh = tk.select(*ids, token_shingles(F.col("_tka"), n).alias("_sa"),
                   token_shingles(F.col("_tkb"), n).alias("_sb"))
    jac = (F.size(F.array_intersect("_sa", "_sb")).cast("double")
           / F.size(F.array_union("_sa", "_sb")).cast("double"))
    return sh.select(*ids, jac.alias("jaccard"))


# ------------------------------------------------------------------ minhash

def minhash_bands(df: DataFrame, id_col: str, shingle_hashes: Column,
                  num_hashes: int = 128, bands: int = 32,
                  seed: int = 0x5EED) -> DataFrame:
    """(id, band, bucket) rows from a column of shingle xxhash64 arrays.

    The minhash itself is vectorized numpy inside one ``mapInPandas``:
    ``sig[i] = min over shingles of splitmix64(h ^ seed_i)`` — a
    (shingles x num_hashes) matrix-min per document, Arrow-batched. Band
    buckets (``bands`` groups of ``num_hashes/bands`` rows) are re-hashed to
    one u64 each, so the downstream join key is small."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    rng = np.random.default_rng(seed)
    seeds = rng.integers(0, 2**63, size=num_hashes, dtype=np.int64) \
               .astype(np.uint64)

    src = df.select(F.col(id_col).alias("_id"),
                    shingle_hashes.alias("_sh"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ])
    band_idx = np.arange(bands, dtype=np.int64)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keep = pdf["_sh"].map(lambda s: s is not None and len(s) > 0)
            pdf = pdf[keep]
            if pdf.empty:
                continue
            # Flatten all docs' shingle hashes into one array and min-reduce
            # per (doc, seed) segment — one vectorized pass per seed instead
            # of a Python loop per document.
            arrs = [np.asarray(s, dtype=np.int64).astype(np.uint64)
                    for s in pdf["_sh"]]
            lens = np.array([a.size for a in arrs])
            offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
            flat = np.concatenate(arrs)
            ndocs = len(arrs)
            sig = np.empty((ndocs, num_hashes), dtype=np.uint64)
            for i in range(num_hashes):
                sig[:, i] = np.minimum.reduceat(hash_longs(flat ^ seeds[i]),
                                                offsets)
            buckets = hash_longs(
                sig.reshape(ndocs, bands, rows)
                   .sum(axis=2, dtype=np.uint64).ravel()).view(np.int64)
            yield pd.DataFrame({
                "_id": np.repeat(pdf["_id"].to_numpy(), bands),
                "band": np.tile(band_idx, ndocs),
                "bucket": buckets,
            })

    return src.mapInPandas(build, out_schema)


def lsh_candidate_pairs(band_df: DataFrame,
                        max_bucket: int = 1024) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band bucket.

    One aggregation keyed by (band, bucket) + an in-row pair expansion —
    NOT a self-join: a self-join would execute the upstream signature
    computation twice (Spark cannot reuse an un-materialized subplan across
    both join sides). Cost stays proportional to real collisions.

    ``max_bucket`` bounds the quadratic expansion of a skewed mega-bucket
    (boilerplate-heavy corpora can put 10^5+ near-identical docs in one
    band bucket — B^2/2 pairs from a single aggregation row). Buckets
    larger than the cap degrade to a STAR expansion: every member pairs
    with the bucket minimum only, B-1 edges instead of B^2/2. Connectivity
    for duplicate-group finding is preserved (a union-find over pair edges
    needs only a spanning set per cluster); what is lost is only the
    explicit enumeration of every intra-cluster pair, which at that bucket
    size is the output-size pathology being prevented. The downstream
    exact-Jaccard verify still filters every emitted edge, so precision is
    unchanged. Both regimes run in the same single pass (no branch-and-
    union, which would re-execute the upstream minhash). A ``observe``
    metric ``lsh_buckets`` reports total vs capped bucket counts per
    action."""
    buckets = (band_df.groupBy("band", "bucket")
               .agg(F.collect_list("_id").alias("ids"))
               .where(F.size("ids") > 1)
               .observe("lsh_buckets",
                        F.count(F.lit(1)).alias("n_buckets"),
                        F.count(F.when(F.size("ids") > max_bucket, 1))
                         .alias("capped_buckets"),
                        F.max(F.size("ids")).alias("max_bucket_size")))
    left = (F.when(F.size("ids") <= max_bucket, F.col("ids"))
            .otherwise(F.array(F.array_min("ids"))))
    return (buckets
            .select(left.alias("left_ids"), "ids")
            .select(F.explode("left_ids").alias("id_a"), "ids")
            .select("id_a", F.explode("ids").alias("id_b"))
            .where(F.col("id_a") < F.col("id_b"))
            .distinct())


def jaccard_verify(pairs: DataFrame, df: DataFrame, id_col: str,
                   shingle_col: Column, threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs (JVM array_intersect/union over the
    distinct-shingle arrays); keeps pairs with J >= threshold."""
    sh = df.select(F.col(id_col).alias("_jid"), shingle_col.alias("_jsh"))
    joined = (pairs
              .join(sh.withColumnRenamed("_jid", "id_a")
                      .withColumnRenamed("_jsh", "sh_a"), "id_a")
              .join(sh.withColumnRenamed("_jid", "id_b")
                      .withColumnRenamed("_jsh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return (joined.select("id_a", "id_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the source
    arrives in fewer partitions (a small parquet file reads as one split —
    which would serialize every downstream per-row compute onto one core).
    No-op when the input is already partitioned, i.e. at real scale."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def minhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.5, shingle_n: int = 3,
                        num_hashes: int = 128, bands: int = 32,
                        max_bucket: int = 1024) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs over word-``shingle_n``-
    gram sets: shingle (JVM) -> xxhash64 per shingle (JVM) -> minhash bands
    (numpy) -> bucket self-join -> exact-Jaccard verify. Returns
    ``(id_a, id_b, jaccard)`` with id_a < id_b.

    Cost shape: the shingle projection (tokenize + n-gram + distinct per
    document) is the dominant JVM expression, so it runs over the corpus
    exactly ONCE — inside the signature pass. The verify stage joins the
    candidate pairs against the RAW text (a cheap two-column relation that
    Spark can re-scan freely) and evaluates the shingle expression only on
    the joined pair rows: corpus-sized shingling x1 + pair-sized x2,
    instead of the x3 corpus-sized passes a shingle-carrying verify
    relation would cost (one per join side, Spark cannot reuse an
    un-materialized subplan across join sides)."""
    # r18: bind the token array before shingling — inline, tokenize is
    # re-evaluated once per ngram slice reference (guide §1.2)
    hashed = F.transform(token_shingles(F.col("_tk"), shingle_n),
                         lambda s: F.xxhash64(s))
    src = df.select(F.col(id_col), F.col(text_col))
    # spread ONLY the signature input (per-row numpy compute wants the
    # cores); the verify text relations are join probes and must not pay
    # a corpus-sized repartition for nothing
    base = (_spread(src)
            .select(F.col(id_col), tokenize(text_col).alias("_tk"))
            .select(F.col(id_col), hashed.alias("_shh")))
    bands_df = minhash_bands(base, id_col, F.col("_shh"),
                             num_hashes=num_hashes, bands=bands)
    cands = lsh_candidate_pairs(bands_df, max_bucket=max_bucket)
    ta = src.select(F.col(id_col).alias("id_a"),
                    F.col(text_col).alias("_ta"))
    tb = src.select(F.col(id_col).alias("id_b"),
                    F.col(text_col).alias("_tb"))
    joined = cands.join(ta, "id_a").join(tb, "id_b")
    return (_exact_jaccard(joined, ["id_a", "id_b"], "_ta", "_tb",
                           shingle_n)
            .where(F.col("jaccard") >= threshold))


# ------------------------------------------------------------------ winnowing

def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 16, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): hash every character ``k``-gram, slide a ``window`` over
    the hash sequence and keep each window's minimum — a position-robust
    fingerprint set whose size is ~2/(window+1) of the text length.
    Vectorized numpy (sliding_window_view) per Arrow batch; emits
    ``(id, fingerprints: array<long>)``."""
    src = _spread(df).select(F.col(id_col).alias("_id"),
                             F.col(text_col).alias("_t"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("fingerprints", ArrayType(LongType(), containsNull=False)),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view
        pows = (np.full(k, 1099511628211, dtype=np.uint64)
                ** np.arange(k, dtype=np.uint64))  # FNV-prime powers, mod 2^64
        for pdf in batches:
            if pdf.empty:
                continue
            ids, fps = [], []
            for _id, text in zip(pdf["_id"], pdf["_t"]):
                if text is None or len(text) < k:
                    continue
                raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                grams = sliding_window_view(raw, k).astype(np.uint64)
                gh = hash_longs((grams * pows).sum(axis=1, dtype=np.uint64))
                if gh.size >= window:
                    mins = sliding_window_view(gh, window).min(axis=1)
                else:
                    mins = gh.min(keepdims=True)
                ids.append(_id)
                fps.append(np.unique(mins).view(np.int64).tolist())
            if ids:
                yield pd.DataFrame({"_id": ids, "fingerprints": fps})

    return src.mapInPandas(build, out_schema)


def winnow_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                       k: int = 16, window: int = 4,
                       min_overlap: float = 0.5,
                       max_bucket: int = 64) -> DataFrame:
    """Near-dup pairs whose winnowing-fingerprint containment
    (shared / min(|fp_a|, |fp_b|)) >= min_overlap — bucketed by
    fingerprint (one aggregation + in-row pair expansion, like the LSH
    path). An absolute shared-count threshold is meaningless on corpora
    with common boilerplate substrings: every pair shares some k-grams;
    the containment ratio normalizes by document size. ``max_bucket``
    drops degenerate fingerprints shared by more than that many docs — the
    stop-gram equivalent of a stopword list. This both bounds the quadratic
    bucket expansion AND improves precision: a k-gram occurring in hundreds
    of documents is boilerplate, not evidence of duplication (true near-dup
    pairs always also share rare fingerprints from their unique content)."""
    fp = winnow_fingerprints(df, id_col, text_col, k=k, window=window)
    return (winnow_pairs_from_fingerprints(fp, "_id", "fingerprints",
                                           min_overlap=min_overlap,
                                           max_bucket=max_bucket)
            .select("id_a", "id_b", "overlap"))


def winnow_pairs_from_fingerprints(fp_df: DataFrame, id_col: str,
                                   fp_col: str, min_overlap: float = 0.5,
                                   max_bucket: int = 64) -> DataFrame:
    """The bucket-join half of winnowing dedup over a PRECOMPUTED
    fingerprint-set column (``array<long>`` of distinct fingerprints) —
    hash-agnostic, so a portable fingerprint the oracle can reproduce
    (``functions.text.winnow_fingerprints_expr``) exercises the same
    candidate-generation plan as the engine-hash path. Emits
    ``(id_a, id_b, shared, n_a, n_b, overlap)`` for pairs whose
    containment (shared / min set size) >= min_overlap; fingerprints in
    buckets larger than ``max_bucket`` are boilerplate and dropped."""
    sized = fp_df.select(F.col(id_col).alias("_id"),
                         F.size(fp_col).alias("n_fp"),
                         F.explode(fp_col).alias("fp"))
    buckets = (sized.groupBy("fp")
               .agg(F.collect_list(F.struct("_id", "n_fp")).alias("ids"))
               .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket)))
    pairs = (buckets
             .select(F.explode("ids").alias("a"), "ids")
             .select("a", F.explode("ids").alias("b"))
             .where(F.col("a._id") < F.col("b._id")))
    counted = (pairs.groupBy(F.col("a._id").alias("id_a"),
                             F.col("b._id").alias("id_b"))
               .agg(F.count("*").alias("shared"),
                    F.first("a.n_fp").alias("n_a"),
                    F.first("b.n_fp").alias("n_b")))
    overlap = (F.col("shared").cast("double")
               / F.least("n_a", "n_b").cast("double"))
    return (counted.select("id_a", "id_b", "shared", "n_a", "n_b",
                           overlap.alias("overlap"))
            .where(F.col("overlap") >= min_overlap))


# ------------------------------------------------------------------ simhash

def simhash(df: DataFrame, id_col: str, text_col: str,
            sep: str = " ") -> DataFrame:
    """64-bit SimHash per document from token xxhash64s: bit b of the
    signature is the sign of sum over tokens of (+1 if bit b set else -1).
    Vectorized numpy via mapInPandas."""
    toks = tokenize(text_col, sep)
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    src = _spread(df).select(F.col(id_col).alias("_id"), hashed.alias("_th"))
    out_schema = StructType([
        StructField("_id", src.schema["_id"].dataType),
        StructField("simhash", LongType()),
    ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if pdf.empty:
                continue
            ids, sigs = [], []
            for _id, th in zip(pdf["_id"], pdf["_th"]):
                if th is None or len(th) == 0:
                    continue
                h = np.asarray(th, dtype=np.int64).astype(np.uint64)
                bits = (h[:, None] >> bit_idx[None, :]) & _U64(1)  # (n, 64)
                votes = 2 * bits.astype(np.int64) - 1
                sig = (votes.sum(axis=0) > 0).astype(np.uint64)
                ids.append(_id)
                sigs.append(int((sig << bit_idx).sum(dtype=np.uint64)
                                .view(np.int64)))
            if ids:
                yield pd.DataFrame({"_id": ids, "simhash": sigs})

    return src.mapInPandas(build, out_schema)


def simhash_pairs_from_sigs(sig_df: DataFrame, id_col: str = "_id",
                            sig_col: str = "simhash",
                            max_distance: int = 3) -> DataFrame:
    """Near-duplicate pairs at Hamming distance <= max_distance from a
    PRECOMPUTED signature column — the pigeonhole bucket + popcount-verify
    machinery, hash-agnostic: any <= 64-bit signature works (the engine's
    xxhash64 SimHash via :func:`simhash`, or a portable hash the oracle
    can reproduce, e.g. ``functions.text.simhash_expr``). max_distance
    must be <= 3 for the 4x16-bit-chunk pigeonhole to guarantee perfect
    recall (a pair differing in <= 3 bits must agree on >= 1 of 4
    chunks)."""
    if max_distance > 3:
        raise ValueError("max_distance > 3 breaks the 4x16-bit pigeonhole "
                         "recall guarantee; add more chunks instead")
    sig = sig_df.select(F.col(id_col).alias("_id"),
                        F.col(sig_col).alias("simhash"))
    chunks = sig.select(
        F.struct(F.col("_id").alias("id"), F.col("simhash").alias("sig"))
         .alias("doc"),
        F.posexplode(F.array(*[
            (F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)))
            for i in range(4)
        ])).alias("chunk_idx", "chunk_val"))
    # one aggregation + in-row pair expansion (see lsh_candidate_pairs for
    # why this beats a self-join: no double execution of simhash())
    buckets = (chunks.groupBy("chunk_idx", "chunk_val")
               .agg(F.collect_list("doc").alias("docs"))
               .where(F.size("docs") > 1))
    pairs = (buckets
             .select(F.explode("docs").alias("a"), "docs")
             .select("a", F.explode("docs").alias("b"))
             .where(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
             .distinct())
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.select("id_a", "id_b", dist.alias("hamming"))
            .where(F.col("hamming") <= max_distance))


def simhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        max_distance: int = 3) -> DataFrame:
    """Near-duplicate pairs at Hamming distance <= max_distance over the
    engine's 64-bit xxhash64 SimHash: :func:`simhash` ->
    :func:`simhash_pairs_from_sigs` (pigeonhole bucket, popcount
    verify)."""
    return simhash_pairs_from_sigs(simhash(df, id_col, text_col),
                                   "_id", "simhash", max_distance)


# -------------------------------------------- exact n-gram Jaccard join

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        threshold: float = 0.6,
                        ngram_n: int = 3,
                        max_gram_df: int | None = None) -> DataFrame:
    """EXACT n-gram-Jaccard near-duplicate pairs via a prefix-filtered
    set-similarity self-join — no LSH, no probability argument: every
    ``(id_a < id_b, jaccard)`` with ``J >= threshold`` is returned, none
    missed (prefix-filter principle, as in Vernica/Carey/Li, "Efficient
    Parallel Set-Similarity Joins Using MapReduce", SIGMOD'10; AllPairs,
    Bayardo et al., WWW'07).

    Plan (all stock DataFrame ops, fully JVM-side):

    1. distinct word-``ngram_n``-gram set per doc (JVM shingling);
    2. global n-gram document frequency (one groupBy);
    3. per doc, sort n-grams rarest-first by ``(df, gram)`` and keep the
       PREFIX of length ``|x| - ceil(t*|x|) + 1`` — if ``J(x, y) >= t``
       then ``|x & y| >= ceil(t*|x|)``, so two qualifying docs MUST share
       a prefix token under any shared total order;
    4. group the inverted prefix index by token + in-row pair expansion
       (one aggregation, NOT a self-join — the upstream is executed once;
       see ``lsh_candidate_pairs``), with the length filter
       ``t*|x| <= |y| <= |x|/t`` applied before emitting a candidate;
    5. exact Jaccard verify on the candidate pairs (``jaccard_verify``).

    At 100 TB the shuffle keys are prefix tokens, which are by
    construction the globally RAREST n-grams of each document — bucket
    sizes stay small even on boilerplate-heavy corpora (common boilerplate
    n-grams have high document frequency and are sorted OUT of prefixes).
    Cost is proportional to true near-collisions, never n^2.

    ``max_gram_df`` (opt-in, round-9 scale lever; the x1/x10 scale proof
    measured ~n^1.2 growth from prefix buckets on corpus-frequency-scaled
    tokens): drop n-grams whose document frequency exceeds the cap from
    the sets entirely. This CHANGES the similarity contract to "exact
    Jaccard over the sub-cap (distinctive) n-grams" — the stopword-
    filtered form real curation pipelines run — so boilerplate-only
    pairs disappear by definition while pairs overlapping on distinctive
    content keep their (usually higher) similarity. The verify then runs
    on the filtered HASHED sets (64-bit xxhash; collisions only merge
    tokens). Default None = the unfiltered exact contract.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    t = float(threshold)
    sh_col = shingles(F.col(text_col), ngram_n)
    # Index on xxhash64(n-gram), not the strings: shuffles carry
    # (long, long) rows. Collisions only MERGE tokens, which can only
    # raise the hashed-set Jaccard — so every pair with string-Jaccard
    # >= t also clears the hashed prefix filter (recall preserved), and
    # the string-array verify at the end restores exactness.
    hsh = F.array_distinct(F.transform(sh_col, lambda g: F.xxhash64(g)))
    # r18 (guide §2.4/§3.3): the hashed-shingle projection is the
    # dominant JVM expression and has FOUR downstream consumers (the
    # document-frequency aggregate, the rarest-first ranking join, and
    # both prefilter join sides) — un-materialized, Catalyst re-executes
    # the scan + shingling per consumer (12 scans in the r18 before
    # plan). Shingle once over the projected two columns and
    # localCheckpoint the compact (id, long-array) result; at real scale
    # persist this to a table instead — the 100-TB trade is one
    # materialized hash set vs 4-6 corpus-wide shingling passes.
    src = df.select(F.col(id_col), F.col(text_col))
    docs = (_spread(src)
            .select(F.col(id_col).alias("_id"), hsh.alias("sh"))
            .where(F.size("sh") > 0)
            .localCheckpoint())
    ex = docs.select("_id", F.explode("sh").alias("g"))
    dfreq = ex.groupBy("g").agg(F.count("*").alias("df"))
    if max_gram_df is not None:
        if max_gram_df < 1:
            raise ValueError("max_gram_df must be >= 1")
        # sub-cap grams only: every downstream set (prefix sizes, length
        # filters, verify) sees the FILTERED sets consistently
        dfreq = dfreq.where(F.col("df") <= int(max_gram_df))
    ranked = (ex.join(dfreq, "g")
              .groupBy("_id")
              .agg(F.array_sort(F.collect_list(F.struct("df", "g")))
                    .alias("toks")))
    sz = F.size("toks")
    plen = (sz - F.ceil(F.lit(t) * sz).cast("int") + F.lit(1))
    idx = (ranked
           .select(F.col("_id"), sz.alias("sz"),
                   F.posexplode(F.slice("toks", F.lit(1), plen))
                    .alias("pos", "p"))
           .select(F.col("p.g").alias("g"),
                   F.struct("_id", "sz", "pos").alias("m")))
    buckets = (idx.groupBy("g").agg(F.collect_list("m").alias("mem"))
               .where(F.size("mem") > 1))
    # PPJoin positional filter (Xiao et al., WWW'08): J >= t needs
    # overlap alpha = ceil(t/(1+t) * (|x|+|y|)), and at the FIRST shared
    # token (positions i, j in the rarest-first orders) the overlap is
    # at most 1 + min(|x|-i-1, |y|-j-1). A pair's first shared token has
    # the loosest such bound, so keeping pairs where ANY shared token
    # passes never drops a qualifying pair — while pruning most spurious
    # candidates with integer arithmetic BEFORE the distinct and the
    # array-intersect verify.
    alpha = F.ceil(F.lit(t / (1.0 + t))
                   * (F.col("a.sz") + F.col("b.sz")))
    suffix_bound = F.lit(1) + F.least(
        F.col("a.sz") - F.col("a.pos") - F.lit(1),
        F.col("b.sz") - F.col("b.pos") - F.lit(1))
    cand = (buckets
            .select(F.explode("mem").alias("a"), "mem")
            .select("a", F.explode("mem").alias("b"))
            .where((F.col("a._id") < F.col("b._id"))
                   & (F.lit(t) * F.col("a.sz") <= F.col("b.sz"))
                   & (F.lit(t) * F.col("b.sz") <= F.col("a.sz"))
                   & (suffix_bound >= alpha))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"))
            .distinct())
    # Two-phase verify: a cheap hashed-set Jaccard pass first (long-array
    # intersects are ~10x cheaper than string-array ones, and candidates
    # outnumber survivors ~100:1), then the EXACT string-array verify on
    # the survivors. J_hash >= J_string always (collisions only merge),
    # so the prefilter never drops a qualifying pair and the final
    # output stays bit-exact.
    if max_gram_df is not None:
        # capped contract: the filtered hashed sets ARE the sets — the
        # exact Jaccard verify runs on them directly
        fdocs = (ex.join(dfreq.select("g"), "g")
                 .groupBy("_id").agg(F.collect_list("g").alias("_hsh")))
        sides = (cand
                 .join(fdocs.withColumnRenamed("_id", "id_a")
                            .withColumnRenamed("_hsh", "ha"), "id_a")
                 .join(fdocs.withColumnRenamed("_id", "id_b")
                            .withColumnRenamed("_hsh", "hb"), "id_b"))
        jac = (F.size(F.array_intersect("ha", "hb")).cast("double")
               / F.size(F.array_union("ha", "hb")).cast("double"))
        return (sides.select("id_a", "id_b", jac.alias("jaccard"))
                .where(F.col("jaccard") >= t))
    hdocs = docs.select(F.col("_id"), F.col("sh").alias("_hsh"))
    prefiltered = (cand
                   .join(hdocs.withColumnRenamed("_id", "id_a")
                              .withColumnRenamed("_hsh", "ha"), "id_a")
                   .join(hdocs.withColumnRenamed("_id", "id_b")
                              .withColumnRenamed("_hsh", "hb"), "id_b")
                   .where(F.size(F.array_intersect("ha", "hb"))
                          >= F.ceil(F.lit(t / (1.0 + t))
                                    * (F.size("ha") + F.size("hb"))))
                   .select("id_a", "id_b"))
    # Exact string-Jaccard verify on the survivors, the minhash pattern
    # (r18): join the few pair rows against the RAW two-column text
    # relation and evaluate the string shingles AFTER the join — the
    # corpus-side scans stay cheap column-pruned probes instead of two
    # more corpus-wide shingling passes.
    ta = src.select(F.col(id_col).alias("id_a"),
                    F.col(text_col).alias("_ta"))
    tb = src.select(F.col(id_col).alias("id_b"),
                    F.col(text_col).alias("_tb"))
    joined = prefiltered.join(ta, "id_a").join(tb, "id_b")
    return (_exact_jaccard(joined, ["id_a", "id_b"], "_ta", "_tb",
                           ngram_n)
            .where(F.col("jaccard") >= t))


# ---------------------------------------------------- connected components

def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """Connected components of the (undirected) duplicate-pair graph:
    ``(id, component)`` where ``component`` is the minimum id reachable
    from ``id``. This is the step a real dedup pipeline needs AFTER pair
    generation — near-dup pairs are edges, and the keep-one-per-group
    decision operates on components, not pairs.

    Min-label propagation with pointer jumping (path halving), in the
    spirit of Kiveris et al., "Connected Components in MapReduce and
    Beyond" (SoCC'14): each round (a) every node takes the min label over
    itself and its neighbors (one shuffle join + groupBy), then (b) every
    node jumps to its label's label (one self-join). Pointer jumping makes
    convergence ~O(log diameter) rounds instead of O(diameter); duplicate
    clusters are shallow in practice, so 2-4 rounds is typical. Each round
    is ``localCheckpoint``-ed to truncate lineage (an iterative DataFrame
    loop otherwise re-executes every prior round), and convergence is
    detected by counting changed labels (one count action per round —
    driver-side control flow, fully distributed data flow). r16 perf:
    the previous label rides THROUGH the checkpoint as an ``old``
    column, so the changed-count is a filter over the just-
    materialized round — the old form re-joined the new labels
    against the previous round, one extra shuffle join per round.
    """
    edges = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
             .union(pairs.select(F.col(dst).alias("u"),
                                 F.col(src).alias("v")))
             .distinct()
             .localCheckpoint())
    labels = (edges.select("u").distinct()
              .select(F.col("u").alias("id"), F.col("u").alias("comp"))
              .localCheckpoint())
    for _ in range(max_iter):
        nbmin = (edges.join(labels.withColumnRenamed("id", "v")
                                  .withColumnRenamed("comp", "nb_comp"), "v")
                 .groupBy("u").agg(F.min("nb_comp").alias("nb_comp"))
                 .withColumnRenamed("u", "id"))
        stepped = (labels.join(nbmin, "id", "left")
                   .select("id", F.col("comp").alias("old"), F.least(
                       "comp", F.coalesce("nb_comp", "comp")).alias("comp")))
        jumped = (stepped.alias("x")
                  .join(stepped.select(F.col("id").alias("comp"),
                                       F.col("comp").alias("gcomp"))
                               .alias("p"), "comp", "left")
                  .select(F.col("id"), F.col("old"),
                          F.least(F.col("comp"),
                                  F.coalesce("gcomp", "comp")).alias("comp"))
                  .localCheckpoint())
        changed = jumped.where(F.col("comp") != F.col("old")).count()
        labels = jumped.select("id", "comp")
        if changed == 0:
            break
    return labels


def dedup_groups_from_pairs(pairs: DataFrame, src: str = "id_a",
                            dst: str = "id_b",
                            max_iter: int = 25) -> DataFrame:
    """Duplicate GROUPS from near-dup pairs: one row per connected
    component — ``(component_id = min member id, n_docs)``."""
    labels = connected_components(pairs, src, dst, max_iter)
    return (labels.groupBy(F.col("comp").alias("component_id"))
            .agg(F.count("*").alias("n_docs")))


# ------------------------------------------------------- R-S minhash join

def minhash_match(query_df: DataFrame, corpus_df: DataFrame, id_col: str,
                  text_col: str, threshold: float = 0.5,
                  shingle_n: int = 3, num_hashes: int = 128,
                  bands: int = 32, max_bucket: int = 8192) -> DataFrame:
    """Near-duplicate matches of QUERY documents against a CORPUS — the
    R-S form of the MinHash join, i.e. incremental dedup: "which of the
    incoming documents already (near-)exist in the corpus?". Returns
    ``(query_id, corpus_id, jaccard)`` with ``J >= threshold``.

    Same machinery as ``minhash_dedup_pairs`` (one signature pass per
    side, identical hash seeds so buckets align), but candidate
    generation is a band-bucket EQUI-JOIN between the two sides instead
    of a self-join expansion: output volume is ``|Q & bucket| x
    |C & bucket|`` summed over buckets — collision-proportional, never
    ``|Q| x |C|``. Exact-Jaccard verify binds both sides' raw text.

    ``max_bucket`` drops corpus band-buckets larger than the cap (a
    boilerplate bucket matches every query doc in it with thousands of
    corpus docs — the classic crawl pathology). With 32 bands a true
    near-dup pair loses only one of its ~32 chances per dropped bucket,
    and the drop count is reported via an ``observe`` metric
    (``minhash_match_buckets``).

    Streaming use: call inside ``foreachBatch`` with the micro-batch as
    ``query_df`` against a persisted corpus signature table — the
    signature pass for the corpus can be precomputed once with
    ``minhash_bands`` and reused.
    """
    hashed = F.transform(token_shingles(F.col("_tk"), shingle_n),
                         lambda s: F.xxhash64(s))

    def _bands(df: DataFrame, side: str) -> DataFrame:
        src = df.select(F.col(id_col), F.col(text_col))
        base = (_spread(src)
                .select(F.col(id_col), tokenize(text_col).alias("_tk"))
                .select(F.col(id_col), hashed.alias("_shh")))
        return (minhash_bands(base, id_col, F.col("_shh"),
                              num_hashes=num_hashes, bands=bands)
                .withColumnRenamed("_id", side))

    qb = _bands(query_df, "query_id")
    cb = (_bands(corpus_df, "corpus_id")
          .groupBy("band", "bucket")
          .agg(F.collect_list("corpus_id").alias("cids"))
          .observe("minhash_match_buckets",
                   F.count(F.lit(1)).alias("n_buckets"),
                   F.count(F.when(F.size("cids") > max_bucket, 1))
                    .alias("dropped_buckets"))
          .where(F.size("cids") <= max_bucket))
    cands = (qb.join(cb, ["band", "bucket"])
             .select("query_id", F.explode("cids").alias("corpus_id"))
             .distinct())
    ta = query_df.select(F.col(id_col).alias("query_id"),
                         F.col(text_col).alias("_ta"))
    tb = corpus_df.select(F.col(id_col).alias("corpus_id"),
                          F.col(text_col).alias("_tb"))
    joined = cands.join(ta, "query_id").join(tb, "corpus_id")
    return (_exact_jaccard(joined, ["query_id", "corpus_id"],
                           "_ta", "_tb", shingle_n)
            .where(F.col("jaccard") >= threshold))


def dedup_drop_list(df: DataFrame, pairs: DataFrame, id_col: str,
                    prefer_col: str | None = None, src: str = "id_a",
                    dst: str = "id_b", max_iter: int = 25,
                    labels: DataFrame | None = None) -> DataFrame:
    """The KEEP-ONE policy that finishes a dedup pipeline: from near-dup
    PAIRS, return the ids to DROP — every member of each connected
    component except its canonical survivor.

    Survivor choice: highest ``prefer_col`` (e.g. doc length or quality
    score), ties broken by lowest id; with no ``prefer_col`` the lowest
    id survives (which needs NO join back to the data — the component
    label already IS the minimum member id).

    An anti-join of the corpus against this list is the deduplicated
    dataset; at 100 TB the list is pair-graph-sized (duplicates only),
    so the anti-join broadcasts in the common case."""
    from pyspark.sql import Window
    if labels is None:
        labels = connected_components(pairs, src, dst, max_iter)
    if prefer_col is None:
        return (labels.where(F.col("id") != F.col("comp"))
                .select(F.col("id").alias(id_col)))
    pref = df.select(F.col(id_col).alias("id"),
                     F.col(prefer_col).alias("_pref"))
    lab = labels.join(pref, "id")
    w = Window.partitionBy("comp").orderBy(F.col("_pref").desc(),
                                           F.col("id").asc())
    return (lab.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > 1)
            .select(F.col("id").alias(id_col)))


# ------------------------------------------------------- decontamination

def ngram_overlap_flags(corpus_df: DataFrame, benchmark_df: DataFrame,
                        id_col: str, text_col: str, ngram_n: int = 13,
                        min_hits: int = 1) -> DataFrame:
    """Benchmark DECONTAMINATION: flag corpus documents sharing at least
    ``min_hits`` distinct word n-grams with ANY benchmark document — the
    standard pre-training hygiene step (exact n-gram collision against
    the eval set; n = 8-13 in common practice). Returns
    ``(id, n_hits)`` for flagged documents; anti-join the corpus
    against it to decontaminate.

    Plan shape for 100 TB: the benchmark side is an eval set — small by
    definition — so its distinct n-gram set broadcasts and the corpus
    pass is a map-side semi-join-style probe (explode -> broadcast hash
    join) with one final groupBy on the flagged doc ids, which are
    contamination-sized, not corpus-sized. Grams are compared by
    xxhash64 (a benchmark gram colliding with a different corpus gram
    would need a 64-bit collision inside the benchmark's gram set —
    negligible, and it can only OVER-flag, never miss contamination).
    """
    g = F.explode(F.array_distinct(
        F.transform(token_shingles(F.col("_tk"), ngram_n),
                    lambda s: F.xxhash64(s)))).alias("g")
    cg = (corpus_df
          .select(F.col(id_col).alias("_id"),
                  tokenize(F.col(text_col)).alias("_tk"))
          .select("_id", g))
    bg = (benchmark_df.select(tokenize(F.col(text_col)).alias("_tk"))
          .select(g).distinct())
    return (cg.join(F.broadcast(bg), "g")
            .groupBy("_id")
            .agg(F.count_distinct("g").alias("n_hits"))
            .where(F.col("n_hits") >= min_hits)
            .select(F.col("_id").alias(id_col), "n_hits"))


def duplicated_spans(df: DataFrame, id_col: str, text_col: str,
                     k: int = 8, hash64: bool = False) -> DataFrame:
    """Span-level EXACT duplicate detection — the fixed-window form of
    suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every k-token window
    that occurs in MORE THAN ONE document is a duplicated window, and
    per document, overlapping-or-adjacent duplicated windows merge into
    maximal spans (the regions a span-removal pass would cut).

    Returns one row per (document, span):
    ``(id, span_idx, span_start, span_end, n_windows)`` with token
    offsets, ``span_end`` exclusive, ``span_idx`` dense from 1 in
    document order. Documents with no cross-document window emit no row.

    Plan shape for 100 TB — ONE corpus scan, two keyed exchanges:
    tokenize -> posexplode of k-gram windows (map-side), one exchange on
    the window key where TWO stacked window functions compute the
    distinct-document count (``max(dense_rank)`` over the key — no
    collect_set materialization, no second aggregate branch rescanning
    the corpus), filter to cross-document windows (dup-bounded from here
    on), then one exchange on the document id where a gaps-and-islands
    running-max merges windows into spans; the final per-span aggregate
    reuses that partitioning (no extra exchange). With ``hash64`` the
    shuffle key is ``xxhash64(window)`` (16 B instead of the window
    text; a collision can only over-flag, never miss a duplicate) — off
    by default so independent engines can replay the operator exactly.
    """
    from pyspark.sql import Window

    w = df.select(F.col(id_col).alias("_id"),
                  F.posexplode(_ngrams_arr(F.col(text_col), k))
                  .alias("pos", "gram"))
    key = F.xxhash64("gram") if hash64 else F.col("gram")
    wh = w.select("_id", "pos", key.alias("g"))

    wg_ord = Window.partitionBy("g").orderBy("_id")
    wg_all = Window.partitionBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    hits = (wh.withColumn("_dr", F.dense_rank().over(wg_ord))
            .withColumn("_nd", F.max("_dr").over(wg_all))
            .where(F.col("_nd") >= 2)
            .select("_id", "pos"))

    wd = Window.partitionBy("_id").orderBy("pos")
    run_end = F.max(F.col("pos") + k).over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(run_end.isNull()
                 | (F.col("pos") > run_end), 1).otherwise(0)
    spans = (hits.withColumn("_brk", brk)
             .withColumn("span_idx", F.sum("_brk").over(
                 wd.rowsBetween(Window.unboundedPreceding, 0)))
             .groupBy("_id", "span_idx")
             .agg(F.min("pos").alias("span_start"),
                  (F.max("pos") + k).alias("span_end"),
                  F.count("*").alias("n_windows")))
    return spans.select(F.col("_id").alias(id_col), "span_idx",
                        "span_start", "span_end", "n_windows")


def _ngrams_arr(col: Column, n: int) -> Column:
    from ..functions.text import ngrams, tokenize
    return ngrams(tokenize(col), n)


def remove_spans(df: DataFrame, spans: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """Apply :func:`duplicated_spans` (or any ``(id, span_start,
    span_end)`` table, token offsets, end exclusive) as a TRANSFORM:
    rebuild each document's text with the spanned tokens cut — the
    removal half of the Lee et al. pipeline (detect cross-document
    spans, then cut them corpus-wide).

    Returns ``(id, text, n_removed_tokens)`` for EVERY input document
    (documents without spans pass through, ``n_removed_tokens`` 0).

    Plan shape: the span table (dup-bounded) aggregates to one
    interval-array row per affected doc and joins the corpus on the id
    — broadcast when small, hash join at scale — then the cut is a
    pure JVM filter over the token positions (no Python row path).
    """
    iv = (spans.groupBy(F.col(id_col).alias("_id"))
          .agg(F.collect_list(
              F.struct(F.col("span_start").alias("s"),
                       F.col("span_end").alias("e"))).alias("_iv")))
    toks = tokenize(text_col)
    src = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    joined = src.join(iv, "_id", "left")
    ivs = F.coalesce(F.col("_iv"), F.array())
    keep = F.filter(
        F.transform(F.col("_toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(ivs, lambda sp: (s["i"] >= sp["s"])
                            & (s["i"] < sp["e"])))
    return joined.select(
        F.col("_id").alias(id_col),
        F.array_join(F.transform(keep, lambda s: s["t"]), " ")
        .alias(text_col),
        (F.size("_toks") - F.size(keep)).cast("long")
        .alias("n_removed_tokens"))


def dedup_lines(df: DataFrame, id_col: str, text_col: str,
                sep: str = "\n", min_doc_freq: int = 2,
                normalize: bool = True) -> DataFrame:
    """Line-level corpus deduplication — the CCNet/RefinedWeb rule:
    drop every line whose NORMALIZED form appears in at least
    ``min_doc_freq`` DISTINCT documents (navigation chrome, cookie
    banners, boilerplate headers — the line-granular complement of
    document near-dup removal).

    Normalization (``normalize=True``): lowercase, trim, collapse
    space runs — the cheap canonicalization CCNet applies before
    hashing lines. Matching is on the md5 of the normalized line (the
    PORTABLE fingerprint, so an independent SQL engine replays the
    decision exactly).

    Returns one row per input document:
    ``(id, text_clean, n_lines, n_removed, chars_removed)`` with
    ``text_clean`` the surviving lines re-joined by ``sep`` in their
    original order (documents whose every line is boilerplate come
    back with an empty string, preserving the row for downstream
    accounting).

    Scale design (the 100 TB shape): one explode produces the line
    stream; the duplicated-fingerprint set is ONE map-side-combined
    aggregate (``count(distinct doc)`` per fingerprint — partial
    distinct on the line key) FILTERED to ``>= min_doc_freq`` before
    it ever joins back, so the join's build side is only the
    boilerplate set, not the corpus; survivors reassemble with a
    single per-document aggregate (``sort_array(collect_list)`` on the
    line index). Nothing is quadratic and the corpus text crosses the
    wire twice (line stream out, cleaned docs back) — the floor for
    any corpus rewrite.
    """
    if min_doc_freq < 2:
        raise ValueError("min_doc_freq must be >= 2")
    # F.split takes a Java regex while concat_ws below joins with the
    # LITERAL separator — quote it (\\Q..\\E) so metacharacter
    # separators ('.', '|', ...) split exactly where they will rejoin.
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col),
                             "\\Q" + sep + "\\E"))
        .alias("_idx", "_line"))
    norm = F.col("_line")
    if normalize:
        norm = F.regexp_replace(F.trim(F.lower(norm)), " +", " ")
    lines = lines.withColumn("_fp", F.md5(norm))

    dup = (lines.groupBy("_fp")
           .agg(F.countDistinct("_id").alias("_df"))
           .where(F.col("_df") >= min_doc_freq)
           .select("_fp"))

    kept = (lines.join(dup, "_fp", "left_anti")
            .groupBy("_id")
            .agg(F.count("*").alias("_n_kept"),
                 F.sum(F.length("_line")).alias("_kept_chars"),
                 F.concat_ws(sep, F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("_idx", "_line"))),
                     lambda s: s["_line"])).alias("text_clean")))

    stats = (lines.groupBy("_id")
             .agg(F.count("*").alias("n_lines"),
                  F.sum(F.length("_line")).alias("_chars")))

    return (stats.join(kept, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(F.col("text_clean"), F.lit(""))
                    .alias("text_clean"),
                    F.col("n_lines"),
                    (F.col("n_lines")
                     - F.coalesce(F.col("_n_kept"), F.lit(0)))
                    .cast("long").alias("n_removed"),
                    (F.col("_chars")
                     - F.coalesce(F.col("_kept_chars"), F.lit(0)))
                    .cast("long").alias("chars_removed")))


# ------------------------------------------------------------- bloom prefilter

def build_prefilter_state(corpus: DataFrame, id_col: str,
                          text_col: str | None = None,
                          fingerprint_col: str | None = None,
                          expected_items: int | None = None,
                          fpp: float = 0.001) -> bytes:
    """Build the corpus membership state ONCE for a standing
    :func:`bloom_prefilter_match` deployment: returns the serialized
    Bloom state (constant-size, ~1.8 MB per million designed keys at
    fpp=1e-3) to persist alongside the fingerprint table and pass back
    as ``state=`` on every later batch — which then costs ONE
    corpus-fingerprint read (the exact-verify join) + one incoming
    scan, with no per-batch state rebuild. Refresh it when the corpus
    grows past ``expected_items`` (fpp degrades smoothly, never the
    no-false-negative guarantee)."""
    from ..functions.text import doc_fingerprint
    from .sketch_agg import sketch_accumulate

    if fingerprint_col is None:
        if text_col is None:
            raise ValueError("need text_col or fingerprint_col")
        cfp = corpus.select(
            doc_fingerprint(F.col(text_col)).alias("fingerprint"))
    else:
        cfp = corpus.select(F.col(fingerprint_col).alias("fingerprint"))
    if expected_items is None:
        expected_items = max(64, cfp.count())
    state_df = sketch_accumulate(cfp, [], "fingerprint", family="bloom",
                                 expected_items=expected_items, fpp=fpp,
                                 state_col="_bf")
    rows = state_df.collect()
    if not rows or rows[0]["_bf"] is None:
        # empty corpus: a minimal always-empty filter (valid state;
        # every probe misses, so the match set is empty — consistent
        # with bloom_prefilter_match's empty-corpus result)
        from ..sketches import BloomFilter
        return BloomFilter.design(64, fpp).serialize()
    return bytes(rows[0]["_bf"])


def bloom_prefilter_match(incoming: DataFrame, corpus: DataFrame,
                          id_col: str, text_col: str | None = None,
                          fingerprint_col: str | None = None,
                          expected_items: int | None = None,
                          fpp: float = 0.001,
                          state: bytes | None = None) -> DataFrame:
    """EXACT incremental membership dedup with a Bloom prefilter:
    "which incoming documents' fingerprints already exist in the
    corpus?" — answered without shuffling the corpus key set against
    the incoming batch.

    Pipeline physics (the 100 TB design):

    1. corpus fingerprints fold into ONE Bloom state via the two-phase
       map-side accumulate (``sketch_accumulate`` family ``bloom``):
       the shuffle carries ``m/8``-byte states, never corpus rows;
    2. the single merged state (constant-size: ~1.8 MB per million
       designed keys at fpp=1e-3) broadcasts to the incoming side,
       which filters AT THE SCAN — Bloom's no-false-negative guarantee
       means only definite-new rows are dropped;
    3. survivors (true matches + ~fpp·|incoming| false positives) are
       verified by an exact broadcast-friendly semi-join against the
       corpus fingerprint set, so the RESULT is exact — the Bloom
       filter only shrinks the join's probe side.

    Returns the incoming rows (id, fingerprint) confirmed present in
    the corpus. ``expected_items=None`` sizes the filter from a corpus
    ``count()`` (one extra cheap job; pass the expected NDV to skip it).

    Corpus scan budget: the corpus is read twice (state build + verify
    build side) — three times if ``expected_items`` is left to the
    count. A standing deployment persists the corpus FINGERPRINT table
    AND the built state (:func:`build_prefilter_state`, passed back as
    ``state=`` so the per-batch rebuild is skipped entirely): every
    later batch is then ONE corpus-fingerprint read (the exact-verify
    join) + one incoming scan — plan-pinned by
    ``tests/test_bloom.py::test_standing_deployment_single_corpus_scan``.
    Caveat: if the incoming batch is a UNION, Catalyst's
    PushdownLeftSemiAntiJoin duplicates the verify join under each
    branch and the broadcast-closure UDF (non-deterministic resultId)
    blocks exchange reuse — coalesce multi-source batches to one
    relation (e.g. write/read or localCheckpoint) to keep the
    single-read budget.
    Catalyst additionally pushes the Bloom predicate onto the verify
    build side (constraint propagation — see docs/PLANS.md), so the
    broadcast is candidate-bounded either way.

    Contrast with ``minhash_match`` (NEAR-duplicate incremental match):
    this operator is the EXACT-fingerprint fast path — at a typical
    snapshot-over-snapshot crawl where >90% of content is byte-identical
    carry-over, it answers most of the dedup question for the price of
    a broadcast, leaving the near-dup machinery a far smaller input.
    """
    from ..functions.text import doc_fingerprint
    from .sketch_agg import sketch_accumulate

    if fingerprint_col is None:
        if text_col is None:
            raise ValueError("need text_col or fingerprint_col")
        fp = doc_fingerprint(F.col(text_col))
        cfp = corpus.select(F.col(id_col), fp.alias("fingerprint"))
        ifp = incoming.select(F.col(id_col), fp.alias("fingerprint"))
    else:
        cfp = corpus.select(F.col(id_col),
                            F.col(fingerprint_col).alias("fingerprint"))
        ifp = incoming.select(F.col(id_col),
                              F.col(fingerprint_col).alias("fingerprint"))

    if state is None:
        if expected_items is None:
            expected_items = max(64, cfp.count())
        state_df = sketch_accumulate(cfp, [], "fingerprint",
                                     family="bloom",
                                     expected_items=expected_items,
                                     fpp=fpp, state_col="_bf")
        # bounded collect: ONE row of m/8 bytes (filter geometry, not
        # data volume — ~1.8 MB per million designed keys at fpp=1e-3),
        # shipped to executors as a SparkContext broadcast. Carrying the
        # state as a literal/cross-joined COLUMN instead would make
        # Arrow re-serialize the whole state once PER PROBE ROW.
        state_rows = state_df.collect()
        if not state_rows or state_rows[0]["_bf"] is None:
            # empty corpus: the accumulate yields a null state
            # (reference null-for-empty-input convention) — nothing can
            # match, so return the empty match set with the output
            # schema intact instead of crashing on bytes(None).
            return ifp.limit(0)
        state = bytes(state_rows[0]["_bf"])
    bc = incoming.sparkSession.sparkContext.broadcast(bytes(state))
    from ..functions.udfs import bloom_contains_broadcast_udf
    candidates = ifp.where(
        bloom_contains_broadcast_udf(bc)(F.col("fingerprint")))
    return candidates.join(cfp.select("fingerprint").distinct(),
                           "fingerprint", "leftsemi")
