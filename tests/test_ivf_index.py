"""Persisted IVF index: build/load round-trip, pruning, and recall."""

from pyspark.sql import functions as F

from datasketches_spark_spark.operators import (
    build_ivf_index, cosine_topk, load_ivf_centroids, query_ivf_index)
from datasketches_spark_spark.sources import read_table


def _key(df):
    return {(r.query_id, r.rank): r.neighbor_id for r in df.collect()}


def test_full_probe_equals_brute_force(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, path, num_cells=4, iters=4)
    assert cents.shape[0] == 4
    qs = [(r.vec_id, r.embedding)
          for r in emb.where("vec_id < 5").collect()]
    idx = query_ivf_index(spark, path, qs, k=3, nprobe=4)
    brute = cosine_topk(emb, qs, k=3)
    assert _key(idx) == _key(brute)


def test_centroids_roundtrip(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, path, num_cells=4, iters=3)
    loaded = load_ivf_centroids(spark, path)
    assert (loaded == cents).all()


def test_partial_probe_prunes_partitions_and_recalls(spark, sf_dir,
                                                     tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=4, iters=4)
    qs = [(r.vec_id, r.embedding)
          for r in emb.where("vec_id < 10").collect()]
    idx = query_ivf_index(spark, path, qs, k=3, nprobe=2)

    # the probed-cell filter reaches the parquet scan as a PARTITION
    # filter on the partitionBy(cell) layout — file-level pruning
    plan = idx._sc._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [cell" in plan, plan

    # nprobe=2 of 4 cells: approximate by design — set recall must be
    # non-trivial (same bound class as the q25 pytest, which measures
    # 0.5 at nprobe=4; synthetic near-uniform vectors are the hard case
    # for IVF)
    exact = {(q, nb) for (q, _), nb in _key(cosine_topk(emb, qs, k=3)).items()}
    approx = {(q, nb) for (q, _), nb in _key(idx).items()}
    assert len(exact & approx) / len(exact) >= 0.4


def test_query_without_rebuild_uses_no_assign_stage(spark, sf_dir,
                                                    tmp_path):
    """Query plans touch only the persisted index files (with cell
    partition pruning): the corpus parquet is never re-read and never
    re-assigned at query time. The r18 probe scores the pruned cells
    with a local-top-k mapInPandas, so the check is on WHAT is scanned,
    not on the absence of Python stages."""
    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=4, iters=3)
    qs = [(0, [0.1] * len(emb.first().embedding))]
    idx = query_ivf_index(spark, path, qs, k=3, nprobe=1)
    plan = idx._sc._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "formatted")
    scans = [ln for ln in plan.splitlines() if "Location" in ln]
    assert scans and all("/vectors" in ln for ln in scans), plan
    assert "embeddings.parquet" not in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters: [" in ln]
    assert pf and all("cell" in ln for ln in pf), plan


def test_incremental_refresh(spark, sf_dir, tmp_path):
    """Vectors appended via refresh_ivf_index are found by later queries
    exactly as if they had been in the original build."""
    from datasketches_spark_spark.operators import refresh_ivf_index
    emb = read_table(spark, sf_dir, "embeddings")
    first = emb.where("vec_id % 2 = 0")
    rest = emb.where("vec_id % 2 = 1")
    inc_path = str(tmp_path / "inc")
    build_ivf_index(first, inc_path, num_cells=4, iters=4)
    refresh_ivf_index(rest, inc_path)

    qs = [(r.vec_id, r.embedding) for r in emb.where("vec_id < 5").collect()]
    got = _key(query_ivf_index(spark, inc_path, qs, k=3, nprobe=4))
    brute = _key(cosine_topk(emb, qs, k=3))
    assert got == brute  # full probe over build+refresh == brute force
