#!/usr/bin/env python
"""Phase-timing probe for q16 (throwaway diagnostic)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datasketches_spark_spark.sources import session_builder, read_table  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (session_builder(master=f"local[{cpus}]", shuffle_partitions=cpus)
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def _warm(batches):
    import datasketches_spark_spark.operators  # noqa: F401
    import datasketches_spark_spark.sketches  # noqa: F401
    yield from batches


warm = spark.range(cpus * 10).repartition(cpus)
warm.mapInPandas(_warm, warm.schema).selectExpr("count(*)").collect()

from datasketches_spark_spark.functions.text import ngrams, tokenize  # noqa: E402
from datasketches_spark_spark.operators import bm25_topk, build_text_index, query_text_index  # noqa: E402
from datasketches_spark_spark.operators.retrieval import _spread  # noqa: E402
from __spark_entry__ import _BM25_QUERIES, sketch_grouped_agg, freqitems_measure  # noqa: E402

for it in range(3):
    t0 = time.perf_counter()
    docs = read_table(spark, sf_dir, "documents")
    tok = (_spread(docs.select("doc_id", "text"))
           .select("doc_id", tokenize("text").alias("toks"))
           .localCheckpoint())
    t1 = time.perf_counter()
    grams = tok.select(F.explode(ngrams(F.col("toks"), 2)).alias("bigram"))
    fi = sketch_grouped_agg(grams, [], freqitems_measure("fi", "bigram", max_map_size=65_536))
    fi.collect()
    t2 = time.perf_counter()
    bm = bm25_topk(tok, "doc_id", None, _BM25_QUERIES, k=10, tokens_col="toks")
    bm.collect()
    t3 = time.perf_counter()
    import shutil
    import tempfile
    root = tempfile.mkdtemp(prefix="dss_profq16_")
    path = root + "/idx"
    build_text_index(tok, "doc_id", None, path, num_buckets=16, tokens_col="toks")
    t4 = time.perf_counter()
    res = query_text_index(spark, path, _BM25_QUERIES, k=10).localCheckpoint()
    res.collect()
    t5 = time.perf_counter()
    shutil.rmtree(root, ignore_errors=True)
    print(f"iter{it}: tok_ckpt {t1-t0:.3f}  gram {t2-t1:.3f}  bm25 {t3-t2:.3f}"
          f"  idx_build {t4-t3:.3f}  idx_probe {t5-t4:.3f}  total {t5-t0:.3f}",
          flush=True)
spark.stop()
