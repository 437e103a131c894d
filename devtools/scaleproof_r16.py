#!/usr/bin/env python
"""Round-16 scale proofs: document extraction + sketch-driven layout.

Methodology = scaleproof_r13/r14/r15: consume()-gated, one session per
measurement, shuffle-write bytes from the event log, x1 vs x10, and
zero-Exchange asserted INSIDE the op where the claim is "scan-stage".

  doc_extract_route — in-plan generated PDF (classic / Type0+CMap /
      ObjStm) + DOCX + XLSX + PPTX + ODT payloads -> the
      coalesce(detect_ooxml, detect_mime) router -> per-format
      extraction. Claim: routing + extraction are one streaming Arrow
      pass per format branch — ZERO exchanges, shuffle FLAT x1 -> x10
      (per-task CPU is where the decode cost lives).

  quantile_bucket_agg — skewed values -> quantile_bucket over
      LITERAL boundaries (decoded once, driver-side, from a persisted
      state) -> per-bucket aggregate. Claim: equi-depth bucket ids are
      scan-stage Column arithmetic; the only exchange is the final
      per-bucket partial-aggregate rows (map-side combined), so
      shuffle bytes are FLAT x1 -> x10 while input rows grow 10x.

  skew_salt_agg — a key distribution with one pathological hot key
      (50% of all rows) -> skew_salt two-stage aggregation. Claim:
      the partial stage's exchange carries (key, salt) combined rows
      — O(partitions x keys), FLAT x1 -> x10 — which is exactly why
      salting beats shipping the hot key's raw rows to one reducer.

Fixtures are generated in-plan from ranges (x1 = 2k docs, x10 = 20k);
no on-disk fixture set is needed.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from devtools.scaleproof import shuffle_bytes_from_eventlog  # noqa: E402
from devtools.scaleproof_r13 import consume  # noqa: E402


def _assert_no_exchange(df, label: str) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"{label}: operator plan contains an "
                             f"Exchange:\n{plan}")


def _n(scale_dir: str) -> int:
    return 2_000 * (10 if scale_dir.endswith("x10") else 1)


def op_doc_extract_route(spark, d):
    import pandas as pd
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (detect_mime,
                                                    detect_ooxml)
    from datasketches_spark_spark.operators import (
        extract_docx_text, extract_odt_text, extract_pdf_text,
        extract_pptx_text, extract_xlsx_text)
    from datasketches_spark_spark.operators.docxcodec import \
        encode_docx_text
    from datasketches_spark_spark.operators.odfcodec import \
        encode_odt_text
    from datasketches_spark_spark.operators.ooxmlcodec import (
        encode_pptx_text, encode_xlsx_cells)
    from datasketches_spark_spark.operators.pdfcodec import (
        encode_pdf_text, encode_pdf_text_objstm, encode_pdf_text_type0)

    n = _n(d)

    def _mk(pdfs):
        encs = [lambda i: encode_pdf_text([f"doc {i} classic body"]),
                lambda i: encode_pdf_text_type0([f"doc {i} ünïcode"]),
                lambda i: encode_pdf_text_objstm([f"doc {i} packed"]),
                lambda i: encode_docx_text([f"doc {i}", "p2 < & >"]),
                lambda i: encode_xlsx_cells([[f"d{i}", i]]),
                lambda i: encode_pptx_text([f"slide {i}"]),
                lambda i: encode_odt_text([f"doc {i}", "odt p2"])]
        for pdf in pdfs:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [encs[i % 7](i) for i in ids]})

    docs = (spark.range(0, n, 1, 32)
            .mapInPandas(_mk, "doc_id long, payload binary")
            .withColumn("mime", F.coalesce(detect_ooxml("payload"),
                                           detect_mime("payload"))))
    dispatch = [
        ("application/pdf", extract_pdf_text),
        ("application/vnd.openxmlformats-officedocument."
         "wordprocessingml.document", extract_docx_text),
        ("application/vnd.openxmlformats-officedocument."
         "spreadsheetml.sheet", extract_xlsx_text),
        ("application/vnd.openxmlformats-officedocument."
         "presentationml.presentation", extract_pptx_text),
        ("application/vnd.oasis.opendocument.text", extract_odt_text),
    ]
    out = None
    from pyspark.sql import functions as F2
    for essence, fn in dispatch:
        part = fn(docs.where(F.col("mime") == essence), "doc_id") \
            .select("doc_id", "text")
        out = part if out is None else out.unionByName(part)
    _assert_no_exchange(out, "doc_extract_route")
    return consume(out.select("doc_id",
                              F2.length("text").alias("tlen")),
                   "doc_id", "tlen")


def op_quantile_bucket_agg(spark, d):
    import numpy as np
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import (quantile_boundaries,
                                                    quantile_bucket)
    from datasketches_spark_spark.sketches import KllSketch

    n = _n(d) * 50                      # row-heavy: 100k / 1M
    # the persisted state a real pipeline would read from yesterday's
    # rollup — built here once, O(state) on the driver
    sk = KllSketch(k=65536, dtype=np.float64)
    sk.update_batch(np.random.default_rng(5).exponential(100.0, 50_000))
    bounds = quantile_boundaries(sk.serialize(), 16)
    rows = spark.range(n).select(
        (F.pow(F.col("id") % 1000 + 1, 1.7) / 10.0).alias("v"))
    out = (rows.groupBy(quantile_bucket("v", bounds).alias("bk"))
           .agg(F.count("*").alias("n"), F.sum("v").alias("s")))
    # ONE exchange (the 16-row partial aggregate) is the whole plan —
    # assert the bucket PROJECTION itself is scan-stage
    _assert_no_exchange(
        rows.select(quantile_bucket("v", bounds).alias("bk")),
        "quantile_bucket projection")
    return consume(out, "bk", "n")


def op_skew_salt_agg(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.operators import skew_salt

    n = _n(d) * 50
    # 50% of all rows land on one key — the straggler shape
    rows = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id") % 997))
        .alias("k"),
        F.col("id"),
        (F.col("id") % 13).cast("double").alias("v"))
    salt = skew_salt("k", ["hot"], 32, F.col("id"))
    partial = (rows.groupBy("k", salt.alias("s"))
               .agg(F.sum("v").alias("ps"), F.count("*").alias("pc")))
    final = (partial.groupBy("k")
             .agg(F.sum("ps").alias("sv"), F.sum("pc").alias("cnt")))
    return consume(final, "k", "cnt")


OPS = [("doc_extract_route", op_doc_extract_route),
       ("quantile_bucket_agg", op_quantile_bucket_agg),
       ("skew_salt_agg", op_skew_salt_agg)]


def run_op(name, fn, scale):
    from datasketches_spark_spark.sources import session_builder
    log_dir = tempfile.mkdtemp()
    spark = (session_builder(master="local[32]", shuffle_partitions=32)
             .config("spark.ui.enabled", "false")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", log_dir)
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.eventLog.compress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    res = fn(spark, scale)
    wall = time.perf_counter() - t0
    spark.stop()
    if not (isinstance(res, dict) and "invariant" in res
            and "rows" in res):
        raise TypeError(f"{name}: must return consume(df, *cols)")
    time.sleep(1.0)
    shuf, inp = shuffle_bytes_from_eventlog(log_dir)
    print(json.dumps({"op": name, "scale": os.path.basename(scale),
                      "wall_s": round(wall, 2), "rows": res["rows"],
                      "invariant": res["invariant"],
                      "shuffle_mb": round(shuf / 1e6, 2),
                      "input_mb": round(inp / 1e6, 2)}), flush=True)


def main():
    only = set(sys.argv[1:])
    for op, fn in OPS:
        if only and op not in only:
            continue
        for scale in ("r16_x1", "r16_x10"):
            run_op(op, fn, scale)


if __name__ == "__main__":
    main()
