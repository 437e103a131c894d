#!/usr/bin/env python
"""Round-15 scale proofs: the extended crawl decode chain.

Rows (methodology = scaleproof_r13/r14: consume()-gated, one session
per measurement, shuffle-write bytes from the event log, x1 vs x10,
zero-Exchange asserted INSIDE the op so the claim is plan-pinned):

  br_zstd_chain — read_warc over response records whose bodies rotate
      the four r15 production encodings (chunked+gzip / brotli /
      brotli+UTF-16-BOM / zstd) -> http_decode_body -> html_to_text.
      Claim: the system-library codings change per-task CPU only —
      ZERO exchanges, shuffle bytes FLAT x1 -> x10.

  cc_index_slices — engine-written offsets lifted to a cc-index-shaped
      PARQUET table -> read_cc_index -> read_warc_slices re-read.
      Claim: the columnar-index path (the Common Crawl access pattern)
      adds no corpus shuffle; the only bytes that move are the tiny
      index rows feeding the range reads.

  sitemap_entries — per-row sitemap XML documents -> sitemap_text ->
      sitemap_entries -> explode. Claim: structured sitemap parsing is
      scan-stage (one Arrow pass + Column exprs), zero exchanges.

Fixtures: .scaleproof/r15_x1 (4 files x 300 response records) and
r15_x10 (40 files); sitemap docs are generated in-plan from a range
(x1 = 2k docs, x10 = 20k).
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from devtools.scaleproof import shuffle_bytes_from_eventlog  # noqa: E402
from devtools.scaleproof_r13 import consume  # noqa: E402


def _chunked(b: bytes, size: int = 61) -> bytes:
    out = [b"%x\r\n%s\r\n" % (len(b[i:i + size]), b[i:i + size])
           for i in range(0, len(b), size)]
    return b"".join(out) + b"0\r\n\r\n"


def _record(did: int) -> bytes:
    from datasketches_spark_spark.operators.brotlinative import \
        brotli_encode
    from datasketches_spark_spark.operators.zstdnative import zstd_encode
    html = (f"<html><head><title>T{did}</title></head><body>"
            f"<p>document {did} body &#8216;text&#8217; for the "
            f"decode chain</p><p>tail {did % 97}</p></body></html>")
    leg = did % 4
    if leg == 0:
        body = _chunked(gzip.compress(html.encode("utf-8")))
        hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
               b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip")
    elif leg == 1:
        body = brotli_encode(html.encode("utf-8"))
        hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
               b"Content-Encoding: br")
    elif leg == 2:
        body = brotli_encode(b"\xff\xfe" + html.encode("utf-16-le"))
        hdr = (b"Content-Type: text/html; charset=iso-8859-1\r\n"
               b"Content-Encoding: br")
    else:
        body = zstd_encode(html.encode("utf-8"))
        hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
               b"Content-Encoding: zstd")
    msg = b"HTTP/1.1 200 OK\r\n" + hdr + b"\r\n\r\n" + body
    head = ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: <https://h{did % 13}.example.com/p/"
            f"{did}>\r\n"
            "WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"WARC-Record-ID: <urn:uuid:{did}>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(msg)}\r\n\r\n").encode()
    return gzip.compress(head + msg + b"\r\n\r\n")


def ensure_fixtures() -> None:
    for scale, nfiles in (("r15_x1", 4), ("r15_x10", 40)):
        d = os.path.join(HERE, ".scaleproof", scale)
        if os.path.isdir(d) and len(os.listdir(d)) == nfiles:
            continue
        os.makedirs(d, exist_ok=True)
        did = 0
        for f in range(nfiles):
            with open(os.path.join(d, f"part{f:04d}.warc.gz"),
                      "wb") as fh:
                for _ in range(300):
                    fh.write(_record(did))
                    did += 1


def _assert_no_exchange(df, label: str) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"{label}: operator plan contains an "
                             f"Exchange:\n{plan}")


def op_br_zstd_chain(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (html_to_text,
                                                    http_decode_body)
    from datasketches_spark_spark.operators import read_warc
    out = (read_warc(spark, d, types=("response",))
           .select(
               F.col("record_id"),
               html_to_text(http_decode_body("payload")).alias("text")))
    _assert_no_exchange(out, "br_zstd_chain")
    return consume(out, "record_id", "text")


def op_cc_index_slices(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import url_surt_key
    from datasketches_spark_spark.operators import (read_cc_index,
                                                    read_warc,
                                                    read_warc_slices)
    ccdir = tempfile.mkdtemp(prefix="dss_ccidx_sp_")
    (read_warc(spark, d, with_offsets=True)
     .where(F.col("offset").isNotNull())
     .select(
         url_surt_key("target_uri", tracking_re=None)
         .alias("url_surtkey"),
         F.col("target_uri").alias("url"),
         F.col("path").alias("warc_filename"),
         F.col("offset").alias("warc_record_offset"),
         F.col("length").alias("warc_record_length"))
     ).write.mode("overwrite").parquet(ccdir)
    # warc_filename carries the absolute file: URI here, so no
    # warc_root prefix — alias it straight onto the slices contract
    idx = read_cc_index(spark, ccdir)
    again = read_warc_slices(
        spark, idx.select(F.col("filename").alias("path"),
                          "offset", "length"))
    _assert_no_exchange(again, "cc_index_slices")
    return consume(again, "record_id", "content_length")


def op_sitemap_entries(spark, d):
    # scale knob: sitemap-doc count proportional to the WARC fixture
    # (x1 = 2k docs, x10 = 20k), each doc 12 <url> entries
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (sitemap_entries,
                                                    sitemap_text)
    n = 2_000 * (10 if d.endswith("x10") else 1)
    docs = spark.range(n).select(
        F.encode(F.concat(
            F.lit("<urlset>"),
            F.concat_ws("", F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.concat(
                    F.lit("<url><loc>https://s.com/d/"),
                    F.col("id") * 12 + i,
                    F.lit("?a=1&amp;b=2</loc><lastmod>2025-01-0"),
                    i % 9 + 1,
                    F.lit("</lastmod></url>")))),
            F.lit("</urlset>")), "utf-8").alias("payload"))
    txt = docs.select(sitemap_text("payload").alias("t"))
    out = txt.select(F.explode(sitemap_entries("t")).alias("e")) \
        .select("e.loc", "e.lastmod")
    _assert_no_exchange(out, "sitemap_entries")
    return consume(out, "loc", "lastmod")


def op_main_content_route(spark, d):
    # the r15 extraction/routing extension of the decode chain:
    # WARC -> http_decode_body -> html_main_text (block features as
    # Column HOFs) alongside detect_mime over the decoded BYTES —
    # still one scan stage, zero exchanges
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (
        detect_mime, html_main_text, http_decode_body,
        http_decode_body_bytes)
    from datasketches_spark_spark.operators import read_warc
    out = (read_warc(spark, d, types=("response",))
           .select(
               F.col("record_id"),
               html_main_text(http_decode_body("payload"),
                              min_chars=20).alias("main"),
               detect_mime(http_decode_body_bytes("payload"))
               .alias("mime")))
    _assert_no_exchange(out, "main_content_route")
    # 'main' MUST be in the consume column set: the aggregate is what
    # stops Catalyst pruning the block-feature HOFs this op measures
    return consume(out, "record_id", "main", "mime")


OPS = [("br_zstd_chain", op_br_zstd_chain),
       ("cc_index_slices", op_cc_index_slices),
       ("sitemap_entries", op_sitemap_entries),
       ("main_content_route", op_main_content_route)]


def run_op(name, fn, scale_dir):
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
    res = fn(spark, scale_dir)
    wall = time.perf_counter() - t0
    spark.stop()
    if not (isinstance(res, dict) and "invariant" in res
            and "rows" in res):
        raise TypeError(f"{name}: must return consume(df, *cols)")
    time.sleep(1.0)
    shuf, inp = shuffle_bytes_from_eventlog(log_dir)
    print(json.dumps({"op": name, "scale": os.path.basename(scale_dir),
                      "wall_s": round(wall, 2), "rows": res["rows"],
                      "invariant": res["invariant"],
                      "shuffle_mb": round(shuf / 1e6, 2),
                      "input_mb": round(inp / 1e6, 2)}), flush=True)


def main():
    ensure_fixtures()
    only = set(sys.argv[1:])
    for op, fn in OPS:
        if only and op not in only:
            continue
        for scale in ("r15_x1", "r15_x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
