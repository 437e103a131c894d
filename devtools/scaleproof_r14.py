#!/usr/bin/env python
"""Round-14 scale proofs: the crawl-ingestion chain.

Rows (methodology = scaleproof_r13: consume()-gated, one session per
measurement, shuffle-write bytes from the event log, x1 vs x10):

  warc_http_html_chain — read_warc (response records, chunked+gzipped
      bodies) -> http_decode_body -> html_to_text -> fingerprint-ish
      consumption. Claim: ZERO exchanges in the operator plan (the
      only shuffle is consume()'s own final aggregate, constant-size
      partials), so shuffle bytes stay FLAT x1 -> x10 while input
      grows 10x. Per-task memory is separately pinned by
      tests/test_warc.py::TestStreamingDecode (tracemalloc: constant
      peak vs stream size) — event logs can't see allocator peaks, so
      that claim lives in pytest where it is enforceable.

  warc_offsets_slices — read_warc(with_offsets=True) -> the CDX index
      -> read_warc_slices re-read. Claim: the index pass adds no
      exchange, and the record-level re-read is itself scan-stage
      (its parallelism knob is an explicit caller repartition of the
      tiny index, not a data shuffle).

Fixtures: .scaleproof/warc_x1 (4 files x 300 response records) and
warc_x10 (40 files), generated on demand — chunked + gzipped HTML
bodies, the real-Common-Crawl worst case the r13 chain mishandled.
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
    html = (f"<html><head><title>T{did}</title></head><body>"
            f"<p>document {did} body text &#8217; with entities "
            f"&#x2018;</p><p>tail {did % 97}</p></body></html>")
    msg = (b"HTTP/1.1 200 OK\r\n"
           b"Content-Type: text/html; charset=utf-8\r\n"
           b"Transfer-Encoding: chunked\r\n"
           b"Content-Encoding: gzip\r\n\r\n"
           + _chunked(gzip.compress(html.encode("utf-8"))))
    head = ("WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: <https://h{did % 13}.example.com/p/{did}>\r\n"
            "WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"WARC-Record-ID: <urn:uuid:{did}>\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(msg)}\r\n\r\n").encode()
    return gzip.compress(head + msg + b"\r\n\r\n")


def ensure_fixtures() -> None:
    for scale, nfiles in (("warc_x1", 4), ("warc_x10", 40)):
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


def op_chain(spark, d):
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (html_to_text,
                                                    http_decode_body)
    from datasketches_spark_spark.operators import read_warc
    out = (read_warc(spark, d, types=("response",))
           .select(
               F.col("record_id"),
               html_to_text(http_decode_body("payload")).alias("text")))
    _assert_no_exchange(out, "warc_http_html_chain")
    return consume(out, "record_id", "text")


def op_offsets_slices(spark, d):
    from datasketches_spark_spark.operators import (read_warc,
                                                    read_warc_slices)
    idx = read_warc(spark, d, with_offsets=True)
    _assert_no_exchange(idx, "warc_offsets_index")
    again = read_warc_slices(
        spark, idx.select("path", "offset", "length", "record_index"))
    return consume(again, "record_id", "content_length")


def op_robots(spark, d):
    # corpus = x1/x10 WARC fixture records lifted to URLs; rules =
    # a fixed 13-host dimension. Claim: the only hash exchange is the
    # rules-side per-host array aggregation, so shuffle bytes stay
    # FLAT while the corpus grows 10x.
    from pyspark.sql import functions as F
    from datasketches_spark_spark.functions import (parse_robots,
                                                    robots_allowed)
    from datasketches_spark_spark.operators import read_warc
    hosts = spark.range(13).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example.com"))
        .alias("host"),
        F.when(F.col("id") % 2 == 0,
               F.lit("User-agent: *\nAllow: /p\nDisallow: /\n"))
        .otherwise(F.lit("User-agent: *\nDisallow: /p/1*\n"))
        .alias("text"))
    rules = parse_robots(hosts, "host", "text")
    urls = read_warc(spark, d, types=("response",)) \
        .select(F.col("target_uri").alias("url"))
    out = robots_allowed(urls, rules)
    return consume(out, "url", "allowed")


OPS = [("warc_http_html_chain", op_chain),
       ("warc_offsets_slices", op_offsets_slices),
       ("robots_allowed", op_robots)]


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
        for scale in ("warc_x1", "warc_x10"):
            run_op(op, fn, os.path.join(HERE, ".scaleproof", scale))


if __name__ == "__main__":
    main()
