#!/usr/bin/env python
"""End-to-end CRAWL ingestion pipeline on the fixture corpus (r15).

The full path from raw crawl bytes to a curated, re-shareable corpus —
every stage a DataFrame transform, the decode chain entirely
scan-stage (zero shuffles until dedup, which needs one by definition):

1. simulate a crawl: documents re-frame as WARC *response* records
   whose HTTP bodies rotate the four production encodings
   (chunked+gzip / brotli / brotli+UTF-16-BOM / zstd) — written
   through the engine's own deterministic `write_warc` sink with a
   warcinfo preamble;
2. robots gate: planted per-host robots.txt -> `parse_robots` ->
   `robots_allowed` broadcast verdicts (the corpus never shuffles);
3. decode: `read_warc` -> `http_decode_body` (de-chunk, inflate,
   charset per WHATWG BOM > header > meta) -> `html_to_text`;
4. frontier expansion: `html_links` -> `url_resolve` -> `url_surt_key`
   + politeness planning via `robots_crawl_delay` + `schedule_fetches`;
5. index + selective re-read: `read_warc(with_offsets=True)` ->
   cc-index-shaped parquet -> `read_cc_index` -> `read_warc_slices`
   (the 100 TB access pattern: filter the index, range-read records);
6. curate: quality features + exact dedup, then re-emit the keepers
   as a WET-style conversion corpus (`write_warc`) and read it back
   with `read_wet`.

Run: python examples/crawl_pipeline_demo.py [sf_dir]
"""

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from datasketches_spark_spark.functions import (  # noqa: E402
    html_links, html_to_text, http_decode_body, parse_robots,
    robots_allowed, robots_crawl_delay, url_host, url_resolve,
    url_surt_key)
from datasketches_spark_spark.functions.text import (  # noqa: E402
    doc_fingerprint, token_count)
from datasketches_spark_spark.operators import (  # noqa: E402
    read_cc_index, read_warc, read_warc_slices, read_wet,
    schedule_fetches, write_warc)
from datasketches_spark_spark.operators.brotlinative import (  # noqa: E402
    brotli_encode)
from datasketches_spark_spark.operators.zstdnative import (  # noqa: E402
    zstd_encode)
from datasketches_spark_spark.sources import (  # noqa: E402
    read_table, session_builder)


def _chunked(b: bytes, size: int = 48) -> bytes:
    out = [b"%x\r\n%s\r\n" % (len(b[i:i + size]), b[i:i + size])
           for i in range(0, len(b), size)]
    return b"".join(out) + b"0\r\n\r\n"


def simulate_crawl(spark, sf_dir: str, out_dir: str) -> None:
    """Stage 1: fixture docs -> encoded WARC response shards."""
    docs = (read_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 600)
            .where(~F.col("text").rlike("[<>&\t\n\r]")
                   & ~F.col("text").contains("  ")
                   & (F.col("text") == F.trim(F.col("text"))))
            .select("doc_id", "text").repartition(2))

    def mk(pdf_iter):
        for pdf in pdf_iter:
            uris, payloads = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                html = (f"<html><body><p>{text}</p>"
                        f'<a href="/d/{(did + 1) % 600}">next</a>'
                        f"<a href='../tag/{did % 7}'>tag</a>"
                        "</body></html>")
                leg = did % 4
                if leg == 0:
                    body = _chunked(gzip.compress(html.encode()))
                    hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
                           b"Transfer-Encoding: chunked\r\n"
                           b"Content-Encoding: gzip")
                elif leg == 1:
                    body = brotli_encode(html.encode())
                    hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
                           b"Content-Encoding: br")
                elif leg == 2:
                    body = brotli_encode(
                        b"\xff\xfe" + html.encode("utf-16-le"))
                    hdr = (b"Content-Type: text/html; "
                           b"charset=iso-8859-1\r\nContent-Encoding: br")
                else:
                    body = zstd_encode(html.encode())
                    hdr = (b"Content-Type: text/html; charset=utf-8\r\n"
                           b"Content-Encoding: zstd")
                uris.append(f"https://h{did % 10}.example.com/d/{did}")
                payloads.append(b"HTTP/1.1 200 OK\r\n" + hdr
                                + b"\r\n\r\n" + body)
            yield pd.DataFrame({"target_uri": uris, "payload": payloads})

    responses = docs.mapInPandas(
        mk, "target_uri string, payload binary")
    manifest = write_warc(
        responses, out_dir, warc_type="response",
        content_type="application/http; msgtype=response",
        warcinfo="software: datasketches-spark-spark crawl demo\r\n")
    print(f"[1] wrote {sum(m.n_records for m in manifest)} response "
          f"records across {len(manifest)} shards")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (session_builder(master="local[8]", shuffle_partitions=8)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="crawl_demo_")
    crawl = os.path.join(work, "crawl")

    simulate_crawl(spark, sf_dir, crawl)

    # ---- 2. robots gate (per-host dimension; corpus never shuffles)
    hosts = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example.com"))
        .alias("host"),
        F.when(F.col("id") % 5 == 0,
               F.lit("User-agent: *\nDisallow: /\nCrawl-delay: 5\n"))
        .otherwise(F.lit("User-agent: *\nAllow: /\nCrawl-delay: 1\n"))
        .alias("text"))
    rules = parse_robots(hosts, "host", "text")

    recs = read_warc(spark, crawl, types=("response",))
    urls = recs.select(F.col("target_uri").alias("url"))
    verdicts = robots_allowed(urls, rules)
    n_all, n_ok = verdicts.count(), \
        verdicts.where("allowed").count()
    print(f"[2] robots: {n_ok}/{n_all} URLs fetchable "
          f"(every 5th host disallows everything)")

    # ---- 3. decode chain on the fetchable subset (left-semi join on
    # the broadcast-resolved verdicts; the decode itself is scan-stage)
    fetchable = verdicts.where("allowed") \
        .select(F.col("url").alias("target_uri"))
    pages = (recs.join(F.broadcast(fetchable), "target_uri",
                       "left_semi")
             .select("target_uri",
                     http_decode_body("payload").alias("html")))
    from datasketches_spark_spark.functions import (detect_mime,
                                                    html_main_text)
    pages = pages.select(
        "target_uri",
        html_to_text("html").alias("text"),
        html_main_text("html", min_chars=20).alias("main"),
        detect_mime(F.encode("html", "UTF-8")).alias("mime"),
        html_links("html").alias("links"))
    sample = pages.select("target_uri", "text", "main", "mime").first()
    print(f"[3] decoded e.g. {sample.target_uri!r} ({sample.mime}) -> "
          f"{sample.text[:48]!r}... | main content: "
          f"{sample.main[:48]!r}...")

    # ---- 4. frontier expansion + politeness plan
    frontier = (pages
                .select("target_uri", F.explode("links").alias("l"))
                .select(url_resolve("target_uri", "l").alias("url"))
                .distinct())
    delays = robots_crawl_delay(hosts, "host", "text")
    plan = schedule_fetches(frontier, delays)
    print("[4] frontier:", frontier.count(), "urls;",
          "first wave (eta<2s):", plan.where("eta_s < 2").count(),
          "| sample key:",
          frontier.select(url_surt_key("url")).first()[0])

    # ---- 5. cc-index + selective range re-read
    ccdir = os.path.join(work, "ccindex")
    (read_warc(spark, crawl, with_offsets=True)
     .where(F.col("offset").isNotNull())
     .select(url_surt_key("target_uri", tracking_re=None)
             .alias("url_surtkey"),
             F.col("target_uri").alias("url"),
             F.col("path").alias("warc_filename"),
             F.col("offset").alias("warc_record_offset"),
             F.col("length").alias("warc_record_length"))
     ).write.mode("overwrite").parquet(ccdir)
    idx = read_cc_index(spark, ccdir)
    picked = idx.where("urlkey like 'com,example,h3)%'")
    hits = read_warc_slices(
        spark, picked.select(F.col("filename").alias("path"),
                             "offset", "length"))
    print(f"[5] cc-index: {idx.count()} rows; host-h3 slice re-read ->"
          f" {hits.count()} records (index filtered, corpus untouched)")

    # ---- 6. curate + WET re-emit
    curated = (pages
               .select("target_uri", "text",
                       token_count("text").alias("n_tok"),
                       doc_fingerprint("text").alias("fp"))
               .where("n_tok >= 5")
               .groupBy("fp")
               .agg(F.min(F.struct("target_uri", "text")).alias("k"))
               .select(F.col("k.target_uri").alias("target_uri"),
                       F.col("k.text").alias("payload")))
    wet = os.path.join(work, "wet")
    write_warc(curated, wet, warcinfo="software: demo WET\r\n")
    back = read_wet(spark, wet)
    print(f"[6] curated {curated.count()} unique docs -> WET; "
          f"read_wet returns {back.count()} rows; "
          f"hosts: {back.select(url_host('url')).distinct().count()}")

    spark.stop()
    print("crawl pipeline demo complete:", work)


if __name__ == "__main__":
    main()
