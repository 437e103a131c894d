"""Crawl-frontier scheduling — politeness-aware fetch planning.

The last step between a frontier (``html_links`` / ``sitemap_entries``
/ ``read_cc_index`` output) and actual fetching: per RFC 9309 practice
a crawler issues at most one request per host per ``Crawl-delay``
seconds, so fetch order IS a per-host sequence. The Spark-first shape:

- hosts are the partition key (one window exchange — inherent to the
  problem, not an artifact: politeness serializes each host's fetches,
  so per-host sequencing is the minimum coordination any correct
  scheduler needs);
- the delay dimension (``functions.robots.robots_crawl_delay`` output)
  is host-bounded and broadcast — the frontier never shuffles twice;
- the result assigns every URL a deterministic ``(seq, eta_s)``:
  position in its host's queue and the earliest polite start time
  relative to the host's first fetch. Downstream fetch executors
  consume waves with a plain ``WHERE eta_s < horizon`` — partition
  pruning if the plan is written out partitioned by wave.

At 100 TB the window state per task is one running counter (Spark's
``row_number`` over a sorted partition streams), and a mega-host
(10M-URL wikipedia-style domain) is by DEFINITION a sequential fetch
queue — the skew is the workload's, not the plan's. Extension
component; no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import url_host

__all__ = ["schedule_fetches"]


def schedule_fetches(frontier: DataFrame, delays: DataFrame | None = None,
                     url_col: str = "url",
                     default_delay: float = 1.0) -> DataFrame:
    """Assign each frontier URL its polite fetch slot.

    ``frontier``: any DataFrame with ``url_col`` (absolute URLs —
    resolve first). ``delays``: optional ``(host, crawl_delay)``
    dimension (the :func:`functions.robots.robots_crawl_delay` output;
    broadcast — it is host-bounded); hosts absent from it (or with a
    null delay) use ``default_delay`` seconds.

    Returns ``(url_col, host, seq, eta_s)``: ``seq`` is the URL's
    1-based position in its host's fetch queue (deterministic: ordered
    by URL string, so reruns schedule identically) and ``eta_s =
    (seq - 1) * delay`` the earliest polite start relative to the
    host's first fetch. URLs without a parseable host get host null,
    seq over the null group (fetch those at will — they will fail DNS
    anyway, loudly)."""
    df = frontier.withColumn("host", url_host(F.col(url_col)))
    if delays is not None:
        dim = F.broadcast(
            delays.select("host", F.col("crawl_delay").cast("double")
                          .alias("__delay")))
        df = df.join(dim, "host", "left")
        delay: Column = F.coalesce(F.col("__delay"),
                                   F.lit(float(default_delay)))
    else:
        delay = F.lit(float(default_delay))
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    seq = F.row_number().over(w)
    out_cols = [F.col(url_col), F.col("host"),
                seq.alias("seq"),
                ((seq - F.lit(1)) * delay).alias("eta_s")]
    return df.select(*out_cols)
