"""robots.txt evaluation (RFC 9309) — crawl-pipeline URL filtering.

A curation pipeline that re-crawls or audits a corpus needs "was this
URL fetchable for this agent?" answered at dataset scale. robots.txt
files are a per-HOST dimension table (one small text per host), so the
Spark-first shape is:

1. ``parse_robots(df, host, text, user_agent=...)`` — one Arrow pass
   over the robots documents (dimension-sized, never the corpus)
   emitting the SELECTED group's rules as rows
   ``(host, rule_path, allow)``; ``robots_sitemaps`` lifts the
   group-independent ``Sitemap:`` URLs (RFC 9309 §2.2.4);
2. ``robots_allowed(urls, rules, ...)`` — broadcast the rules table
   (host-bounded), join on host, and resolve each URL with pure JVM
   expressions: per §2.2.2 the MOST SPECIFIC rule wins (longest
   ``rule_path``, Allow beating Disallow on ties), wildcard ``*`` and
   the trailing ``$`` anchor per §2.2.3, and no matching rule (or a
   host with no robots entry) -> allowed. Matching runs against the
   URL's path-plus-query (fragment stripped), the Googlebot
   convention.

Group selection per §2.2.1: the group whose ``User-agent`` product
token case-insensitively equals the crawler's token wins; otherwise
the ``*`` group; rules before any User-agent line belong to no group
and are ignored; consecutive User-agent lines share one group.

The rule -> verdict step is replayable by an independent SQL engine
(the demo-gate recipe): for wildcard-free rules the match predicate is
``starts_with(path, rule)`` and precedence is an argmax over
``(length(rule) * 2 + allow)`` — exactly what the oracle recomputes.
Extension component; no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["parse_robots_text", "parse_robots", "robots_allowed",
           "robots_crawl_delay", "robots_sitemaps"]


def _parse_groups(text: str):
    """Shared group parser: ``(groups, sitemaps)`` where groups maps
    UA token -> ``{"rules": [(path, allow), ...], "delay": float |
    None}``. Group selection state per RFC 9309 §2.2.1 (consecutive
    User-agent lines share a group; any group-member line after them
    closes the header)."""
    groups: dict[str, dict] = {}
    sitemaps: list[str] = []
    current: list[str] = []     # UA tokens of the open group
    in_group_rules = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if in_group_rules:
                current = []            # a new group starts
                in_group_rules = False
            tok = val.lower()
            if tok:
                current.append(tok)
                groups.setdefault(tok, {"rules": [], "delay": None})
            continue
        if key in ("allow", "disallow"):
            in_group_rules = True
            if not current or val == "":
                # rules outside any group are ignored; an empty
                # Disallow (or Allow) value is a no-op rule
                continue
            for tok in current:
                groups[tok]["rules"].append((val, key == "allow"))
        elif key == "crawl-delay":
            # non-standard but near-universal extension: a per-group
            # member line (closes the UA header like allow/disallow)
            in_group_rules = True
            try:
                delay = float(val)
            except ValueError:
                continue                # malformed value: ignore line
            if delay < 0:
                continue
            for tok in current:
                if groups[tok]["delay"] is None:
                    groups[tok]["delay"] = delay    # first wins
    return groups, sitemaps


def _select_group(groups: dict, user_agent: str) -> dict:
    ua = user_agent.strip().lower()
    if ua in groups:
        return groups[ua]
    return groups.get("*", {"rules": [], "delay": None})


def parse_robots_text(text: str, user_agent: str = "*"):
    """Pure-python single-document parser (the per-row kernel of
    :func:`parse_robots`, exposed for tests and driver-side use).
    Returns ``(rules, sitemaps)``: rules is ``[(path, allow), ...]``
    for the group selected for ``user_agent``; sitemaps collects every
    ``Sitemap:`` URL regardless of group."""
    groups, sitemaps = _parse_groups(text)
    return _select_group(groups, user_agent)["rules"], sitemaps


def _decode(t) -> str:
    if t is None:
        return ""
    if isinstance(t, str):
        return t
    return bytes(t).decode("utf-8", "replace")


def parse_robots(df, host: str, text: str, user_agent: str = "*"):
    """robots documents ``(host, text)`` -> the rules table
    ``(host, rule_path, allow)`` for ``user_agent`` — one Arrow pass
    over a host-bounded input (a dimension table at any corpus
    scale). A host whose file yields no applicable rules emits no
    rows (absent host == everything allowed downstream)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hosts, paths, allows = [], [], []
            for h, t in zip(pdf[host], pdf[text]):
                rules, _ = parse_robots_text(_decode(t), user_agent)
                for p, a in rules:
                    hosts.append(h)
                    paths.append(p)
                    allows.append(a)
            yield pd.DataFrame({"host": hosts, "rule_path": paths,
                                "allow": allows})

    return df.select(host, text).mapInPandas(
        run, "host string, rule_path string, allow boolean")


def robots_sitemaps(df, host: str, text: str):
    """``(host, text)`` -> exploded ``(host, sitemap_url)`` rows (the
    crawl-frontier seed listing)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hosts, urls = [], []
            for h, t in zip(pdf[host], pdf[text]):
                _, sm = parse_robots_text(_decode(t))
                for u in sm:
                    hosts.append(h)
                    urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return df.select(host, text).mapInPandas(
        run, "host string, sitemap_url string")


def robots_crawl_delay(df, host: str, text: str,
                       user_agent: str = "*",
                       default_delay: float | None = None):
    """``(host, text)`` -> ``(host, crawl_delay)`` for ``user_agent``
    (r15) — the politeness dimension a fetch scheduler joins against
    its frontier. ``Crawl-delay`` is the non-standard but
    near-universal extension line; it is group-scoped like
    Allow/Disallow (the agent's own group wins over ``*``), the FIRST
    value in a group wins, and malformed/negative values are ignored.
    Hosts that declare no delay emit ``default_delay`` (null by
    default, so schedulers can tell "unspecified" from an explicit
    0). One Arrow pass over the host-bounded dimension, like
    :func:`parse_robots`."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            hosts, delays = [], []
            for h, t in zip(pdf[host], pdf[text]):
                groups, _ = _parse_groups(_decode(t))
                d = _select_group(groups, user_agent)["delay"]
                hosts.append(h)
                delays.append(default_delay if d is None else d)
            yield pd.DataFrame(
                {"host": hosts,
                 "crawl_delay": pd.Series(delays, dtype="float64")})

    return df.select(host, text).mapInPandas(
        run, "host string, crawl_delay double")


def _rule_regex(rule: Column) -> Column:
    """robots path rule -> anchored Java regex, as pure Column string
    ops: escape every regex metacharacter (including ``$``), turn
    ``*`` into ``.*``, then re-anchor a TRAILING ``$`` (the only
    position where RFC 9309 §2.2.3 gives it meaning — elsewhere it is
    literal, the Googlebot behavior)."""
    esc = F.regexp_replace(rule,
                           r"([\\.\[\]\{\}\(\)\+\-\^\|\?\$])",
                           r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    anchored = F.when(
        esc.endswith(r"\$"),
        F.concat(F.substr(esc, F.lit(1), F.length(esc) - 2),
                 F.lit("$"))) \
        .otherwise(F.concat(esc, F.lit(".*")))
    return F.concat(F.lit("^"), anchored)


def robots_allowed(urls, rules, url_col: str = "url",
                   out_col: str = "allowed"):
    """Append ``allowed`` to ``urls`` by evaluating the rules table
    (output of :func:`parse_robots`; columns host/rule_path/allow)
    per RFC 9309: longest matching ``rule_path`` wins, Allow beats
    Disallow on equal length, no match (or no rules for the host) ->
    allowed.

    100 TB shape — the corpus NEVER shuffles: rules pre-aggregate to
    one array row per host (the only exchange, rules-table-sized),
    that dimension broadcasts into a left join, and the verdict is a
    per-row higher-order expression (``filter`` by ``regexp_like``
    with the precompiled per-rule regex, then ``array_max`` over
    ``(2*length + allow)`` ranks). One corpus scan, no Python row
    path, no row-id bookkeeping — multiplicity is trivially
    preserved because no aggregate ever touches the URL side."""
    from .urls import url_host

    rule_arr = (rules.groupBy(F.col("host").alias("__host"))
                .agg(F.collect_list(F.struct(
                    F.length("rule_path").alias("len"),
                    F.col("allow").alias("a"),
                    _rule_regex(F.col("rule_path")).alias("re")))
                    .alias("__rules")))
    u = (urls
         .withColumn("__host", url_host(F.col(url_col)))
         .withColumn(
             "__path",
             F.coalesce(
                 F.nullif(F.regexp_extract(
                     F.col(url_col),
                     r"^[^:/?#]+://[^/?#]*([^#]*)", 1), F.lit("")),
                 F.lit("/"))))
    j = u.join(F.broadcast(rule_arr), "__host", "left")
    matched = F.filter(
        F.col("__rules"),
        lambda r: F.regexp_like(F.col("__path"), r["re"]))
    best = F.array_max(F.transform(
        matched,
        lambda r: F.struct(
            (r["len"] * 2 + r["a"].cast("int")).alias("rank"),
            r["a"].alias("a"))))
    verdict = F.when(best.isNull(), F.lit(True)).otherwise(best["a"])
    return (j.withColumn(out_col, verdict)
            .drop("__rules", "__host", "__path"))
