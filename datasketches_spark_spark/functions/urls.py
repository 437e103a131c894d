"""URL canonicalization and host extraction — the normalization every
crawl pipeline runs before URL-level dedup and domain-level curation
(a crawl sees the same page as ``http://WWW.Site.com/a?utm_source=x``
and ``https://site.com/a``; URL-keyed dedup without canonicalization
misses most of the carry-over).

Extension beyond the reference (sketch functions only). Companion to
``operators/domains.py`` (these produce its ``domain_col``) and
``operators/dedup.py::bloom_prefilter_match`` (canonical URLs are the
natural membership fingerprint for snapshot-over-snapshot crawls).

Everything is a chain of JVM string/array expressions (zero Python,
scan-stage, shuffle-free) built ONLY from deterministic regexp/split
primitives that an independent SQL engine replays verbatim — the
full-value oracle-gate recipe. No network/IDN/percent-decoding
semantics: this is the string-level canonical form (the Common Crawl /
warcio convention), not a URL resolver.

Canonical form (applied in this order):

1. strip the fragment (``#...``);
2. lowercase scheme and authority; strip a ``www.`` host prefix and
   the scheme-default port (``:80`` http, ``:443`` https);
3. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), sort the survivors byte-wise, and re-join —
   an empty survivor set drops the ``?`` entirely;
4. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters that never identify content (click/campaign tracking)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"

# multi-label public suffixes covered by the built-in default (a compact,
# documented subset of the Public Suffix List — pass your own for more)
DEFAULT_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.nz", "com.ar", "co.za",
)


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(col) -> Column:
    """Lowercased host of a URL (no port, no userinfo); null when the
    input has no ``scheme://`` authority."""
    c = _col(col)
    host = F.lower(F.regexp_extract(c, r"^[^:/?#]+://(?:[^@/?#]*@)?([^/:?#]*)", 1))
    return F.when(host == "", None).otherwise(host)


def url_registered_domain(col, multi_suffixes=DEFAULT_MULTI_SUFFIXES
                          ) -> Column:
    """The registrable domain of a URL's host: the last two labels, or
    the last three when the host ends in a known multi-label public
    suffix (``a.b.co.uk -> b.co.uk``). ``multi_suffixes`` defaults to a
    compact documented subset of the Public Suffix List — callers with
    real PSL needs pass the full list."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    is_multi = last2.isin(*list(multi_suffixes))
    return (F.when(host.isNull(), None)
            .when((n >= 3) & is_multi, last3)
            .when(n >= 2, last2)
            .otherwise(host))


def canonicalize_url(col, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical string form of a URL (module docstring, steps 1-4) —
    one nested JVM expression, replayable verbatim in SQL."""
    c = _col(col)
    # 1. fragment off
    nofrag = F.regexp_replace(c, r"#.*$", "")
    # 2. authority: lowercase, de-www, de-default-port
    prefix = F.regexp_extract(nofrag, r"^([^:/?#]+://(?:[^@/?#]*@)?[^/?#]*)", 1)
    rest = F.substring(nofrag, F.length(prefix) + 1, F.lit(2_147_483_647))
    auth = F.lower(prefix)
    auth = F.regexp_replace(auth, r"^(https?://)www\.", r"$1")
    auth = F.regexp_replace(auth, r"^(http://[^/:?#]*):80$", r"$1")
    auth = F.regexp_replace(auth, r"^(https://[^/:?#]*):443$", r"$1")
    # 3. query: drop tracking params, sort survivors
    path = F.regexp_replace(rest, r"\?.*$", "")
    qs = F.when(rest.contains("?"),
                F.regexp_replace(rest, r"^[^?]*\?", "")).otherwise(F.lit(""))
    params = F.filter(F.split(qs, "&"),
                      lambda p: (p != F.lit("")) & ~p.rlike(tracking_re))
    query = F.array_join(F.array_sort(params), "&")
    # 4. path: trailing slashes off
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(auth, path,
                    F.when(query == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), query)))
