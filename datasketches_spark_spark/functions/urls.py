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


class PublicSuffixList:
    """Parsed Public Suffix List rules for :func:`url_registered_domain`.

    Accepts the real PSL file format (https://publicsuffix.org/list/):
    ``//`` comments and blank lines are skipped; ``*.`` prefixes are
    wildcard rules (any single label under the base is a public
    suffix); ``!`` prefixes are exception rules (the named domain IS
    registrable even though a wildcard would cover it). Rules are
    matched label-wise per the PSL algorithm, with the implicit
    default rule ``*`` (an unlisted TLD is itself a public suffix).

    The parsed sets ship INSIDE the Column expression (Catalyst folds
    ``isin`` over >10 literals to an O(1) hash ``InSet``), so matching
    stays a scan-stage JVM expression — no join, no shuffle, no Python
    row path; the full ~10k-rule list adds ~200 KB to the plan, once.
    """

    __slots__ = ("plain", "wildcard_bases", "exceptions", "max_labels")

    def __init__(self, plain, wildcard_bases, exceptions):
        self.plain = frozenset(plain)
        self.wildcard_bases = frozenset(wildcard_bases)
        self.exceptions = frozenset(exceptions)
        lens = [1]
        lens += [s.count(".") + 1 for s in self.plain]
        lens += [s.count(".") + 2 for s in self.wildcard_bases]
        lens += [s.count(".") + 1 for s in self.exceptions]
        self.max_labels = max(lens)

    @classmethod
    def parse(cls, lines) -> "PublicSuffixList":
        plain, wild, exc = [], [], []
        for raw in lines:
            rule = raw.strip().split()[0] if raw.strip() else ""
            if not rule or rule.startswith("//"):
                continue
            rule = rule.lower().rstrip(".")
            if rule.startswith("!"):
                exc.append(rule[1:])
            elif rule.startswith("*."):
                wild.append(rule[2:])
            elif rule == "*":
                pass  # the implicit default rule — always applied
            else:
                plain.append(rule)
        return cls(plain, wild, exc)

    @classmethod
    def load(cls, path: str) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as fh:
            return cls.parse(fh)

    @classmethod
    def bundled(cls) -> "PublicSuffixList":
        """The snapshot committed at ``data/psl_snapshot.dat`` — a
        curated OFFLINE snapshot in the real PSL file format (every
        ccTLD, classic + common gTLDs, the major second-level
        registries, the documented wildcard/exception families like
        ``*.ck`` / ``!www.ck`` and the ``*.<city>.jp`` pairs, and the
        common private-section suffixes). It is deliberately NOT the
        full ~10k-rule Mozilla list (this build environment has no
        network) — the file header documents exactly what is and is
        not covered; production deployments should fetch the current
        list out-of-band and use :meth:`load` (identical format and
        code path)."""
        import os
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "psl_snapshot.dat")
        return cls.load(path)

    @classmethod
    def from_dataframe(cls, df, rule_col: str = "rule"
                       ) -> "PublicSuffixList":
        # bounded collect: the PSL is a dimension table (~10k rules)
        return cls.parse(r[rule_col] for r in df.select(rule_col).collect()
                         if r[rule_col] is not None)


def url_host(col) -> Column:
    """Lowercased host of a URL (no port, no userinfo); null when the
    input has no ``scheme://`` authority."""
    c = _col(col)
    host = F.lower(F.regexp_extract(c, r"^[^:/?#]+://(?:[^@/?#]*@)?([^/:?#]*)", 1))
    return F.when(host == "", None).otherwise(host)


def url_registered_domain(col, multi_suffixes=DEFAULT_MULTI_SUFFIXES,
                          psl: PublicSuffixList | None = None) -> Column:
    """The registrable domain of a URL's host.

    Default mode (``psl=None``, unchanged semantics): the last two
    labels, or the last three when the host ends in a known two-label
    public suffix (``a.b.co.uk -> b.co.uk``); ``multi_suffixes``
    defaults to a compact documented subset of the Public Suffix List.

    PSL mode: pass a :class:`PublicSuffixList` (from
    ``PublicSuffixList.load(path)`` / ``.parse(lines)`` /
    ``.from_dataframe(df)``) for the full PSL algorithm — longest
    matching rule wins, ``*.`` wildcard rules make every single label
    under their base a public suffix, ``!`` exception rules are
    themselves registrable, unlisted TLDs fall back to the implicit
    ``*`` rule, and a host that IS a public suffix yields null. Still
    one scan-stage JVM expression (sets fold to ``InSet``)."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    if psl is None:
        last2 = F.concat_ws(".", F.slice(labels, -2, 2))
        last3 = F.concat_ws(".", F.slice(labels, -3, 3))
        is_multi = last2.isin(*list(multi_suffixes))
        return (F.when(host.isNull(), None)
                .when((n >= 3) & is_multi, last3)
                .when(n >= 2, last2)
                .otherwise(host))

    def sfx(k: int) -> Column:
        return F.concat_ws(".", F.slice(labels, -k, k))

    def in_set(c: Column, s: frozenset) -> Column:
        return c.isin(*sorted(s)) if s else F.lit(False)

    # public-suffix length: LONGEST matching rule wins, so the when-
    # chain is built with the largest k outermost (ascending loop —
    # each iteration wraps the previous chain). A k-label suffix is a
    # PS if it matches a plain rule, or its (k-1)-label parent is a
    # wildcard base; the implicit default rule '*' gives 1.
    ps_len: Column = F.lit(1)
    for k in range(2, psl.max_labels + 1):
        is_ps = (n >= k) & (
            in_set(sfx(k), psl.plain)
            | in_set(sfx(k - 1), psl.wildcard_bases))
        ps_len = F.when(is_ps, F.lit(k)).otherwise(ps_len)
    # exception rules: the named domain itself is registrable and
    # overrides the wildcard that would otherwise cover it (longest
    # exception outermost, same construction)
    exc: Column = F.lit(None).cast("string")
    if psl.exceptions:
        for k in range(1, psl.max_labels + 1):
            exc = F.when((n >= k) & in_set(sfx(k), psl.exceptions),
                         sfx(k)).otherwise(exc)
    reg_len = ps_len + 1
    registered = F.concat_ws(
        ".", F.slice(labels, -reg_len, reg_len))
    return (F.when(host.isNull(), F.lit(None).cast("string"))
            .when(exc.isNotNull(), exc)
            .when(n >= reg_len, registered)
            .otherwise(F.lit(None).cast("string")))


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


def _xml_unescape(u: Column) -> Column:
    """The five XML predefined entities (sitemaps are required to
    entity-escape ``& < > ' "`` inside URLs), ``&amp;`` last."""
    u = F.regexp_replace(u, r"(?i)&lt;", "<")
    u = F.regexp_replace(u, r"(?i)&gt;", ">")
    u = F.regexp_replace(u, r"(?i)&quot;", "\"")
    u = F.regexp_replace(u, r"(?i)&(apos|#39);", "'")
    return F.regexp_replace(u, r"(?i)&amp;", "&")


def sitemap_locs(col) -> Column:
    """``<loc>`` URLs of an XML sitemap / sitemap-index document as an
    array column — pure Column exprs (``regexp_extract_all`` + a
    per-element XML entity decode). Pair with
    ``functions.robots.robots_sitemaps`` for the robots-declared
    listing; explode the result into the crawl frontier. For the
    structured per-entry view (``lastmod``, index-vs-urlset), use
    :func:`sitemap_entries`."""
    s = _col(col)
    locs = F.regexp_extract_all(
        s, F.lit(r"(?is)<loc>\s*(.*?)\s*</loc>"), 1)
    return F.transform(locs, _xml_unescape)


def sitemap_is_index(col) -> Column:
    """True when the document's root element is ``<sitemapindex>``
    (its ``<loc>`` entries are MORE SITEMAPS to fetch, not pages),
    False for ``<urlset>`` and any other/missing root — the
    distinction that drives frontier recursion (sitemaps.org protocol:
    the two roots share the ``<loc>``/``<lastmod>`` child shape)."""
    return _col(col).rlike(r"(?is)<\s*sitemapindex[\s>]")


def sitemap_entries(col) -> Column:
    """Structured sitemap parse (r15) — the per-entry view frontier
    construction needs: an ``array<struct<loc, lastmod, is_index>>``
    over the document's ``<url>`` (urlset) or ``<sitemap>``
    (sitemapindex) blocks. Pure Column exprs: one
    ``regexp_extract_all`` per block, per-block ``<loc>``/``<lastmod>``
    extraction (entity-decoded loc; lastmod kept verbatim — the
    protocol allows both W3C date and datetime forms, and the caller
    casts), ``is_index`` from the document root via
    :func:`sitemap_is_index`. Blocks without a ``<loc>`` are dropped
    (a loc-less entry addresses nothing). Gzipped ``.xml.gz`` payloads
    decode first through :func:`sitemap_text`.

    Frontier recipe: explode; ``is_index`` rows go back to the fetch
    queue, the rest join the crawl frontier keyed by
    :func:`url_surt_key`, with ``lastmod`` driving re-crawl
    scheduling."""
    s = _col(col)
    blocks = F.regexp_extract_all(
        s, F.lit(r"(?is)<(?:url|sitemap)\b[^>]*>(.*?)"
                 r"</(?:url|sitemap)\s*>"), 1)
    is_idx = sitemap_is_index(s)

    def _entry(b: Column) -> Column:
        loc = _xml_unescape(F.regexp_extract(
            b, r"(?is)<loc>\s*(.*?)\s*</loc>", 1))
        lastmod = F.regexp_extract(
            b, r"(?is)<lastmod>\s*(.*?)\s*</lastmod>", 1)
        return F.struct(
            F.when(loc == "", None).otherwise(loc).alias("loc"),
            F.when(lastmod == "", None).otherwise(lastmod)
            .alias("lastmod"),
            is_idx.alias("is_index"))

    return F.filter(F.transform(blocks, _entry),
                    lambda e: e["loc"].isNotNull())


def feed_kind(col) -> Column:
    """``rss`` / ``atom`` / null — the two wild web-feed formats,
    sniffed from the root element (RSS 2.0 ``<rss>``, Atom
    ``<feed>``). Feeds are the other crawl-discovery document next
    to sitemaps: they carry entry URLs WITH titles and timestamps."""
    s = _col(col)
    return (F.when(s.rlike(r"(?is)<\s*rss[\s>]"), "rss")
             .when(s.rlike(r"(?is)<\s*feed[\s>]"), "atom")
             .otherwise(F.lit(None).cast("string")))


def _cdata_unwrap(t: Column) -> Column:
    return F.regexp_replace(
        t, r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$", "$1")


def feed_title(col) -> Column:
    """The channel/feed ``<title>`` (the FIRST title in document
    order — both formats put it before the entries), CDATA-unwrapped
    and entity-decoded; null when absent."""
    t = F.regexp_extract(_col(col),
                         r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    t = F.trim(_xml_unescape(_cdata_unwrap(t)))
    return F.when(t == "", None).otherwise(t)


def feed_entries(col) -> Column:
    """Structured feed parse — ``array<struct<url, title,
    published>>`` over RSS ``<item>`` or Atom ``<entry>`` blocks,
    pure Column exprs (the :func:`sitemap_entries` pattern). The
    entry URL is the RSS ``<link>`` text, else the Atom link in
    priority order: ``rel="alternate"`` (either attribute order),
    a link WITHOUT a rel (Atom's default is alternate — never the
    ``rel="self"`` bookkeeping link), else any ``href``. Titles
    CDATA-unwrap and entity-decode; ``published`` is the verbatim
    ``<pubDate>`` / ``<published>`` / ``<updated>`` text (RFC 822
    vs RFC 3339 — the caller casts). Blocks without a URL drop.

    Frontier recipe: explode; join URLs by
    :func:`url_surt_key` against the seen set, with ``published``
    driving re-crawl priority — the feed IS the freshness signal."""
    s = _col(col)
    blocks = F.regexp_extract_all(
        s, F.lit(r"(?is)<(?:item|entry)[\s>](.*?)"
                 r"</(?:item|entry)\s*>"), 1)

    def _entry(b: Column) -> Column:
        rss = F.regexp_extract(
            b, r"(?is)<link\s*>\s*(.*?)\s*</link\s*>", 1)
        alt1 = F.regexp_extract(
            b, r"(?is)<link[^>]*rel\s*=\s*[\"']alternate[\"']"
               r"[^>]*href\s*=\s*[\"']([^\"']*)", 1)
        alt2 = F.regexp_extract(
            b, r"(?is)<link[^>]*href\s*=\s*[\"']([^\"']*)[\"']"
               r"[^>]*rel\s*=\s*[\"']alternate[\"']", 1)
        norel = F.regexp_extract(
            b, r"(?is)<link(?![^>]*\brel\s*=)[^>]*href\s*=\s*"
               r"[\"']([^\"']*)", 1)
        anyh = F.regexp_extract(
            b, r"(?is)<link[^>]*href\s*=\s*[\"']([^\"']*)", 1)
        url = (F.when(rss != "", rss).when(alt1 != "", alt1)
                .when(alt2 != "", alt2).when(norel != "", norel)
                .otherwise(anyh))
        url = _xml_unescape(F.trim(url))
        title = F.trim(_xml_unescape(_cdata_unwrap(
            F.regexp_extract(
                b, r"(?is)<title[^>]*>(.*?)</title\s*>", 1))))
        pub = F.regexp_extract(
            b, r"(?is)<(pubDate|published|updated)[^>]*>\s*"
               r"(.*?)\s*</(?:pubDate|published|updated)\s*>", 2)
        return F.struct(
            F.when(url == "", None).otherwise(url).alias("url"),
            F.when(title == "", None).otherwise(title)
             .alias("title"),
            F.when(pub == "", None).otherwise(pub)
             .alias("published"))

    return F.filter(F.transform(blocks, _entry),
                    lambda e: e["url"].isNotNull())


def _remove_dot_segments(p: Column) -> Column:
    """RFC 3986 §5.2.4 over a path Column, as a BOUNDED chain of
    regexp passes (each pass resolves one nesting level of
    ``/seg/../`` — 12 passes cover any realistic path; a deeper
    dot-chain is left partially resolved, documented). Pure Column
    exprs so the whole resolver stays scan-stage and replayable."""
    p = F.regexp_replace(p, r"^(\.\./|\./)+", "")
    for _ in range(4):
        p = F.regexp_replace(p, r"/\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    seg = r"/(?!\.\.(?:/|$))[^/]+"
    for _ in range(12):
        p = F.regexp_replace(p, seg + r"/\.\./", "/")
    p = F.regexp_replace(p, seg + r"/\.\.$", "/")
    for _ in range(12):
        p = F.regexp_replace(p, r"^/\.\.(/|$)", "/")
    return p


def url_idna(col) -> Column:
    """Replace a URL's host with its IDNA ASCII (punycode) form (r15)
    — ``https://bücher.example/de`` -> ``https://xn--bcher-kva.example
    /de``. Composes with :func:`url_surt_key` to close the enumerated
    IDN divergence against real CDX urlkeys:
    ``url_surt_key(url_idna(u), tracking_re=None)``.

    One Arrow-batched pass (python's stdlib ``idna`` codec — the
    label-wise RFC 3492 bootstring; not expressible as Column exprs);
    all-ASCII rows (the overwhelming majority of a crawl) short-
    circuit inside the batch via ``str.isascii``. Labels the codec
    rejects (empty, over-long, already-encoded oddities) keep their
    original text — the key must never crash on a weird URL.
    Scan-stage, no shuffle."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def enc(p):
        out = []
        for u in p:
            if u is None or u.isascii():
                out.append(u)
                continue
            m = re.match(r"^([^:/?#]+://(?:[^@/?#]*@)?)([^/:?#]*)(.*)$",
                         u, re.S)
            if not m:
                out.append(u)
                continue
            pre, host, rest = m.groups()
            labels = []
            for lab in host.split("."):
                try:
                    labels.append(
                        lab.encode("idna").decode("ascii")
                        if lab else lab)
                except UnicodeError:
                    labels.append(lab)
            out.append(pre + ".".join(labels) + rest)
        return pd.Series(out, dtype=object)

    enc.__annotations__ = {"p": pd.Series, "return": pd.Series}
    return pandas_udf(enc, StringType())(_col(col))


def url_resolve(base, ref) -> Column:
    """RFC 3986 §5 reference resolution (r15) — turn the ``href``
    targets :func:`functions.html.html_links` extracts into absolute
    crawl-frontier URLs against the record's base
    (``WARC-Target-URI``). Pure Column exprs, scan-stage.

    Cases per §5.2.2: a ref with its own scheme passes through;
    ``//host/...`` takes the base scheme; ``/abs`` takes
    scheme+authority; ``?query`` replaces the base query; an empty (or
    fragment-only) ref returns the base without its fragment; anything
    else merges with the base directory. Dot-segments are removed via
    :func:`_remove_dot_segments` (bounded passes). Fragments never
    survive (crawl keys are fragment-free). Null when the base has no
    ``scheme://authority``. Divergence from the legacy urljoin
    behavior, by design: a same-scheme relative ref (``http:g``) is
    treated as absolute per the RFC's strict reading."""
    b, r = _col(base), _col(ref)
    r = F.regexp_replace(F.trim(r), r"#.*$", "")
    b_scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    b_auth = F.regexp_extract(b, r"^[^:/?#]+://([^/?#]*)", 1)
    b_pathq = F.regexp_extract(b, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    b_path = F.regexp_replace(b_pathq, r"\?.*$", "")
    prefix = F.concat(b_scheme, F.lit("://"), b_auth)
    b_dir = F.regexp_replace(b_path, r"[^/]*$", "")
    # §5.2.4 applies to the PATH only: a '?next=/old/../new' query
    # must survive verbatim, so split the ref's query off before any
    # dot-segment removal and reattach it after
    r_path = F.regexp_replace(r, r"\?.*$", "")
    r_q = F.regexp_extract(r, r"(\?.*)$", 1)   # "" when no query
    merged = F.concat(
        F.when(b_dir == "", F.lit("/")).otherwise(b_dir), r_path)
    out = (F.when(r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), r)
           .when(r.startswith("//"),
                 F.concat(b_scheme, F.lit(":"), r))
           .when(r.startswith("/"),
                 F.concat(prefix, _remove_dot_segments(r_path), r_q))
           .when(r.startswith("?"),
                 F.concat(prefix, b_path, r))
           .when(r == "", F.concat(prefix, b_pathq))
           .otherwise(F.concat(prefix, _remove_dot_segments(merged),
                               r_q)))
    return F.when((b_scheme == "") | (b_auth == ""),
                  F.lit(None).cast("string")).otherwise(out)


def sitemap_text(col) -> Column:
    """BINARY sitemap payload -> document text: gzipped payloads
    (``.xml.gz`` — magic-sniffed ``1f 8b``, inflated via the same
    helper the HTTP decode chain uses) and plain XML both decode
    UTF-8-with-replacement (the protocol requires UTF-8). Null for
    undecodable gzip streams (loud). One Arrow-batched pass,
    scan-stage; feed the result to :func:`sitemap_entries`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from .http import _inflate

    def dec(p):
        out = []
        for b in p:
            if b is None:
                out.append(None)
                continue
            b = bytes(b)
            if b[:2] == b"\x1f\x8b":
                try:
                    b = _inflate(b, "gzip")
                except ValueError:
                    out.append(None)
                    continue
            out.append(b.decode("utf-8", "replace"))
        return pd.Series(out, dtype=object)

    dec.__annotations__ = {"p": pd.Series, "return": pd.Series}
    return pandas_udf(dec, StringType())(_col(col))


# query params that carry a session id, never content (the IA/pywb
# canonicalizer's strip set) — matched case-insensitively
SESSION_PARAM_RE = (r"(?i)^(jsessionid|phpsessid|sid|aspsessionid\w*|"
                    r"cfid|cftoken)(=.*)?$")


def _pct_decode_unreserved(s: Column) -> Column:
    """RFC 3986 §6.2.2.2 percent-encoding normalization, lowercased-
    world variant: a ``%XX`` escape of an UNRESERVED character
    (letter / digit / ``.-_~``) decodes to the (lowercased) character;
    every other escape keeps its literal (lowercase-hex) ``%xx`` text.
    Real CDX urlkeys normalize exactly these (``%7E`` -> ``~``,
    ``%41`` -> ``a``) while keeping reserved escapes — the same
    split/zip machinery as the HTML NCR pass, pure Column exprs.
    Unreserved-ness is decided on the CODE POINT (never by decoding
    the byte: ``decode('UTF-8')`` THROWS on the lead byte of a
    multi-byte escape like ``%C3%A9``, which must stay literal) and
    the character comes from throw-free ``char()``."""
    parts = F.split(s, r"%[0-9a-fA-F]{2}", -1)
    toks = F.regexp_extract_all(s, F.lit(r"%([0-9a-fA-F]{2})"), 1)

    def _chr(tok: Column) -> Column:
        cp = F.conv(tok, 16, 10).cast("int")
        unreserved = (cp.between(0x30, 0x39)      # 0-9
                      | cp.between(0x41, 0x5A)    # A-Z
                      | cp.between(0x61, 0x7A)    # a-z
                      | cp.isin(0x2D, 0x2E, 0x5F, 0x7E))  # - . _ ~
        return F.when(unreserved, F.lower(F.char(cp))) \
            .otherwise(F.concat(F.lit("%"), F.lower(tok)))

    return F.array_join(
        F.zip_with(parts, F.transform(toks, _chr),
                   lambda p, d: F.concat(p, F.coalesce(d, F.lit("")))),
        "")


def url_surt_key(col, tracking_re: str | None = TRACKING_PARAM_RE
                 ) -> Column:
    """SURT-form url key (the CDX index join key: ``read_cdxj``'s
    ``urlkey`` column) as pure Column exprs: host labels reversed and
    comma-joined, ``)/`` separator, then the lowercased path+query
    with params sorted and trailing slashes stripped.
    ``https://WWW.Example.COM:443/A/b?b=2&a=1#f`` ->
    ``com,example)/a/b?a=1&b=2``.

    r15 fidelity rules (closing the gap to real pywb/Common Crawl
    urlkeys, pinned by ``tests/data/surt_fixture.cdxj``):

    - a leading ``www`` / ``www2`` / ``www3``... label is dropped
      (surt massages ``www\\d*.``);
    - the scheme-DEFAULT port is dropped, any other port is kept
      after the reversed host (``com,example:8080)/``);
    - session-id params (``jsessionid``/``phpsessid``/``sid``/
      ``aspsessionid*``/``cfid``/``cftoken``) are always stripped,
      as is a ``;jsessionid=...`` path parameter (the IA
      canonicalizer rule);
    - ``%XX`` escapes of UNRESERVED characters decode
      (``%7E`` -> ``~``), other escapes keep lowercase-hex literals.

    ``tracking_re`` drops click/campaign params (``utm_*`` etc.) —
    the engine's dedup default. REAL CDX/Common Crawl urlkeys do NOT
    strip tracking params; pass ``tracking_re=None`` when joining
    against an external index (``read_cdxj``/``read_cc_index``).
    Remaining documented divergences (enumerated in
    ``tests/test_urls.py::TestSurtFixture``): no IDN/punycode mapping
    in the pure-Column key — compose :func:`url_idna` to close it
    (``url_surt_key(url_idna(u), tracking_re=None)``, fixture-pinned
    23/24) — and no repeated-unquote of double-encoded escapes."""
    c = _col(col)
    host = url_host(c)
    host = F.regexp_replace(host, r"^www\d*\.", "")
    scheme = F.lower(F.regexp_extract(c, r"^([^:/?#]+)://", 1))
    # port from the authority AFTER stripping userinfo on the LAST
    # '@' — a one-regex version backtracks into 'user:8080pass@host'
    # and extracts a phantom port
    auth = F.regexp_extract(c, r"^[^:/?#]+://([^/?#]*)", 1)
    port = F.regexp_extract(
        F.substring_index(auth, "@", -1), r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    rev = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")))
    rest = F.lower(F.regexp_extract(c, r"^[^:/?#]+://[^/?#]*([^#]*)", 1))
    rest = _pct_decode_unreserved(rest)
    path = F.regexp_replace(F.regexp_replace(rest, r"\?.*$", ""),
                            "/+$", "")
    path = F.regexp_replace(path, r";jsessionid=[^/?]*", "")
    qs = F.when(rest.contains("?"),
                F.regexp_replace(rest, r"^[^?]*\?", "")) \
        .otherwise(F.lit(""))
    def _dropped(p: Column) -> Column:
        d = p.rlike(SESSION_PARAM_RE)
        if tracking_re is not None:
            d = d | p.rlike(tracking_re)
        return d

    kept = F.array_join(F.array_sort(F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~_dropped(p))), "&")
    tail = F.concat(path,
                    F.when(kept == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), kept)))
    return F.when(host.isNull(), None) \
        .otherwise(F.concat(rev, F.lit(")"), F.lit("/"),
                            F.regexp_replace(tail, r"^/", "")))
