"""Public function surface — the reference's 18 SQL functions
(``shims.scala:32-56``) as PySpark Column functions.

Import as::

    from datasketches_spark_spark import functions as dsf
    df.groupBy("g").agg(dsf.approx_percentile_ex("v", 0.95).alias("p95"))
"""

from . import quality_rules, text, urls
from .text import strip_invisible, unicode_normalize
from .html import (html_article_meta, html_blocks,
                   html_canonical_url, html_decode_numeric_refs,
                   html_feed_links, html_jsonld, html_links,
                   html_main_text, html_meta_charset,
                   html_meta_content, html_noindex, html_title,
                   html_to_text)
from .quality_rules import readability_metrics, readability_struct
from .robots import (parse_robots, parse_robots_text,
                     robots_allowed, robots_crawl_delay,
                     robots_sitemaps)
from .mime import detect_mime, detect_ooxml, is_binary_payload
from .http import (http_body, http_charset, http_decode_body,
                   http_decode_body_bytes, http_header,
                   http_status, http_text)
from .urls import (canonicalize_url, feed_entries, feed_kind,
                   feed_title, sitemap_entries, sitemap_is_index,
                   sitemap_locs, sitemap_text, url_host,
                   url_idna, url_registered_domain, url_resolve,
                   url_surt_key)
from .embeddings import (
    dequantize_int8,
    l2_normalize,
    quantize_int8,
)
from .distinctcnt import (
    approx_count_distinct_bounds,
    approx_count_distinct_accumulate,
    approx_set_difference,
    approx_set_intersection,
    approx_set_jaccard,
    approx_count_distinct_combine,
    approx_count_distinct_cpc,
    approx_count_distinct_estimate,
    approx_count_distinct_ex,
    approx_count_distinct_accumulate_cpc,
    approx_count_distinct_accumulate_theta_wire,
    approx_count_distinct_hll,
    approx_count_distinct_theta,
)
from .freqitems import (
    approx_freqitems,
    approx_freqitems_accumulate,
    approx_freqitems_combine,
    approx_freqitems_estimate,
    approx_freqitems_maxerr,
    approx_join_size,
)
from .sampling import (
    approx_sample_accumulate,
    approx_sample_combine,
    approx_sample_estimate,
    approx_sample_stream_size,
    approx_sample_weighted_accumulate,
)
from .membership import (
    approx_membership_accumulate,
    approx_membership_accumulate_wire,
    approx_membership_combine,
    approx_membership_contains,
    approx_membership_estimate,
    approx_membership_fpp,
)
from .tuplesketch import (
    approx_tuple_accumulate,
    approx_tuple_accumulate_wire,
    approx_tuple_bounds,
    approx_tuple_combine,
    approx_tuple_estimate,
    approx_tuple_segment_estimate,
)
from .quantiles import (
    approx_ks_distance,
    approx_percentile_bounds,
    approx_cdf_estimate,
    approx_percentile_accumulate,
    approx_percentile_accumulate_weighted,
    approx_rank_estimate,
    approx_percentile_combine,
    approx_percentile_estimate,
    approx_percentile_ex,
    approx_percentile_kll,
    approx_percentile_mergeable,
    approx_percentile_req,
    approx_pmf_estimate,
)

__all__ = [
    "text",
    # URL canonicalization (extension; crawl-pipeline normalization)
    "canonicalize_url",
    "html_decode_numeric_refs",
    "html_links",
    "html_meta_charset",
    "html_title",
    "html_jsonld",
    "html_article_meta",
    "html_canonical_url",
    "html_noindex",
    "html_feed_links",
    "html_to_text",
    "http_body",
    "parse_robots",
    "parse_robots_text",
    "robots_allowed",
    "robots_crawl_delay",
    "robots_sitemaps",
    "sitemap_entries",
    "feed_kind",
    "feed_title",
    "feed_entries",
    "sitemap_is_index",
    "sitemap_locs",
    "sitemap_text",
    "url_idna",
    "url_resolve",
    "url_surt_key",
    "http_charset",
    "http_decode_body",
    "http_decode_body_bytes",
    "http_header",
    "http_status",
    "http_text",
    "url_host",
    "url_registered_domain",
    # reservoir sampling (extension; DataSketches sampling family)
    "approx_sample_accumulate",
    "approx_sample_combine",
    "approx_sample_estimate",
    "approx_sample_stream_size",
    "approx_sample_weighted_accumulate",
    # Bloom membership (extension; DataSketches BloomFilter analog)
    "approx_membership_accumulate",
    "approx_membership_accumulate_wire",
    "approx_membership_combine",
    "approx_membership_contains",
    "approx_membership_estimate",
    "approx_membership_fpp",
    # tuple / per-key summary sketch (extension; DataSketches Tuple family)
    "approx_tuple_accumulate",
    "approx_tuple_accumulate_wire",
    "approx_tuple_bounds",
    "approx_tuple_combine",
    "approx_tuple_estimate",
    "approx_tuple_segment_estimate",
    # quantiles (reference #1-#8)
    "approx_percentile_ex",
    "approx_percentile_kll",
    "approx_percentile_req",
    "approx_percentile_mergeable",
    "approx_percentile_accumulate",
    "approx_percentile_accumulate_weighted",
    "approx_percentile_combine",
    "approx_percentile_estimate",
    "approx_pmf_estimate",
    # frequent items (#9-#12)
    "approx_freqitems",
    "approx_freqitems_accumulate",
    "approx_freqitems_combine",
    "approx_freqitems_estimate",
    "approx_freqitems_maxerr",
    "approx_join_size",
    "approx_ks_distance",
    "approx_count_distinct_bounds",
    "approx_percentile_bounds",
    # distinct count (#13-#18)
    "approx_count_distinct_ex",
    "approx_count_distinct_cpc",
    "approx_count_distinct_theta",
    "approx_count_distinct_accumulate_cpc",
    "approx_count_distinct_accumulate_theta_wire",
    "approx_count_distinct_hll",
    "approx_count_distinct_accumulate",
    "approx_count_distinct_combine",
    "approx_count_distinct_estimate",
    # embedding preparation
    "l2_normalize",
    "quantize_int8",
    "dequantize_int8",
]
