"""Distributed operators built on the sketch primitives and stock Spark."""

from .dedup import (
    exact_dedup_groups,
    winnow_dedup_pairs,
    winnow_fingerprints,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_dedup_pairs,
    simhash,
    simhash_dedup_pairs,
)
from .multimodal import extract_features, with_payload
from .similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_ann_topk,
    ivf_assign,
    rhp_ann_topk,
    rhp_signatures,
    train_ivf_centroids,
)
from .sketch_agg import (
    Measure,
    distinct_measure,
    freqitems_measure,
    percentile_measure,
    sketch_accumulate,
    sketch_grouped_agg,
    sketch_merge,
    sketch_partial,
    sketch_partial_multi,
)

__all__ = [
    "exact_dedup_groups",
    "winnow_dedup_pairs",
    "winnow_fingerprints",
    "jaccard_verify",
    "lsh_candidate_pairs",
    "minhash_bands",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_dedup_pairs",
    "extract_features",
    "with_payload",
    "cosine_pairs",
    "cosine_topk",
    "rhp_ann_topk",
    "rhp_signatures",
    "ivf_ann_topk",
    "ivf_assign",
    "train_ivf_centroids",
    "Measure",
    "distinct_measure",
    "freqitems_measure",
    "percentile_measure",
    "sketch_accumulate",
    "sketch_grouped_agg",
    "sketch_merge",
    "sketch_partial",
    "sketch_partial_multi",
]
