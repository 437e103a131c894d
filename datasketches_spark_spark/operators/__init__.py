"""Distributed operators built on the sketch primitives and stock Spark."""

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
