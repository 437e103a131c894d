"""Distributed operators built on the sketch primitives and stock Spark."""

from .sketch_agg import sketch_accumulate, sketch_merge, sketch_partial

__all__ = ["sketch_accumulate", "sketch_merge", "sketch_partial"]
