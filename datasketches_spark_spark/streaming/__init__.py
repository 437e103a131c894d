"""Structured Streaming operators for the sketch engine."""

from .sketch_stream import sketch_accumulate_stream, streaming_summary_sink

__all__ = ["sketch_accumulate_stream", "streaming_summary_sink"]
