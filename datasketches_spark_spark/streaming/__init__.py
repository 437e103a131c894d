"""Structured Streaming operators for the sketch engine."""

from .sketch_stream import (
    await_or_fail,
    session_distinct,
    session_summaries,
    sketch_accumulate_stream,
    sketch_accumulate_stream_multi,
    streaming_dedup,
    streaming_summary_sink,
    with_event_time_watermark,
)

__all__ = ["await_or_fail", "session_distinct", "session_summaries",
           "sketch_accumulate_stream",
           "sketch_accumulate_stream_multi",
           "streaming_dedup", "streaming_summary_sink",
           "with_event_time_watermark"]
