"""Structured Streaming layer: windowed aggs, stateful ops, chunked sinks."""

from redcap_omop_etl_spark.streaming.windows import (
    read_events_stream,
    sliding_window_agg,
    session_window_agg,
    stream_dedup,
    stream_to_chunked_sink,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "stream_to_chunked_sink",
    "tumbling_window_agg",
]
