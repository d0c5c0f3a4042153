"""Sinks: chunk-enveloped batch transmit, JSON-lines, debug pivot CSV."""

from redcap_omop_etl_spark.sinks.chunked import (
    chunk_envelopes,
    debug_pub,
    foreach_chunk_post,
    with_global_index,
    write_jsonl,
)

__all__ = [
    "chunk_envelopes",
    "debug_pub",
    "foreach_chunk_post",
    "with_global_index",
    "write_jsonl",
]
