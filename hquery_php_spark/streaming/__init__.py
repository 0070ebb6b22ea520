"""Structured Streaming variants of the extraction pipeline."""

from .pipeline import (  # noqa: F401
    streaming_append_snaptable,
    streaming_dedup_exact,
    streaming_distinct_hll,
    streaming_incremental_dedup,
    streaming_extract_spans,
    streaming_sessionize,
    streaming_span_metrics,
)
