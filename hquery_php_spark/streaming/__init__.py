"""Structured Streaming variants of the extraction pipeline."""

from .pipeline import streaming_extract_spans, streaming_span_metrics  # noqa: F401
