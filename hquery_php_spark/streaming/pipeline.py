"""Streaming extraction: readStream → extract → writeStream.

The per-document extraction UDF is stateless, so the batch operator
(``extract_spans_df``) applies to a streaming DataFrame unchanged —
``mapInPandas`` is supported on streams.  What streaming adds here:

* ``streaming_extract_spans`` — wire a streaming source (files/Kafka/…)
  of documents through the same extraction stage; checkpointing gives
  exactly-once sink semantics, which *is* the resume story for the
  streaming deployment (per-partition lineage comes free from the
  offset log).
* ``streaming_span_metrics`` — windowed per-source span-rate metrics
  with a watermark for late events.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.extract import DEFAULT_OPTIONS, ExtractOptions
from ..operators.pipeline import extract_spans_df

__all__ = ["streaming_extract_spans", "streaming_span_metrics"]


def streaming_extract_spans(
    stream_df: DataFrame,
    doc_id_col: str = "doc_id",
    html_col: str = "html",
    base_url_col: Optional[str] = "base_url",
    encoding: str = "utf-8",
    opts: ExtractOptions = DEFAULT_OPTIONS,
) -> DataFrame:
    """Streaming documents → streaming spans (same engine, same schema).

    Usage:
        src = spark.readStream.schema(sch).parquet(in_dir)
        out = streaming_extract_spans(src)
        out.writeStream.format("parquet")
           .option("checkpointLocation", ckpt)
           .option("path", out_dir).start()
    """
    if not stream_df.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    return extract_spans_df(
        stream_df,
        doc_id_col=doc_id_col,
        html_col=html_col,
        base_url_col=base_url_col,
        encoding=encoding,
        opts=opts,
    )


def streaming_span_metrics(
    spans_stream: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window extraction metrics with late-data watermark."""
    df = spans_stream
    if ts_col not in df.columns:
        df = df.withColumn(ts_col, F.current_timestamp())
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_text").alias("n_text"),
            F.sum("n_media").alias("n_media"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
            F.sum("size_bytes").alias("bytes"),
        )
    )
