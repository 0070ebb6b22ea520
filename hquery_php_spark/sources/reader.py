"""Documents-table readers and the spans sink.

The engine's canonical input is an Iceberg/Parquet table
``documents(doc_id, html|text, base_url?, size_bytes?)``; output is
``spans(doc_id, spans array<struct<kind,text,media_ref,offset>>, …metrics)``.

* ``read_documents`` — format-agnostic scan (iceberg when a catalog is
  configured, parquet otherwise); only the projected columns reach the
  scan (Catalyst prunes the rest).
* ``read_html_files`` — whole-file ingestion (the reference's
  ``fromFile``, hQuery.php:112-125): ``binaryFile`` source keeps raw
  bytes so charset detection sees the original encoding.
* ``write_spans`` — partitioned append of the span table plus a metrics
  sidecar; the (output, metrics) pair is what makes re-runs idempotent
  via ``resume_filter``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_documents", "read_html_files", "write_spans", "read_done_ids"]


def read_documents(
    spark: SparkSession,
    path_or_table: str,
    columns: Optional[Sequence[str]] = None,
    fmt: Optional[str] = None,
) -> DataFrame:
    """Scan a documents table (iceberg table name or parquet path)."""
    if fmt == "iceberg" or (fmt is None and "/" not in path_or_table):
        df = spark.read.table(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    if columns:
        df = df.select(*columns)
    return df


def read_html_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Whole-file read → (doc_id=path, html=bytes, size_bytes).

    binaryFile keeps the ORIGINAL bytes (no implicit UTF-8 decode), so
    the engine's charset detection/conversion sees what was on disk —
    the reference's fromFile semantics."""
    raw = spark.read.format("binaryFile").load(glob_path)
    return raw.select(
        F.col("path").alias("doc_id"),
        F.col("content").alias("html"),
        F.col("length").alias("size_bytes"),
    )


def write_spans(
    spans_df: DataFrame,
    out_path: str,
    metrics_path: Optional[str] = None,
    partition_cols: Sequence[str] = (),
    mode: str = "append",
) -> None:
    """Append the span table (+ metrics sidecar when requested).

    Write the data FIRST, metrics LAST: a metrics row present ⇒ its
    partition's data committed, so ``resume_filter`` against the output
    (or the metrics doc-id ranges) never skips uncommitted work.
    """
    if metrics_path:
        spans_df = spans_df.persist()  # one extraction pass feeds both writes
    w = spans_df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(out_path)
    if metrics_path:
        from ..operators.pipeline import partition_metrics

        partition_metrics(spans_df).withColumn(
            "committed_at", F.current_timestamp()
        ).write.mode("append").parquet(metrics_path)
        spans_df.unpersist()


def read_done_ids(spark: SparkSession, out_path: str) -> Optional[DataFrame]:
    """doc_ids already committed to the output (None when no output yet)."""
    try:
        return spark.read.parquet(out_path).select("doc_id")
    except Exception:
        return None
