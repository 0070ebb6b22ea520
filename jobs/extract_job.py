#!/usr/bin/env python
"""Production entrypoint: documents table → span table, resumable.

Submit (north rule: spark-submit --py-files on a multi-executor cluster):

    python -c "import shutil; shutil.make_archive('/tmp/hquery_php_spark', 'zip', '.', 'hquery_php_spark')"
    spark-submit --py-files /tmp/hquery_php_spark.zip \
        jobs/extract_job.py \
        --input  /path/docs.parquet  \
        --output /path/spans_out     \
        --metrics /path/spans_metrics \
        [--partitions 4096] [--tail-bytes 4194304] [--html-col html]

Behavior:
* salted size-bucket repartition with mega-doc tail isolation
  (``split_tail_repartition``);
* idempotent resume: doc_ids already present in --output are skipped
  (anti-join), so re-running after a failure completes the remainder;
* per-partition lineage/metrics appended to --metrics AFTER the data
  commit (metrics row present ⇒ partition data committed).
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument(
        "--input-format",
        choices=("parquet", "warc"),
        default="parquet",
        help="warc: --input is a glob of WARC archives; 200 text/html "
        "responses become documents (url→doc_id, HTTP headers feed "
        "charset detection)",
    )
    ap.add_argument(
        "--warc-slice-bytes",
        type=int,
        default=0,
        help="with --input-format warc: range-split archives into slices "
        "of ~this many compressed bytes (0 = whole-file tasks); a giant "
        "single .warc.gz then fans out instead of serializing to one task",
    )
    ap.add_argument(
        "--table-format",
        choices=("parquet", "snaptable"),
        default="parquet",
        help="snaptable: output is a snapshot-manifest table — atomic "
        "batch commits, resume by O(#batches) manifest set-difference "
        "instead of the row-level anti-join (the 10^12-doc resume path)",
    )
    ap.add_argument(
        "--batches",
        type=int,
        default=8,
        help="with --table-format snaptable: number of input file-group "
        "batches, each committed as one snapshot",
    )
    ap.add_argument(
        "--max-batches",
        type=int,
        default=0,
        help="stop after N uncommitted batches this run (kill/resume "
        "testing; 0 = run all)",
    )
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--tail-bytes", type=int, default=4 << 20)
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--base-url-col", default="base_url")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("hquery-extract").getOrCreate()

    from hquery_php_spark.operators.pipeline import (
        extract_spans_df,
        split_tail_repartition,
    )
    from hquery_php_spark.sources.reader import read_done_ids, write_spans

    if args.table_format == "snaptable":
        if args.input_format != "parquet":
            raise SystemExit("--table-format snaptable requires parquet input")
        from hquery_php_spark.sources.ingest import batched_extract

        stats = batched_extract(
            spark,
            args.input,
            args.output,
            batches=args.batches,
            max_batches=args.max_batches,
            partitions=args.partitions,
            tail_bytes=args.tail_bytes,
            metrics_path=args.metrics,
            doc_id_col=args.doc_id_col,
            html_col=args.html_col,
            base_url_col=args.base_url_col,
        )
        print(
            "snaptable ingest: ran %(ran)d, skipped %(skipped)d committed, "
            "of %(total)d batches" % stats
        )
        spark.stop()
        return

    headers_col = None
    if args.input_format == "warc":
        from hquery_php_spark.sources.warc import (
            read_warc_files,
            read_warc_files_split,
        )

        if args.warc_slice_bytes > 0:
            recs = read_warc_files_split(
                spark, args.input, target_slice_bytes=args.warc_slice_bytes
            )
        else:
            recs = read_warc_files(spark, args.input)
        docs = (
            recs
            .where(
                (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            .select(
                F.col("url").alias(args.doc_id_col),
                F.col("payload").alias(args.html_col),
                F.col("url").alias(args.base_url_col),
                F.concat(F.lit("Content-Type: "), F.col("content_type")).alias(
                    "__headers"
                ),
            )
        )
        headers_col = "__headers"
    else:
        docs = spark.read.parquet(args.input)
    n_parts = args.partitions or spark.sparkContext.defaultParallelism * 3

    done = read_done_ids(spark, args.output)
    if done is not None:
        docs = docs.join(
            done.withColumnRenamed("doc_id", "__done").distinct(),
            docs[args.doc_id_col] == F.col("__done"),
            "left_anti",
        )

    docs = docs.withColumn(
        "__size", F.length(F.col(args.html_col)).cast("long")
    )
    docs = split_tail_repartition(
        docs, n_parts, size_col="__size", tail_bytes=args.tail_bytes,
        key_col=args.doc_id_col,
    )
    spans = extract_spans_df(
        docs,
        doc_id_col=args.doc_id_col,
        html_col=args.html_col,
        base_url_col=args.base_url_col if args.base_url_col in docs.columns else None,
        headers_col=headers_col,
    )
    write_spans(spans, args.output, metrics_path=args.metrics)
    spark.stop()


if __name__ == "__main__":
    main()
