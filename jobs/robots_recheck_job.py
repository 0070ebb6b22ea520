#!/usr/bin/env python
"""Governance: re-check a committed corpus against CURRENT robots rules.

A corpus assembled months ago contains documents whose hosts have since
tightened their robots.txt.  Compliance pipelines periodically re-run
the policy gate at rest and remove (or flag) newly-disallowed documents:

    spark-submit --py-files hquery_php_spark.zip jobs/robots_recheck_job.py \
        --docs /path/docs.parquet          # (doc_id, url)
        --robots /path/robots.parquet      # (host, robots_txt) — current
        --out-denied /path/denied.parquet  # (doc_id, url) newly disallowed
        [--agent '*'] \
        [--pipeline /path/pipeline --takedown-id rc-2026-08]  # optional:
        # feed the denied ids straight into the snaptable takedown path

Scale shape: robots parse ∝ hosts (mapInPandas once per host), the
corpus is touched by ONE shuffle join on host plus the map-side
longest-match fold (operators/robots.py) — no per-URL Python, no
forced broadcast.  With --pipeline, the denied keys go through the
same O(|keys|) merge-on-read equality-delete commit as
jobs/takedown_job.py (idempotent via --takedown-id).
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet (doc_id, url)")
    ap.add_argument("--robots", required=True,
                    help="parquet (host, robots_txt) — current rules")
    ap.add_argument("--out-denied", required=True)
    ap.add_argument("--agent", default="*")
    ap.add_argument("--pipeline", default=None,
                    help="pipeline root to apply the takedown to")
    ap.add_argument("--takedown-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hquery-robots-recheck").getOrCreate()

    from hquery_php_spark.operators.robots import (
        filter_allowed,
        robots_rules_df,
    )

    docs = spark.read.parquet(args.docs).withColumn(
        "host",
        F.lower(F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)),
    )
    rules = robots_rules_df(spark.read.parquet(args.robots), agent=args.agent)
    flagged = filter_allowed(docs, rules, keep_denied=True)
    denied = flagged.where(~F.col("allowed")).select("doc_id", "url")
    denied.write.mode("overwrite").parquet(args.out_denied)
    try:
        n = spark.read.parquet(args.out_denied).count()
    except Exception:
        n = 0
    print(f"denied: {n} docs -> {args.out_denied}")

    if args.pipeline:
        if not args.takedown_id:
            raise SystemExit("--takedown-id required with --pipeline")
        # reuse the takedown job's per-table idempotent delete path,
        # in-process on the same SparkSession (cluster conf preserved)
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from takedown_job import apply_takedown

        apply_takedown(
            spark, args.pipeline,
            spark.read.parquet(args.out_denied), "doc_id",
            args.takedown_id,
        )


if __name__ == "__main__":
    main()
