#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

The headline metric is docs/sec of the end-to-end extraction pipeline
(synth HTML → tokenize → index → extract spans → count), reported as
seconds in "value" (total wall of all queries) with per-query seconds in
"queries" and throughput fields alongside.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hquery_php_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    bench_queries = [
        "extract_spans",
        "selector_counts",
        "media_refs",
        "dedup_exact",
        "token_count",
        "text_quality",
        "fingerprint",
        "similarity_topk",
        "dedup_minhash",
        "simhash",
    ]

    timings = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = 0.0
    spans_docs_per_sec = None
    for name in bench_queries:
        fn = qs[name]
        t0 = time.perf_counter()
        cnt = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt
        if name == "extract_spans":
            spans_docs_per_sec = round(n_docs / dt, 2)

    out = {
        "metric": "total_bench_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "cpus": int(cpus),
        "extract_docs_per_sec": spans_docs_per_sec,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
