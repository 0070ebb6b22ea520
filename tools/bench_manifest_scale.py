#!/usr/bin/env python
"""Metadata-scale evidence for the snapshot table's two-level planning.

Builds a SnapTable with N disjoint-key-range batches (the time-ordered
daily-ingest shape: one manifest shard per commit, each covering a
disjoint doc-id range) and measures, from a COLD process-equivalent
table handle (empty manifest cache):

* ``plan_lazy_ms``   — plan_scan point lookup: snapshot JSON + only the
  summary-matching manifest shards are read;
* ``plan_inflate_ms`` — the pre-summary behavior (inflate every shard,
  then prune per-file), what planning cost looked like when metadata
  I/O was O(table);
* ``append_ms``       — one more append on the N-shard table (the O(1)
  commit: must not grow with N);
* shards loaded vs total, and a correctness check that the lazy point
  read returns exactly the one row.

At 10^12 rows the table would hold thousands of shards; this measures
the planning crossover directly instead of asserting it.  Run:

    python tools/bench_manifest_scale.py [n_batches] [rows_per_batch]

Prints one JSON line.  Not part of bench.py (the per-round bench times
the data path; this times the metadata path once per change).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hquery_php_spark.sources.snaptable import SnapTable

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("manifest-scale")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="bench-mfscale-")
    shutil.rmtree(root)
    tbl = SnapTable(root)
    t0 = time.perf_counter()
    for b in range(n_batches):
        df = (
            spark.range(b * per, (b + 1) * per)
            .select(
                F.col("id").cast("long").alias("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .coalesce(1)
        )
        tbl.append(df, "b%05d" % b)
    build_s = time.perf_counter() - t0

    # one more append on the wide table: the O(1)-commit claim
    extra = (
        spark.range(n_batches * per, n_batches * per + per)
        .select(
            F.col("id").cast("long").alias("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        .coalesce(1)
    )
    t0 = time.perf_counter()
    tbl.append(extra, "b-extra")
    append_ms = (time.perf_counter() - t0) * 1e3

    key = (n_batches // 2) * per + 7
    cold = SnapTable(root)  # empty manifest cache — a fresh reader
    t0 = time.perf_counter()
    plan = cold.plan_scan(eq=("id", key))
    plan_lazy_ms = (time.perf_counter() - t0) * 1e3

    cold2 = SnapTable(root)
    t0 = time.perf_counter()
    snap = cold2._snapshot_at(None)  # pre-summary behavior: inflate all
    files, _ = cold2._plan_files(snap, None, None, ("id", key))
    plan_inflate_ms = (time.perf_counter() - t0) * 1e3
    assert plan["files"] == files, "lazy plan diverged from full plan"

    got = [r.v for r in cold.read(spark, eq=("id", key)).collect()]
    assert got == ["v%d" % key], got

    print(
        json.dumps(
            {
                "metric": "snaptable_plan_scale",
                "n_manifest_shards": plan["manifests_total"],
                "rows": (n_batches + 1) * per,
                "build_s": round(build_s, 2),
                "append_on_wide_table_ms": round(append_ms, 1),
                "plan_lazy_ms": round(plan_lazy_ms, 2),
                "plan_inflate_ms": round(plan_inflate_ms, 2),
                "manifests_loaded": plan["manifests_loaded"],
                "files_kept": plan["files_kept"],
                "point_read_ok": True,
            }
        )
    )
    shutil.rmtree(root)
    spark.stop()


if __name__ == "__main__":
    main()
