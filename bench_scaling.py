#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule): run the SAME
extraction job on the SAME input at two parallelism levels — local[N] and
local[4N] — and report throughput at both plus efficiency
eff = (T_N / T_4N) / 4.

A real cluster is unavailable in this sandbox; two local[] core counts on
one box are the sanctioned stand-in (BASELINE.md).  The job is the
end-to-end pipeline: synth HTML → byte-balanced repartition → tokenize →
index → extract spans → count, sized by SPARK_GRAFT_SCALE_DOCS (the
per-doc work is large enough that Python-side startup noise is <2%).

Usage: python bench_scaling.py [N] [sf_dir]    (default N=8 → compares 8 vs 32)
Prints one JSON line.  SPARK_GRAFT_SCALE_JOB=ingest switches the measured
job from extract-only to the FULL snaptable batched ingest (extract +
parquet sink + per-batch manifest commits over a materialized multi-file
input) — the gate for the manifest-resume path, whose per-batch barriers
and driver-side commits are invisible to the extract-only number.

Measurement notes (this sandbox):
* every Python worker pays ~1s fork+import on first use — the worker pool
  is warmed before timing (that cost is session startup, not scaling);
* the host shows hypervisor steal spikes — each level reports the min of
  SPARK_GRAFT_SCALE_REPS (default 3) repetitions;
* the box's 32 vCPUs are SMT/turbo-limited: a pure-multiprocessing parse
  test sustains eff=0.83 at 4→16 procs and 0.80 at 4→32 — the hardware's
  own ceiling before Spark is involved;
* each "core" of a Python-UDF pipeline occupies ~2 processes (JVM task
  thread + Python worker), so local[16] loads ~32 procs: the 4→16 Spark
  number is capped by the hardware 32-proc ceiling, while 2→8 (≤16
  procs) isolates the engine's own scaling — report that level.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_once(cores: int, sf_dir: str, repeat: int, n_parts: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hquery_php_spark.operators.pipeline import (
        extract_spans_df,
        salted_repartition,
    )
    from hquery_php_spark.sources.html_synth import BASE_URL, synth_html_col

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # make per-doc work realistic (multi-KB docs) and the job long enough
    # that fixed stage overhead is amortized: repeat the text body and
    # replicate rows with distinct ids
    # 32 copies ≈ 160k docs: with the round-2 parser speedups a 16-copy
    # job at local[8] finishes in ~5s, inside the fixed-overhead floor
    # (~0.4s/stage), which alone costs ~8% apparent efficiency — the
    # longer job measures the engine, not the scheduler.
    copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "32"))
    d = d.withColumn("text", F.repeat(F.col("text"), repeat))
    if copies > 1:
        d = d.crossJoin(spark.range(copies).withColumnRenamed("id", "rep"))
        d = d.withColumn("doc_id", F.concat_ws("_", "doc_id", "rep")).drop("rep")
    docs = d.select(
        "doc_id",
        synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
        F.lit(BASE_URL).alias("base_url"),
        F.length("text").cast("long").alias("size_bytes"),
    )
    # salted size-bucket repartition: shuffle-parallel, no global sort.
    # n_parts is IDENTICAL at both parallelism levels so each level runs
    # the exact same partitions — only the number of concurrent slots
    # differs (a real two-cluster-size comparison holds the dataset
    # layout fixed the same way).
    docs = salted_repartition(docs, n_parts, size_col="size_bytes")
    docs = docs.persist()
    n_docs = docs.count()  # materialize input outside the timed region

    # Warm EVERY python worker (fork + pandas/pyarrow import ≈ 1s/worker —
    # a fixed cost that belongs to session startup, not per-job scaling):
    # one tiny doc per partition forces the full worker pool up.
    warm = spark.createDataFrame(
        [(str(i), "<p>w</p>", "https://x/", 8) for i in range(cores * 8)],
        ["doc_id", "html", "base_url", "size_bytes"],
    ).repartition(n_parts)
    extract_spans_df(warm).count()

    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    wall = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        got = extract_spans_df(docs).count()
        wall = min(wall, time.perf_counter() - t0)
        assert got == n_docs
    spark.stop()
    return wall, n_docs


def _synth_input_parquet(sf_dir: str, repeat: int, path: str, n_files: int) -> int:
    """Materialize the synth corpus ONCE as a multi-file parquet input so
    the ingest job at both levels reads identical bytes; returns n_docs."""
    import shutil

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hquery_php_spark.sources.html_synth import BASE_URL, synth_html_col

    shutil.rmtree(path, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scaling-ingest-input")
        .config("spark.sql.shuffle.partitions", "8")
        # this session launches the process's ONLY JVM — driver memory
        # set later would be silently ignored, and the default 1g heap
        # OOMs the vectorized reader on multi-MB html strings
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "32"))
    d = d.withColumn("text", F.repeat(F.col("text"), repeat))
    if copies > 1:
        d = d.crossJoin(spark.range(copies).withColumnRenamed("id", "rep"))
        d = d.withColumn("doc_id", F.concat_ws("_", "doc_id", "rep")).drop("rep")
    docs = d.select(
        "doc_id",
        synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
        F.lit(BASE_URL).alias("base_url"),
    )
    docs.repartition(n_files).write.parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_once_ingest(cores: int, inp: str, n_parts: int, batches: int) -> tuple[float, int]:
    """Time the FULL snaptable batched ingest (extract + parquet sink +
    per-batch manifest commits) — the job-level gate for the manifest
    resume path, where per-batch barriers and driver-side commits are
    the scaling risks the extract-only number cannot see."""
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from hquery_php_spark.operators.pipeline import extract_spans_df
    from hquery_php_spark.sources.ingest import batched_extract
    from hquery_php_spark.sources.snaptable import SnapTable

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-ingest-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        # multi-MB html strings × 4096-row default columnar batches × N
        # concurrent scan tasks won't fit any sane heap — cap the batch
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.createDataFrame(
        [(str(i), "<p>w</p>", "https://x/", 8) for i in range(cores * 8)],
        ["doc_id", "html", "base_url", "size_bytes"],
    ).repartition(n_parts)
    extract_spans_df(warm).count()

    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    wall, n_docs = float("inf"), 0
    for _ in range(reps):
        out = tempfile.mkdtemp(prefix="scaling-tbl-")
        shutil.rmtree(out)
        t0 = time.perf_counter()
        stats = batched_extract(spark, inp, out, batches=batches, partitions=n_parts)
        wall = min(wall, time.perf_counter() - t0)
        assert stats["ran"] == batches, stats
        n_docs = sum(l["n_rows"] for l in SnapTable(out).lineage().values())
        shutil.rmtree(out)
    spark.stop()
    return wall, n_docs


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeat = int(os.environ.get("SPARK_GRAFT_SCALE_REPEAT", "24"))
    job = os.environ.get("SPARK_GRAFT_SCALE_JOB", "extract")

    n_parts = 4 * n * 3  # same physical partitioning at both levels
    if job == "ingest":
        batches = int(os.environ.get("SPARK_GRAFT_SCALE_BATCHES", "4"))
        inp = os.environ.get(
            "SPARK_GRAFT_SCALE_INPUT_DIR", "/tmp/scaling-ingest-input"
        )
        _synth_input_parquet(sf_dir, repeat, inp, n_files=batches * 4)
        t_n, docs_n = run_once_ingest(n, inp, n_parts, batches)
        t_4n, docs_4n = run_once_ingest(4 * n, inp, n_parts, batches)
    else:
        t_n, docs_n = run_once(n, sf_dir, repeat, n_parts)
        t_4n, docs_4n = run_once(4 * n, sf_dir, repeat, n_parts)
    assert docs_n == docs_4n
    eff = (t_n / t_4n) / 4
    out = {
        "metric": "scaling_efficiency_Nx4"
        + ("_ingest" if job == "ingest" else ""),
        "value": round(eff, 4),
        "unit": "ratio",
        "n_cores": n,
        "n4_cores": 4 * n,
        "n_docs": docs_n,
        "wall_n_sec": round(t_n, 3),
        "wall_4n_sec": round(t_4n, 3),
        "docs_per_sec_n": round(docs_n / t_n, 2),
        "docs_per_sec_4n": round(docs_n / t_4n, 2),
        "sf": sf_dir,
        "pass_ge_0_8": eff >= 0.8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
