#!/usr/bin/env python
"""Two-parallelism scaling evidence for the media-codec path (the same
N→4N methodology as bench_scaling.py, applied to the mapInPandas codec
operators): run q_multimodal_features — synth + decode of 5 image
families per doc through the pure-Python codecs — at local[N] and
local[4N] on the same input, report payloads/s at both plus
eff = (T_N / T_4N) / 4.

The codec path is embarrassingly parallel (zero shuffles after the
salted spread), so this pins that the per-payload Python work scales
with cores the way a 1000-executor fleet needs it to.  local[2]→
local[8] stays ≤16 OS processes, under the box's SMT ceiling (see
BASELINE.md "Hardware ceiling").

Usage: python tools/bench_media_scaling.py [N] [sf_dir] [query]
(query defaults to multimodal_features; audio_stats exercises the
WAV/FLAC/G.711/ADPCM/AVI-audio decode leg the same way)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_level(cpus: int, sf_dir: str, query: str, reps: int = 2) -> float:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"media-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, ".")
    import __spark_entry__ as E

    # warm the Python worker pool so spin-up is not measured
    def _noop(it):
        import hquery_php_spark.operators.jpeg  # noqa: F401
        for pdf in it:
            yield pdf

    warm = spark.range(0, cpus * 4, 1, cpus * 4).withColumnRenamed("id", "doc_id")
    warm.mapInPandas(_noop, "doc_id long").count()

    best = None
    n_rows = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n_rows = E.all_queries()[query](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best, n_rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    query = sys.argv[3] if len(sys.argv) > 3 else "multimodal_features"
    t_n, rows = run_level(n, sf_dir, query)
    t_4n, _ = run_level(4 * n, sf_dir, query)
    eff = (t_n / t_4n) / 4
    print(
        json.dumps(
            {
                "metric": "media_codec_scaling",
                "query": query,
                "levels": [n, 4 * n],
                "n_payloads": rows,
                "payloads_per_sec": [round(rows / t_n, 1), round(rows / t_4n, 1)],
                "wall_sec": [round(t_n, 3), round(t_4n, 3)],
                "efficiency": round(eff, 3),
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
