#!/usr/bin/env python
"""Composed training-data pipeline, phase-checkpointed to snapshot tables.

    raw HTML docs ──extract──▶ spans ──curate──▶ kept ids ──pack──▶ shards

Submit (north rule: spark-submit --py-files on a multi-executor cluster):

    spark-submit --py-files hquery_php_spark.zip jobs/pipeline_job.py \
        --input /path/docs.parquet --output /path/pipeline \
        [--batches 16] [--max-tokens 2048] [--media-token-cost 64]

Each phase commits to its own snapshot-manifest table under --output
(`spans/`, `curated/`, `packs/`), so a killed-and-resubmitted run
resumes by manifest set-difference at the finest granularity the phase
allows:

* extract — per file-group batch (``batched_extract``): only
  uncommitted batches re-run;
* curate — corpus-level by construction (cross-document dedup must see
  the whole corpus), one snapshot batch ``curate-all``: skipped when
  committed;
* pack — one snapshot batch ``pack-all`` over the kept docs' spans:
  skipped when committed.

A re-submit of a completed pipeline commits nothing (three no-op
phases).  Per-phase lineage (rows, files, walls) lives in each table's
manifest; downstream phases read upstream tables through their
manifests, so a phase never sees a half-committed predecessor.
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, html[, base_url])")
    ap.add_argument("--output", required=True, help="pipeline root; phase tables go under it")
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--max-batches", type=int, default=0,
                    help="stop the extract phase after N uncommitted batches (kill/resume testing)")
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--media-token-cost", type=int, default=64)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--bucket-docs", type=int, default=0,
                    help="bucket-partition the spans table by doc_id into N "
                         "buckets: per-doc point lookups and at-rest deletes "
                         "(decontamination) plan only 1/N of the files")
    ap.add_argument("--incremental", action="store_true",
                    help="delta mode: curate/pack only the spans appended "
                         "since the last run (read_incremental + fingerprint "
                         "ledgers) — per-run cost scales with NEW data, not "
                         "the corpus; cannot mix with full mode in one "
                         "--output")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("hquery-pipeline").getOrCreate()

    from hquery_php_spark.operators.curate import CurateOptions, curate_corpus
    from hquery_php_spark.operators.pipeline import (
        interleaved_doc_stats,
        pack_interleaved,
    )
    from hquery_php_spark.sources.ingest import (
        batched_extract,
        incremental_extract,
    )
    from hquery_php_spark.sources.snaptable import SnapTable

    root = args.output.rstrip("/")
    spans_tbl = SnapTable(root + "/spans")
    curated_tbl = SnapTable(root + "/curated")
    packs_tbl = SnapTable(root + "/packs")

    # ---- phase 1: extract (batched, per-batch resume; delta-planned
    # over only the never-ingested input files in --incremental mode) ---
    extract = incremental_extract if args.incremental else batched_extract
    stats = extract(
        spark,
        args.input,
        spans_tbl.path,
        batches=args.batches,
        max_batches=args.max_batches,
        partitions=args.partitions,
        partition_spec=[("doc_id", "bucket", args.bucket_docs)]
        if args.bucket_docs
        else None,
    )
    print("phase extract: %(ran)d ran, %(skipped)d committed, of %(total)d" % stats)
    if args.max_batches and stats["ran"] + stats["skipped"] < stats["total"]:
        print("extract phase incomplete (--max-batches); stopping before curate")
        spark.stop()
        return

    # ---- incremental mode: consume only the spans delta -----------------
    if args.incremental:
        from hquery_php_spark.operators.incremental_pipeline import (
            PipelineTables,
            curate_increment,
            pack_increment,
        )

        t = PipelineTables(root)
        opts = CurateOptions(
            id_col="doc_id",
            text_col="main_text",
            domain_col=None,
            min_words=args.min_words,
            near_dup=not args.no_near_dup,
        )
        c = curate_increment(
            spark, t, opts=opts,
            params={"min_words": args.min_words,
                    "near_dup": not args.no_near_dup},
        )
        print(
            "phase curate [incremental]: spans %(from)d..%(upto)d, "
            "kept %(kept)d%(s)s"
            % {**c, "s": " (nothing new)" if c["skipped"] else ""}
        )
        p = pack_increment(
            spark, t,
            max_tokens=args.max_tokens,
            media_token_cost=args.media_token_cost,
            n_shards=args.n_shards,
        )
        print(
            "phase pack [incremental]: curated %(from)d..%(upto)d, "
            "%(rows)d rows%(s)s"
            % {**p, "s": " (nothing new)" if p["skipped"] else ""}
        )
        spark.stop()
        return

    if any(
        b.startswith("curate-upto-") for b in curated_tbl.committed_batches()
    ):
        raise ValueError(
            "%s was curated incrementally; full and incremental modes "
            "cannot mix — pass --incremental or use a fresh --output"
            % curated_tbl.path
        )

    def _check_phase_params(tbl: SnapTable, batch_id: str, params: dict) -> bool:
        """True when the phase is committed AND with the same parameters;
        committed-with-different-parameters fails loudly — silently
        skipping would leave stale output that looks current (the same
        guard batched_extract applies to its batch plan)."""
        if batch_id not in tbl.committed_batches():
            return False
        prior = tbl.lineage().get(batch_id, {}).get("params")
        if prior is not None and prior != params:
            raise ValueError(
                "phase %s already committed with params %s; this run wants "
                "%s — write to a fresh --output to re-run it"
                % (batch_id, prior, params)
            )
        return True

    # ---- phase 2: curate (corpus-level, one commit) --------------------
    curate_params = {
        "min_words": args.min_words,
        "near_dup": not args.no_near_dup,
    }
    if _check_phase_params(curated_tbl, "curate-all", curate_params):
        print("phase curate: committed, skipping")
    else:
        spans = spans_tbl.read(spark)
        # the repartition is a plan break, not a layout choice: without
        # it CollapseProject inlines the interpreted HOF main_text
        # reassembly into every gate/hash expression downstream, where
        # no subexpression elimination applies (measured ~10x the gate
        # cost; see incremental_pipeline._delta_docs)
        docs = (
            interleaved_doc_stats(spans)
            .select("doc_id", "main_text")
            .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        )
        opts = CurateOptions(
            id_col="doc_id",
            text_col="main_text",
            domain_col=None,  # raw-HTML corpora carry no source column here
            min_words=args.min_words,
            near_dup=not args.no_near_dup,
        )
        reg: list = []
        kept = curate_corpus(docs, opts=opts, persist_registry=reg).select(
            "doc_id", "pos", "n_tokens"
        )
        n_in = spans_tbl.row_count()  # manifest-answered, no scan
        snap = curated_tbl.append(
            kept,
            "curate-all",
            lineage={"n_input_docs": n_in, "params": curate_params},
        )
        for cached in reg:
            cached.unpersist()
        lin = snap["lineage"]["curate-all"]
        print(
            "phase curate: kept %d of %d docs" % (lin["n_rows"], n_in)
        )

    # ---- phase 3: pack (one commit over kept docs' spans) --------------
    pack_params = {
        "max_tokens": args.max_tokens,
        "media_token_cost": args.media_token_cost,
        "n_shards": args.n_shards,
    }
    if _check_phase_params(packs_tbl, "pack-all", pack_params):
        print("phase pack: committed, skipping")
    else:
        spans = spans_tbl.read(spark)
        kept = curated_tbl.read(spark).select("doc_id")
        # plain semi-join: the kept set is corpus-proportional — never
        # force-broadcast; AQE picks broadcast when it is actually small
        survivors = spans.join(kept, "doc_id", "left_semi")
        packs = pack_interleaved(
            survivors,
            max_tokens=args.max_tokens,
            media_token_cost=args.media_token_cost,
            n_shards=args.n_shards,
        )
        snap = packs_tbl.append(
            packs, "pack-all", lineage={"params": pack_params}
        )
        print("phase pack: %d rows" % snap["lineage"]["pack-all"]["n_rows"])

    spark.stop()


if __name__ == "__main__":
    main()
