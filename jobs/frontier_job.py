#!/usr/bin/env python
"""Production entrypoint: discovery tables → politeness-partitioned
crawl frontier.

Composes the discovery operators into the fetch queue a crawler
consumes (operators/frontier.py):

    python -c "import shutil; shutil.make_archive('/tmp/hquery_php_spark', 'zip', '.', 'hquery_php_spark')"
    spark-submit --py-files /tmp/hquery_php_spark.zip \
        jobs/frontier_job.py \
        --output /path/frontier \
        [--media-output /path/media_frontier]  # image:/video: queue
        [--seeds /path/seeds.parquet]          # (url)
        [--sitemaps /path/sitemaps.parquet]    # (doc_id, xml)
        [--feeds /path/feeds.parquet]          # (doc_id, xml)
        [--outlinks /path/outlinks.parquet]    # (url)
        [--robots /path/robots.parquet]        # (host, robots_txt)
        [--fetched-ledger /path/frontier_ledger]  # already-fetched urls
        [--host-buckets 256] [--agent '*']

Scale shape: sitemap/feed XML parse is mapInPandas ∝ input documents;
robots parse is mapInPandas ∝ hosts; the only corpus-sized shuffles
are the canonical-URL dedup groupBy, the host join for the robots
gate, the (optional) fetched-ledger anti-join, and the final
politeness repartition — all linear, none broadcast-forced.

Resume / incremental crawling: pass the PREVIOUS crawl's committed
URL set as --fetched-ledger; the frontier anti-joins it on the
canonical URL, so a daily run emits only never-fetched URLs.  The
output itself is partitioned by host_bucket, so a fetcher fleet
claims whole bucket directories (one bucket = one politeness unit).
"""

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--media-output", default=None,
                    help="also emit a politeness-partitioned MEDIA fetch "
                         "queue from the sitemaps' image:/video: "
                         "extensions (the image-text-corpus channel)")
    ap.add_argument("--seeds", default=None)
    ap.add_argument("--sitemaps", default=None)
    ap.add_argument("--feeds", default=None)
    ap.add_argument("--outlinks", default=None)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--fetched-ledger", default=None)
    ap.add_argument("--host-buckets", type=int, default=256)
    ap.add_argument("--agent", default="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("hquery-frontier").getOrCreate()

    from hquery_php_spark.functions.url import canonical_url
    from hquery_php_spark.operators.feeds import (
        feed_entries_df,
        sitemap_entries_df,
    )
    from hquery_php_spark.operators.frontier import frontier_df
    from hquery_php_spark.operators.robots import robots_rules_df

    parts = []
    if args.seeds:
        parts.append(
            spark.read.parquet(args.seeds).select(
                F.col("url"),
                F.lit("seed").alias("source_kind"),
                F.lit(0).cast("long").alias("priority_micro"),
            )
        )
    if args.sitemaps:
        sm = sitemap_entries_df(spark.read.parquet(args.sitemaps))
        parts.append(
            sm.where(F.col("kind") == "urlset").select(
                F.col("loc").alias("url"),
                F.lit("sitemap").alias("source_kind"),
                # <priority> 0.0-1.0 → integer micro-units
                F.coalesce(
                    (F.col("priority").cast("double") * 1_000_000)
                    .cast("long"),
                    F.lit(0).cast("long"),
                ).alias("priority_micro"),
            )
        )
        # sitemapindex children: the child sitemap locs are discovery
        # candidates too (same treatment as robots-declared Sitemap
        # URLs) — the next crawl round fetches them and feeds them back
        # through --sitemaps, so index-only-reachable URLs get found
        parts.append(
            sm.where(F.col("kind") == "sitemapindex").select(
                F.col("loc").alias("url"),
                F.lit("sitemap").alias("source_kind"),
                F.lit(0).cast("long").alias("priority_micro"),
            )
        )
    if args.feeds:
        fe = feed_entries_df(spark.read.parquet(args.feeds))
        parts.append(
            fe.where(F.col("link").isNotNull()).select(
                F.col("link").alias("url"),
                F.lit("feed").alias("source_kind"),
                F.lit(0).cast("long").alias("priority_micro"),
            )
        )
    if args.outlinks:
        parts.append(
            spark.read.parquet(args.outlinks).select(
                F.col("url"),
                F.lit("outlink").alias("source_kind"),
                F.lit(0).cast("long").alias("priority_micro"),
            )
        )
    if not parts:
        raise SystemExit("no discovery inputs given")
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)

    rules = (
        robots_rules_df(spark.read.parquet(args.robots), agent=args.agent)
        if args.robots
        else None
    )
    if rules is not None:
        # robots-declared Sitemap: URLs join the frontier as sitemap
        # candidates (the crawl then fetches + feeds them back through
        # --sitemaps on the next run)
        declared = rules.select(
            F.explode("sitemaps").alias("url"),
            F.lit("sitemap").alias("source_kind"),
            F.lit(0).cast("long").alias("priority_micro"),
        )
        cands = cands.unionByName(declared)
    fr = frontier_df(cands, rules, n_host_buckets=args.host_buckets)

    if args.fetched_ledger:
        done = spark.read.parquet(args.fetched_ledger).select(
            canonical_url(F.col("url")).alias("url")
        )
        # linear anti-join (no forced broadcast: the fetched set is
        # corpus-proportional); AQE broadcasts when actually small
        fr = fr.join(done, "url", "left_anti")

    if args.media_output:
        if not args.sitemaps:
            raise SystemExit("--media-output needs --sitemaps")
        from hquery_php_spark.operators.feeds import sitemap_media_df

        media = sitemap_media_df(spark.read.parquet(args.sitemaps)).where(
            F.col("loc").isNotNull()
        )
        mcands = media.select(
            F.col("loc").alias("url"),
            # declared media ranks below page outlinks is wrong — it IS
            # the payload; reuse 'sitemap' weight so webmaster-declared
            # media outranks crawled links, same as declared pages
            F.lit("sitemap").alias("source_kind"),
            F.lit(0).cast("long").alias("priority_micro"),
        )
        mfr = frontier_df(mcands, rules, n_host_buckets=args.host_buckets)
        if args.fetched_ledger:
            done_m = spark.read.parquet(args.fetched_ledger).select(
                canonical_url(F.col("url")).alias("url")
            )
            mfr = mfr.join(done_m, "url", "left_anti")
        mfr.write.mode("overwrite").partitionBy("host_bucket").parquet(
            args.media_output
        )
        try:
            nm = spark.read.parquet(args.media_output).count()
        except Exception:
            nm = 0
        print(f"media frontier committed: {nm} urls -> {args.media_output}")

    fr.write.mode("overwrite").partitionBy("host_bucket").parquet(args.output)
    try:
        n = spark.read.parquet(args.output).count()
    except Exception:
        n = 0  # fully-fetched incremental run: no data files written
    print(f"frontier committed: {n} urls -> {args.output}")


if __name__ == "__main__":
    main()
