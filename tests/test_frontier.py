"""Crawl-frontier assembly: dedup, robots gate, politeness layout."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "url string, source_kind string, priority_micro long"
    )


def test_canonical_dedup_keeps_best_source(spark):
    from hquery_php_spark.operators.frontier import frontier_df

    # same page claimed as outlink and seed (tracking param stripped by
    # canonicalization) -> one row, seed wins
    c = _cands(
        spark,
        [
            ("https://A.com/p?utm_source=x", "outlink", 0),
            ("https://a.com/p", "seed", 0),
            ("https://b.com/q", "outlink", 0),
        ],
    )
    rows = frontier_df(c).collect()
    by_url = {r["url"]: r for r in rows}
    assert len(rows) == 2
    assert by_url["https://a.com/p"]["source_kind"] == "seed"


def test_priority_order_source_then_sitemap_priority(spark):
    from hquery_php_spark.operators.frontier import frontier_df

    c = _cands(
        spark,
        [
            ("https://h.com/a", "feed", 0),
            ("https://h.com/b", "sitemap", 500_000),
            ("https://h.com/c", "sitemap", 800_000),
            ("https://h.com/d", "seed", 0),
        ],
    )
    rows = frontier_df(c).orderBy("fetch_order").collect()
    order = [r["url"].rsplit("/", 1)[1] for r in rows]
    assert order == ["d", "c", "b", "a"]
    assert [r["fetch_order"] for r in rows] == [0, 1, 2, 3]


def test_robots_gate_drops_denied(spark):
    from hquery_php_spark.operators.frontier import frontier_df
    from hquery_php_spark.operators.robots import robots_rules_df

    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /no/\n")],
        "host string, robots_txt string",
    )
    c = _cands(
        spark,
        [
            ("https://h.com/no/x", "seed", 0),
            ("https://h.com/yes", "seed", 0),
        ],
    )
    urls = [r["url"] for r in frontier_df(c, robots_rules_df(robots)).collect()]
    assert urls == ["https://h.com/yes"]


def test_host_colocated_in_one_partition(spark):
    from hquery_php_spark.operators.frontier import frontier_df

    c = _cands(
        spark,
        [(f"https://host{i % 7}.com/p{i}", "outlink", 0) for i in range(70)],
    )
    out = frontier_df(c, n_host_buckets=4)
    # every host's rows carry exactly one bucket id
    per_host = (
        out.groupBy("host")
        .agg({"host_bucket": "count", "fetch_order": "max"})
        .collect()
    )
    import pyspark.sql.functions as F

    n_buckets = (
        out.groupBy("host").agg(F.countDistinct("host_bucket").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in n_buckets)
    # fetch_order is dense 0..n-1 per host
    for r in per_host:
        assert r["max(fetch_order)"] == r["count(host_bucket)"] - 1


def test_deterministic_rerun(spark):
    from hquery_php_spark.operators.frontier import frontier_df

    c = _cands(
        spark,
        [(f"https://h{i % 5}.com/{i}", ["seed", "sitemap", "feed", "outlink"][i % 4], (i % 3) * 100_000) for i in range(40)],
    )
    a = sorted(map(tuple, frontier_df(c).collect()))
    b = sorted(map(tuple, frontier_df(c).collect()))
    assert a == b
