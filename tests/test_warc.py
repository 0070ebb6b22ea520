"""WARC crawl-archive ingestion: framing roundtrip (plain + gzip
members), HTTP envelope split, charset handoff, and the Spark
binaryFile → records → extract_spans pipeline."""

import gzip
import os

import pytest

from hquery_php_spark.sources.warc import (
    gunzip_members,
    make_warc,
    parse_warc,
)

RESPONSES = [
    ("https://a.example/x", 200, "text/html; charset=UTF-8", b"<p>hello</p>"),
    (
        "https://b.example/y",
        200,
        "text/html; charset=ISO-8859-2",
        "<p>priv\xe9t</p>".encode("latin-1"),
    ),
    ("https://c.example/z", 404, "text/plain", b"not found"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    data = make_warc(RESPONSES, gzip_members=gz)
    recs = parse_warc(data)
    assert [r.warc_type for r in recs] == ["warcinfo"] + ["response"] * 3
    resp = [r for r in recs if r.warc_type == "response"]
    assert [r.target_uri for r in resp] == [u for u, _, _, _ in RESPONSES]
    assert [r.http_status for r in resp] == [200, 200, 404]
    assert [r.payload for r in resp] == [b for _, _, _, b in RESPONSES]
    assert resp[0].http_content_type == "text/html; charset=UTF-8"


def test_gunzip_members_multi():
    members = b"".join(gzip.compress(p) for p in (b"aa", b"bb", b"cc"))
    assert gunzip_members(members) == b"aabbcc"
    assert gunzip_members(b"plain") == b"plain"


def test_warc_truncated_and_garbage():
    data = make_warc(RESPONSES)
    # truncating mid-record keeps the complete prefix records
    cut = parse_warc(data[: len(data) - 20])
    assert len(cut) >= 2
    # garbage after a record boundary stops cleanly
    assert parse_warc(b"not a warc") == []


def test_read_warc_files_spark(tmp_path):
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hquery_php_spark.operators.pipeline import extract_spans_df
    from hquery_php_spark.sources.warc import read_warc_files

    d = tmp_path / "crawl"
    os.makedirs(d)
    (d / "a.warc").write_bytes(make_warc(RESPONSES[:2]))
    (d / "b.warc.gz").write_bytes(make_warc(RESPONSES[2:], gzip_members=True))

    recs = read_warc_files(spark, str(d) + "/*")
    rows = {r.url: r for r in recs.collect()}
    assert set(rows) == {u for u, _, _, _ in RESPONSES}
    # charset flows from the HTTP envelope into the engine's detector
    assert rows["https://b.example/y"].charset == "ISO-8859-2"
    assert rows["https://c.example/z"].http_status == 404

    # records → extraction: the full crawl-archive-to-spans pipeline
    from pyspark.sql import functions as F

    html_docs = recs.where(
        (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select(
        F.col("url").alias("doc_id"),
        F.col("payload").alias("html"),
        F.col("url").alias("base_url"),
        F.concat(F.lit("Content-Type: "), F.col("content_type")).alias("headers"),
    )
    spans = {
        r.doc_id: r
        for r in extract_spans_df(html_docs, headers_col="headers").collect()
    }
    assert len(spans) == 2
    # ISO-8859-2 bytes decoded via the HTTP envelope's charset — the
    # payload itself carries no meta tag
    assert spans["https://b.example/y"].charset == "ISO-8859-2"
    texts = [s["text"] for s in spans["https://b.example/y"].spans]
    assert "privét" in " ".join(texts)


def test_extract_job_warc_input(tmp_path, monkeypatch):
    """jobs/extract_job.py --input-format warc: crawl archives straight
    to the span table through the packaged job (in-process main())."""
    pytest.importorskip("pyspark")
    import sys

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = tmp_path / "crawl"
    os.makedirs(d)
    (d / "a.warc").write_bytes(make_warc(RESPONSES))
    out = str(tmp_path / "spans")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import extract_job

    # the job calls spark.stop() — keep the shared test session alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "extract_job.py",
            "--input", str(d) + "/*",
            "--input-format", "warc",
            "--output", out,
            "--partitions", "2",
        ],
    )
    extract_job.main()

    got = {r.doc_id: r for r in SparkSession.builder.getOrCreate().read.parquet(out).collect()}
    # only the two 200 text/html responses become documents
    assert set(got) == {"https://a.example/x", "https://b.example/y"}
    assert got["https://b.example/y"].charset == "ISO-8859-2"
