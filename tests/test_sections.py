"""Document outline + structure-aware chunking."""

import pytest

from hquery_php_spark.operators.sections import section_rows

DOC = """<html><head><title>T</title><style>x{}</style></head><body>
preamble text
<h1>One</h1><p>alpha beta</p>
<h2>One A</h2><p>gamma</p> <ul><li>delta</li></ul>
<h3>Deep</h3>text deep
<h2>One B</h2>b text
<h1>Two</h1><p>omega</p>
</body></html>"""


def test_outline_paths_and_levels():
    secs = section_rows(DOC)
    assert [(s.level, s.title, s.path) for s in secs] == [
        (0, "", ""),
        (1, "One", "One"),
        (2, "One A", "One > One A"),
        (3, "Deep", "One > One A > Deep"),
        (2, "One B", "One > One B"),
        (1, "Two", "Two"),
    ]
    assert secs[0].text == "preamble text"
    assert secs[1].text == "alpha beta"
    assert secs[3].text == "text deep"
    assert secs[5].text == "omega"
    # ascending offsets, dense numbering
    assert [s.section_no for s in secs] == list(range(6))
    assert all(a.offset < b.offset for a, b in zip(secs, secs[1:]))


def test_sibling_heading_pops_stack():
    secs = section_rows("<h2>A</h2>x<h2>B</h2>y")
    assert [(s.title, s.path) for s in secs] == [("A", "A"), ("B", "B")]


def test_level_jump_up_and_down():
    secs = section_rows("<h1>A</h1><h3>B</h3><h2>C</h2>")
    assert [s.path for s in secs] == ["A", "A > B", "A > C"]


def test_no_headings_single_preamble():
    secs = section_rows("<p>just text</p>")
    assert len(secs) == 1 and secs[0].text == "just text"


def test_heading_markup_in_title_collapsed():
    secs = section_rows("<h1>Big <em>bold</em> title</h1>body")
    assert secs[0].title == "Big bold title"
    assert secs[0].text == "body"


def test_soup_never_raises():
    for soup in ("<h1>unclosed", "", "\x00<h2><h2>", "<h3>a<h1>b"):
        section_rows(soup)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_section_rows_df_and_chunking(spark):
    from hquery_php_spark.operators.sections import (
        chunk_sections_df,
        section_rows_df,
    )

    html = (
        "<h1>A</h1>" + "w " * 10
        + "<h1>B</h1>" + "w " * 10
        + "<h1>C</h1>" + "w " * 25
        + "<h1>D</h1>" + "w " * 3
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    secs = section_rows_df(df)
    out = chunk_sections_df(secs, max_tokens=20).orderBy("section_no").collect()
    # A(10)+B(10) fill chunk 0; C(25) oversize alone; D(3) new chunk
    assert [(r["title"], r["chunk_no"], r["oversize"]) for r in out] == [
        ("A", 0, False),
        ("B", 0, False),
        ("C", 1, True),
        ("D", 2, False),
    ]


def test_chunking_budget_never_split_below_max(spark):
    from hquery_php_spark.operators.sections import (
        chunk_sections_df,
        section_rows_df,
    )
    import pyspark.sql.functions as F

    html = "".join(
        f"<h2>S{i}</h2>" + "tok " * (3 + i % 5) for i in range(20)
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    out = chunk_sections_df(section_rows_df(df), max_tokens=12)
    per_chunk = (
        out.groupBy("chunk_no")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_chunk:
        assert r["t"] <= 12 or r["n"] == 1  # only oversize singletons exceed


def test_section_chunks_flow_into_pack_sequences(spark):
    """Composition: structure-aware chunks are pack_sequences input —
    reassembled chunk texts pack under the same token budget with the
    documented <=1-doc overflow bound."""
    import pyspark.sql.functions as F

    from hquery_php_spark.operators.pipeline import pack_sequences
    from hquery_php_spark.operators.sections import (
        chunk_sections_df,
        section_rows_df,
    )

    html = "".join(
        f"<h2>S{i}</h2>" + ("tok " * (4 + i % 6)) for i in range(30)
    )
    docs = spark.createDataFrame(
        [(d, html) for d in range(4)], "doc_id long, html string"
    )
    chunks = (
        chunk_sections_df(section_rows_df(docs), max_tokens=16)
        .groupBy("doc_id", "chunk_no")
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("section_no", "text"))),
                    lambda s: s["text"],
                ),
            ).alias("text")
        )
        .select(
            F.concat_ws("#", F.col("doc_id"), F.col("chunk_no")).alias("doc_id"),
            "text",
        )
    )
    from hquery_php_spark.functions.text import token_count

    chunks = chunks.withColumn("n_tokens", token_count(F.col("text")))
    packed = pack_sequences(chunks, max_tokens=64, n_shards=2)
    per_pack = (
        packed.groupBy("shard", "pack_no")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.max("n_tokens").alias("mx"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert per_pack, "packing produced no packs"
    for r in per_pack:
        # pack_sequences' documented bound: overflow < one member
        assert r["t"] - r["mx"] < 64, r
