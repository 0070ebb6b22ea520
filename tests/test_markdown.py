"""Markdown renderer: deterministic rendering rules over the tag index."""

from hquery_php_spark.operators.markdown import render_markdown


def test_headings_and_paragraphs():
    md = render_markdown(
        "<h1>Title</h1><p>one</p><h2>Sub</h2><p>two</p>"
    )
    assert md == "# Title\n\none\n\n## Sub\n\ntwo"


def test_inline_marks_links_images():
    md = render_markdown(
        '<p>a <strong>b</strong> <em>c</em> <code>d()</code> '
        '<a href="/x">lnk</a> <img src="/i.png" alt="pic"></p>',
        "https://ex.com/base/",
    )
    assert md == (
        "a **b** *c* `d()` [lnk](https://ex.com/x) "
        "![pic](https://ex.com/i.png)"
    )


def test_b_i_aliases_and_empty_emphasis():
    assert render_markdown("<p><b>x</b><i>y</i></p>") == "**x***y*"
    assert render_markdown("<p>a<b>  </b>b</p>") == "a b"


def test_nested_lists_ordered_and_unordered():
    md = render_markdown(
        "<ul><li>one</li><li>two<ul><li>sub</li></ul></li></ul>"
        "<ol><li>first</li><li>second</li></ol>"
    )
    assert md == (
        "- one\n- two\n  - sub\n\n1. first\n2. second"
    )


def test_blockquote_prefixes_every_line():
    md = render_markdown("<blockquote><p>a</p><p>b</p></blockquote>")
    assert md == "> a\n>\n> b"


def test_pre_code_fence_not_collapsed():
    md = render_markdown("<pre><code>x = 1\n  y = 2</code></pre>")
    assert md == "```\nx = 1\n  y = 2\n```"
    # bare pre without code wrapper
    assert render_markdown("<pre>a  b</pre>") == "```\na  b\n```"


def test_table_pipe_rendering():
    md = render_markdown(
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>id</td><td>4|2</td></tr></table>"
    )
    assert md == "| k | v |\n| --- | --- |\n| id | 4\\|2 |"


def test_br_and_hr():
    assert render_markdown("<p>a<br>b</p>") == "a\nb"
    assert render_markdown("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb"


def test_head_script_style_skipped():
    md = render_markdown(
        "<html><head><title>T</title><style>p{}</style>"
        "<script>var x;</script></head><body><p>only</p></body></html>"
    )
    assert md == "only"


def test_bare_text_in_container_becomes_paragraph():
    md = render_markdown("<div>bare<p>para</p>tail</div>")
    assert md == "bare\n\npara\n\ntail"


def test_entities_decoded():
    assert render_markdown("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


def test_base_href_absolutization():
    md = render_markdown(
        '<head><base href="https://cdn.ex.com/root/"></head>'
        '<p><a href="f.html">f</a></p>'
    )
    assert md == "[f](https://cdn.ex.com/root/f.html)"


def test_unclosed_soup_never_raises():
    for soup in (
        "<p>broken <b>soup",
        "<ul><li>a<li>b",
        "<table><tr><td>x",
        "<blockquote>q",
        "\x00\xff<div<<>p",
        "",
    ):
        render_markdown(soup)  # must not raise


def test_unclosed_li_html5_style():
    md = render_markdown("<ul><li>a</li><li>b</li></ul>")
    assert md == "- a\n- b"


def test_anchor_without_href_is_transparent():
    assert render_markdown("<p><a>just text</a></p>") == "just text"


def test_comment_between_blocks_invisible():
    assert render_markdown("<p>a</p><!-- hidden --><p>b</p>") == "a\n\nb"


def test_markdown_df_roundtrip(tmp_path):
    import pytest

    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from hquery_php_spark.operators.markdown import markdown_df

    df = spark.createDataFrame(
        [(1, "<h1>T</h1><p>body</p>"), (2, "<p>x</p>")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in markdown_df(df).collect()}
    assert rows[1]["markdown"] == "# T\n\nbody"
    assert rows[1]["n_blocks"] == 2
    assert rows[2]["markdown"] == "x"
    assert rows[2]["n_chars"] == 1


def test_link_style_text_drops_urls():
    html = (
        '<p>See <a href="/x">the docs</a> and '
        '<img src="/i.png" alt="a chart"> now.</p>'
    )
    md = render_markdown(html, "https://e.com/", link_style="text")
    assert md == "See the docs and a chart now."
    # anchor with no text contributes nothing but its spacing
    assert (
        render_markdown('<p>a <a href="/x"></a>b</p>', link_style="text")
        == "a b"
    )


def test_markdown_df_mega_doc_among_small(tmp_path):
    """A multi-MB document in the same batch as KB docs must not wedge
    the Arrow batch path (the mega-doc skew case the extract leg
    isolates with split-tail repartition)."""
    import gzip

    import pytest

    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from hquery_php_spark.operators.markdown import markdown_df

    mega = gzip.open(
        "/root/reference/tests/data/big_granito_1.html.gz", "rb"
    ).read().decode("windows-1251", "replace")
    rows = [(0, mega)] + [(i, f"<h1>d{i}</h1><p>body {i}</p>") for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in markdown_df(df).collect()}
    assert len(got) == 30
    assert got[0]["n_chars"] > 100_000  # the mega render is real
    assert got[5]["markdown"] == "# d5\n\nbody 5"


def test_extract_all_single_parse_surfaces():
    from hquery_php_spark.operators.extract_all import extract_all

    h = (
        '<html><head><title>T</title>'
        '<link rel="canonical" href="https://e.com/c"></head>'
        "<body><h1>H</h1><p>body <a href='/x'>lnk</a></p>"
        "<table><tr><td>v</td></tr></table></body></html>"
    )
    r = extract_all(h, "https://e.com/")
    assert r["title"] == "T"
    assert r["canonical"] == "https://e.com/c"
    assert r["markdown"].startswith("# H")
    assert r["n_sections"] == 1 and r["sec1_path"] == "H"
    assert r["n_cells"] == 1
    assert "body" in r["main_text"]
    kinds = [s.kind for s in r["spans"]]
    assert "media" in kinds and "text" in kinds
    # every surface agrees with its standalone operator
    from hquery_php_spark.core.extract import extract_spans
    from hquery_php_spark.operators.markdown import render_markdown
    import hquery_php_spark as hq

    doc = hq.HDoc(h.encode(), "https://e.com/")
    assert r["spans"] == extract_spans(doc)
    assert r["markdown"] == render_markdown(hq.HDoc(h.encode(), "https://e.com/"))


def test_extract_all_df_roundtrip():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from hquery_php_spark.operators.extract_all import extract_all_df

    df = spark.createDataFrame(
        [(1, "<h1>A</h1><p>x</p>"), (2, "<p>y <b>z</b></p>")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in extract_all_df(df).collect()}
    assert rows[1]["markdown"] == "# A\n\nx"
    assert rows[1]["n_sections"] == 1
    assert rows[2]["markdown"] == "y **z**"
    assert [s["kind"] for s in rows[2]["spans"]] == ["text", "text"]
    assert [s["text"] for s in rows[2]["spans"]] == ["y", "z"]
