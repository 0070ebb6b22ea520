"""HTML table extraction: grid resolution, spans, fault tolerance."""

from hquery_php_spark.operators.tables import html_tables


def grid(html):
    return {
        (c.table_no, c.row_no, c.col_no): c.text for c in html_tables(html)
    }


def test_simple_grid():
    g = grid(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )
    assert g == {(0, 0, 0): "a", (0, 0, 1): "b", (0, 1, 0): "1", (0, 1, 1): "2"}


def test_colspan_shifts_following_cells():
    cells = html_tables(
        '<table><tr><td colspan="2">ab</td><td>c</td></tr>'
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    pos = [(c.row_no, c.col_no) for c in cells]
    assert pos == [(0, 0), (0, 2), (1, 0), (1, 1), (1, 2)]


def test_rowspan_occupies_next_rows():
    cells = html_tables(
        '<table><tr><td rowspan="2">r</td><td>1</td></tr>'
        "<tr><td>2</td></tr></table>"
    )
    pos = {(c.row_no, c.col_no): c.text for c in cells}
    assert pos == {(0, 0): "r", (0, 1): "1", (1, 1): "2"}


def test_thead_tbody_transparent_and_header_flag():
    cells = html_tables(
        "<table><thead><tr><th>h</th></tr></thead>"
        "<tbody><tr><td>d</td></tr></tbody></table>"
    )
    assert [(c.row_no, c.is_header) for c in cells] == [(0, True), (1, False)]


def test_unclosed_html5_cells():
    g = grid("<table><tr><td>x<td>y<tr><td>z</table>")
    assert g == {(0, 0, 0): "x", (0, 0, 1): "y", (0, 1, 0): "z"}


def test_nested_table_owns_its_cells():
    cells = html_tables(
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td></tr></table>"
    )
    by_t = {}
    for c in cells:
        by_t.setdefault(c.table_no, []).append(c.text)
    assert by_t[1] == ["inner"]
    assert "inner" in by_t[0][0]  # outer cell text includes nested text


def test_invalid_spans_read_as_one():
    cells = html_tables('<table><tr><td rowspan="x" colspan="-3">v</td></tr></table>')
    assert cells[0].rowspan == 1 and cells[0].colspan == 1


def test_entities_and_whitespace_in_cells():
    g = grid("<table><tr><td> a &amp;\n b </td></tr></table>")
    assert g[(0, 0, 0)] == "a & b"


def test_soup_never_raises():
    for soup in ("<table><td junk", "<tr><td>no table", "", "\x00<table"):
        html_tables(soup)


def test_multiple_tables_document_order():
    cells = html_tables(
        "<table><tr><td>t0</td></tr></table>"
        "<p>x</p><table><tr><td>t1</td></tr></table>"
    )
    assert [(c.table_no, c.text) for c in cells] == [(0, "t0"), (1, "t1")]


def test_html_tables_df():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from hquery_php_spark.operators.tables import html_tables_df

    df = spark.createDataFrame(
        [(7, "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>")],
        "doc_id long, html string",
    )
    rows = html_tables_df(df).orderBy("row_no").collect()
    assert [(r["doc_id"], r["row_no"], r["is_header"], r["text"]) for r in rows] == [
        (7, 0, True, "k"),
        (7, 1, False, "v"),
    ]
