"""Structured page metadata (operators/pagemeta.py): OpenGraph /
Twitter / canonical / JSON-LD / feed extraction through the hquery
engine, URL absolutization, broken-block tolerance, row projection."""

from hquery_php_spark.operators.pagemeta import page_meta, page_meta_rows

HTML = """<html><head>
<meta charset="utf-8"><title> My Page </title>
<link rel="canonical" href="/articles/1">
<meta name="description" content="A description.">
<meta property="og:title" content="OG Title">
<meta property="og:image" content="https://cdn.example.com/img.png">
<meta name="twitter:card" content="summary">
<link rel="alternate" type="application/rss+xml" href="/feed.xml">
<link rel="icon" href="/favicon.ico">
<script type="application/ld+json">{"@type": "Article", "name": "x"}</script>
<script type="application/ld+json">{broken json</script>
</head><body><p>hi</p></body></html>"""


def test_full_extraction():
    m = page_meta(HTML, "https://example.com/articles/1?x=1")
    assert m["title"] == "My Page"
    assert m["canonical"] == "https://example.com/articles/1"
    assert m["description"] == "A description."
    assert m["og"] == {
        "title": "OG Title", "image": "https://cdn.example.com/img.png",
    }
    assert m["twitter"] == {"card": "summary"}
    # broken JSON-LD counts but claims no types
    assert m["n_jsonld"] == 2 and m["jsonld_types"] == ["Article"]
    assert m["feeds"] == ["https://example.com/feed.xml"]
    assert m["icons"] == ["https://example.com/favicon.ico"]


def test_base_href_wins_over_document_url():
    html = (
        '<html><head><base href="https://cdn.other.org/x/">'
        '<link rel="canonical" href="page.html"></head></html>'
    )
    m = page_meta(html, "https://example.com/")
    assert m["canonical"] == "https://cdn.other.org/x/page.html"


def test_jsonld_type_lists_and_arrays():
    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '[{"@type": "A"}, {"@type": ["B", "C"]}]</script>'
        "</head></html>"
    )
    m = page_meta(html)
    assert m["jsonld_types"] == ["A", "B", "C"] and m["n_jsonld"] == 1


def test_rows_projection_order():
    rows = page_meta_rows(HTML, "https://example.com/")
    kinds = [(r["kind"], r["key"]) for r in rows]
    # fixed emission order: doc, canonical, description, og sorted,
    # twitter sorted, feeds, icons, jsonld
    assert kinds == [
        ("doc", "title"), ("link", "canonical"), ("doc", "description"),
        ("og", "image"), ("og", "title"), ("twitter", "card"),
        ("link", "feed"), ("link", "icon"), ("jsonld", "@type"),
    ]


def test_degenerate_inputs():
    assert page_meta(None) is None
    m = page_meta("")
    assert m["title"] is None and m["og"] == {} and m["n_meta"] == 0
    assert page_meta_rows("plain text, no tags") == []
    # byte soup never raises
    page_meta(b"\x00\xff<meta", "https://e.com/")


def test_fuzz_never_raises():
    import random

    rng = random.Random(9)
    for _ in range(150):
        b = list(HTML)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = chr(rng.randrange(32, 127))
        page_meta("".join(b), "https://example.com/")


def test_parse_srcset_grammar():
    from hquery_php_spark.core.urlutil import parse_srcset

    assert parse_srcset("/a.png 1x, /b.png 2x") == [
        ("/a.png", "1x"),
        ("/b.png", "2x"),
    ]
    assert parse_srcset("a.png 600w,b.png 200w") == [
        ("a.png", "600w"),
        ("b.png", "200w"),
    ]
    assert parse_srcset("x.png") == [("x.png", None)]
    # a comma INSIDE the URL (data: URI) is not a separator
    assert parse_srcset("data:image/png;base64,iVBOR 1x, /y.png 2x") == [
        ("data:image/png;base64,iVBOR", "1x"),
        ("/y.png", "2x"),
    ]
    # junk commas / bare candidates / trailing comma
    assert parse_srcset(" , ,a.png,  b.png 2x ,") == [
        ("a.png", None),
        ("b.png", "2x"),
    ]
    assert parse_srcset(None) == [] and parse_srcset("") == []


def test_srcset_refs_engine_walk():
    from hquery_php_spark.operators.pagemeta import srcset_refs

    h = (
        '<html><head><base href="https://cdn.ex.com/p/"></head><body>'
        '<picture><source srcset="a-1x.png 1x, a-2x.png 2x">'
        '<img srcset="/big.png 600w, sm.png 200w" src="f.png"></picture>'
        '<img src="plain.png"></body></html>'
    )
    assert srcset_refs(h, "https://ex.com/x") == [
        ("source", "https://cdn.ex.com/p/a-1x.png", "1x"),
        ("source", "https://cdn.ex.com/p/a-2x.png", "2x"),
        ("img", "https://cdn.ex.com/big.png", "600w"),
        ("img", "https://cdn.ex.com/p/sm.png", "200w"),
    ]
    assert srcset_refs("<p>none</p>") == []
    assert srcset_refs(None) == []
    # soup never raises
    srcset_refs('<img srcset=",,,  ">')
    srcset_refs("<source srcset")
