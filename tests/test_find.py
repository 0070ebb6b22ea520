"""End-to-end behavioral tests — golden selector counts, texts, URLs,
outerHtml close-styles, dl extraction — ported from
/root/reference/tests/hQueryCore.Test.php (cited per test)."""

import re

import pytest

from hquery_php_spark.core import HDoc
from hquery_php_spark.sources import (
    ATTR_QUOTES_HTML,
    BASE_TAG_1,
    BASE_URL,
    BODY_HTML,
    EMPTY_BODY_HTML,
    STRESS_SELECTORS,
)


@pytest.fixture(scope="module")
def doc():
    return HDoc(BODY_HTML, BASE_URL + "index.html")


@pytest.fixture(scope="module")
def attr_doc():
    return HDoc(ATTR_QUOTES_HTML, BASE_URL)


def count(doc, sel):
    r = doc.find(sel)
    return len(r) if r else 0


# ---- test_find (hQueryCore.Test.php:263-398) ----------------------------- #
GOLDEN_COUNTS = [
    (".test-class #test-div.test-div > a[href]", 1),
    (".test-class [id=test-div].test-div.span-div > a[href].path.span-a", 1),
    ('.test-class a[href][class="path span span-a"]', 1),
    ('.test-class [class="path span span-a"]', 1),
    ('[class="path span span-a"]', 1),
    ('th[class=" "]', 1),
    ("#outerImg", 1),
    ("dl>dt+dd", 2),
    ("div + a", 1),
    ("div + img", 0),
    ("div ~ img", 1),
    (".span", 3),
    (".span.span-div", 1),
    (".span-a.span-div", 0),
    ("a ~ .span", 2),
    ("[href]", 3),
    ("[href][class]", 2),
    ("[href][class=pjax]", 1),
    ("[href].pjax", 1),
]


@pytest.mark.parametrize("sel,want", GOLDEN_COUNTS)
def test_golden_counts(doc, sel, want):
    assert count(doc, sel) == want, sel


def test_find_details(doc):
    a = doc.find(".test-class #test-div.test-div > a[href]")
    assert len(a) == 1
    assert a.node_name() == "a"
    assert a.first().text().strip() == "link: This is a link"
    assert a.attr("href", True) == "https://DUzun.Me/path"
    assert a.attr("href") == "/path"
    assert a.parent().node_name() == "div"
    p = a.parent()
    assert doc.index.get_attr_by_id(p.pos(), "id") == "test-div"

    th = doc.find('th[class=" "]')
    assert th.node_name() == "th"
    assert th.first().text().strip() == "Coffee"

    assert doc.find("#outerImg").node_name() == "img"

    # same href found via [attr=] and via .class — same element
    a1 = doc.find("[href][class=pjax]")
    a2 = doc.find("[href].pjax")
    assert a1.pos() == a2.pos()


def test_context_invariance(doc):
    # hQueryStress.Test.php:159: count(doc.find(s)) == count(body.find(s))
    # (holds only for selectors that do not match <body> itself — context
    # containment is strict, same as the reference)
    body = doc.find("body")
    for sel in STRESS_SELECTORS:
        r1 = doc.find(sel)
        r2 = body.find(sel)
        n1 = len(r1) if r1 else 0
        n2 = len(r2) if r2 else 0
        assert n1 == n2, sel


def test_head_title(doc):
    assert doc.find("head title").text() == "Sample HTML Doc"


def test_empty_body_unclosed_head():
    # hQueryCore.Test.php:377-386
    edoc = HDoc(EMPTY_BODY_HTML, BASE_URL + "index.html")
    assert edoc.charset == "WINDOWS-1251"
    assert edoc.find("a") is None
    # no </head>: meta is NOT inside <head>
    assert edoc.find("head meta") is None
    assert len(edoc.find("body")) == 1


# ---- attr.html: misplaced-quote attributes (hQueryCore.Test.php:343-362) - #
def test_attr_quotes(attr_doc):
    assert len(attr_doc.find("a.aa")) == 3
    assert len(attr_doc.find("input")) == 3
    inp = attr_doc.find("input[name=title]")
    assert len(inp) == 1
    assert inp.val() == "the title"
    assert len(attr_doc.find("input[type=text]")) == 2
    it = attr_doc.find("input[type=text][name=text]")
    assert len(it) == 1
    assert it.attr("value") == "the text"


def test_attr_and_prop(attr_doc):
    # hQueryCore.Test.php:455-487
    e = attr_doc.find("#img1")
    a = attr_doc.find("a.aa:last")
    assert e.attr("src") == "/path/to/img.png"
    assert e.attr("src2") == "other/img/here.jpg"
    assert e.attr("src3") == "//example.com/full/path.gif"
    assert a.attr("href") == "#test"
    # evaluated: src resolved, src2 not special
    assert e.attr("src", True) == BASE_URL + "path/to/img.png"
    assert e.attr("src2", True) == "other/img/here.jpg"
    assert a.attr("href", True) == BASE_URL + "#test"


# ---- hasClass tri-state (hQueryCore.Test.php:401-434) -------------------- #
def test_has_class(doc):
    a = doc.find("a:first")
    div = doc.find("div.test-div")
    body = doc.find("body")
    head = doc.find("head")
    allc = doc.find(".test-class")

    assert div.has_class("test-class")
    assert div.has_class(["test-class", "test-div"])
    assert not div.has_class(["test-class", "test-div", "span"])
    assert allc.has_class("test-class test-div")

    assert not a.has_class("test-class")
    assert not body.has_class("test-div")
    assert not body.has_class("test-class test-div")

    assert not a.has_class("non-existent-class")
    assert not head.has_class("non-existent-class")
    assert not div.has_class(["non-existent-class", "span"])
    assert not a.has_class("")
    assert not a.has_class([])
    empty = head.slice(0, 0)
    assert not empty.has_class("test-class")
    assert not empty.has_class("non-existent-class")

    # tri-state: 0 = has attrs/classes but not this one; False = class not
    # in document at all
    assert a.has_class("test-class") == 0
    assert div.has_class("no-such-class-anywhere") is False
    assert div.has_class("test-div") is True


# ---- URLs (hQueryCore.Test.php:487-620) ----------------------------------- #
def test_relative_vs_absolute_urls(doc):
    a = doc.find("a:first")
    assert a.attr("href", True) == BASE_URL + "path"
    assert a.attr("href") == "/path"

    a = doc.find("a#outerLink")
    assert a.attr("href", True) == "https://not-my-site.com/next.html"
    assert a.attr("href") == "//not-my-site.com/next.html"

    st = a.attr("style", True)
    assert isinstance(st, dict)
    assert list(st.keys()) == ["color", "padding", "background-image"]
    assert st["color"] == "blue"
    assert isinstance(a.attr("style"), str)

    img = doc.find("img#outerImg")
    assert img.attr("src", True) == "https://cdn.duzun.me/images/logo.png"
    assert img.attr("src") == "//cdn.duzun.me/images/logo.png"

    link = doc.find("link", {"rel": "shortcut icon"})
    assert link.attr("href", True) == BASE_URL + "favicon.ico"
    assert link.attr("href") == "/favicon.ico"

    m = doc.find("meta", {"property": "og:image"})
    assert m.attr("content") == "/logo.png"
    assert doc.url2abs("/logo.png") == BASE_URL + "logo.png"


def test_base_tag_resolution():
    # hQueryCore.Test.php:558-620
    d = HDoc(BASE_TAG_1, BASE_URL + "index.html")
    assert d.base_url == BASE_URL + "base/"
    assert d.base_uri == BASE_URL + "base/path.html?how=rewrite#hash"

    a = d.find("a#rel_path")
    assert a.attr("href") == "rel-path/index.html"
    assert a.attr("href", True) == BASE_URL + "base/rel-path/index.html"

    a = d.find("a#rel_origin")
    assert a.attr("href", True) == BASE_URL + "abs-path/index.html"

    a = d.find("a#rel_schema")
    assert a.attr("href", True) == "https://not-my-site.com/next.html"

    img = d.find("img#rel_img")
    assert img.attr("src", True) == BASE_URL + "images/logo.png"


def test_doc_base_url(doc):
    assert doc.base_url == BASE_URL
    assert doc.base_uri == BASE_URL + "index.html"


# ---- charset (hQueryCore.Test.php:547-553,746-759) ------------------------ #
def test_prop_charset(doc, attr_doc):
    assert doc.charset.lower() == "iso-8859-2"
    assert attr_doc.charset.lower() == "utf-8"


# ---- text extraction (hQueryCore.Test.php:623-630) ------------------------ #
def test_text(doc):
    div = doc.find("#test-div")
    text = div.text().strip()
    assert text == (
        "text: This is some text\n        \n            link: This is a link"
        "\n        \n         in : between tags\n        span: Span text"
        "\n        notSpan: notSpan text"
    )
    assert re.sub(r"\s+", " ", text) == (
        "text: This is some text link: This is a link in : between tags "
        "span: Span text notSpan: notSpan text"
    )


# ---- outerHtml incl. close style (hQueryCore.Test.php:632-650) ------------ #
def test_outer_html(doc):
    assert doc.find("meta[charset]").outer_html() == '<meta charset="ISO-8859-2">'
    assert (
        doc.find("meta[property=og:image]").outer_html()
        == '<meta content="/logo.png" property="og:image"/>'
    )
    assert (
        doc.find('link[rel="shortcut icon"]').outer_html()
        == '<link class="pjax" href="/favicon.ico" rel="shortcut icon" />'
    )
    assert doc.find('th[class=" "]').outer_html() == '<th class=" "  >Coffee</th>'


# ---- dl / text2dl (hQueryCore.Test.php:652-717) ---------------------------- #
def test_text2dl(doc):
    div = doc.find("#test-div")
    assert div.text2dl() == {
        "text": "This is some text",
        "link": "This is a link",
        "in": "between tags",
        "span": "Span text",
        "notSpan": "notSpan text",
    }
    assert div.text2dl(":", "link") == "This is a link"
    assert div.text2dl(":", lambda k, v: "span" in k.lower()) == "Span text"


def test_dl(doc):
    dl = doc.find("#dict1")
    assert dl.dl("dt", "dd") == {
        "Coffee": "Black hot drink",
        "Milk": "White cold drink",
    }
    assert dl.dl("dt", "dd", None, "Milk") == "White cold drink"

    dl = doc.find("#dict2")
    assert dl.dl("th", "td", "tr") == {
        "Coffee": "Black hot drink",
        "Milk": "White cold drink",
    }
    assert dl.dl("th", "td", "tr", "Milk") == "White cold drink"


# ---- exclude: content-view subtraction (Node.php:205-218) ------------------ #
def test_exclude(doc):
    div = HDoc(BODY_HTML, BASE_URL).find("#test-div").first()
    div.exclude("div")  # drop the nested #aDiv from the content view
    t = re.sub(r"\s+", " ", div.text().strip())
    assert "notSpan text" not in t
    assert "Span text" in t


# ---- positional pseudos ----------------------------------------------------- #
def test_positional_pseudos(doc):
    a_all = doc.find("a")
    assert len(a_all) == 2
    assert doc.find("a:first").attr("href") == "/path"
    assert doc.find("a:last").attr("href") == "//not-my-site.com/next.html"
    assert doc.find("a:eq(1)").attr("href") == "//not-my-site.com/next.html"
    assert doc.find("a:eq(-1)").attr("href") == "//not-my-site.com/next.html"
    assert doc.find("a:1").attr("href") == "//not-my-site.com/next.html"
    assert len(doc.find("dd:lt(2)")) == 2
    assert len(doc.find("dd:lt(1)")) == 1
    # reference semantics: :gt(n) drops the first n (array_slice from n)
    assert len(doc.find("dd:gt(0)")) == 2
    assert len(doc.find("dd:gt(1)")) == 1
    # :parent / :children / :next / :prev
    assert doc.find("dt:first:next").first().text() == "Black hot drink"
    assert doc.find("dd:last:prev").first().text() == "Milk"
    assert doc.find("#aSpan:parent").attr("id") == "test-div"
    ch = doc.find("#dict1:children")
    assert len(ch) == 4


# ---- property magic (Element.php:54-97) ------------------------------------ #
def test_property_sugar(doc):
    a = doc.find("a#outerLink")
    assert a.href == "https://not-my-site.com/next.html"
    assert isinstance(a.style, dict) and a.style["color"] == "blue"
    assert a.nodeName == "a"
    assert a.id == "outerLink"
    img = doc.find("img#outerImg")
    assert img.src == "https://cdn.duzun.me/images/logo.png"
    assert doc.find("#test-div").textContent.strip().startswith("text:")


def test_from_file(tmp_path):
    import gzip

    p = tmp_path / "x.html.gz"
    p.write_bytes(gzip.compress(b"<html><body><a href='y.html'>y</a></body></html>"))
    d = HDoc.from_file(str(p), "https://h.io/base/")
    assert d.find("a").attr("href", True) == "https://h.io/base/y.html"


def test_del_spaces_option():
    """T14: optional whitespace squeeze before indexing
    (HTML_Index.php:38,797-800) — off by default."""
    raw = b"<div>\n   <p>a</p>\n</div>"
    d = HDoc(raw, del_spaces=True)
    assert d.index.html == b"<div> <p>a</p> </div>"
    assert HDoc(raw).index.html == raw


def test_outer_html_tag_map():
    """E2: tag_map rename on output, lowercased lookup (Node.php:299-303)."""
    el = HDoc(b'<B href="x">t</B>').find("b").first()
    assert el.outer_html() == '<B href="x">t</B>'
    assert el.outer_html({"b": "strong"}) == '<strong href="x">t</strong>'


def test_detect_charset_table():
    """Port of the reference's charset table (hQueryCore.Test.php:746-759):
    HTML/XML declarations, bad HTML, and HTTP headers in several shapes."""
    from hquery_php_spark.core.charset import detect_charset
    from hquery_php_spark.sources.fixtures import BAD_HTML_1, BAD_HTML_2

    assert detect_charset(b" ") is None
    assert detect_charset(BODY_HTML) == "ISO-8859-2"
    assert (
        detect_charset(EMPTY_BODY_HTML, {"content-type": "text/html; charset=UTF-8"})
        == "WINDOWS-1251"
    )
    assert detect_charset(BAD_HTML_1) is None
    assert detect_charset(BAD_HTML_2) == "UFT-8"  # the doc's own typo, kept

    assert detect_charset(b"", "Content-Type: text/html; charset=UTF-8") == "UTF-8"
    assert detect_charset(b"", {"Content-Type": "text/html; charset = utf-8 "}) == "UTF-8"
    assert detect_charset(b"", {"content-type": 'text/html; charset = "utf-8"'}) == "UTF-8"
    assert detect_charset(b"", {"CONTENT_TYPE": "text/html;charset='Utf-8'"}) == "UTF-8"


def test_attr_order_collision_document_order():
    """Distinct raw attr strings that canonicalize to one interned key
    (attr2str ksorts names, so reordered attrs collide) must keep the
    merged posting list in document order — the reference ksorts
    (HTML_Index.php:1261-1285); regression for the single-aid fast path
    in get_ids_by_aid skipping the sort."""
    html = (
        b"<html><body>"
        b'<i class="x" title="t">A</i>'
        b'<i title="t" class="x">B</i>'
        b'<i class="x" title="t">C</i>'
        b"</body></html>"
    )
    d = HDoc(html)
    r = d.find(".x")
    assert [e.text() for e in r] == ["A", "B", "C"]
    assert [e.text() for e in d.find(".x:lt(2)")] == ["A", "B"]
    assert d.find(".x:eq(1)").text() == "B"
