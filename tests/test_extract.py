"""Span-extraction tests: ordered (kind, text, media_ref, offset) sequences
over this repo's own pinned fixtures (the heuristics are new relative to
the reference — see hquery_php_spark/core/extract.py)."""

from hquery_php_spark.core import ExtractOptions, HDoc, extract_spans
from hquery_php_spark.sources import gen_corpus, interleaved_media_doc


def spans_of(html, url=None, **kw):
    doc = HDoc(html, url)
    opts = ExtractOptions(**kw) if kw else ExtractOptions()
    return extract_spans(doc, opts)


def test_simple_interleaved():
    html = '<html><body><p>Hello world</p><a href="/x">go</a><img src="/i.png"/></body></html>'
    sp = spans_of(html, "https://ex.com/a/b.html")
    kinds = [(s.kind, s.text, s.media_ref) for s in sp]
    assert kinds == [
        ("text", "Hello world", None),
        ("media", "go", "https://ex.com/x"),
        ("media", "", "https://ex.com/i.png"),
    ]
    # offsets: text run starts right after <p>'s '>'
    p_gt = html.index("<p>") + 2
    assert sp[0].offset == p_gt + 1
    a_gt = html.index('"/x">') + 4
    assert sp[1].offset == a_gt
    img_gt = html.index('/i.png"/>') + len('/i.png"/')
    assert sp[2].offset == img_gt


def test_order_is_document_order():
    html = (
        "<body>alpha<img src='/1.png'/>beta<a href='/l'>L</a>gamma</body>"
    )
    sp = spans_of(html, "https://e.com/")
    assert [s.kind for s in sp] == ["text", "media", "text", "media", "text"]
    assert [s.offset for s in sp] == sorted(s.offset for s in sp)
    assert [s.text for s in sp] == ["alpha", "", "beta", "L", "gamma"]


def test_script_style_comments_masked():
    html = (
        "<body>keep<script>drop this < text</script>"
        "<style>.x{}</style><!-- drop too -->tail</body>"
    )
    sp = spans_of(html)
    assert [s.text for s in sp] == ["keep", "tail"]


def test_entities_decoded_and_ws_collapsed():
    html = "<body>a &amp; b\n\n   c&quot;</body>"
    sp = spans_of(html)
    assert sp[0].text == 'a & b c"'


def test_link_density_strip():
    # text inside <a> is the link's text, not a standalone text span
    html = "<body><a href='/x'>only link text</a></body>"
    sp = spans_of(html)
    assert len(sp) == 1
    assert sp[0].kind == "media"
    assert sp[0].text == "only link text"
    # unless explicitly included — the <a> begins before its inner text run
    sp = spans_of(html, include_link_text_spans=True)
    assert [s.kind for s in sp] == ["media", "text"]


def test_min_text_chars():
    html = "<body>x<p>long enough</p></body>"
    sp = spans_of(html, min_text_chars=3)
    assert [s.text for s in sp] == ["long enough"]


def test_skip_inside_head():
    html = "<html><head><title>T</title></head><body>B</body></html>"
    sp = spans_of(html, skip_inside=("head",))
    assert [s.text for s in sp] == ["B"]
    sp2 = spans_of(html)
    assert [s.text for s in sp2] == ["T", "B"]


def test_max_tag_depth():
    html = "<body>top<div><div><div>deep</div></div></div></body>"
    sp = spans_of(html, max_tag_depth=2)
    assert [s.text for s in sp] == ["top"]


def test_charset_aware_media_ref():
    # windows-1251 doc: offsets are into the UTF-8-converted string
    doc_id, html, url = interleaved_media_doc(2)  # doc_id 2 → windows-1251
    doc = HDoc(html.encode("latin-1"), url)
    assert doc.charset == "WINDOWS-1251"
    sp = extract_spans(doc)
    for s in sp:
        if s.kind == "media" and s.media_ref.startswith("https://ex.com"):
            assert "/doc/2/" in s.media_ref  # resolved vs base host


def test_base_href_overrides_location():
    html = (
        "<html><head><base href='https://cdn.base.org/dir/x.html'/></head>"
        "<body><a href='rel.html'>r</a></body></html>"
    )
    sp = spans_of(html, "https://other.com/")
    media = [s for s in sp if s.kind == "media"]
    assert media[0].media_ref == "https://cdn.base.org/dir/rel.html"


def test_unclosed_script_masks_tail():
    html = "<body>ok<script>var a = '<p>hi</p>' "  # script never closes
    sp = spans_of(html)
    assert [s.text for s in sp] == ["ok"]


def test_corpus_deterministic():
    c1 = list(gen_corpus(50, seed=42))
    c2 = list(gen_corpus(50, seed=42))
    assert c1 == c2
    # fixture docs present
    ids = [r["doc_id"] for r in c1]
    assert ids[:6] == [
        "body_html",
        "empty_body",
        "bad_html_1",
        "bad_html_2",
        "base_tag",
        "attr_quotes",
    ]
    # every generated doc extracts without error
    for row in c1:
        doc = HDoc(row["html"].encode("latin-1"), row["base_url"])
        spans = extract_spans(doc)
        for a, b in zip(spans, spans[1:]):
            assert a.offset <= b.offset


def test_media_tags_non_indexed_attr_lazy_load():
    """media_tags accepts NON-indexed attrs (per-element fallback): the
    lazy-loading pattern (real URL in data-src, placeholder in src) is
    extractable by config — at crawl scale the placeholder is a 1px
    gif and data-src is where the image lives."""
    from hquery_php_spark.core.doc import HDoc
    from hquery_php_spark.core.extract import ExtractOptions, extract_spans

    h = (
        "<html><body><p>intro</p>"
        '<img class="lazy" src="/ph.gif" data-src="/real/photo1.jpg">'
        '<img src="/eager.png"></body></html>'
    )
    doc = HDoc(h.encode(), "https://site.ex/")
    opts = ExtractOptions(media_tags=(("img", "data-src"),))
    refs = [s.media_ref for s in extract_spans(doc, opts) if s.kind == "media"]
    assert refs == ["https://site.ex/real/photo1.jpg"]
    # boolean/absent attrs never emit a ref
    opts2 = ExtractOptions(media_tags=(("img", "loading"), ("img", "nope")))
    doc2 = HDoc(b'<img loading src="/x.png">', "https://s.ex/")
    assert [
        s for s in extract_spans(doc2, opts2) if s.kind == "media"
    ] == []
