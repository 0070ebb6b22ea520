"""Fault-tolerance fuzzing: the engine must never crash and must keep
its structural invariants on ARBITRARY byte input (north star: repair
megabytes of invalid HTML; reference asserts survival on badHTML1/2)."""

from hypothesis import given, settings
from hypothesis import strategies as st

import hquery_php_spark as hq
from hquery_php_spark.core.extract import ExtractOptions, extract_spans

# byte soup biased toward markup punctuation so tags actually form
_markup = st.sampled_from(
    [b"<", b">", b"/", b"=", b'"', b"'", b"<!--", b"-->", b"<div", b"</div",
     b"<script>", b"</script>", b"<a href=", b"<img src=", b" ", b"\n",
     b"x", b"\xc3\xa9", b"\xff", b"&amp;", b"<p class='a b'", b"<!", b"<?"]
)
_soup = st.lists(_markup, min_size=0, max_size=80).map(b"".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_never_crashes_and_invariants_hold(raw):
    doc = hq.HDoc(raw)  # must not raise, whatever the bytes
    idx = doc.index
    n = len(idx.html)
    begins = sorted(idx.ids)
    # intervals: begin <= end, inside the document
    for b in begins:
        e = idx.ids[b]
        assert 0 <= b <= n
        assert b <= e <= n
    # extents sorted by construction after merge; spans extraction runs
    spans = extract_spans(doc, ExtractOptions())
    offs = [s.offset for s in spans]
    assert offs == sorted(offs)
    for s in spans:
        assert s.kind in ("text", "media")
        assert 0 <= s.offset <= n
    # selector engine never crashes on the indexed soup
    for sel in ("div", "a[href]", "div > a", "p + a", ".a", "*:first"):
        doc.find(sel)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pure_random_bytes(raw):
    doc = hq.HDoc(raw)
    extract_spans(doc)
