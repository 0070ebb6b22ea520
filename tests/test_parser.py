"""Unit tests on parser primitives — golden values ported from the
reference suite (/root/reference/tests/hQueryParser.Test.php and
hQueryCore.Test.php; cited per test)."""

import pytest

from hquery_php_spark.core import (
    HDoc,
    find_tag_close,
    index_comments,
    parse_attr_str,
    parse_css_str,
    parse_html,
    parse_selector,
)
from hquery_php_spark.sources import BAD_HTML_1, BAD_HTML_2, big_synthetic


# ---- _findTagClose goldens (hQueryParser.Test.php:162-183) ------------- #
STR1 = (
    b'<img class="map>Img" "src"="https://cdn.duzun.lh/images/logo.png"">\n'
    b'                 <div class="overlayLowlightoverlayBottom">abra-kadabra</div>\n'
    b"               "
)
STR2 = (
    b'<img "class"="mapImg" title="What <br>a nice day for testing!!!" ">\n'
    b'                 <div class="overlayLowlightoverlayBottom">abra-kadabra</div>\n'
    b"               "
)
STR3 = (
    b"<img 'class 4 mapImg' title='What <br>a nice day for testing!!' ''>\n"
    b"                 <div class='overlayLowlightoverlayBottom'>abra-kadabra</div>\n"
    b"               "
)


@pytest.mark.parametrize("s", [STR1, STR2, STR3])
def test_find_tag_close_misplaced_quotes(s):
    assert find_tag_close(s, 1) == 66


def test_find_tag_close_plain():
    assert find_tag_close(b"<a href=x>", 2) == 9
    assert find_tag_close(b'<a href=">">', 2) == 11
    assert find_tag_close(b"<a href=x", 2) == -1  # no '>' → never closes
    assert find_tag_close(b"<a", 2) == 2  # p >= l → returns l (PHP quirk)


# ---- selector AST goldens (hQueryParser.Test.php:55,136-159) ------------ #
def test_selector_ast_golden():
    sel = (
        "tn1#id1[attr='[x]'] .cl1.cl2:first tn2:5\t, \n\ttn3.cl3 "
        "tn4#id2:eq(-1) > tn5:last-child>tn6:lt('3' ) + span[data-name] ~ a[href]"
    )
    a = parse_selector(sel)
    assert a[0][0]["n"] == "tn1"
    assert a[0][0]["i"] == "id1"
    assert a[0][0]["a"] == {"attr": "[x]"}
    assert not a[0][1].get("a")
    assert a[0][1]["c"] == ["cl1", "cl2"]
    assert a[0][1]["p"] == [0]
    assert a[0][2] == {"n": "tn2", "p": [5]}

    assert a[1][0]["n"] == "tn3"
    assert a[1][0]["c"] == ["cl3"]
    assert a[1][1]["n"] == "tn4"
    assert a[1][1]["i"] == "id2"
    assert a[1][1]["p"] == [-1]
    assert a[1][2]["n"] == "tn5"
    assert a[1][2]["x"] == ">"
    assert a[1][2]["p"] == [-1]
    assert a[1][3]["n"] == "tn6"
    assert [{k: int(v) for k, v in p.items()} for p in a[1][3]["p"]] == [{"<": 3}]
    assert a[1][4] == {"x": "+", "n": "span", "a": {"data-name": None}}
    assert a[1][5] == {"x": "~", "n": "a", "a": {"href": None}}


# ---- attribute parsing (Parser/HTML.php:275-338 semantics) -------------- #
def test_parse_attr_str():
    a = parse_attr_str('href="/x" CLASS=a  checked  title=\'q\'')
    assert a == {"href": "/x", "class": "a", "checked": None, "title": "q"}
    # unquoted value, no closing quote (value stays None, scan continues)
    assert parse_attr_str('a=1 b="unclosed') == {
        "a": "1",
        "b": None,
        "unclosed": None,
    }
    # extended: class list sorted, style parsed
    a = parse_attr_str('class="z a m" style="Color:red; x:1"', True, True)
    assert a["class"] == ["a", "m", "z"]
    assert a["style"] == {"color": "red", "x": "1"}


def test_parse_css_str():
    assert parse_css_str("Color:blue;padding: 1px 2pt") == {
        "color": "blue",
        "padding": "1px 2pt",
    }
    assert parse_css_str(";;") == {}


# ---- comment index (Parser/HTML.php:197-220) ----------------------------- #
def test_index_comments():
    s = b"a<!-- x -->b<!-- unterminated"
    tg = index_comments(s)
    assert tg == {1: 11, 12: len(s)}


# ---- tokenizer interval semantics --------------------------------------- #
def test_parse_intervals_basic():
    res = parse_html(b"<div><a>x</a></div>")
    # begin = offset of open '>', end = offset of close '<'
    assert res.ids == {4: 13, 7: 9}
    assert res.tags == {4: "div", 7: "a"}


def test_parse_interleaved_misnesting_repair():
    # <b><i></b></i> — per-name LIFO stacks give each tag an interval
    res = parse_html(b"<b><i></b></i>")
    assert res.ids == {2: 6, 5: 10}
    assert res.tags == {2: "b", 5: "i"}


def test_parse_unmatched_close_ignored():
    res = parse_html(b"<div>x</div></div>")
    assert res.ids == {4: 6}


def test_parse_unclosed_stays_empty():
    res = parse_html(b"<br><hr/><p>text")
    # void/self-closed/unclosed ⇒ begin == end
    assert res.ids == {3: 3, 8: 8, 11: 11}


def test_parse_script_is_opaque():
    res = parse_html(b"<script>if (a<b) { x='<div>' }</script><p>t</p>")
    assert res.tags[7] == "script"
    names = sorted(res.tags.values())
    assert names == ["p", "script"]


def test_parse_trailing_lt_trimmed():
    res = parse_html(b"<a>x</a><")
    assert res.ids == {2: 4}
    res = parse_html(b"<a>x</a></")
    assert res.ids == {2: 4}


def test_parse_comment_skipped():
    res = parse_html(b"<!-- <div> --><span>s</span>")
    assert list(res.tags.values()) == ["span"]


def test_attr_interning():
    res = parse_html(b'<i class="x">1</i><i class="x">2</i><i class="y">3</i>')
    # identical raw attr strings share one entry (Parser/HTML.php:125-132)
    assert set(res.attr.keys()) == {b'class="x"', b'class="y"'}
    assert isinstance(res.attr[b'class="x"'], list)


# ---- bad-HTML tolerance asserted, not just survived ---------------------- #
def test_bad_html_1_exactly_two_tags():
    # hQueryCore.Test.php:245-247
    doc = HDoc(BAD_HTML_1)
    assert len(doc) == 2
    assert len(doc.find("iframe")) == 1
    assert len(doc.find("meta")) == 1


def test_bad_html_2_charset_error_and_parse_continues():
    # hQueryCore.Test.php:250-256
    doc = HDoc(BAD_HTML_2, "https://DUzun.Me/")
    assert doc.charset == "UFT-8"
    assert doc.html_errors.get("convert_encoding")
    assert len(doc) == 5
    assert doc.find("a").text() == "A"


# ---- big_synthetic: volume + unmatched-close tolerance -------------------- #
def test_big_synthetic_indexes_over_10k_tags():
    # hQueryStress.Test.php:224-238 (reduced line count for CI speed;
    # the >10k-tags bound is the reference's own assertion)
    html = big_synthetic(6000)
    doc = HDoc(html)
    assert len(doc) > 10_000
    assert len(doc.find("div")) == 12_000
