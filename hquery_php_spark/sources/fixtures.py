"""Deterministic fixture corpus: the reference's test documents + seeded
synthetic interleaved text+media documents.

Every generator is seeded and reproducible (no wall-clock, no unseeded
RNG) — the corpus doubles as the correctness fixture set (ported from
/root/reference/tests, cited per fixture) and the bench input.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = [
    "BODY_HTML",
    "EMPTY_BODY_HTML",
    "BAD_HTML_1",
    "BAD_HTML_2",
    "BASE_TAG_1",
    "ATTR_QUOTES_HTML",
    "BASE_URL",
    "big_synthetic",
    "interleaved_media_doc",
    "gen_corpus",
    "STRESS_SELECTORS",
]

BASE_URL = "https://DUzun.Me/"

# Fixture: tests/hQueryCore.Test.php:64-117 — nested divs/links/spans,
# ISO-8859-2 meta, dl/table/div dictionaries, abs+rel+scheme-relative URLs.
BODY_HTML = """<!doctype html>
<html>
<head>
    <meta charset="ISO-8859-2">
    <!-- <meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-2" /> -->
    <meta content="/logo.png" property="og:image"/>
    <title>Sample HTML Doc</title>
    <link rel="shortcut icon" href='/favicon.ico' class=pjax />
</head>
<body class="test-class">
    <div id="test-div" class="test-class test-div span-div">
        text: This is some text
        <a href="/path" class="path span span-a">
            link: This is a link
        </a>
         in : between tags
        span: <span id="aSpan" class="span span-span">Span text</span>
        notSpan: <div id="aDiv" class="span span-div">notSpan text</div>
    </div>
    <a id="outerLink"
        href="//not-my-site.com/next.html"
        style="Color:blue;padding: 1px 2pt 3em 0; background-image:url(/path/to/img.jpg?url=param&and=another&one);"
    >Not My Site</a>
    <img id="outerImg" src="//cdn.duzun.me/images/logo.png" />

    <dl id="dict1">
      <dt>Coffee</dt>
      <dd>Black hot drink</dd>
      <dt>Milk</dt>
      <dd>White cold drink</dd>
    </dl>

    <table id="dict2">
        <tr>
            <th class=" "  >Coffee</th>
            <td>Black hot drink</td>
        </tr>
        <tr>
            <th>Milk</th>
            <td>White cold drink</td>
        </tr>
    </table>


    <div id="dict3">
      <span><b>Coffee:</b> Black hot drink</span>
      <span><b>Milk:</b> White cold drink</span>
    </div>

    Contents...
</body>
</html>"""

# Fixture: tests/hQueryCore.Test.php:119-127 — XML decl windows-1251,
# UNCLOSED <head> (so `head meta` must match nothing), empty body.
EMPTY_BODY_HTML = (
    '    <?xml version="1.0" encoding="windows-1251"?>\n'
    "    <html>\n"
    "    <head>\n"
    '    <meta name="robots" content="noindex,nofollow">\n'
    '    <script src="xxx"></script>\n'
    "    <body>\n"
    "    </body></html>"
)

# Fixture: tests/hQueryCore.Test.php:129 — malformed quote/termination:
# must index exactly 2 tags.
BAD_HTML_1 = '<iframe><meta http-equiv="refresh" content="1;/>'

# Fixture: tests/hQueryCore.Test.php:131 — bogus charset label "uft-8",
# trailing lone '<': error recorded, 5 tags indexed, <a> text still found.
BAD_HTML_2 = (
    '<html><head><meta http-equiv="Content-Type" '
    'content="text/html; charset=uft-8" /></head>'
    "<body><a>A</a></body></html><"
)

# Fixture: tests/hQueryCore.Test.php:133-146 — <base href> resolution matrix.
BASE_TAG_1 = """<!doctype html>
<html>
<head>
    <meta content="/logo.png" property="og:image"/>
    <base href="/base/path.html?how=rewrite#hash" />
    <link rel="shortcut icon" href="/favicon.ico" class=pjax />
</head>
<body class="test-class">
    <a href="rel-path/index.html" id="rel_path">relative path</a>
    <a href="/abs-path/index.html" id="rel_origin">relative origin</a>
    <a href="//not-my-site.com/next.html" id="rel_schema">relative schema</a>
    <img id="rel_img" src="/images/logo.png" />
</body>
</html>"""

# Fixture: tests/data/attr.html (gunzipped) — quoted attribute *names*
# ("href"='#test', "a>a"), unquoted values, '>' inside quotes.
ATTR_QUOTES_HTML = """<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
<html xmlns="http://www.w3.org/1999/xhtml">
    <head>
        <meta http-equiv="Content-Type" content="text/html; charset=utf-8" />
        <title>Showcase misplaced quotes inside tag attributes</title>
    </head>
    <body>
        <input name=title value="the title" type="text" /><br />
        <input name='text' value="the text" type='text' /><br />
        <input name="random" value=42 type="number" /><br />

        <a "href"='#test' class="aa ab" "a>a">A1</a><br />
        <a 'href'='#test' class=aa a="a>a">A2</a><br />
        <a href=#test class=aa>A3</a><br />

        <img id="img1" src=/path/to/img.png src2='other/img/here.jpg' src3="//example.com/full/path.gif" />
    </body>
</html>"""

# The 28-selector sweep from tests/hQueryStress.Test.php:102-131
STRESS_SELECTORS = [
    "span", "span.glyphicon", "div", "p", "form", "td", "tr", "table",
    "table tr", "table>tr", "tr td", "tr>td", ".ch-title", ".even", ".row",
    "a", "a[href]", "img", "img[src]", "a img", "a>img", "a>img:parent",
    "a[href]>img[src]:parent", ".first", ".first:parent", ".first:next",
    "img.click", "script",
]


def big_synthetic(lines: int = 19000) -> str:
    """Port of tests/data/big_synthetic.html.sh: ``lines`` × a doubly-nested
    div row, plus a stray ``</script>`` before ``</html>`` (unmatched-close
    tolerance)."""
    row = (
        "    <div><div>19dnbfkjsb asdhfjkashjkfhalkshdfljkhaskdj "
        "fhkajsdfkjaslflkjashdlfkhaskldfhaklsj hdflkasdfkjlhasdflkashdklfj "
        "hasdk</div></div>\n"
    )
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n</head>\n<body>\n"
        + row * lines
        + "</body>\n</script>\n</html>\n"
    )


_WORDS = (
    "data span table query batch line merge shuffle column stream window "
    "join index vector hash page link media text block quote light dark "
    "apple river stone cloud metal paper glass north south field"
).split()

_CHARSETS = ["utf-8", "ISO-8859-2", "windows-1251", "utf-8", "utf-8"]


def interleaved_media_doc(doc_id: int, rng: Optional[random.Random] = None,
                          mega: bool = False) -> Tuple[str, str, str]:
    """One seeded interleaved text+media document.

    Returns (doc_id_str, html, base_url).  Text paragraphs interleaved
    with <img src> / <a href> at generator-known positions, mixed
    charsets, optional mega-doc (size skew).
    """
    rng = rng or random.Random(doc_id * 2654435761 % (2**31))
    cs = _CHARSETS[doc_id % len(_CHARSETS)]
    n_blocks = rng.randint(3, 9) * (40 if mega else 1)
    parts = [
        f'<!doctype html><html><head><meta charset="{cs}">'
        f"<title>Doc {doc_id}</title></head><body>"
    ]
    for i in range(n_blocks):
        words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 30)))
        kind = rng.randint(0, 3)
        if kind == 0:
            parts.append(f'<p class="para p{i % 3}">{words}</p>')
        elif kind == 1:
            parts.append(
                f'<div class="block"><span>{words}</span>'
                f'<a href="/doc/{doc_id}/{i}.html" class="ref">link {i}</a></div>'
            )
        elif kind == 2:
            parts.append(f'<img src="//cdn.example.com/{doc_id}/{i}.png"/>')
        else:
            parts.append(f"<td>{words}</td>")
    parts.append("<script>var x = 1 < 2;</script></body></html>")
    html = "".join(parts)
    if cs != "utf-8":
        # encode through the declared charset so detection+conversion runs
        try:
            codec = {"ISO-8859-2": "iso8859-2", "windows-1251": "cp1251"}[cs]
            html_b = html.encode(codec)
            return str(doc_id), html_b.decode("latin-1"), f"https://ex.com/{doc_id}/"
        except KeyError:
            pass
    return str(doc_id), html, f"https://ex.com/{doc_id}/"


def gen_corpus(n_docs: int, seed: int = 42, mega_every: int = 97) -> Iterator[Dict]:
    """Seeded corpus of interleaved docs + the reference fixture docs,
    with a long-tail size distribution (every ``mega_every``-th doc is a
    mega-doc) for skew testing."""
    fixed: List[Tuple[str, str, str]] = [
        ("body_html", BODY_HTML, BASE_URL + "index.html"),
        ("empty_body", EMPTY_BODY_HTML, BASE_URL + "index.html"),
        ("bad_html_1", BAD_HTML_1, BASE_URL),
        ("bad_html_2", BAD_HTML_2, BASE_URL),
        ("base_tag", BASE_TAG_1, BASE_URL + "index.html"),
        ("attr_quotes", ATTR_QUOTES_HTML, BASE_URL),
    ]
    for doc_id, html, url in fixed:
        yield {"doc_id": doc_id, "html": html, "base_url": url,
               "size_bytes": len(html.encode("latin-1", "replace"))}
    rng = random.Random(seed)
    for i in range(n_docs - len(fixed)):
        mega = mega_every > 0 and i > 0 and i % mega_every == 0
        doc_id, html, url = interleaved_media_doc(i, random.Random(rng.random()), mega)
        yield {"doc_id": f"gen_{doc_id}", "html": html, "base_url": url,
               "size_bytes": len(html.encode("latin-1", "replace"))}
