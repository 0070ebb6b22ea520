"""Independent cross-validation of the outline walk: a second
implementation of the documented section semantics on stdlib
html.parser events, compared section-for-section on randomized
well-formed documents (same pattern as test_tables_diff /
test_markdown_diff)."""

import random
from html.parser import HTMLParser

from hquery_php_spark.operators.sections import section_rows

_H = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _StdlibOutline(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = []  # (level, title, path, text)
        self.stack = []  # (level, title)
        self.cur_head = None  # accumulating heading title
        self.body = []  # accumulating section body text
        self.cur = None  # (level, title, path) of the open section
        self.skip = 0  # inside head/script/style

    def _flush(self):
        text = " ".join("".join(self.body).split())
        if self.cur is None:
            if text:
                self.out.append((0, "", "", text))
        else:
            lvl, title, path = self.cur
            self.out.append((lvl, title, path, text))
        self.body = []

    def handle_starttag(self, tag, attrs):
        if tag in ("head", "script", "style", "template", "noscript"):
            self.skip += 1
        elif tag in _H and not self.skip:
            self.cur_head = []

    def handle_endtag(self, tag):
        if tag in ("head", "script", "style", "template", "noscript"):
            self.skip = max(0, self.skip - 1)
        elif tag in _H and self.cur_head is not None:
            self._flush()
            lvl = _H[tag]
            title = " ".join("".join(self.cur_head).split())
            while self.stack and self.stack[-1][0] >= lvl:
                self.stack.pop()
            self.stack.append((lvl, title))
            path = " > ".join(t for _, t in self.stack)
            self.cur = (lvl, title, path)
            self.cur_head = None

    def handle_data(self, data):
        if self.skip:
            return
        if self.cur_head is not None:
            self.cur_head.append(data)
        else:
            self.body.append(data)

    def result(self):
        self._flush()
        # the engine emits a preamble section only when it has text
        # (or when there are no headings at all)
        if self.out and self.out[0][:3] == (0, "", "") and not self.out[0][3]:
            if len(self.out) > 1:
                self.out = self.out[1:]
        return [
            (i, lvl, t, p, x) for i, (lvl, t, p, x) in enumerate(self.out)
        ]


def _reference(html):
    p = _StdlibOutline()
    p.feed(html)
    return p.result()


def _ours(html):
    return [
        (s.section_no, s.level, s.title, s.path, s.text)
        for s in section_rows(html)
    ]


def _gen_doc(rnd):
    parts = []
    if rnd.random() < 0.5:
        parts.append("pre amble " * rnd.randint(1, 2))
    for _ in range(rnd.randint(1, 8)):
        lvl = rnd.randint(1, 4)
        title = rnd.choice(["Alpha", "Beta b", "G &amp; D", "X1"])
        parts.append(f"<h{lvl}>{title}</h{lvl}>")
        for _ in range(rnd.randint(0, 2)):
            parts.append(
                rnd.choice(
                    [
                        "<p>plain words here</p>",
                        "words outside tags ",
                        "<div>in a div</div>",
                        "<p>x &amp; y</p>",
                    ]
                )
            )
    return "<html><body>" + "".join(parts) + "</body></html>"


def test_differential_random_outlines():
    rnd = random.Random(99)
    for trial in range(80):
        html = _gen_doc(rnd)
        assert _ours(html) == _reference(html), (trial, html)


def test_differential_with_head_and_script():
    html = (
        "<html><head><title>T</title><style>p{}</style></head>"
        "<body>lead<h1>A</h1>one<script>var x;</script>two"
        "<h2>B</h2>three</body></html>"
    )
    assert _ours(html) == _reference(html)
    assert _ours(html)[0][4] == "lead"
