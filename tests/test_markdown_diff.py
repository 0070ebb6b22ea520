"""Independent cross-validation of the Markdown renderer: a second
implementation of the SAME documented rendering rules built on stdlib
html.parser events (no hquery index involved), compared string-for-
string on randomized well-formed documents over the shared feature
subset (headings, paragraphs, flat lists, blockquote>p, pre, hr,
tables, inline strong/em/code/a/img/br).

Same pattern as tests/test_tables_diff.py: two independent walks must
agree exactly on the well-formed subset; the byte-soup behavior is
covered by the renderer's own fuzz."""

import random
from html.parser import HTMLParser

from hquery_php_spark.operators.markdown import render_markdown

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _StdlibMd(HTMLParser):
    """Event-stream reimplementation of the documented rules for the
    generator's grammar (no nested lists, blockquote holds one p)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks = []
        self.buf = None  # inline accumulation for the current block
        self.mode = []  # tag stack
        self.list_items = None
        self.ordered = False
        self.pre = None
        self.table = None
        self.cell = None

    # -- inline helpers -- #
    def _emit(self, s):
        if self.cell is not None:
            self.cell.append(s)
        elif self.buf is not None:
            self.buf.append(s)

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _HEADINGS or tag == "p":
            self.buf = []
            self.mode.append(tag)
        elif tag == "ul" or tag == "ol":
            self.list_items = []
            self.ordered = tag == "ol"
        elif tag == "li":
            # implicit close of an unclosed previous item (HTML5)
            if self.buf is not None and self.list_items is not None:
                self.list_items.append(_collapse("".join(self.buf)))
            self.buf = []
        elif tag == "blockquote":
            self.mode.append(tag)
        elif tag == "pre":
            self.pre = []
        elif tag == "code" and self.pre is None:
            self._emit("\x01code\x01")
        elif tag == "hr":
            self.blocks.append("---")
        elif tag == "br":
            self._emit("\x00br\x00")
        elif tag in ("strong", "b"):
            self._emit("\x01b\x01")
        elif tag in ("em", "i"):
            self._emit("\x01i\x01")
        elif tag == "a":
            self._emit("\x01a" + a.get("href", "") + "\x01")
        elif tag == "img":
            self._emit(f"![{a.get('alt', '')}]({a.get('src', '')})")
        elif tag == "table":
            self.table = []
        elif tag == "tr" and self.table is not None:
            if self.cell is not None:  # implicit close of open cell
                self.table[-1].append(
                    _collapse("".join(self.cell)).replace("|", "\\|")
                )
                self.cell = None
            self.table.append([])
        elif tag in ("td", "th") and self.table is not None:
            if self.cell is not None:  # implicit close of open cell
                self.table[-1].append(
                    _collapse("".join(self.cell)).replace("|", "\\|")
                )
            self.cell = []

    def handle_endtag(self, tag):
        if tag in _HEADINGS:
            t = _collapse("".join(self.buf))
            self.blocks.append("#" * _HEADINGS[tag] + (" " + t if t else ""))
            self.buf = None
            self.mode.pop()
        elif tag == "p":
            t = _collapse("".join(self.buf))
            if self.mode[-2:] == ["blockquote", "p"] if len(self.mode) >= 2 else False:
                pass
            if t:
                if self.mode and self.mode[-1] == "p":
                    self.mode.pop()
                if self.mode and self.mode[-1] == "blockquote":
                    self.blocks.append(
                        "\n".join("> " + ln if ln else ">" for ln in t.split("\n"))
                    )
                else:
                    self.blocks.append(t)
            else:
                if self.mode and self.mode[-1] == "p":
                    self.mode.pop()
            self.buf = None
        elif tag == "li":
            if self.buf is not None:
                self.list_items.append(_collapse("".join(self.buf)))
            self.buf = None
        elif tag in ("ul", "ol"):
            if self.buf is not None:  # implicit close of unclosed item
                self.list_items.append(_collapse("".join(self.buf)))
                self.buf = None
            if self.list_items:
                if self.ordered:
                    self.blocks.append(
                        "\n".join(
                            f"{i + 1}. {t}" for i, t in enumerate(self.list_items)
                        )
                    )
                else:
                    self.blocks.append(
                        "\n".join(f"- {t}" for t in self.list_items)
                    )
            self.list_items = None
        elif tag == "blockquote":
            self.mode.pop()
        elif tag == "pre":
            body = "".join(self.pre).strip("\n")
            self.blocks.append(f"```\n{body}\n```")
            self.pre = None
        elif tag in ("strong", "b"):
            self._emit("\x01/b\x01")
        elif tag in ("em", "i"):
            self._emit("\x01/i\x01")
        elif tag == "code" and self.pre is None:
            self._emit("\x01/code\x01")
        elif tag == "a":
            self._emit("\x01/a\x01")
        elif tag in ("td", "th") and self.table is not None:
            self.table[-1].append(
                _collapse("".join(self.cell)).replace("|", "\\|")
            )
            self.cell = None
        elif tag == "tr" and self.table is not None:
            if self.cell is not None:  # implicit close of open cell
                self.table[-1].append(
                    _collapse("".join(self.cell)).replace("|", "\\|")
                )
                self.cell = None
        elif tag == "table":
            if self.cell is not None:  # implicit closes at table end
                self.table[-1].append(
                    _collapse("".join(self.cell)).replace("|", "\\|")
                )
                self.cell = None
            rows = self.table
            if rows:
                ncol = max(len(r) for r in rows)
                lines = []
                for i, r in enumerate(rows):
                    cells = r + [""] * (ncol - len(r))
                    lines.append("| " + " | ".join(cells) + " |")
                    if i == 0:
                        lines.append(
                            "|" + "|".join(" --- " for _ in range(ncol)) + "|"
                        )
                self.blocks.append("\n".join(lines))
            self.table = None

    def handle_data(self, data):
        if self.pre is not None:
            self.pre.append(data)
        else:
            self._emit(data)


def _collapse(s: str) -> str:
    """Whitespace collapse + resolve the inline mark placeholders with
    the renderer's rules (empty emphasis -> space, link text
    collapsed)."""
    parts = [" ".join(p.split()) for p in s.split("\x00br\x00")]
    out = "\n".join(parts).strip()
    # resolve innermost marks repeatedly
    import re

    def emph(m):
        mark, inner = m.group(1), m.group(2)
        t = inner.strip()
        if not t:
            return " " if inner else ""
        sym = {"b": "**", "i": "*"}.get(mark)
        return f"{sym}{t}{sym}" if sym else f"`{t}`"

    def link(m):
        href, inner = m.group(1), m.group(2)
        if href:
            return f"[{' '.join(inner.split())}]({href})"
        return inner

    prev = None
    while prev != out:
        prev = out
        out = re.sub(
            r"\x01(b|i|code)\x01([^\x01]*)\x01/\1\x01", emph, out
        )
        out = re.sub(r"\x01a([^\x01]*)\x01([^\x01]*)\x01/a\x01", link, out)
    return " ".join(
        ln if ln else "" for ln in (p.strip() for p in out.split("\n"))
    ).replace("  ", " ").strip() if "\n" not in s.replace("\x00br\x00", "") else out


def _reference_md(html: str) -> str:
    p = _StdlibMd()
    p.feed(html)
    return "\n\n".join(p.blocks)


def _gen_inline(rnd, depth=0):
    out = []
    for _ in range(rnd.randint(1, 4)):
        r = rnd.random()
        if r < 0.45 or depth > 0:
            out.append(rnd.choice(["alpha", "beta g", "x &amp; y", "42"]))
        elif r < 0.6:
            out.append(f"<strong>{_gen_inline(rnd, 1)}</strong>")
        elif r < 0.7:
            out.append(f"<em>{_gen_inline(rnd, 1)}</em>")
        elif r < 0.8:
            out.append(f"<code>f({rnd.randint(0, 9)})</code>")
        elif r < 0.9:
            out.append(f'<a href="https://e.com/{rnd.randint(0, 9)}">{_gen_inline(rnd, 1)}</a>')
        else:
            out.append(f'<img src="https://e.com/i{rnd.randint(0, 9)}.png" alt="pic {rnd.randint(0, 9)}">')
    return " ".join(out)


def _gen_block(rnd):
    r = rnd.random()
    if r < 0.25:
        lvl = rnd.randint(1, 3)
        return f"<h{lvl}>{_gen_inline(rnd)}</h{lvl}>"
    if r < 0.5:
        return f"<p>{_gen_inline(rnd)}</p>"
    if r < 0.65:
        tag = rnd.choice(["ul", "ol"])
        items = "".join(
            # HTML5 optional close tags: every item independently
            # closed or unclosed — both walks must agree either way
            f"<li>{_gen_inline(rnd)}"
            + ("</li>" if rnd.random() < 0.5 else "")
            for _ in range(rnd.randint(1, 3))
        )
        return f"<{tag}>{items}</{tag}>"
    if r < 0.75:
        return f"<blockquote><p>{_gen_inline(rnd)}</p></blockquote>"
    if r < 0.85:
        return f"<pre>x = {rnd.randint(0, 99)}\n  y = 2</pre>"
    if r < 0.92:
        return "<hr>"
    def cell(txt):
        return f"<td>{txt}" + ("</td>" if rnd.random() < 0.5 else "")

    rows = "".join(
        "<tr>"
        + "".join(cell(f"v{rnd.randint(0, 9)}") for _ in range(2))
        + ("</tr>" if rnd.random() < 0.5 else "")
        for _ in range(2)
    )
    head = "<tr><th>a</th><th>b" + ("</th>" if rnd.random() < 0.5 else "")
    head += "</tr>" if rnd.random() < 0.5 else ""
    return f"<table>{head}{rows}</table>"


def test_differential_random_documents():
    rnd = random.Random(1234)
    for trial in range(240):
        body = "".join(_gen_block(rnd) for _ in range(rnd.randint(1, 6)))
        html = f"<html><body>{body}</body></html>"
        ours = render_markdown(html)
        ref = _reference_md(html)
        assert ours == ref, (trial, html, ours, ref)
