"""Independent cross-validation of the table-grid extractor: a second
implementation of the SAME documented semantics built on stdlib
html.parser events (no hquery index involved), compared cell-for-cell
on randomized well-formed tables.

This is the test_vs_stdlib_htmlparser pattern applied to tables: two
independent walks (byte-offset interval index vs event stream) must
agree on every (table_no, row_no, col_no, rowspan, colspan, is_header,
text) tuple."""

import random
from html.parser import HTMLParser

from hquery_php_spark.operators.tables import html_tables


class _StdlibTables(HTMLParser):
    """Event-stream reimplementation of the documented grid semantics
    (innermost-table ownership, occupancy placement, section tags
    transparent).  Only handles well-formed input — that is the point:
    on the well-formed subset both implementations must agree."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables = []  # stack of live table states
        self.done = []  # finished cells
        self.n_tables = 0
        self.cell = None  # (table_state, rowspan, colspan, is_header, buf)

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table":
            self.n_tables += 1
            self.tables.append(
                {"no": self.n_tables - 1, "row": -1, "occ": {}, "col": 0}
            )
        elif tag == "tr" and self.tables:
            self._flush_cell()  # implicit close of an open cell (HTML5)
            t = self.tables[-1]
            t["row"] += 1
            t["col"] = 0
        elif tag in ("td", "th") and self.tables:
            self._flush_cell()  # implicit close of an open cell (HTML5)
            t = self.tables[-1]

            def spn(k):
                try:
                    v = int(str(a.get(k, "1")).strip())
                except ValueError:
                    return 1
                return v if v >= 1 else 1

            rs, cs = spn("rowspan"), spn("colspan")
            occ = t["occ"].setdefault(t["row"], {})
            while occ.get(t["col"]):
                t["col"] += 1
            self.cell = [t, t["row"], t["col"], rs, cs, tag == "th", []]
            for dr in range(rs):
                ro = t["occ"].setdefault(t["row"] + dr, {})
                for dc in range(cs):
                    ro[t["col"] + dc] = True
            t["col"] += cs

    def _flush_cell(self):
        if self.cell:
            t, r, c, rs, cs, hdr, buf = self.cell
            self.done.append(
                (t["no"], r, c, rs, cs, hdr, " ".join("".join(buf).split()))
            )
            self.cell = None

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self.cell:
            self._flush_cell()
        elif tag == "tr":
            self._flush_cell()  # implicit close of an open cell
        elif tag == "table" and self.tables:
            self._flush_cell()
            self.tables.pop()

    def handle_data(self, data):
        if self.cell is not None:
            self.cell[6].append(data)


def _reference_cells(html):
    p = _StdlibTables()
    p.feed(html)
    return sorted(p.done)


def _gen_table(rnd, table_no_hint=0, depth=0):
    rows = rnd.randint(1, 4)
    cols = rnd.randint(1, 4)
    out = ["<table>"]
    for r in range(rows):
        out.append("<tr>")
        for c in range(cols):
            tag = "th" if r == 0 and rnd.random() < 0.5 else "td"
            attrs = ""
            if rnd.random() < 0.25:
                attrs += f' rowspan="{rnd.randint(1, 2)}"'
            if rnd.random() < 0.25:
                attrs += f' colspan="{rnd.randint(1, 2)}"'
            txt = f"c{r}{c}" + (" &amp; x" if rnd.random() < 0.2 else "")
            close = f"</{tag}>" if rnd.random() < 0.5 else ""
            out.append(f"<{tag}{attrs}>{txt}{close}")
        if rnd.random() < 0.5:
            out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def test_differential_random_tables():
    rnd = random.Random(42)
    for trial in range(60):
        html = "<html><body>"
        for t in range(rnd.randint(1, 3)):
            html += _gen_table(rnd) + "<p>gap</p>"
        html += "</body></html>"
        ours = sorted(
            (c.table_no, c.row_no, c.col_no, c.rowspan, c.colspan,
             c.is_header, c.text)
            for c in html_tables(html)
        )
        ref = _reference_cells(html)
        assert ours == ref, (trial, html, ours, ref)


def test_differential_sectioned_tables():
    html = (
        "<table><thead><tr><th>h1</th><th>h2</th></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr>"
        '<tr><td colspan="2">wide</td></tr></tbody>'
        "<tfoot><tr><td>f1</td><td>f2</td></tr></tfoot></table>"
    )
    ours = sorted(
        (c.table_no, c.row_no, c.col_no, c.rowspan, c.colspan,
         c.is_header, c.text)
        for c in html_tables(html)
    )
    assert ours == _reference_cells(html)
