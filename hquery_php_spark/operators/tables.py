"""HTML table extraction: ``<table>`` -> structured (row, col, text) grid.

Tables are where the web keeps its *data* — specs, prices, standings,
infoboxes — and "turn the page's tables into rows" is a core extraction
ask alongside main-content text.  This operator walks the hquery tag
index (same index-array model as every other extraction leg) and
resolves each table to a dense grid:

* row structure from ``tr`` under the table (``thead``/``tbody``/
  ``tfoot`` transparent), cells from ``td``/``th`` in document order;
* ``rowspan``/``colspan`` resolved with the HTML-table occupancy
  algorithm: each cell lands at the first free column of its row, and
  spans mark the covered cells occupied for subsequent rows — the
  emitted (row, col) coordinates are the *visual* grid coordinates;
* ``is_header`` = the cell is a ``th``;
* cell text: markup-stripped, entity-decoded, whitespace-collapsed
  (nested tables contribute their text to the outer cell AND are
  emitted as their own table — document order numbers them);
* fault tolerance inherited from the engine: unclosed ``tr``/``td``
  (legal HTML5, ubiquitous in the wild) associate *positionally* — a
  cell belongs to the innermost table interval containing it and to
  the last ``tr`` of that table that begins before it — because the
  reference's index gives unclosed tags empty content intervals
  (per-name LIFO repair fires only on explicit close tags); spans
  clamped to >= 1, non-numeric span attributes read as 1.

Scale: per-document, embarrassingly parallel; ``html_tables_df`` is one
Arrow-batched ``mapInPandas``, zero shuffles.
"""

from __future__ import annotations

import html as _htmlmod
from typing import Dict, List, NamedTuple, Optional

from ..core.doc import HDoc
from ..core.extract import _strip_markup_text  # shared primitive

__all__ = ["TableCell", "html_tables", "html_tables_df"]


class TableCell(NamedTuple):
    table_no: int
    row_no: int
    col_no: int
    rowspan: int
    colspan: int
    is_header: bool
    text: str


def _span(idx, b: int, name: str) -> int:
    v = idx.get_attr_by_id(b, name)
    try:
        n = int(str(v).strip())
    except (TypeError, ValueError):
        return 1
    return n if n >= 1 else 1


def html_tables(html, url: Optional[str] = None) -> List[TableCell]:
    """HTML (str/bytes or HDoc) -> flat list of TableCell in
    (table_no, row_no, col_no) order."""
    if html is None:
        return []
    if isinstance(html, (str, bytes, bytearray)):
        raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
        doc = HDoc(raw, url)
    else:
        doc = html
    idx = doc.index
    ids, tags = idx.ids, idx.tags

    # positional association sweep: walk tr/td/th/table begins in document
    # order with a stack of open table intervals — the innermost table
    # whose (b, e] contains a tr/td begin owns it; a cell belongs to the
    # last tr of its table that begins before it.  This is robust to
    # unclosed tr/td (empty intervals in the reference's index model).
    tables: List[int] = []
    table_no: Dict[int, int] = {}
    rows_of: Dict[int, List[int]] = {}
    cells_of: Dict[int, List[int]] = {}
    tstack: List[int] = []  # begins of open tables
    last_tr: Dict[int, int] = {}  # table begin -> current tr begin
    bounds_of: Dict[int, List[int]] = {}  # table -> marker begins (for
    # effective text ends of unclosed cells)
    for b in ids:
        t = tags.get(b)
        if t not in ("table", "tr", "td", "th"):
            continue
        while tstack and b > ids[tstack[-1]]:
            tstack.pop()
        if tstack:
            bounds_of.setdefault(tstack[-1], []).append(b)
        if t == "table":
            table_no[b] = len(tables)
            tables.append(b)
            rows_of[b] = []
            if ids[b] > b:  # only non-empty tables can own rows
                tstack.append(b)
            continue
        if not tstack:
            continue  # tr/td outside any table: ignored
        owner = tstack[-1]
        if t == "tr":
            rows_of[owner].append(b)
            last_tr[owner] = b
        else:
            r = last_tr.get(owner)
            if r is not None:
                cells_of.setdefault(r, []).append(b)

    def eff_end(tb: int, cb: int) -> int:
        """Content end of cell cb in table tb: its own interval when the
        cell was explicitly closed, else the begin of the next marker
        (tr/td/th/nested-table) of the table, else the table's end."""
        if ids[cb] > cb:
            return ids[cb]
        from bisect import bisect_right as _br

        bl = bounds_of.get(tb, ())
        i = _br(bl, cb)
        return bl[i] if i < len(bl) else max(ids[tb], cb)

    masked_list = sorted(idx.extents)
    merged: List[tuple] = []
    for s, e in masked_list:
        if merged and s <= merged[-1][1]:
            if e > merged[-1][1]:
                merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    mask_starts = [m[0] for m in merged]

    def cell_text(tb: int, b: int) -> str:
        t = _strip_markup_text(idx.html, b, max(eff_end(tb, b), b), merged, mask_starts)
        if "&" in t:
            t = _htmlmod.unescape(t)
        return " ".join(t.split())

    out: List[TableCell] = []
    for tb in tables:
        tno = table_no[tb]
        occupied: Dict[int, Dict[int, bool]] = {}  # row -> {col: True}
        for rno, rb in enumerate(rows_of[tb]):
            col = 0
            occ = occupied.setdefault(rno, {})
            for cb in cells_of.get(rb, ()):
                while occ.get(col):
                    col += 1
                rs, cs = _span(idx, cb, "rowspan"), _span(idx, cb, "colspan")
                out.append(
                    TableCell(
                        tno, rno, col, rs, cs, tags[cb] == "th", cell_text(tb, cb)
                    )
                )
                for dr in range(rs):
                    tr_occ = occupied.setdefault(rno + dr, {})
                    for dc in range(cs):
                        tr_occ[col + dc] = True
                col += cs
    return out


def html_tables_df(df, html_col: str = "html", id_col: str = "doc_id"):
    """(id, html) -> one row per table cell:
    (id, table_no, row_no, col_no, rowspan, colspan, is_header, text)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("table_no", IntegerType()),
            StructField("row_no", IntegerType()),
            StructField("col_no", IntegerType()),
            StructField("rowspan", IntegerType()),
            StructField("colspan", IntegerType()),
            StructField("is_header", BooleanType()),
            StructField("text", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for i, h in zip(pdf[id_col].tolist(), pdf[html_col].tolist()):
                for c in html_tables(h):
                    rows[id_col].append(i)
                    rows["table_no"].append(c.table_no)
                    rows["row_no"].append(c.row_no)
                    rows["col_no"].append(c.col_no)
                    rows["rowspan"].append(c.rowspan)
                    rows["colspan"].append(c.colspan)
                    rows["is_header"].append(c.is_header)
                    rows["text"].append(c.text)
            yield pd.DataFrame(rows)

    return df.select(id_col, html_col).mapInPandas(run, schema)
