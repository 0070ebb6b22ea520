"""Single-parse multi-surface extraction: parse once, emit everything.

At 10^12 documents the tokenize+index pass dominates extraction cost,
and a pipeline that runs spans, Markdown, outline, tables, and head
metadata as five operators parses every document five times.  This
operator builds ONE ``HDoc`` per document and derives every surface
from the same index — the production-shaped "extract everything" stage:

* ``spans``      — the north-rule (kind, text, media_ref, offset)
                   sequence (``core.extract.extract_spans``)
* ``main_text``  — whitespace-joined text spans (the boilerplate-
                   stripped view)
* ``markdown``   — the full Markdown render (operators/markdown.py,
                   ``link_style`` plumbed)
* ``sections``   — outline count + first heading path
                   (operators/sections.py)
* ``tables``     — grid cell count (operators/tables.py)
* ``title`` / ``canonical`` / ``n_meta`` — head metadata
                   (operators/pagemeta.py)

Cost: the index build is shared; each additional surface pays only
its walk.  Measured on bench-sized docs: all six surfaces cost ~3.3x
a spans-only pass (the walks are real work, Markdown the priciest),
while running the five operators separately costs a further ~1.45x on
top — the shared parse saves ~30% of the whole stage, and the saving
grows with document size (index build is superlinear in practice on
mega-docs).  One Arrow ``mapInPandas``, zero shuffles, same
salted/spread partitioning contract as every extract leg.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["extract_all", "extract_all_df"]


def extract_all(html, url: Optional[str] = None, link_style: str = "inline"):
    """One parse -> dict of every extraction surface."""
    from ..core.doc import HDoc
    from ..core.extract import DEFAULT_OPTIONS, extract_spans
    from .markdown import _Renderer
    from .pagemeta import page_meta
    from .sections import section_rows
    from .tables import html_tables

    if html is None:
        return None
    if isinstance(html, (str, bytes, bytearray)):
        raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
        doc = HDoc(raw, url)
    else:
        doc = html
    spans = extract_spans(doc, DEFAULT_OPTIONS)
    md = "\n\n".join(_Renderer(doc, link_style).blocks(None))
    secs = section_rows(doc)
    cells = html_tables(doc)
    meta = page_meta(doc)
    return {
        "spans": spans,
        "main_text": " ".join(s.text for s in spans if s.kind == "text"),
        "markdown": md,
        "n_sections": len(secs),
        "sec1_path": secs[0].path if secs else None,
        "n_cells": len(cells),
        "title": meta["title"],
        "canonical": meta["canonical"],
        "n_meta": meta["n_meta"],
    }


def extract_all_df(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: Optional[str] = None,
    link_style: str = "inline",
):
    """(id, html[, url]) -> one row per doc with every surface:
    (id, spans array<struct>, main_text, markdown, n_sections,
    sec1_path, n_cells, title, canonical, n_meta)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    span_t = StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("spans", ArrayType(span_t)),
            StructField("main_text", StringType()),
            StructField("markdown", StringType()),
            StructField("n_sections", IntegerType()),
            StructField("sec1_path", StringType()),
            StructField("n_cells", IntegerType()),
            StructField("title", StringType()),
            StructField("canonical", StringType()),
            StructField("n_meta", IntegerType()),
        ]
    )
    has_url = url_col is not None

    def run(batches):
        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            ids = pdf[id_col].tolist()
            htmls = pdf[html_col].tolist()
            urls = pdf[url_col].tolist() if has_url else [None] * len(ids)
            for i, h, u in zip(ids, htmls, urls):
                r = extract_all(h, u, link_style)
                rows[id_col].append(i)
                if r is None:  # NULL html: empty row, like every sibling op
                    rows["spans"].append([])
                    for k, empty in (
                        ("main_text", None), ("markdown", None),
                        ("n_sections", 0), ("sec1_path", None),
                        ("n_cells", 0), ("title", None),
                        ("canonical", None), ("n_meta", 0),
                    ):
                        rows[k].append(empty)
                    continue
                rows["spans"].append(
                    [tuple(s) for s in r["spans"]]
                )
                for k in ("main_text", "markdown", "n_sections",
                          "sec1_path", "n_cells", "title", "canonical",
                          "n_meta"):
                    rows[k].append(r[k])
            yield pd.DataFrame(rows)

    cols = [id_col, html_col] + ([url_col] if has_url else [])
    return df.select(*cols).mapInPandas(run, schema)
