"""Minimal PDF layout parse: real structure, stdlib-only codecs.

The north rule's extraction tier includes "PDF/layout parse" alongside
HTML.  Full PDF rendering needs codec libraries this container lacks,
but the *structural* layer is pure byte work: header/version sniffing,
object scanning, ``/FlateDecode`` content streams (stdlib ``zlib``),
and the text-showing operators (``Td``/``Tj``/``TJ``) that carry both
the text and its page coordinates — enough for layout-ordered text
extraction from digitally-born PDFs.  Image/XObject decode stays
stubbed like the image codecs in ``multimodal.py``.

``make_pdf`` builds a real, valid single-page PDF (correct byte-offset
xref table, optional Flate compression) from positioned text blocks —
the deterministic fixture generator for tests and the driver oracle
(template inversion, like ``sources/html_synth``).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "make_pdf",
    "sniff_pdf",
    "extract_pdf_spans",
    "pdf_extract_df",
    "PDF_SPANS_SCHEMA",
]


def _esc(s: str) -> str:
    """PDF literal-string escaping for ( ) and backslash."""
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unesc(s: bytes) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = s[i + 1]
            mapped = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x28: "(", 0x29: ")", 0x5C: "\\"}
            out.append(mapped.get(nxt, chr(nxt)))
            i += 2
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def make_pdf(
    blocks: Sequence[Tuple[float, float, str]],
    compress: bool = False,
) -> bytes:
    """A real single-page PDF showing ``(x, y, text)`` blocks.

    Object layout: 1 catalog, 2 pages, 3 page, 4 font, 5 content stream.
    The xref table carries exact byte offsets, so any conformant reader
    (and our extractor) can follow the trailer."""
    parts = []
    for x, y, text in blocks:
        parts.append(f"BT /F1 12 Tf {x:g} {y:g} Td ({_esc(text)}) Tj ET")
    content = ("\n".join(parts)).encode("latin-1", "replace")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content
        + b"\nendstream",
    ]
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def sniff_pdf(data: Optional[bytes]) -> Optional[str]:
    """PDF version from the header magic, or None."""
    if not data or not data.startswith(b"%PDF-"):
        return None
    return data[5:8].decode("latin-1", "replace")


_STREAM_RE = re.compile(
    rb"<<(?P<dict>[^>]*(?:>(?!>)[^>]*)*)>>\s*stream\r?\n(?P<body>.*?)endstream",
    re.S,
)
_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)")
_TD_RE = re.compile(rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Td")
# Tj shows a literal string; TJ shows an array of strings/kerns
_TJ_RE = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)\s*Tj|\[(?P<arr>[^\]]*)\]\s*TJ")
_ARR_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")


def extract_pdf_spans(data: bytes) -> Tuple[int, List[Tuple[float, float, str]]]:
    """(page_count, [(x, y, text)...]) in top-down, left-right layout
    order — real xref-anchored structure walk, stdlib codecs only."""
    n_pages = 0
    m = _COUNT_RE.search(data)
    if m:
        n_pages = int(m.group(1))
    spans: List[Tuple[float, float, str]] = []
    for sm in _STREAM_RE.finditer(data):
        d, body = sm.group("dict"), sm.group("body")
        if body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # fault tolerance: skip undecodable stream
        x = y = 0.0
        pos = 0
        for tm in _TJ_RE.finditer(body):
            td = None
            for td in _TD_RE.finditer(body, pos, tm.start()):
                pass
            if td is not None:
                x, y = float(td.group(1)), float(td.group(2))
                pos = tm.end()
            if tm.group("s") is not None:
                txt = _unesc(tm.group("s"))
            else:
                txt = "".join(
                    _unesc(p[1:-1]) for p in _ARR_STR_RE.findall(tm.group("arr"))
                )
            spans.append((x, y, txt))
    spans.sort(key=lambda t: (-t[1], t[0]))
    return n_pages, spans


PDF_SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("version", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("ord", IntegerType()),
        StructField("x", FloatType()),
        StructField("y", FloatType()),
        StructField("text", StringType()),
    ]
)


def pdf_extract_df(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload: binary) → layout-ordered text spans per doc."""
    narrow = df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col(payload_col).alias("p"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in PDF_SPANS_SCHEMA.fieldNames()}
            for doc_id, p in zip(pdf["doc_id"], pdf["p"]):
                data = bytes(p) if p is not None else b""
                ver = sniff_pdf(data)
                if ver is None:
                    continue  # fault tolerance: not a PDF, skip
                n_pages, spans = extract_pdf_spans(data)
                for i, (x, y, txt) in enumerate(spans):
                    out["doc_id"].append(doc_id)
                    out["version"].append(ver)
                    out["n_pages"].append(n_pages)
                    out["ord"].append(i)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["text"].append(txt)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, PDF_SPANS_SCHEMA)
