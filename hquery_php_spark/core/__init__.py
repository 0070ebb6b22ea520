"""Per-document engine: tokenizer, index, selector algebra, extraction.

This is the computation the reference (duzun/hQuery.php) performs for one
document, re-expressed as plain Python over byte offsets.  At pipeline
scale it runs inside Arrow-batched UDFs (see hquery_php_spark.operators).
"""

from .attrs import attr2str, parse_attr_str, parse_css_str, css2str
from .charset import convert_to_utf8, detect_charset
from .doc import HDoc, HElement
from .extract import DEFAULT_OPTIONS, ExtractOptions, Span, extract_spans
from .index import DocIndex
from .parser import find_tag_close, index_comments, parse_html
from .selector import parse_selector
from .urlutil import abs_url, get_url_base, get_url_path, is_abs_path, is_url_path

__all__ = [
    "HDoc",
    "HElement",
    "DocIndex",
    "Span",
    "ExtractOptions",
    "DEFAULT_OPTIONS",
    "extract_spans",
    "parse_html",
    "parse_selector",
    "parse_attr_str",
    "attr2str",
    "parse_css_str",
    "css2str",
    "detect_charset",
    "convert_to_utf8",
    "abs_url",
    "get_url_base",
    "get_url_path",
    "is_url_path",
    "is_abs_path",
    "find_tag_close",
    "index_comments",
]
