"""Charset detection and fault-tolerant decoding.

Re-expresses the reference's ``detect_charset`` / ``convert_encoding``
(duzun/hQuery.php, HTML_Index.php:421-488,768-803; Node.php:1395-1452):
the charset label is sniffed from the XML declaration, ``<meta charset>``,
``<meta http-equiv=content-type>`` or HTTP headers (first ~1KB scan), and
the document is converted to internal UTF-8.  Conversion failure is *fault
tolerance, not failure*: the original bytes are kept and the error recorded
in ``html_errors['convert_encoding']`` — at pipeline scale, a bad charset
label must never kill a partition.
"""

from __future__ import annotations

import codecs
from typing import Dict, Mapping, Optional, Tuple, Union

from .attrs import parse_attr_str

__all__ = ["detect_charset", "convert_to_utf8", "ICHARSET"]

ICHARSET = "UTF-8"

_HEADER_KEYS = ("content-type", "Content-Type", "CONTENT_TYPE")

# Common web charset labels → Python codec names (codecs.lookup handles the
# rest; these cover labels lookup() does not normalize by itself).
_CODEC_ALIASES = {
    "WINDOWS-1251": "cp1251",
    "WINDOWS-1252": "cp1252",
    "WINDOWS-1250": "cp1250",
    "WINDOWS-1254": "cp1254",
    "ISO-8859-2": "iso8859-2",
    "ISO-8859-1": "iso8859-1",
    "ISO-8859-15": "iso8859-15",
    "US-ASCII": "ascii",
    "ASCII": "ascii",
    "UTF-8": "utf-8",
    "UTF8": "utf-8",
    "GB2312": "gb2312",
    "GBK": "gbk",
    "BIG5": "big5",
    "SHIFT_JIS": "shift_jis",
    "SHIFT-JIS": "shift_jis",
    "EUC-JP": "euc_jp",
    "EUC-KR": "euc_kr",
    "KOI8-R": "koi8-r",
}


def detect_charset(
    html: Union[bytes, str],
    headers: Optional[Union[str, Mapping[str, str]]] = None,
) -> Optional[str]:
    """Return the UPPERCASE charset label, or None when undetectable.

    Scan order (HTML_Index.php:421-488): XML decl ``encoding=`` → first
    ``<meta charset>`` / ``<meta http-equiv=content-type>`` within the
    first ~1KB → HTTP ``Content-Type`` header.
    """
    if isinstance(html, bytes):
        html = html.decode("latin-1")  # byte-transparent for the ASCII scan

    p = 0
    n = len(html)
    while p < n and html[p] in " \t\n\r":
        p += 1
    # reference quirk: substr($html, $p, $p + 1024) — window length p+1024
    html = html[p : p + p + 1024]
    html_l = html.lower()
    l = len(html_l)

    # XML declaration
    if html_l.startswith("<?xml"):
        q = html_l.find(">", 5)
        if q < 0:
            q = l
        a = parse_attr_str(html[: q - 1], True)
        enc = a.get("encoding")
        if enc:
            return str(enc).upper()

    # <meta ...>
    p = 0
    while p < l:
        p = html_l.find("<meta", p)
        if p < 0:
            break
        p += 5
        q = html_l.find(">", p)
        if q < p:
            q = l
        end = q - (1 if q > 0 and html_l[q - 1] == "/" else 0)
        a = parse_attr_str(html[p:end], True)
        p = q + 2
        cs = a.get("charset")
        if cs:
            return str(cs).upper()
        he = a.get("http-equiv")
        if he is not None and str(he).lower() == "content-type":
            content = a.get("content")
            if not content:
                return None
            parts = str(content).split("charset=")
            if len(parts) < 2 or not parts[1]:
                return None
            return parts[1].strip().upper()

    # HTTP headers
    if headers:
        if isinstance(headers, Mapping):
            hv: Optional[str] = None
            for k in _HEADER_KEYS:
                if headers.get(k):
                    hv = headers[k]
                    break
            headers = hv
        if headers:
            a = parse_attr_str(str(headers).replace(";", " "), True)
            cs = a.get("charset")
            if cs:
                return str(cs).upper()

    return None


def _codec_for(label: str) -> Optional[str]:
    name = _CODEC_ALIASES.get(label.upper())
    if name:
        return name
    try:
        return codecs.lookup(label).name
    except (LookupError, TypeError):
        return None


def convert_to_utf8(
    html: bytes,
    headers: Optional[Union[str, Mapping[str, str]]] = None,
) -> Tuple[bytes, Optional[str], Dict[str, str]]:
    """Detect charset and convert ``html`` to UTF-8 bytes.

    Returns (converted_bytes, detected_label, errors).  On unsupported or
    failing charsets the ORIGINAL bytes are returned and
    ``errors['convert_encoding']`` is set (HTML_Index.php:768-803) —
    downstream indexing proceeds on the raw bytes.
    """
    errors: Dict[str, str] = {}
    c = detect_charset(html, headers) or None
    if c and c != ICHARSET:
        codec = _codec_for(c)
        if codec is None:
            errors["convert_encoding"] = f'Unsupported charset detected "{c}".'
        else:
            try:
                html = html.decode(codec).encode("utf-8")
            except (UnicodeError, ValueError) as ex:
                errors["convert_encoding"] = (
                    f'Error converting encoding from "{c}" to "{ICHARSET}": {ex}'
                )
    return html, c, errors
