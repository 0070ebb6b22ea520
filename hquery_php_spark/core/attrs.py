"""Attribute-string and inline-CSS parsing + canonical serialization.

Re-expresses the reference's ``parseAttrStr`` / ``attr2str`` /
``parseCssStr`` / ``css2str`` (duzun/hQuery.php, Parser/HTML.php:275-410)
over ``str``.  Canonical serialization (names ksorted, class list sorted,
``"`` escaped as ``&quot;``) is what makes attribute-set *interning* work:
identical attribute sets — regardless of source order/quoting — collapse to
one dictionary entry (dictionary encoding of the attribute column).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Union

__all__ = ["parse_attr_str", "attr2str", "parse_css_str", "css2str"]

_SPACE = " \t\n\r"
_NAME_BREAK = " \t\n\r=\"'"
_VALUE_BREAK = " \t\n\r\"'"
_WS_RE = re.compile(r"\s+")

# reference nameStartRange: a-zA-Z_\x80-\xFF (Parser.php:83).
# _SKIP_RE consumes everything that is NOT a name-start char (all ASCII
# except letters and '_'); _NAME_RE / _WS_SKIP_RE / _BARE_RE are the
# C-speed equivalents of the strcspn/strspn scans.
_SKIP_RE = re.compile(r"[\x00-\x40\x5b-\x5e\x60\x7b-\x7f]*")
_NAME_RE = re.compile(r"[^ \t\n\r=\"']*")
_WS_SKIP_RE = re.compile(r"[ \t\n\r]*")
_BARE_RE = re.compile(r"[^ \t\n\r\"']*")


def _is_name_start(ch: str) -> bool:
    return (ch.isascii() and (ch.isalpha() or ch == "_")) or ord(ch) > 127


def parse_attr_str(
    s: str, case_folding: bool = True, extended: bool = False
) -> Dict[str, Optional[Union[str, List[str], Dict[str, Optional[str]]]]]:
    """Attribute string → ordered map (Parser/HTML.php:275-338).

    Names are case-folded; values may be double-quoted, single-quoted or
    bare; a valueless attribute maps to ``None``; a quoted value with no
    closing quote stays ``None``.  ``extended`` splits+sorts multi-class
    ``class`` and parses ``style`` into a map.
    """
    ret: Dict[str, Optional[Union[str, List[str], Dict[str, Optional[str]]]]] = {}
    ln = len(s)
    i = _WS_SKIP_RE.match(s).end()
    while i < ln:
        i = _SKIP_RE.match(s, i).end()
        if i >= ln:
            break
        b = i
        i = _NAME_RE.match(s, i).end()
        name = s[b:i].rstrip()
        if case_folding:
            name = name.lower()
        i = _WS_SKIP_RE.match(s, i).end()
        value: Optional[str] = None
        if i < ln and s[i] == "=":
            i = _WS_SKIP_RE.match(s, i + 1).end()
            if i < ln:
                q = s[i]
                if q == '"' or q == "'":
                    b2 = i + 1
                    e2 = s.find(q, b2)
                    if e2 != -1:
                        value = s[b2:e2]
                        i = e2 + 1
                    else:
                        i = b2  # no closing quote: value stays None
                else:
                    b2 = i
                    i = _BARE_RE.match(s, i).end()
                    value = s[b2:i]
        out: Optional[Union[str, List[str], Dict[str, Optional[str]]]] = value
        if extended and value:
            key = name if case_folding else name.lower()
            if key == "class":
                parts = _WS_RE.split(value.strip())
                out = parts[0] if len(parts) == 1 else sorted(parts)
            elif key == "style":
                out = parse_css_str(value, case_folding)
        ret[name] = out
    return ret


def attr2str(attr: Dict[str, object], quote: str = '"') -> str:
    """Canonical serialization: names ksorted, class list sorted+joined,
    style map ksorted ``n:v;`` — the interning key (Parser/HTML.php:345-368)."""
    # htmlspecialchars(quote): only " maps to an entity
    sq = "&quot;" if quote == '"' else None
    items = dict(attr)
    cl = items.get("class")
    if isinstance(cl, list):
        items["class"] = " ".join(sorted(cl))
    st = items.get("style")
    if isinstance(st, dict):
        items["style"] = css2str(st)
    parts = []
    for n in sorted(items):
        v = items[n]
        if v is None:
            parts.append(n)
        else:
            v = str(v)
            if sq:
                v = v.replace(quote, sq)
            parts.append(n + "=" + quote + v + quote)
    return " ".join(parts)


def parse_css_str(s: str, case_folding: bool = True) -> Dict[str, Optional[str]]:
    """Inline style → map (Parser/HTML.php:376-391)."""
    ret: Dict[str, Optional[str]] = {}
    for part in s.split(";"):
        kv = part.split(":", 1)
        n = kv[0].strip()
        if case_folding:
            n = n.lower()
        ret[n] = kv[1].strip() if len(kv) == 2 else None
    ret.pop("", None)
    return ret


def css2str(css: Union[Dict[str, object], str]) -> str:
    if isinstance(css, dict):
        return ";".join(f"{n}:{css[n]}" for n in sorted(css))
    return css
