"""CSS-selector subset parser.

Re-expresses the reference's selector grammar (duzun/hQuery.php,
Parser/Selector.php:94-285) — tag, ``#id``, ``.class``, ``[attr]`` /
``[attr=v]`` / ``[attr="v"]``, descendant / ``>`` / ``+`` / ``~``
combinators, and the positional pseudo set ``:eq(n) :N :first(-child)
:last(-child) :lt(n) :gt(n) :prev(n) :next(n) :parent :children`` —
into the same list-of-lists IR::

    [orGroup][step] -> {n: name, i: id, c: [classes], a: {attr: val|None},
                        p: [pseudo], x: combinator}

pseudos: int (positional) or {op: arg} with op ∈ '<' '>' '-' '+' '|' '*'.

The parse is driver-side, once per query; the compiled IR is broadcast with
the extraction UDF (a tiny plain-Python structure).

Golden IR pinned by tests ported from tests/hQueryParser.Test.php:136-159.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

__all__ = ["parse_selector", "SelectorError"]

_SPACE = " \t\n\r\x00\x0b\x0c"
_COMBINATORS = ">+~"

_PSEUDO_MAP: Dict[str, Union[str, int]] = {
    "lt": "<",
    "gt": ">",
    "prev": "-",
    "next": "+",
    "parent": "|",
    "children": "*",
    "*": "*",
    "first": 0,
    "first-child": 0,
    "last": -1,
    "last-child": -1,
}

Pseudo = Union[int, Dict[str, Optional[str]]]
Step = Dict[str, object]


class SelectorError(ValueError):
    pass


def _is_name_start(ch: str) -> bool:
    return (ch.isascii() and (ch.isalpha() or ch == "_")) or ord(ch) > 127


def _is_name_char(ch: str) -> bool:
    return _is_name_start(ch) or ch.isdigit() or ch == "-"


class _P:
    __slots__ = ("s", "i", "l")

    def __init__(self, s: str) -> None:
        self.s = s
        self.i = 0
        self.l = len(s)

    @property
    def c(self) -> str:
        return self.s[self.i] if self.i < self.l else ""

    def eof(self) -> bool:
        return self.i >= self.l

    def skip_ws(self) -> None:
        while self.i < self.l and self.s[self.i] in _SPACE:
            self.i += 1

    def read_name(self) -> str:
        b = self.i
        while self.i < self.l and _is_name_char(self.s[self.i]):
            self.i += 1
        return self.s[b : self.i]

    def read_to(self, stop: str) -> str:
        j = self.s.find(stop, self.i)
        if j < 0:
            j = self.l
        out = self.s[self.i : j]
        self.i = j
        return out

    def read_until_any(self, chars: str) -> str:
        b = self.i
        while self.i < self.l and self.s[self.i] not in chars:
            self.i += 1
        return self.s[b : self.i]


def parse_selector(sel: str, extensions: bool = False) -> List[List[Step]]:
    """``extensions=False`` (default) reproduces the reference grammar
    byte-for-byte, including its silent fall-throughs.  ``True`` turns
    on the beyond-reference extension set (the reference's own TODOs,
    Parser/Selector.php:47-72, 205-233):

    * attribute operators ``[a~=v] [a^=v] [a$=v] [a*=v]`` — parsed
      into a step's ``ax`` list ([(name, op, value), ...]) and applied
      as a post-filter (the legacy ``a`` dict is untouched);
    * the pseudos ``:not(<simple compound>)``, ``:empty`` and
      ``:nth-child(an+b|odd|even)`` parse the same either way (unknown
      pseudo -> {name: arg}); only execution differs (core/doc.py).
    """
    p = _P(sel.strip())
    ret: List[List[Step]] = []
    and_i = 0
    desc = 0
    p.skip_ws()

    def step() -> Step:
        while len(ret) <= and_i:
            ret.append([])
        group = ret[and_i]
        while len(group) <= desc:
            group.append({})
        return group[desc]

    while not p.eof():
        _i = p.i
        start_dash = False
        c = p.c
        if c == ",":
            if not ret:
                raise SelectorError(f"Not a valid selector: {sel!r}")
            p.i += 1
            p.skip_ws()
            and_i += 1
            desc = 0
        elif c == "*":
            p.i += 1
            step()
        elif c == "#":
            p.i += 1
            step()["i"] = p.read_name()
        elif c == ".":
            p.i += 1
            step().setdefault("c", []).append(p.read_name())  # type: ignore[union-attr]
        elif c == "[":
            p.i += 1
            a = _parse_attr(p)
            st = step()
            if extensions and len(a) == 1:
                (an, av), = a.items()
                if av is not None and an and an[-1] in "~^$*":
                    st.setdefault("ax", []).append(  # type: ignore[union-attr]
                        (an[:-1].rstrip(), an[-1], av)
                    )
                    a = {}
            if a:
                cur = st.get("a")
                if not cur:
                    st["a"] = a
                else:
                    cur.update(a)  # type: ignore[union-attr]
        elif c == ":":
            p.i += 1
            step().setdefault("p", []).append(_parse_pseudo(p))  # type: ignore[union-attr]
        else:
            if c == "-":
                p.i += 1
                start_dash = True
                c = p.c
            if c in _COMBINATORS:
                if not ret:
                    raise SelectorError(f"Not a valid selector: {sel!r}")
                desc += 1
                step()["x"] = c
                p.i += 1
                p.skip_ws()
            elif c in _SPACE:
                p.skip_ws()
                desc += 1
                if p.c in _COMBINATORS:
                    step()["x"] = p.c
                    p.i += 1
                    p.skip_ws()
            elif _is_name_start(c):
                n = p.read_name()
                if start_dash:
                    n = "-" + n
                step()["n"] = n
            else:
                raise SelectorError(f"Unexpected {c!r} in selector {sel!r}")
        if p.i == _i:
            raise SelectorError(f"Infinite loop in selector {sel!r}")
    return ret


def _parse_attr(p: _P) -> Dict[str, Optional[str]]:
    p.skip_ws()
    n = p.read_until_any("=]").rstrip()
    if p.c == "]" or p.c == "":
        p.i += 1
        return {n: None}
    p.i += 1  # '='
    p.skip_ws()
    if p.c in "\"'":
        q = p.c
        p.i += 1
        v = p.read_to(q)
        p.i += 1
        p.skip_ws()
    else:
        v = p.read_to("]").rstrip()
    p.i += 1  # ']'
    return {n: v}


def _parse_pseudo(p: _P) -> Pseudo:
    a = p.read_name()
    try:
        if str(int(a)) == a:
            return int(a)
    except ValueError:
        pass
    mapped = _PSEUDO_MAP.get(a, a)
    if isinstance(mapped, int):
        return mapped
    a = mapped
    t: Optional[str] = None
    if p.c == "(":
        p.i += 1
        p.skip_ws()
        if p.c in "\"'":
            q = p.c
            p.i += 1
            t = p.read_to(q)
            p.i += 1
            p.skip_ws()
            if p.c != ")":
                raise SelectorError(f"Unexpected {p.c!r}")
        else:
            t = p.read_to(")").rstrip()
        p.i += 1
    if a == "eq":
        if t is None or t == "":
            raise SelectorError(":eq() should have an argument")
        return int(t)
    return {a: t}
