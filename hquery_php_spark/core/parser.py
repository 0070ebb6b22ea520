"""Single-pass byte-offset HTML tokenizer.

Re-expresses the reference's tag scan (duzun/hQuery.php,
``src/hQuery/Parser/HTML.php:38-266``) as a from-scratch Python scanner over
``bytes``.  The design fact that matters: the document is never turned into a
DOM tree — the scanner emits a flat *interval index* ``{begin -> end}`` where

* ``begin`` = byte offset of the open tag's terminating ``>``
* ``end``   = byte offset of the matching close tag's ``<``
  (``begin == end`` for empty / self-closed / unclosed tags)

Nesting is implicit (``b_i < b_j < e_i``), document order = sorted begins.

Malformed-HTML repair semantics are matched to the reference exactly:

* quote-aware ``>`` search tolerating misplaced/unbalanced quotes and quoted
  attribute *names* (``_findTagClose``, ``Parser/HTML.php:228-266``);
* per-tag-name LIFO stacks so interleaved tags (``<b><i></b></i>``) each
  still get an interval (``Parser/HTML.php:140-154``);
* unmatched close tags silently ignored; unclosed opens keep
  ``begin == end`` (``Parser/HTML.php:147``);
* comment pre-index consulted as a skip list (``Parser/HTML.php:197-220``);
* ``<script>/<style>`` bodies are opaque: tags inside are not indexed until
  the matching close tag (``Parser/HTML.php:24,102-139``);
* trailing lone ``<`` / ``</`` trimmed (``Parser/HTML.php:66-76``).

All scanning is done with C-speed ``bytes.find`` primitives — the same trick
the reference uses with ``strpos``/``strspn``/``strcspn`` — so the per-byte
work never runs in the interpreter; only per-*tag* bookkeeping does.

On top of the reference semantics, the scanner also records *markup extents*
(half-open byte ranges covered by tag tokens, comments and script/style
bodies).  The complement of those extents is exactly the document's text
runs — the basis for span extraction (kind='text') at the pipeline level.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

__all__ = [
    "ParseResult",
    "parse_html",
    "find_tag_close",
    "index_comments",
    "UNPARSED_TAGS",
]

# Tag-name byte classification (reference: Parser.php:80-87 —
# nameStartRange = a-zA-Z_\x80-\xFF ; nameRange adds \-0-9, tag names add ':')
_NAME_START = bytearray(256)
for _c in range(256):
    if (
        0x61 <= _c <= 0x7A  # a-z
        or 0x41 <= _c <= 0x5A  # A-Z
        or _c == 0x5F  # _
        or _c >= 0x80
    ):
        _NAME_START[_c] = 1

_NAME_CHAR = bytearray(_NAME_START)
for _c in range(0x30, 0x3A):  # 0-9
    _NAME_CHAR[_c] = 1
_NAME_CHAR[0x2D] = 1  # -
_NAME_CHAR[0x3A] = 1  # : (tag names only; Parser/HTML.php:53)

_WS = b" \n\r\t"
_PHP_TRIM = b" \t\n\r\x00\x0b"  # PHP trim() default charlist

UNPARSED_TAGS = (b"style", b"script")


def index_comments(s: bytes) -> Dict[int, int]:
    """Pair ``<!--`` ... ``-->`` offsets. Returns {start -> end_after_-->}.

    Mirrors the reference's comment pre-index (Parser/HTML.php:197-220):
    an unterminated comment swallows the rest of the document.
    """
    tg: Dict[int, int] = {}
    i = 0
    l = len(s)
    while i < l:
        i = s.find(b"<!--", i)
        if i < 0:
            break
        p = i
        i = s.find(b"-->", i + 4)
        i = l if i < 0 else i + 3
        tg[p] = i
    return tg


import re as _re

# Whole attribute region in one C scan (possessive quantifiers — no
# backtracking): plain runs / double-quoted / single-quoted, then '>'.
# Used as a fast path only when provably equivalent to the reference's
# quote rules (see find_tag_close).
_ATTR_REGION_RE = _re.compile(rb"(?:[^>\"']++|\"[^\"]*+\"|'[^']*+')*+>")


def find_tag_close(s: bytes, p: int, l: Optional[int] = None) -> int:
    """Quote-aware scan for the tag-terminating ``>``.

    Returns the offset of the ``>`` that closes the tag whose attribute
    region starts at ``p``, or -1 when the tag never closes.  Tolerates
    ``>`` inside quoted attribute values, quoted attribute *names*
    (``"a>a"``), and unbalanced quotes — semantics identical to the
    reference's ``_findTagClose`` (Parser/HTML.php:228-266); golden
    offsets pinned by tests ported from tests/hQueryParser.Test.php:162-183.
    """
    n = len(s)
    if l is None:
        l = n
    find = s.find
    # Fast path: consume the whole attr region (quoted values skipped) in
    # one scan.  The result provably equals the reference's quote rules
    # when no skipped quote contained a '>': the only divergence between
    # "skip as value" and the reference's no-'='-before-quote NAME rule is
    # a '>' *inside* the quoted region — so if the first raw '>' is the
    # one the regex landed on, the answer is exact.  Otherwise fall back.
    m = _ATTR_REGION_RE.match(s, p, l)
    if m is not None:
        e = m.end() - 1
        if find(b">", p, e) < 0:
            return e
    gt = -1  # cached position of the next known '>' (≥ current scan point)
    while True:
        if p >= l:
            return l  # PHP: $p >= $l ⇒ strcspn degenerates ⇒ return $l
        # first-of('>', '"', "'") from p via memchr: locate the next '>'
        # once, then look for quotes only inside [p, gt) — quote-less tags
        # (the overwhelmingly common case) cost three C scans, no regex.
        if gt < p:
            gt = find(b">", p)
            if gt < 0:
                return -1  # no '>' ahead: tag never closes
        dq = find(b'"', p, gt)
        sq = find(b"'", p, gt)
        if dq < 0:
            if sq < 0:
                return gt  # '>' with no quote before it terminates the tag
            qpos = sq
        elif sq < 0 or dq < sq:
            qpos = dq
        else:
            qpos = sq
        q = s[qpos]
        e = p
        p = qpos + 1
        # was there a '=' between the scan start and the quote?
        if find(b"=", e, qpos) < 0:
            # quote opens an attribute *name*: a name must not contain '>',
            # so the first of ('>' | closing quote) decides — '>' is gt.
            j = find(b'"' if q == 0x22 else b"'", p, l)
            if j < 0 or gt < j:
                return gt
            p = j
        else:
            # quote opens an attribute value: skip to the closing quote
            j = find(b'"' if q == 0x22 else b"'", p, l)
            p = j if j >= 0 else l
        p += 1


class ParseResult:
    """Flat index produced by one scan: the reference's ``($ids,$tags,$attr)``
    triple plus markup extents for text-run extraction."""

    __slots__ = ("ids", "tags", "attr", "extents")

    def __init__(
        self,
        ids: Dict[int, int],
        tags: Dict[int, str],
        attr: Dict[bytes, Union[int, List[int]]],
        extents: List[Tuple[int, int]],
    ) -> None:
        self.ids = ids
        self.tags = tags
        self.attr = attr
        self.extents = extents


# classify-and-name in one C scan: group 1 = '/' for close tags,
# group 2 = tag name (nameStartRange then nameRange+':'), group 3 = the
# whole attribute region through the terminating '>' (possessive — plain
# runs / quoted values / quoted names, no backtracking), so most tags
# need no separate find_tag_close call at all; group 4 = '!'/'?' special
# tags.  group 3 treats every quote as value-quoting — equivalent to the
# reference's rules unless a skipped quote contained a '>', which the
# loop detects (memchr) and sends to the slow path.  Stray '<'s cannot
# start a match and are skipped by the regex engine — the reference's
# continue-on-non-name behavior.
_SCAN_RE = _re.compile(
    rb"<(?:(/?)([a-zA-Z_\x80-\xff][\-0-9:a-zA-Z_\x80-\xff]*)"
    rb"((?:[^>\"']++|\"[^\"]*+\"|'[^']*+')*+>)?"
    rb"|([!?]))"
)


def parse_html(s: bytes) -> ParseResult:
    """One pass over ``s``; returns the interval index.

    ``ids``  {begin -> end} in document (begin) order.
    ``tags`` {begin -> tag name (original case, latin-1-decoded)}.
    ``attr`` {raw attribute bytes -> begin | [begins]} — raw strings are
             deduplicated at scan time (string interning, the reference's
             Parser/HTML.php:125-132).
    ``extents`` sorted half-open [start, stop) byte ranges covered by markup
             (tag tokens, comments, special tags, script/style bodies).
    """
    l = len(s)
    tg = index_comments(s)

    # Edge case: trailing lone '<' or '</' is not a tag (Parser/HTML.php:66-76)
    if l > 0:
        c = s[l - 1]
        if c == 0x3C:  # '<'
            l -= 1
        elif c == 0x2F and l > 1 and s[l - 2] == 0x3C:  # '</'
            l -= 2

    ids: Dict[int, int] = {}
    tags: Dict[int, str] = {}
    attr: Dict[bytes, Union[int, List[int]]] = {}
    stack: Dict[bytes, List[int]] = {}
    extents: List[Tuple[int, int]] = []

    utn: Optional[bytes] = None  # current unparsed tag name (script/style)
    utn_from = -1  # '>' offset of the unparsed open tag

    # One C-level scan classifies the next construct and captures the tag
    # name: group 1 = '/' for close tags, group 2 = name, group 3 = '!'/'?'
    # for special tags.  Stray '<'s are skipped by the regex engine itself
    # (they cannot start a match), which is exactly the reference's
    # continue-on-non-name behavior.  The scan advances through a C-level
    # ``finditer`` (no per-match Python re-invocation of search); the rare
    # paths that move the cursor somewhere other than the match end —
    # script-body resume, earlier-'>' fallback, forward jumps over
    # comments/unparsed regions — recreate the iterator at the new cursor,
    # and a discarded match that STRADDLES the cursor also recreates it
    # (candidates inside its span would otherwise be skipped).
    find = s.find
    finditer = _SCAN_RE.finditer
    # n -> (lowercased bytes, decoded original-case str): one probe per tag
    name_cache: Dict[bytes, Tuple[bytes, str]] = {}
    # per-match bookkeeping is the per-tag cost floor: bind the bound
    # methods once (each `.append`/`.get` attribute lookup costs as much
    # as the append itself at ~100k matches/doc) and drive the iterator
    # through __next__ with a try/except so the sentinel-default branch
    # of next(it, None) is not paid per tag
    name_cache_get = name_cache.get
    extents_append = extents.append
    attr_get = attr.get
    stack_get = stack.get
    tg_get = tg.get
    i = 0
    it = finditer(s)
    nxt = it.__next__
    while True:
        try:
            m = nxt()
        except StopIteration:
            break
        lt, me = m.span()
        if lt < i:
            if me > i:
                it = finditer(s, i)
                nxt = it.__next__
            continue
        if lt >= l:
            break
        n = m[2]
        if n is not None:
            # regular tag; classification comes from offset arithmetic
            # instead of further Match-object calls — group(3) (the whole
            # attribute region) is never materialized as bytes, and the
            # name end is lt + '<' + optional '/' + len(name)
            is_close = s[lt + 1] == 0x2F
            ne = lt + 1 + is_close + len(n)  # name end = attr region start
            i = me
            ent = name_cache_get(n)
            if ent is None:
                ent = name_cache[n] = (n.lower(), n.decode("latin-1"))
            nl, ns = ent
            if utn is not None:
                if nl != utn or not is_close:
                    # opaque script/style body — resume right after the
                    # NAME: the matched attr region may contain '<' and
                    # could otherwise swallow the real closing tag
                    i = ne
                    if ne < me:
                        it = finditer(s, ne)
                        nxt = it.__next__
                    continue
                # close of the unparsed tag: mask its body
                extents_append((utn_from + 1, lt))
                utn = None
            if me != ne:  # group 3 matched iff the match extends past the name
                # the regex consumed the whole attr region through '>';
                # valid unless a quoted stretch swallowed a '>' (then the
                # reference's no-'='-name rule may pick an earlier '>')
                e = me - 1
                if ne < e and find(b">", ne, e) >= 0:
                    e = find_tag_close(s, ne, l)
                    if e < 0:
                        break
                i = e + 1
                if i < me:
                    it = finditer(s, i)
                    nxt = it.__next__
            else:
                e = find_tag_close(s, ne, l)
                if e < 0:
                    break  # tag never closes — malformed tail
                i = e + 1
            extents_append((lt, i))
            if not is_close:
                ids[e] = e
                tags[e] = ns
                if ne < e:
                    # strip(PHP trim charlist) subsumes the reference's
                    # leading-whitespace skip (the charlist is a superset
                    # of the tag-name whitespace class), so one C-level
                    # strip replaces the per-byte skip loop
                    at = s[ne:e].strip(_PHP_TRIM)
                    # PHP `if ($at)`: the 1-byte string "0" is falsy
                    if at and at != b"0":
                        prev = attr_get(at)
                        if prev is None:
                            attr[at] = e
                        elif type(prev) is list:
                            prev.append(e)
                        else:
                            attr[at] = [prev, e]
                # '/>' ⇒ self-closed: no stack push (Parser/HTML.php:135)
                if s[e - 1] != 0x2F:
                    if nl in UNPARSED_TAGS:
                        utn = nl
                        utn_from = e
                    st = stack_get(nl)
                    if st is None:
                        st = stack[nl] = []
                    st.append(e)
            else:
                st = stack_get(nl)
                if st:
                    q = st.pop()  # per-name LIFO repair
                    ids[q] = lt
        else:
            # special tags: <!...> (doctype/comment/CDATA-ish), <?...>
            ce = tg_get(lt)
            if ce is not None:
                extents_append((lt, ce))
                i = ce
                continue
            gi = find(b">", lt + 2)
            if gi < 0 or gi >= l:
                break
            extents_append((lt, gi + 1))
            i = gi + 1

    if utn is not None:
        # unparsed tag never closed: the rest of the document is opaque
        extents_append((utn_from + 1, l))

    return ParseResult(ids, tags, attr, extents)
