"""Selector algebra: filters, semi-joins and interval joins over the index.

Re-expresses the reference's query operators (duzun/hQuery.php) as ordered
set operations on posting lists (Python dicts preserve insertion order =
document order):

* conjunction driver ``find_ids`` — tag ∧ classes ∧ attrs ∧ context with
  cheapest-first early exits            (HTML_Index.php:831-931 ``_find``)
* ``filter_ids`` — same over an explicit candidate set
                                         (HTML_Index.php:1002-1095 ``_filter``)
* class AND-intersection               (HTML_Index.php:1141-1216)
* attr predicate over interned sets    (HTML_Index.php:1102-1133)
* interval containment join (descendant combinator / context)
                                         (Node.php:1075-1114 ``_filter_contains``)
* direct children / next / prev siblings / parent hops
                                         (Node.php:611-1001)
* context normalization (outermost intervals)  (Node.php:504-522 ``_ctx_ids``)

All of these run *per document inside the extraction UDF* — they are
in-partition sorted-merge joins, never Spark shuffles.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, Iterable, List, Optional, Tuple, Union

from .attrs import parse_attr_str
from .index import INDEX_ATTRIBS, DocIndex, IdMap

__all__ = [
    "find_ids",
    "filter_ids",
    "ctx_ids",
    "sub_ids",
    "filter_contains",
    "children_of",
    "next_siblings",
    "prev_siblings",
    "parents_of",
    "get_aids_by_class",
    "get_aids_by_attr",
    "get_ids_by_aid",
    "has_class",
]

_INT_MAX = 2**63 - 1


def _intersect_key(a: IdMap, b) -> IdMap:
    """array_intersect_key: keys of ``a`` also in ``b``, preserving a's order."""
    return {k: v for k, v in a.items() if k in b}


# --------------------------------------------------------------------- #
# aid-level lookups

def get_aids_by_class(doc: DocIndex, cl, as_keys: bool = True):
    """{aid: ids} for attribute sets carrying ALL classes in ``cl``
    (HTML_Index.php:1141-1216); pairwise intersection with early exit."""
    aids: Dict[int, Union[int, IdMap]] = {}
    if not isinstance(cl, list):
        cl = [c for c in str(cl).strip().split() if True]
    if not cl:
        return aids
    postings = []
    for c in set(cl):
        p = doc.class_idx.get(c)
        if p is None:
            return {}  # at least one class not in the document
        postings.append(p)
    for p in postings:
        cur = p if isinstance(p, dict) else {p: doc.attr_idx[p]}
        if not aids:
            aids = dict(cur)
        else:
            aids = {k: v for k, v in aids.items() if k in cur}
            if not aids:
                return aids
    return aids if as_keys else list(aids)


def get_aids_by_attr(doc: DocIndex, attr, as_keys: bool = True, actx=None):
    """{aid: ids} for interned attribute sets matching all (name, value)
    pairs; value None = existence test (HTML_Index.php:1102-1133)."""
    aids: Dict[int, Union[int, IdMap]] = {}
    if actx is not None and not actx:
        return aids
    if isinstance(attr, str):
        attr = parse_attr_str(attr)
    attribs = doc.attribs
    items = (
        ((aid, attribs[aid]) for aid in actx if aid in attribs)
        if actx
        else attribs.items()
    )
    for aid, a in items:
        ok = True
        for n, v in attr.items():
            if n not in a or (v is not None and a[n] != v):
                ok = False
                break
        if ok:
            aids[aid] = doc.attr_idx[aid]
    return aids if as_keys else list(aids)


def get_ids_by_aid(doc: DocIndex, aids, sort: bool = True) -> IdMap:
    """Union of id-maps for a set of aids, ksorted (HTML_Index.php:1261-1285).

    Single-aid unions are a plain C-level dict copy — posting lists are
    begin-sorted by construction (index.py sorts merged postings), so no
    sort and no per-item tuple materialization.  Multi-aid unions merge
    via ``dict.update`` (no tuple churn) and rebuild in key order once."""
    if len(aids) == 1:
        aix = next(iter(aids.values()))
        return dict(aix) if isinstance(aix, dict) else {aix: doc.ids[aix]}
    m: IdMap = {}
    for aix in aids.values():
        if isinstance(aix, dict):
            m.update(aix)
        else:
            m[aix] = doc.ids[aix]
    if sort:
        return {k: m[k] for k in sorted(m)}
    return m


# --------------------------------------------------------------------- #
# context handling

def ctx_ids(ids: IdMap, exc: Optional[IdMap] = None) -> IdMap:
    """Outermost non-empty intervals (Node.php:504-522):
    drop x when (nested-in-previous OR empty) and x not excluded."""
    ret: IdMap = {}
    m = -1
    exc = exc or {}
    for b, e in ids.items():
        if (b <= m or b + 1 >= e) and b not in exc:
            continue
        ret[b] = e
        m = e
    return ret


def sub_ids(doc: DocIndex, ctx: IdMap, eq: bool = False) -> IdMap:
    """All doc elements inside the context intervals (Node.php:529-552).
    Literal transliteration of the reference's single-pointer walk."""
    ret: IdMap = {}
    it = iter(ctx.items())
    try:
        cb, ce = next(it)
    except StopIteration:
        return ret
    for b, e in doc.ids.items():
        if b < cb or (not eq and b == cb):
            continue
        if b < ce:
            ret[b] = e
        else:
            try:
                cb, ce = next(it)
            except StopIteration:
                break
    return ret


def filter_contains(ctx: IdMap, el: IdMap, eq: bool = False) -> IdMap:
    """ids of ``el`` contained in(side) ``ctx`` — sorted-merge interval
    containment join (Node.php:1075-1114)."""
    ret: IdMap = {}
    it = iter(el.items())
    try:
        ib, ie = next(it)
    except StopIteration:
        return ret
    for b, e in ctx.items():
        try:
            while ib < b or (not eq and ib == b):
                ib, ie = next(it)
            while ib < e:
                ret[ib] = ie
                ib, ie = next(it)
        except StopIteration:
            return ret
    return ret


# --------------------------------------------------------------------- #
# structural hops (children / siblings / parent)

def _sorted_items(ids: IdMap) -> List[Tuple[int, int]]:
    items = list(ids.items())
    items.sort()
    return items


def children_of(doc: DocIndex, ids: IdMap, n: Optional[int] = None) -> IdMap:
    """Direct children (Node.php:658-734): contained intervals that are not
    inside an intermediate one; ``n`` selects the n-th child per parent."""
    begins, ends = doc.begins_ends()
    nb = len(begins)
    ret: IdMap = {}
    for b, e in _sorted_items(ids):
        if b + 4 >= e:
            continue  # a tag needs ≥3 chars; empty intervals have no children
        i = bisect_right(begins, b)
        k = 0
        while i < nb and begins[i] < e:
            cb, ce = begins[i], ends[i]
            if n is None:
                ret[cb] = ce
            elif n == k:
                ret[cb] = ce
                break
            k += 1
            nxt = ce if ce < e else e
            if nxt < cb:
                nxt = cb
            i = bisect_right(begins, nxt, i)
    return ret


def _parent_end(doc: DocIndex, b: int) -> int:
    pb = doc.parent_begin().get(b)
    return doc.ids[pb] if pb is not None else _INT_MAX


def next_siblings(
    doc: DocIndex, ids: IdMap, idx: Optional[int] = 0, count: int = 1
) -> IdMap:
    """Following siblings (Node.php:742-857): for each x, siblings are the
    elements after x's end and before x's parent's end, at x's depth;
    ``idx`` skips, ``count`` limits (-1 = unlimited)."""
    if idx is None:
        idx = 0
    begins, ends = doc.begins_ends()
    nb = len(begins)
    # sibling contexts keyed by x's end: {kb: ke}, deduped + sorted
    st: Dict[int, int] = {}
    for b, e in ids.items():
        st[e] = _parent_end(doc, b)
    ret: IdMap = {}
    for kb in sorted(st):
        ke = st[kb]
        i = bisect_right(begins, kb)
        k = 0
        c = count
        while i < nb and begins[i] < ke:
            sb, se = begins[i], ends[i]
            if k >= idx:
                ret[sb] = se
                c -= 1
                if c == 0:
                    break
            else:
                k += 1
            lie = se if se < ke else ke
            if lie < sb:
                lie = sb
            i = bisect_right(begins, lie, i)
    return ret


def prev_siblings(doc: DocIndex, ids: IdMap, n: Optional[int] = 0) -> IdMap:
    """n-th previous sibling (Node.php:864-1001): collect all siblings
    before x inside x's parent, then pick index c-n-1 (n<0 counts from
    the front)."""
    if n is None:
        n = 0
    begins, ends = doc.begins_ends()
    nb = len(begins)
    pbm = doc.parent_begin()
    # contexts: {parent_begin: x_begin}; reference dedupes by (kb → last ke)
    st: Dict[int, int] = {}
    for b in ids:
        st[pbm.get(b, -1)] = b
    ret: IdMap = {}
    for kb in sorted(st):
        ke = st[kb]
        sibs: List[Tuple[int, int]] = []
        i = bisect_right(begins, kb)
        while i < nb and begins[i] < ke:
            sb, se = begins[i], ends[i]
            sibs.append((sb, se))
            lie = se if se < ke else ke
            if lie < sb:
                lie = sb
            i = bisect_right(begins, lie, i)
        c = len(sibs)
        j = (0 if n < 0 else c) - n - 1
        if 0 <= j < c:
            sb, se = sibs[j]
            ret[sb] = se
    return ret


def parents_of(doc: DocIndex, ids: IdMap) -> IdMap:
    """Nearest enclosing interval per id, deduped (Node.php:611-651)."""
    pbm = doc.parent_begin()
    ret: IdMap = {}
    for b in ids:
        pb = pbm.get(b)
        if pb is not None:
            ret[pb] = doc.ids[pb]
    if ret:
        ret = dict(sorted(ret.items()))
    return ret


# --------------------------------------------------------------------- #
# the conjunction drivers

def find_ids(
    doc: DocIndex,
    name: Optional[str],
    cls=None,
    attr: Optional[dict] = None,
    ctx: Optional[IdMap] = None,
) -> IdMap:
    """Conjunction driver (HTML_Index.php:831-931): name ∧ classes ∧ attrs
    ∧ context via ordered hash semi-joins with cheapest-first early exits."""
    attr = dict(attr) if attr else {}
    if isinstance(name, str) and name != "" and name != "*":
        name = name.strip().lower()
        if not doc.tag_idx.get(name):
            return {}
        has_selectors = True
    else:
        name = None
        has_selectors = bool(attr) or bool(cls)

    iattr = {}
    for atn in INDEX_ATTRIBS:
        if atn in attr:
            if not doc.idx_attr.get(atn):
                return {}
            iattr[atn] = attr.pop(atn)

    aids = None
    if cls:
        aids = get_aids_by_class(doc, cls, True)
        if not aids:
            return {}
    if attr:
        aids = get_aids_by_attr(doc, attr, True, aids)
        if not aids:
            return {}

    ids: Optional[IdMap] = None
    if aids is not None:
        ids = get_ids_by_aid(doc, aids, True)

    if name:
        tix = doc.tag_idx[name]
        ids = _intersect_key(ids, tix) if ids is not None else tix

    for n, v in iattr.items():
        base = ids if ids is not None else doc.ids
        idxa = doc.idx_attr[n]
        ids = _intersect_key(base, idxa)
        if v is not None:
            ids = {k: t for k, t in ids.items() if idxa[k] == v}
        if not ids:
            return ids

    if has_selectors:
        if ids and ctx is not None:
            ids = filter_contains(ctx, ids)
    else:
        if ctx is not None:
            ids = sub_ids(doc, ctx, False)
        else:
            ids = doc.ids
    return ids if ids is not None else {}


def filter_ids(
    doc: DocIndex,
    ids: IdMap,
    name: Optional[str] = None,
    cls=None,
    attr: Optional[dict] = None,
    ctx: Optional[IdMap] = None,
) -> IdMap:
    """Same conjunction over an explicit candidate set
    (HTML_Index.php:1002-1095) — used after combinators."""
    attr = dict(attr) if attr else {}
    if isinstance(name, str) and name != "" and name != "*":
        name = name.strip().lower()
        tix = doc.tag_idx.get(name)
        if not tix:
            return {}
        ids = _intersect_key(ids, tix)
        if not ids:
            return ids

    iattr = {}
    for atn in INDEX_ATTRIBS:
        if atn in attr:
            if not doc.idx_attr.get(atn):
                return {}
            iattr[atn] = attr.pop(atn)

    for n, v in iattr.items():
        idxa = doc.idx_attr[n]
        ids = _intersect_key(ids, idxa)
        if v is not None:
            ids = {k: t for k, t in ids.items() if idxa[k] == v}
        if not ids:
            return ids

    aids = None
    if cls:
        aids = get_aids_by_class(doc, cls, True)
        if not aids:
            return {}
    if attr:
        aids = get_aids_by_attr(doc, attr, True, aids)
        if not aids:
            return {}

    if aids:
        attrs = doc.attrs
        ids = {b: e for b, e in ids.items() if b in attrs and attrs[b] in aids}
        if not ids:
            return ids

    if ctx is not None:
        ids = filter_contains(ctx, ids)
    return ids


# --------------------------------------------------------------------- #
def has_class(doc: DocIndex, id_: int, cl: Iterable[str]):
    """Tri-state class membership: True / 0 (no attrs or mismatch) / False
    (class not in document) — HTML_Index.php:940-991."""
    cl = list(cl)
    if id_ not in doc.attrs:
        return 0
    if not cl:
        return 0
    for c in cl:
        p = doc.class_idx.get(c)
        if p is None:
            return False
        aid = doc.attrs[id_]
        if (aid not in p) if isinstance(p, dict) else (p != aid):
            return 0
    return True
