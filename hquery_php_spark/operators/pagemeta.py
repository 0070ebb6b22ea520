"""Structured page metadata: the head-section extraction operator.

Every serious crawl pipeline runs this step: OpenGraph / Twitter-card
properties, the canonical URL, description, feed and icon links, and
embedded JSON-LD — the machine-readable identity of a page, used for
dedup keys (canonical), document titles, image selection (og:image),
and knowledge-graph joins (JSON-LD @type).  Built entirely on the
repo's own hquery engine: one ``meta``/``link``/``script`` sweep over
the tag index, attribute access through the interned attribute sets
(names case-folded — reference semantics), URL absolutization through
the same resolver the media-ref pipeline uses.

Reference parity: this is the natural extension of the reference's
`<base href>` pickup (HTML_Index.php:756-763) and href/src dedicated
indexes (HTML_Index.php:617-640) to the full head-metadata surface.
"""

from __future__ import annotations

import json
from typing import List, Optional

__all__ = ["page_meta", "page_meta_rows", "srcset_refs"]


def page_meta(html, url: Optional[str] = None) -> Optional[dict]:
    """HTML (str/bytes or an ``HDoc``) -> {'title', 'canonical',
    'description', 'og': {...}, 'twitter': {...}, 'jsonld_types': [...],
    'n_jsonld', 'feeds': [...], 'icons': [...], 'n_meta'}.

    og/twitter maps hold the un-prefixed property names
    (``og:image`` -> ``og['image']``).  canonical / feed / icon URLs
    are absolutized against ``<base href>``/the document URL, exactly
    like the engine's media refs.  Broken JSON-LD blocks count toward
    ``n_jsonld`` but contribute no types (fault tolerance, not
    failure)."""
    import hquery_php_spark as hq

    if html is None:
        return None
    if isinstance(html, (str, bytes, bytearray)):
        raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
        doc = hq.HDoc(raw, url)
    else:
        doc = html

    out = {
        "title": None,
        "canonical": None,
        "description": None,
        "og": {},
        "twitter": {},
        "jsonld_types": [],
        "n_jsonld": 0,
        "feeds": [],
        "icons": [],
        "n_meta": 0,
    }

    titles = doc.find("title")
    if titles:
        out["title"] = next(iter(titles)).text().strip() or None

    for m in doc.find("meta") or []:
        out["n_meta"] += 1
        content = m.attr("content")
        prop = m.attr("property") or ""
        name = m.attr("name") or ""
        if content is None:
            continue
        if prop.startswith("og:"):
            out["og"][prop[3:]] = content
        elif name.startswith("twitter:") or prop.startswith("twitter:"):
            key = (name or prop)[8:]
            out["twitter"][key] = content
        elif name == "description" and out["description"] is None:
            out["description"] = content

    for ln in doc.find("link") or []:
        rel = (ln.attr("rel") or "").lower()
        href = ln.attr("href")
        if not href:
            continue
        # evaluate=True resolves relative hrefs against <base href>/the
        # document URL — the same path the media-ref pipeline uses
        absolute = ln.attr("href", evaluate=True)
        if "canonical" in rel.split() and out["canonical"] is None:
            out["canonical"] = absolute
        elif "alternate" in rel.split():
            typ = (ln.attr("type") or "").lower()
            if "rss" in typ or "atom" in typ:
                out["feeds"].append(absolute)
        elif "icon" in rel.split():
            out["icons"].append(absolute)

    for sc in doc.find("script") or []:
        if (sc.attr("type") or "").lower() != "application/ld+json":
            continue
        out["n_jsonld"] += 1
        try:
            data = json.loads(sc.text())
        except (ValueError, TypeError):
            continue  # broken block: counted, no types claimed
        items = data if isinstance(data, list) else [data]
        for item in items:
            if isinstance(item, dict):
                t = item.get("@type")
                if isinstance(t, str):
                    out["jsonld_types"].append(t)
                elif isinstance(t, list):
                    out["jsonld_types"].extend(
                        x for x in t if isinstance(x, str)
                    )
    return out


def page_meta_rows(html, url: Optional[str] = None) -> List[dict]:
    """Flat per-property rows (kind, key, value) for relational
    consumption: 'og'/'twitter'/'link'/'jsonld'/'doc' families in
    deterministic order — the exploded twin of ``page_meta``."""
    m = page_meta(html, url)
    if m is None:
        return []
    rows = []
    if m["title"] is not None:
        rows.append({"kind": "doc", "key": "title", "value": m["title"]})
    if m["canonical"] is not None:
        rows.append(
            {"kind": "link", "key": "canonical", "value": m["canonical"]}
        )
    if m["description"] is not None:
        rows.append(
            {"kind": "doc", "key": "description", "value": m["description"]}
        )
    for k in sorted(m["og"]):
        rows.append({"kind": "og", "key": k, "value": m["og"][k]})
    for k in sorted(m["twitter"]):
        rows.append({"kind": "twitter", "key": k, "value": m["twitter"][k]})
    for u in m["feeds"]:
        rows.append({"kind": "link", "key": "feed", "value": u})
    for u in m["icons"]:
        rows.append({"kind": "link", "key": "icon", "value": u})
    for t in m["jsonld_types"]:
        rows.append({"kind": "jsonld", "key": "@type", "value": t})
    return rows


def srcset_refs(html, url: Optional[str] = None):
    """Responsive-image references: [(tag, url_abs, descriptor)] for
    every ``srcset`` candidate of every ``img``/``source`` element in
    document order, URLs absolutized through the engine's resolver
    (<base href> honored like every media ref).

    Beyond the reference (which predates responsive images, so its
    media extraction sees only ``img[src]``): at crawl scale the
    srcset candidates are where the high-resolution variants live —
    an image-text corpus that ignores them collects thumbnail-quality
    pixels.  Candidate parsing is the WHATWG grammar
    (core/urlutil.parse_srcset); fault-tolerant end to end."""
    from ..core.doc import HDoc
    from ..core.urlutil import parse_srcset

    if html is None:
        return []
    if isinstance(html, (str, bytes, bytearray)):
        raw = html.encode("utf-8") if isinstance(html, str) else bytes(html)
        doc = HDoc(raw, url)
    else:
        doc = html
    r = doc.find("img[srcset],source[srcset]")
    out = []
    for el in r or []:
        for u, d in parse_srcset(el.attr("srcset")):
            out.append((el.nodeName, doc.index.url2abs(u), d))
    return out
