"""Corpus-level URL canonicalization — pure JVM expressions.

Web-scale pipelines dedup by canonical URL BEFORE any content pass
(it removes the bulk of re-crawl duplicates for the cost of a string
expression, no shuffle at all until the final group-by).  This module is
the corpus-side complement of the per-document ``core.urlutil`` (which
implements the reference's href absolutization semantics,
hQuery.php:1100-1170): here everything is a Catalyst expression so a
10^12-row scan never leaves the JVM.

Canonicalization rules (the common-denominator recipe):

* scheme and host lowercased
* default ports stripped (``:80`` for http, ``:443`` for https)
* fragment dropped
* tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``), remaining parameters sorted byte-wise so parameter order
  never splits a group
* empty path becomes ``/``; a trailing slash on a non-root path is
  removed

Every regex uses explicit ASCII classes valid and identical in Java
(Spark) and RE2 (DuckDB); the generated twin in
:func:`canonical_url_sql` is the exact same expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "canonical_url_sql",
           "url_features", "url_features_sql"]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(col: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).

    One expression tree per row — no UDF, no shuffle; rows that do not
    look like absolute URLs (no ``scheme://``) pass through trimmed and
    unchanged so the operator is safe on mixed columns.
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    host = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).when(
        (raw_path != "/") & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - 1),
    ).otherwise(raw_path)
    raw_q = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(raw_q, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    q = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonical_url` — identical expression tree."""
    u = f"trim({col}, ' ')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth = f"lower(regexp_extract({u}, '{_AUTH_RE}', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' AND ends_with({auth}, ':80') "
        f"THEN substring({auth}, 1, length({auth}) - 3) "
        f"WHEN {scheme} = 'https' AND ends_with({auth}, ':443') "
        f"THEN substring({auth}, 1, length({auth}) - 4) "
        f"ELSE {auth} END"
    )
    raw_path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/' "
        f"WHEN {raw_path} <> '/' AND ends_with({raw_path}, '/') "
        f"THEN substring({raw_path}, 1, length({raw_path}) - 1) "
        f"ELSE {raw_path} END"
    )
    raw_q = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(string_split({raw_q}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    q = f"array_to_string({kept}, '&')"
    canon = (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )
    return f"CASE WHEN {scheme} = '' THEN {u} ELSE {canon} END"


def url_features(col: Column) -> Column:
    """struct(host, tld, depth, ext, has_query, n_params) — the crawl-
    prioritization features (URL shape is a strong quality/dup prior:
    deep paths, parameterized URLs, and non-content extensions down-
    rank).  Pure expression tree over an (ideally canonical) URL."""
    host = F.lower(F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1))
    path = F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(col, r"\?([^#]*)", 1)
    return F.struct(
        host.alias("host"),
        F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1).alias("tld"),
        (F.length(path) - F.length(F.regexp_replace(path, "/", "")))
        .cast("int")
        .alias("depth"),
        F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1).alias("ext"),
        (F.length(query) > 0).alias("has_query"),
        F.when(F.length(query) == 0, F.lit(0))
        .otherwise(
            F.length(query) - F.length(F.regexp_replace(query, "&", "")) + 1
        )
        .cast("int")
        .alias("n_params"),
    )


def url_features_sql(col: str) -> str:
    """DuckDB twins of url_features, as a dict of (name -> expr)."""
    host = f"lower(regexp_extract({col}, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1))"
    path = f"regexp_extract({col}, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract({col}, '\\?([^#]*)', 1)"
    return {
        "host": host,
        "tld": f"regexp_extract({host}, '\\.([a-z0-9-]+)$', 1)",
        "depth": (
            f"CAST(length({path}) - length(replace({path}, '/', '')) AS INT)"
        ),
        "ext": f"regexp_extract({path}, '\\.([A-Za-z0-9]+)$', 1)",
        "has_query": f"length({query}) > 0",
        "n_params": (
            f"CAST(CASE WHEN length({query}) = 0 THEN 0 ELSE "
            f"length({query}) - length(replace({query}, '&', '')) + 1 "
            f"END AS INT)"
        ),
    }
