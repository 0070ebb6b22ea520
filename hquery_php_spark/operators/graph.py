"""Host-graph analytics: fixed-point PageRank for crawl-quality
weighting.

Production crawl pipelines rank hosts by link authority (the
CommonCrawl host-level ranking recipe) and use the rank as a quality
prior in curation.  The input is the host link graph the extraction
stage already produces — `a[href]` media refs resolve to absolute URLs
(`core/urlutil.py`), host(base_url) → host(href) edges aggregate to a
weighted edge list — and the algorithm is power iteration, which on a
cluster is per-round: one join (ranks ⋈ edges) + one partial-agg
shuffle keyed by destination.  Same shape as the k-means rounds:
shuffle ∝ edges, driver holds nothing but the iteration counter.

The repo's exactness discipline, applied to an algorithm that is
normally float: ranks are FIXED-POINT micro-units (int64).  Each round
    share(u)  = r(u) // outdeg(u)                 (integer floor)
    r'(v)     = base + (d_num · Σ_{u→v} share(u)) // d_den
with base = ((den−num)·SCALE//den) // n_nodes, d = d_num/d_den the
damping factor.  Every operation is integer and deterministic, so an
unrolled-CTE DuckDB twin reproduces the ranks bit for bit on any
engine — and the floor-truncation error per round is bounded by
outdeg·1 micro-unit, irrelevant at SCALE = 1e6.  Dangling mass (nodes
with no out-edges) is dropped, the standard simplification; the ranks
are a relative ordering, not a probability simplex.

Lineage: each round builds on the previous round's DataFrame; for
double-digit iteration counts apply the same localCheckpoint/
checkpoint_dir discipline as ``dedup.connected_components`` — at the
default 5 rounds the plan stays shallow enough to skip it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed_point", "pagerank_oracle_sql",
           "host_link_edges", "host_ids", "anchor_term_topk"]

SCALE = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_micro) after ``iters`` integer power-iteration
    rounds over a (src, dst) edge list (parallel edges count once —
    the edge set is distinct-ified; weighted variants multiply the
    share by the edge weight, same arithmetic).

    Per round: broadcast-or-shuffle join of the n-node rank table
    against the edge list on src, then one partial-agg sum keyed by
    dst — both linear in |edges|."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = ((d_den - d_num) * SCALE // d_den) // n_nodes
    ranks = nodes.select(
        "node", F.lit(SCALE // n_nodes).cast("long").alias("r")
    )
    for _ in range(iters):
        shares = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "inner")
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("r") / F.col("outdeg")).cast("long").alias("share"),
            )
        )
        contrib = shares.groupBy("node").agg(F.sum("share").alias("s"))
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + (F.lit(d_num) * F.coalesce(F.col("s"), F.lit(0)))
                / F.lit(d_den)
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    d_num: int = 85,
    d_den: int = 100,
) -> str:
    """DuckDB twin: identical integer rounds as an unrolled CTE chain.
    ``edges_sql`` yields (src, dst)."""
    ctes = [
        f"e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src, "
        f"CAST(dst AS BIGINT) AS dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        f"base AS (SELECT (({d_den - d_num} * {SCALE}) // {d_den})"
        " // n AS b FROM nn)",
        f"r0 AS (SELECT node, CAST({SCALE} // (SELECT n FROM nn) AS BIGINT)"
        " AS r FROM nodes)",
    ]
    prev = "r0"
    for it in range(iters):
        nxt = f"r{it + 1}"
        ctes.append(
            f"c{it} AS (SELECT e.dst AS node, "
            f"sum(CAST(p.r // o.outdeg AS BIGINT)) AS s "
            f"FROM {prev} p JOIN outdeg o ON p.node = o.src "
            f"JOIN e ON e.src = p.node GROUP BY e.dst)"
        )
        ctes.append(
            f"{nxt} AS (SELECT nodes.node, "
            f"CAST((SELECT b FROM base) + ({d_num} * coalesce(c.s, 0))"
            f" // {d_den} AS BIGINT) AS r "
            f"FROM nodes LEFT JOIN c{it} c ON nodes.node = c.node)"
        )
        prev = nxt
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank_micro FROM {prev}"
    )


def host_link_edges(
    spans_df: DataFrame,
    base_host_col: str = "base_host",
    ref_col: str = "media_ref",
    kind_col: str = "kind",
) -> DataFrame:
    """Exploded span rows -> weighted host edge list (src, dst, n).

    The real-corpus feeder for ``pagerank_fixed_point``: ``a[href]``
    media spans carry absolute URLs (the extract stage resolved them),
    so src = the document's host, dst = host(media_ref); self-loops
    (internal navigation) are dropped, parallel links aggregate to a
    weight.  One partial-agg shuffle keyed by (src, dst) — linear in
    spans, no Python.  Feed the (src, dst) pairs to the integer
    PageRank (weighted variant: multiply share by ``n``) after mapping
    hosts to dense ids with the same first-occurrence ranking every
    other operator uses."""
    dst = F.lower(
        F.regexp_extract(F.col(ref_col), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )
    return (
        spans_df.where(
            (F.col(kind_col) == "media") & F.col(ref_col).isNotNull()
        )
        .select(
            F.lower(F.col(base_host_col)).alias("src"), dst.alias("dst")
        )
        .where((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )


def host_ids(edges: DataFrame, dense: bool = False) -> DataFrame:
    """(host, node_id) for the hosts appearing in the edge list.

    Default: node_id = xxhash64(host) — zero-shuffle beyond the
    distinct, scales to any host count; PageRank only needs ids as
    join keys, not a dense range (collision odds ~ n²/2⁶⁴).
    ``dense=True`` ranks hosts lexicographically through a single
    global window — deterministic and twin-friendly, but one-partition
    at the rank step, so reserve it for test/oracle corpora."""
    hosts = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    )
    if not dense:
        return hosts.withColumn("node_id", F.xxhash64("host"))
    from pyspark.sql.window import Window

    w = Window.orderBy("host")
    return hosts.withColumn(
        "node_id", (F.row_number().over(w) - 1).cast("long")
    )


def anchor_term_topk(
    spans_df: DataFrame,
    k: int = 10,
    ref_col: str = "media_ref",
    text_col: str = "text",
    kind_col: str = "kind",
) -> DataFrame:
    """Anchor-text term profile per destination host: (dst_host, term,
    n, rk<=k) — the classic off-page relevance signal (what OTHER
    pages' link text says a host is about), fed by the same media
    spans as ``host_link_edges``.

    Shape: explode anchor tokens (already-extracted link text, no
    re-parse) -> one (host, term) partial-agg shuffle -> per-host
    window top-k over the counted table (bounded partitions: terms per
    host, not corpus rows).  No Python, no global window."""
    from pyspark.sql.window import Window

    from ..functions.text import norm_ws

    dst = F.lower(
        F.regexp_extract(F.col(ref_col), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
    )
    toks = (
        spans_df.where(
            (F.col(kind_col) == "media")
            & F.col(ref_col).isNotNull()
            & (F.col(text_col) != "")
        )
        .select(
            dst.alias("dst_host"),
            F.explode(F.split(norm_ws(F.lower(F.col(text_col))), " ")).alias(
                "term"
            ),
        )
        .where((F.col("term") != "") & (F.col("dst_host") != ""))
    )
    counts = toks.groupBy("dst_host", "term").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )
