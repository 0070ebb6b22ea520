"""Corpus ranking operators: BM25 keyword search and PMI collocations.

Both are classic retrieval/corpus-statistics shapes a training-data
pipeline runs next to TF-IDF (``text.tfidf_top_terms``):

* :func:`bm25_topk` — Okapi BM25 scoring of a fixed keyword query over
  the corpus, top-k by score.
* :func:`pmi_collocations` — pointwise mutual information over adjacent
  token pairs, surfacing the corpus's strongest collocations.

Cross-engine exactness strategy (same contract as the rest of
``functions.text``): every floating-point expression is written as ONE
fixed tree evaluated per row (no order-dependent double summation — the
BM25 per-term contributions are combined left-to-right in the query-term
order on a single row, never via a float aggregate), integer statistics
are aggregated exactly, and every emitted float is round(·, 6).  Each
function has a generated DuckDB twin with the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import SQL, _LOWERC, _UPPER, norm_ws

__all__ = [
    "bm25_topk",
    "bm25_oracle_sql",
    "pmi_collocations",
    "pmi_oracle_sql",
    "bigram_logprob",
    "bigram_logprob_oracle_sql",
]


def _toks(text_col: Column) -> Column:
    """Lowercased whitespace tokens; empty array for an empty document."""
    norm = F.translate(norm_ws(text_col), _UPPER, _LOWERC)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _toks_sql(col: str) -> str:
    norm = f"translate({SQL.norm_ws(col)}, '{_UPPER}', '{_LOWERC}')"
    return (
        f"CASE WHEN length({norm}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({norm}, ' ') END"
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    persist_base: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Okapi BM25 top-k for a fixed ``terms`` query.

    Spark-first shape: per-document term frequencies come straight from
    the token ARRAY (``size(filter(...))`` — no explode, no shuffle), so
    scoring is one scan of pure JVM expressions.  The only other work is
    a 2-value corpus statistic (N, Σdl) collected once driver-side (the
    same single-row "parameter lookup" pattern as the IVF query vector)
    and embedded as literals, and the final ``orderBy().limit(k)`` which
    Spark executes as per-partition partial top-k + driver merge — no
    global sort shuffle.

    Determinism: idf uses exact integer df embedded in a fixed
    expression; the per-term contributions are added LEFT-TO-RIGHT in
    the ``terms`` order within one row expression, so there is no
    aggregation-order float drift; the score is round(·, 6) and ties
    break on ``id_col``.

    Output: (id, dl, tf_0..tf_{n-1}, bm25) — one row per top-k doc.
    """
    toks = _toks(F.col(text_col))

    def _eq(term: str):
        # closure factory, NOT a defaulted 2-arg lambda: pyspark treats a
        # 2-param HOF lambda as (element, index) and would bind the index
        # column over the default (the HOF index-binding trap pinned in
        # tests/test_spark.py for the minhash family)
        return lambda w: w == F.lit(term)

    base = df.select(F.col(id_col).alias("id"), toks.alias("__t")).select(
        "id",
        F.size("__t").alias("dl"),
        *[
            F.size(F.filter("__t", _eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    if persist_base:
        # the (id, dl, tf_*) projection — a few ints per doc — feeds both
        # the stats lookup and the scoring pass; cache it so the corpus is
        # tokenized once, not twice (release via persist_registry)
        base = base.persist()
        if persist_registry is not None:
            persist_registry.append(base)
    # corpus stats: exact integers, one tiny job
    n_docs, sum_dl, *dfs = base.select(
        F.count("*"),
        F.sum("dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")) for i in range(len(terms))],
    ).first()
    avgdl = float(sum_dl) / float(n_docs)  # exact IEEE division of exact ints

    import math

    score = None
    for i in range(len(terms)):
        idf = math.log(1.0 + (float(n_docs) - float(dfs[i]) + 0.5) / (float(dfs[i]) + 0.5))
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
        )
        contrib = F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
        score = contrib if score is None else (score + contrib)
    scored = base.withColumn("bm25", F.round(score, 6))
    return (
        scored.where(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "id")
        .limit(k)
    )


def bm25_oracle_sql(
    terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — the same fixed left-to-right
    contribution sum, idf/avgdl from the same exact integer statistics
    (computed in-query instead of driver-side)."""
    toks = _toks_sql(text_col)
    tf_cols = ", ".join(
        f"len(list_filter(t, w -> w = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(ln(1.0 + (CAST(s.n AS DOUBLE) - CAST(s.df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(s.df_{i} AS DOUBLE) + 0.5)))"
        f" * (CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
        f" * CAST(dl AS DOUBLE) / (CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))))"
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, len(t) AS dl, {tf_cols}
  FROM (SELECT {id_col}, {toks} AS t FROM {table})
),
s AS (SELECT count(*) AS n, sum(dl) AS sdl, {df_cols} FROM base)
SELECT id, CAST(dl AS INT) AS dl,
       {", ".join(f"CAST(tf_{i} AS INT) AS tf_{i}" for i in range(len(terms)))},
       bm25
FROM (SELECT base.*, round({contribs}, 6) AS bm25 FROM base, s)
WHERE bm25 > 0
ORDER BY bm25 DESC, id
LIMIT {k}
"""


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
    persist_counts: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual information.

    PMI(x, y) = ln( p(xy) / (p(x) p(y)) ) with p(xy) = n_xy / N_bi and
    p(w) = n_w / N_uni, computed as the fixed tree
    ``ln(n_xy) + 2 ln(N_uni) - ln(N_bi) - ln(n_x) - ln(n_y)`` so the
    integer statistics never multiply into an overflowable product
    (N_uni² alone would overflow int64 on a 10^12-doc corpus).

    Spark-first shape: ONE scan emits both unigram and bigram events as
    a single exploded (kind, term) stream, so one shuffle produces both
    count tables (map-side partial agg); the bigram table then joins the
    unigram counts twice on the term key.  Totals are a single-row
    parameter lookup.  ``persist_counts=True`` caches the (kind, term)
    count table — vocabulary-sized, tiny next to the corpus — so the
    totals lookup, the bigram side, and both unigram join sides all read
    one materialized subtree instead of re-scanning the corpus 3×;
    long-lived sessions release it with ``spark.catalog.clearCache()``
    after materializing the output (or pass ``persist_counts=False``).
    Output: (w1, w2, n_xy, n_x, n_y, pmi, rk).
    """
    toks = _toks(F.col(text_col))
    d = df.select(toks.alias("t"))
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat(
                F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    events = d.select(
        F.explode(
            F.concat(
                F.transform("t", lambda w: F.struct(F.lit("u").alias("kind"), w.alias("term"))),
                F.transform(bigrams, lambda g: F.struct(F.lit("b").alias("kind"), g.alias("term"))),
            )
        ).alias("e")
    ).select("e.kind", "e.term").where(F.col("term") != "")
    counts = events.groupBy("kind", "term").agg(F.count("*").alias("n"))
    if persist_counts:
        counts = counts.persist()
        if persist_registry is not None:
            persist_registry.append(counts)
    uni = counts.where(F.col("kind") == "u").select(F.col("term").alias("w"), F.col("n").alias("n_w"))
    bi = counts.where(F.col("kind") == "b").select(
        F.split("term", " ")[0].alias("w1"),
        F.split("term", " ")[1].alias("w2"),
        F.col("n").alias("n_xy"),
    )
    n_uni, n_bi = (
        counts.groupBy()
        .agg(
            F.sum(F.when(F.col("kind") == "u", F.col("n")).otherwise(0)),
            F.sum(F.when(F.col("kind") == "b", F.col("n")).otherwise(0)),
        )
        .first()
    )
    joined = (
        bi.where(F.col("n_xy") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_x"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_y"), "w2")
    )
    pmi = F.round(
        F.log(F.col("n_xy").cast("double"))
        + F.lit(2.0) * F.log(F.lit(float(n_uni)))
        - F.log(F.lit(float(n_bi)))
        - F.log(F.col("n_x").cast("double"))
        - F.log(F.col("n_y").cast("double")),
        6,
    )
    # partial top-k (orderBy().limit() = per-partition TakeOrdered + driver
    # merge — no global sort shuffle), THEN rank the <= top_k survivors;
    # a row_number window over the full bigram vocabulary would force a
    # single-partition global sort at scale.
    top = joined.withColumn("pmi", pmi).orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)
    w = Window.orderBy(F.desc("pmi"), "w1", "w2")
    return top.withColumn("rk", F.row_number().over(w)).select(
        "w1", "w2", "n_xy", "n_x", "n_y", "pmi", "rk"
    )


def pmi_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` — identical log-space tree."""
    toks = _toks_sql(text_col)
    return f"""
WITH d AS (SELECT {toks} AS t FROM {table}),
uni AS (
  SELECT term AS w, count(*) AS n_w
  FROM (SELECT unnest(t) AS term FROM d) WHERE term <> '' GROUP BY term
),
bi AS (
  SELECT g AS bigram, count(*) AS n_xy
  FROM (SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
        FROM d)
  GROUP BY g
),
tot AS (SELECT (SELECT sum(n_w) FROM uni) AS n_uni,
               (SELECT sum(n_xy) FROM bi) AS n_bi)
SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy,
       CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rk
FROM (
  SELECT string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2,
         n_xy,
         (SELECT n_w FROM uni WHERE w = string_split(bigram, ' ')[1]) AS n_x,
         (SELECT n_w FROM uni WHERE w = string_split(bigram, ' ')[2]) AS n_y,
         round(ln(CAST(n_xy AS DOUBLE))
               + 2.0 * ln(CAST(tot.n_uni AS DOUBLE))
               - ln(CAST(tot.n_bi AS DOUBLE))
               - ln((SELECT CAST(n_w AS DOUBLE) FROM uni
                     WHERE w = string_split(bigram, ' ')[1]))
               - ln((SELECT CAST(n_w AS DOUBLE) FROM uni
                     WHERE w = string_split(bigram, ' ')[2])), 6) AS pmi
  FROM bi, tot WHERE n_xy >= {min_count}
)
QUALIFY rk <= {top_k}
"""


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_tf: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Per-document unigram log-probability — the CCNet/RedPajama
    "perplexity filter" shape with the language model replaced by the
    corpus's own unigram distribution (no external model artifact; the
    plumbing is identical if a real LM table is substituted).

    Cross-engine exactness: a float sum over a document's tokens is
    aggregation-order-dependent, so each token's ln(n_w / N) is first
    quantized to FIXED-POINT micro-nats (round(lp·1e6) as BIGINT) on the
    per-TERM table — one rounding per vocabulary entry, not per token —
    and the per-document reduction is then an exact integer sum, giving
    identical results on any engine, partitioning, or cluster size.

    Shape — ONE corpus scan: explode → per-(doc, term) tf shuffle; the
    unigram table, total-token count, AND the scoring join all derive
    from that tf table (the tfidf_top_terms trick), so the raw corpus
    is never re-tokenized.  The per-doc sum becomes Σ tf·lp_micro —
    still an exact integer sum.  ``persist_tf=True`` caches the tf
    table (materialized eagerly by the N lookup) so the plan shows one
    tf subtree feeding both the unigram build and the join — at scale
    this cache is the (doc, term)-distinct table, far smaller than the
    token stream; callers that keep the session alive should
    ``spark.catalog.clearCache()`` (or pass ``persist_tf=False``) once
    the output is materialized.  The vocabulary of a web corpus is too
    large to broadcast, so the term join is a plain shuffle join (AQE
    may still pick broadcast when it measures small).

    Output: (id, n_toks, sum_lp_micro, avg_logprob, ppl_proxy) where
    avg_logprob = round(sum_lp_micro / 1e6 / n_toks, 6) and ppl_proxy =
    round(exp(-avg_logprob), 6).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(_toks(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    if persist_tf:
        tf = tf.persist()
        if persist_registry is not None:
            persist_registry.append(tf)
    counts = tf.groupBy("term").agg(F.sum("tf").alias("n_w"))
    n_total = counts.agg(F.sum("n_w")).first()[0]
    lp = counts.withColumn(
        "lp_micro",
        F.round(
            (F.log(F.col("n_w").cast("double")) - F.log(F.lit(float(n_total))))
            * F.lit(1e6),
            0,
        ).cast("long"),
    ).select("term", "lp_micro")
    per_doc = (
        tf.join(lp, "term")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_toks"),
            F.sum(F.col("tf") * F.col("lp_micro")).alias("sum_lp_micro"),
        )
    )
    avg = F.col("sum_lp_micro").cast("double") / F.lit(1e6) / F.col("n_toks").cast("double")
    return per_doc.select(
        "id",
        "n_toks",
        "sum_lp_micro",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("ppl_proxy"),
    )


def unigram_logprob_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`unigram_logprob` — the same per-term
    fixed-point quantization and exact integer per-document sum."""
    toks = _toks_sql(text_col)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, term
  FROM (SELECT {id_col}, unnest({toks}) AS term FROM {table})
  WHERE term <> ''
),
counts AS (SELECT term, count(*) AS n_w FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(n_w) AS DOUBLE) AS n FROM counts),
lp AS (
  SELECT term,
         CAST(round((ln(CAST(n_w AS DOUBLE)) - ln(tot.n)) * 1e6, 0) AS BIGINT)
           AS lp_micro
  FROM counts, tot
),
per_doc AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro
  FROM toks JOIN lp USING (term)
  GROUP BY id
)
SELECT id, n_toks, sum_lp_micro,
       round(CAST(sum_lp_micro AS DOUBLE) / 1e6 / CAST(n_toks AS DOUBLE), 6)
         AS avg_logprob,
       round(exp(-(CAST(sum_lp_micro AS DOUBLE) / 1e6 / CAST(n_toks AS DOUBLE))), 6)
         AS ppl_proxy
FROM per_doc
"""


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam_num: int = 9,
    lam_den: int = 10,
    persist_registry: list | None = None,
) -> DataFrame:
    """Per-document interpolated-bigram log-probability — one rung up
    the CCNet ladder from ``unigram_logprob`` toward the 5-gram KenLM
    filter, with the same engine-exact discipline:

        p(w_i | w_{i-1}) = λ·c(w_{i-1} w_i)/c(w_{i-1}) + (1−λ)·c(w_i)/N

    Each DISTINCT bigram's ln p quantizes ONCE to fixed-point micro-nats
    on the bigram table (|bigram types| roundings; the inner float
    expression is a fixed left-to-right op sequence, identical on any
    engine), and the per-document score is the exact integer
    Σ tf·lp_micro — order-independent under any partitioning.

    Shape — ONE corpus scan emits both unigram and bigram events
    (posexplode of a unioned event array, the pmi_collocations trick),
    one count shuffle feeds the unigram, context, and bigram tables;
    scoring joins the per-doc bigram tf against the quantized table.
    The first token of each document has no left context and is NOT
    scored — only the n−1 bigram transitions contribute (n_bigrams =
    n_tokens − 1), exactly as in the twin.

    Output: (id, n_bigrams, sum_lp_micro, avg_logprob, ppl_proxy);
    single-token and empty documents carry no bigram evidence and are
    omitted (match the twin's join semantics)."""
    toked = df.select(
        F.col(id_col).alias("id"), _toks(F.col(text_col)).alias("__t")
    ).where(F.size("__t") >= 2)
    t = F.col("__t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i), F.element_at(t, i + 1)
        ),
    )
    ex = toked.select("id", F.explode(bigrams).alias("bg"))
    tf = ex.groupBy("id", "bg").agg(F.count("*").alias("tf"))
    if persist_registry is not None:
        tf = tf.persist()
        persist_registry.append(tf)
    bg_counts = tf.groupBy("bg").agg(F.sum("tf").alias("c_bg"))
    # context and unigram tables derive from the bigram table: c(w1) =
    # Σ_w2 c(w1 w2) over bigram STARTS, p_uni from bigram SECOND words
    # (the corpus positions 2..n — self-consistent with the events
    # actually scored; no second corpus scan)
    w1 = F.split(F.col("bg"), " ")[0]
    w2 = F.split(F.col("bg"), " ")[1]
    ctx = bg_counts.groupBy(w1.alias("w")).agg(F.sum("c_bg").alias("c_ctx"))
    uni = bg_counts.groupBy(w2.alias("w")).agg(F.sum("c_bg").alias("c_uni"))
    n_total = int(bg_counts.agg(F.sum("c_bg")).first()[0] or 0)
    lam = lam_num / lam_den
    lp = (
        bg_counts.withColumn("__w1", w1)
        .withColumn("__w2", w2)
        .join(ctx, F.col("__w1") == ctx["w"])
        .drop("w")
        .join(uni, F.col("__w2") == uni["w"])
        .select(
            "bg",
            F.round(
                F.log(
                    F.lit(lam)
                    * F.col("c_bg").cast("double")
                    / F.col("c_ctx").cast("double")
                    + F.lit(1.0 - lam)
                    * F.col("c_uni").cast("double")
                    / F.lit(float(n_total))
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    per_doc = (
        tf.join(lp, "bg")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("lp_micro")).alias("sum_lp_micro"),
        )
    )
    avg = (
        F.col("sum_lp_micro").cast("double")
        / F.lit(1e6)
        / F.col("n_bigrams").cast("double")
    )
    return per_doc.select(
        "id",
        "n_bigrams",
        "sum_lp_micro",
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("ppl_proxy"),
    )


def bigram_logprob_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    lam_num: int = 9,
    lam_den: int = 10,
) -> str:
    """DuckDB twin of :func:`bigram_logprob` — identical bigram events,
    interpolation arithmetic (same op order), quantization, sums."""
    toks = _toks_sql(text_col)
    lam = lam_num / lam_den
    return f"""
WITH toked AS (
  SELECT {id_col} AS id, {toks} AS t FROM {table}
  WHERE len({toks}) >= 2
),
ex AS (
  SELECT id, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bg
  FROM toked
),
tf AS (SELECT id, bg, count(*) AS tf FROM ex GROUP BY id, bg),
bgc AS (SELECT bg, sum(tf) AS c_bg FROM tf GROUP BY bg),
ctx AS (SELECT string_split(bg, ' ')[1] AS w, sum(c_bg) AS c_ctx
        FROM bgc GROUP BY 1),
uni AS (SELECT string_split(bg, ' ')[2] AS w, sum(c_bg) AS c_uni
        FROM bgc GROUP BY 1),
tot AS (SELECT CAST(sum(c_bg) AS DOUBLE) AS n FROM bgc),
lp AS (
  SELECT bg,
         CAST(round(ln({lam!r} * CAST(c_bg AS DOUBLE) / CAST(c_ctx AS DOUBLE)
                       + {1.0 - lam!r} * CAST(c_uni AS DOUBLE) / tot.n)
                    * 1e6, 0) AS BIGINT) AS lp_micro
  FROM bgc
  JOIN ctx ON string_split(bgc.bg, ' ')[1] = ctx.w
  JOIN uni ON string_split(bgc.bg, ' ')[2] = uni.w
  CROSS JOIN tot
),
per_doc AS (
  SELECT id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         CAST(sum(tf * lp_micro) AS BIGINT) AS sum_lp_micro
  FROM tf JOIN lp USING (bg) GROUP BY id
)
SELECT id, n_bigrams, sum_lp_micro,
       round(CAST(sum_lp_micro AS DOUBLE) / 1e6
             / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob,
       round(exp(-(CAST(sum_lp_micro AS DOUBLE) / 1e6
                   / CAST(n_bigrams AS DOUBLE))), 6) AS ppl_proxy
FROM per_doc
"""
