"""Distributed TRAINING of the hashed-linear quality classifier.

``functions/classify.py`` scores documents with a hashed linear model
(the CCNet / GPT-3 / LLaMA quality-gate shape) but its weight table is
a deterministic stand-in.  This module closes the loop: it TRAINS an
integer weight table from labeled documents — weak labels are fine and
are what production recipes use (label "good" = looks like a curated
reference corpus; here the driver row uses the already-exact Gopher
pass flag) — as a batch perceptron, the one linear-classifier training
rule that is EXACT in integer arithmetic:

    epoch:  score(d)  = Σ_tokens w[bucket(tok)] + w_bias
            pred(d)   = [score ≥ 0]
            Δw[b]     = lr · Σ_{d misclassified} (2·y_d − 1) · x_d[b]

No sigmoid, no float gradient — every update is a sum of integers, so
the whole training run is order-independent and reproduces bit-for-bit
on any engine, partitioning, or cluster size, and an unrolled-CTE
DuckDB twin (``perceptron_oracle_sql``) replays it exactly — the
``pagerank_fixed_point`` discipline applied to model fitting.

Scale shape (the 100 TB story)
------------------------------
The hashed feature rows (doc, bucket, count) are built ONCE — one
explode + partial-agg shuffle — and persisted; every epoch after that
is map-side work: the current weights ride into the executors as an
ARRAY LITERAL (n_buckets + 1 ints, parameter-sized, same pattern as
semantic.py's centroids and pq.py's codebooks), scoring is one
groupBy(doc) partial agg, and the epoch's weight delta is one
groupBy(bucket) partial agg whose ≤ n_buckets + 1 rows are the only
thing the driver ever collects.  Per epoch: 2 vocab-bounded shuffles,
zero corpus rescans.  At fastText-scale n_buckets (2^18+) the array
literal becomes a broadcast (bucket, w) dim join — the swap
``classify.py``'s docstring already promises — with identical values.

Inference with the trained table is ``score_with_weights`` — the same
zero-shuffle expression tree as ``hashed_linear_score``, with the
trained array in place of the affine stand-in.

Reference parity note: the reference engine (duzun/hQuery.php) has no
classifier training — beyond-reference LLM-pipeline surface, same tier
as dedup.py / dsir.py / bpe.py.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.classify import _BASE, _MOD
from ..functions.text import _LOWERC, _UPPER, norm_ws
from ..functions.text import SQL as TSQL

__all__ = [
    "token_bucket_counts",
    "train_perceptron",
    "score_with_weights",
    "calibrate_keep_threshold",
    "perceptron_oracle_sql",
]


def _norm_tokens(col: Column) -> Column:
    n = F.translate(norm_ws(col), _UPPER, _LOWERC)
    return F.when(F.length(n) == 0, F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def _bucket_expr(tok: Column, n_buckets: int) -> Column:
    fold = F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * _BASE + F.ascii(ch), F.lit(_MOD)),
    )
    return F.pmod(fold, F.lit(n_buckets))


def token_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, label, bucket, cnt) hashed bag-of-words feature rows — the
    classifier's exact token normalization and polynomial bucket hash
    (classify.py's family), one explode + partial-agg shuffle.  Built
    once per training run and persisted; the per-epoch work never
    touches the corpus again."""
    toks = _norm_tokens(F.col(text_col))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("int").alias("label"),
            F.explode(toks).alias("tok"),
        )
        .select("id", "label", _bucket_expr(F.col("tok"), n_buckets).alias("b"))
        .groupBy("id", "label", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_perceptron(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    epochs: int = 3,
    lr: int = 1,
) -> List[int]:
    """Batch-perceptron weights after ``epochs`` integer rounds; returns
    ``n_buckets + 1`` ints (index ``n_buckets`` is the bias).  Weights
    start at zero — epoch 1 therefore predicts everything positive and
    the first delta is the negative class's feature mass, exactly as the
    twin replays it."""
    feats = token_bucket_counts(
        df, text_col=text_col, id_col=id_col, label_col=label_col,
        n_buckets=n_buckets,
    ).persist()
    try:
        w = [0] * (n_buckets + 1)
        for _ in range(epochs):
            w_arr = F.array(*[F.lit(int(x)).cast("long") for x in w[:-1]])
            scores = feats.groupBy("id", "label").agg(
                (F.sum(F.element_at(w_arr, F.col("b").cast("int") + 1)
                       * F.col("cnt")) + F.lit(int(w[-1]))).alias("score")
            )
            mis = scores.where(
                (F.col("score") >= 0).cast("int") != F.col("label")
            ).select("id", (F.col("label") * 2 - 1).cast("long").alias("dir"))
            # ONE job per epoch: bucket deltas and the bias delta (a
            # synthetic b = n_buckets row per misclassified doc) share
            # the same partial agg and the same ≤ n_buckets + 1 collect
            deltas = (
                feats.join(mis, "id")
                .select(
                    F.col("b").cast("long").alias("b"),
                    (F.col("dir") * F.col("cnt")).alias("d"),
                )
                .unionByName(
                    mis.select(
                        F.lit(n_buckets).cast("long").alias("b"),
                        F.col("dir").alias("d"),
                    )
                )
                .groupBy("b")
                .agg(F.sum("d").alias("d"))
                .collect()
            )
            for r in deltas:
                w[int(r["b"])] += lr * int(r["d"])
        return w
    finally:
        feats.unpersist()


def score_with_weights(
    col: Column, weights: List[int], n_buckets: int
) -> Column:
    """Struct(n_tokens, score_micro, keep) with the TRAINED weight
    table — the same zero-shuffle expression shape as
    ``hashed_linear_score``; ``keep`` is the perceptron decision
    score ≥ 0."""
    w_arr = F.array(*[F.lit(int(x)).cast("long") for x in weights[:-1]])
    toks = _norm_tokens(col)
    n_tok = F.size(toks)
    score = F.aggregate(
        toks,
        F.lit(int(weights[-1])).cast("long"),
        lambda acc, t: acc
        + F.element_at(w_arr, _bucket_expr(t, n_buckets).cast("int") + 1),
    )
    return F.struct(
        n_tok.alias("n_tokens"),
        score.alias("score_micro"),
        (score >= 0).cast("int").alias("keep"),
    )


def calibrate_keep_threshold(
    scored: DataFrame,
    keep_pct: int,
    score_col: str = "score_micro",
    bin_width: int = 100,
) -> int:
    """Integer score threshold keeping ≈ ``keep_pct`` percent of the
    corpus — production quality gates are tuned to a keep RATE ("drop
    the worst 30%"), not a raw score.  Composes the trained scores with
    the engine-exact binned-quantile sketch (sketches.binned_quantiles:
    one (group, bin) partial-agg shuffle, state independent of corpus
    size), so the calibrated threshold is deterministic on any engine
    or cluster and off by at most ``bin_width`` micro-units (the
    histogram trade).  Keep decision: score ≥ threshold.  Returns the
    threshold; at least ``keep_pct``% of rows score ≥ it (guaranteed by
    the sketch's lower-edge convention), pinned in tests."""
    from .sketches import binned_quantiles

    p = 100 - max(0, min(100, keep_pct))
    if p == 0:
        row = scored.agg(F.min(F.col(score_col).cast("long"))).collect()
        if row[0][0] is None:
            raise ValueError("calibrate_keep_threshold: no scored rows")
        return int(row[0][0])
    out = binned_quantiles(
        scored.select(F.lit("all").alias("g"), F.col(score_col)),
        value_col=score_col,
        group_col="g",
        bin_width=bin_width,
        qs=(p,),
    ).collect()
    if not out:
        raise ValueError("calibrate_keep_threshold: no scored rows")
    return int(out[0][f"p{p}"])


def _sql_bucket(n_buckets: int) -> str:
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(t[i + 1 : i + 1]) AS BIGINT) "
        f"for i in range(0, length(t))]), "
        f"(acc, c) -> (acc * {_BASE} + c) % {_MOD})"
    )
    return f"(({fold}) % {n_buckets})"


def perceptron_oracle_sql(
    label_expr: str,
    n_buckets: int = 64,
    epochs: int = 3,
    lr: int = 1,
    table: str = "documents",
    text_col: str = "text",
) -> Tuple[str, str]:
    """DuckDB twin: (weights_sql, preds_sql).

    ``weights_sql`` yields (b BIGINT, w BIGINT) for all n_buckets + 1
    slots (bias at b = n_buckets) after the unrolled epochs;
    ``preds_sql`` yields (doc_id VARCHAR, n_tokens INT, score_micro
    BIGINT, keep INT) under the final weights.  ``label_expr`` is any
    integer 0/1 expression over ``table``'s columns (the driver row
    passes the Gopher pass flag).  All multi-referenced CTEs are
    MATERIALIZED (the bpe/pagerank chain discipline)."""
    n = f"translate({TSQL.norm_ws(text_col)}, '{_UPPER}', '{_LOWERC}')"
    toks = f"string_split({n}, ' ')"
    bias = n_buckets
    ctes = [
        # feature rows: one per (doc, bucket) with counts; empty docs
        # contribute no rows (token list is empty after the CASE)
        # SELECT * pass-throughs keep every base column visible to
        # label_expr (it may reference any column of the table)
        f"f AS MATERIALIZED ("
        f"SELECT CAST(doc_id AS VARCHAR) AS id, "
        f"CAST({label_expr} AS INT) AS label, b, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM ("
        f"SELECT *, {_sql_bucket(n_buckets)} AS b "
        f"FROM (SELECT *, unnest("
        f"CASE WHEN length({n}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE {toks} END) AS t "
        f"FROM {table})) GROUP BY 1, 2, 3)",
        f"w0 AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS b, "
        f"CAST(0 AS BIGINT) AS w "
        f"FROM unnest(generate_series(0, {bias})) AS t(i))",
    ]
    for e in range(epochs):
        ctes.append(
            f"s{e} AS MATERIALIZED ("
            f"SELECT f.id, f.label, "
            f"sum(f.cnt * w{e}.w) + (SELECT w FROM w{e} WHERE b = {bias})"
            f" AS score "
            f"FROM f JOIN w{e} ON f.b = w{e}.b GROUP BY f.id, f.label)"
        )
        ctes.append(
            f"m{e} AS MATERIALIZED ("
            f"SELECT id, CAST(label * 2 - 1 AS BIGINT) AS dir FROM s{e} "
            f"WHERE (CASE WHEN score >= 0 THEN 1 ELSE 0 END) != label)"
        )
        # CAST every summed quantity back to BIGINT: DuckDB sum() over
        # BIGINT returns HUGEINT (→ float64 via pandas) where Spark
        # stays BIGINT — the r3 quality_classifier lesson
        ctes.append(
            f"d{e} AS MATERIALIZED ("
            f"SELECT f.b, CAST(sum(m{e}.dir * f.cnt) AS BIGINT) AS d "
            f"FROM f JOIN m{e} ON f.id = m{e}.id GROUP BY f.b "
            f"UNION ALL SELECT {bias}, "
            f"CAST(coalesce(sum(dir), 0) AS BIGINT) FROM m{e})"
        )
        ctes.append(
            f"w{e + 1} AS MATERIALIZED ("
            f"SELECT w{e}.b, CAST(w{e}.w + {lr} * coalesce(d{e}.d, 0) "
            f"AS BIGINT) AS w FROM w{e} LEFT JOIN d{e} ON w{e}.b = d{e}.b)"
        )
    wsql = f"SELECT b, w FROM w{epochs}"
    psql = (
        "WITH " + ",\n".join(ctes) + ",\n"
        f"nt AS (SELECT CAST(doc_id AS VARCHAR) AS id, "
        f"CAST(CASE WHEN length({n}) = 0 THEN 0 ELSE len({toks}) END AS INT)"
        f" AS n_tokens FROM {table}),\n"
        f"sc AS (SELECT nt.id, nt.n_tokens, "
        f"coalesce(s.s, 0) + (SELECT w FROM w{epochs} WHERE b = {bias})"
        f" AS score_micro FROM nt LEFT JOIN ("
        f"SELECT f.id, sum(f.cnt * w{epochs}.w) AS s "
        f"FROM f JOIN w{epochs} ON f.b = w{epochs}.b GROUP BY f.id) s "
        f"ON nt.id = s.id)\n"
        "SELECT id AS doc_id, n_tokens, CAST(score_micro AS BIGINT) AS "
        "score_micro, CAST(CASE WHEN score_micro >= 0 THEN 1 ELSE 0 END "
        "AS INT) AS keep FROM sc"
    )
    return ("WITH " + ",\n".join(ctes) + "\n" + wsql, psql)
