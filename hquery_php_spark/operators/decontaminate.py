"""Benchmark decontamination: drop training documents that overlap an
evaluation corpus.

The published recipe (word-n-gram collision against the benchmark set,
as used for GPT-3/PaLM-style training-data hygiene): a training document
is contaminated when it shares at least one n-gram of words with any
benchmark document.  13-grams are the literature default for web-scale
corpora; the driver query uses n=8 because its synthetic documents
average ~55 words.

Scale shape: the benchmark side is SMALL by nature (eval sets are
thousands of documents, not billions) — its distinct gram set is
broadcast, so the training corpus is ONE scan + explode + broadcast
hash semi-join; nothing n², no shuffle of the training side beyond the
per-doc aggregation.  Gram strings are the portable normalized form
(explicit whitespace class + ASCII case fold), so the match set is
engine-neutral and the whole operator has an exact SQL oracle
(``decontaminate_oracle_sql``).  At 10^12-doc scale, swap the gram
string for its ``portable_row_hash`` (8 bytes on the wire instead of
the gram text) — same semantics, same oracle via the hash twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import SQL as TSQL, word_ngrams

__all__ = ["ngram_decontaminate", "decontaminate_oracle_sql"]


def ngram_decontaminate(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    mode: str = "flag",
) -> DataFrame:
    """``mode='flag'``: (id, n_hits) for every CONTAMINATED training doc
    — n_hits = number of distinct benchmark n-grams it contains.
    ``mode='clean'``: the training rows with contaminated docs removed
    (broadcast anti-join on the flagged ids)."""
    bench_grams = (
        bench_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    train_grams = train_df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    flagged = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("n_hits"))
    )
    if mode == "flag":
        return flagged
    if mode == "clean":
        # flagged ids are corpus-proportional (contamination rate × rows):
        # plain anti-join, AQE broadcasts when the set is actually small.
        # Only bench_grams above is bounded (benchmark suites are fixed).
        return train_df.join(
            flagged.select(F.col("id").alias(id_col)),
            id_col,
            "left_anti",
        )
    raise ValueError(f"mode must be 'flag' or 'clean', got {mode!r}")


def decontaminate_oracle_sql(
    n: int = 8,
    table: str = "documents",
    bench_pred: str = "doc_id % 10 = 0",
) -> str:
    """DuckDB twin: identical normalization, identical gram strings,
    identical flag set."""
    grams = TSQL.word_ngrams("text", n)
    return f"""
WITH g AS (SELECT doc_id, {grams} AS grams FROM {table}),
bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE {bench_pred}),
train AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT ({bench_pred}))
SELECT doc_id AS id, count(DISTINCT gram) AS n_hits
FROM train JOIN bench USING (gram)
GROUP BY doc_id
"""
