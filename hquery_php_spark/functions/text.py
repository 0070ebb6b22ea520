"""Text-analysis column functions (training-data pipeline ops).

All JVM-side ``pyspark.sql.functions`` expressions — no Python UDFs in
these hot paths.  Each function has a DuckDB-SQL twin (same arithmetic,
not just "similar") so the driver's oracle comparison is exact:

* token counting (whitespace tokenizer)
* language-ID heuristic (stopword-marker counting via length arithmetic —
  deliberately regex-free so both engines compute bit-identical results)
* quality scoring (length / punctuation / stopword / repetition ratios)
* document fingerprinting (md5 of the normalized text)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "norm_ws",
    "token_count",
    "occurrence_count",
    "lang_id_en",
    "quality_score",
    "fingerprint",
    "SQL",
]


def norm_ws(col: Column) -> Column:
    """Whitespace-normalized text (collapse runs, trim)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def token_count(col: Column) -> Column:
    n = norm_ws(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.split(n, " "))
    )


def occurrence_count(col: Column, needle: str) -> Column:
    """# occurrences of ``needle`` via length arithmetic (dialect-free)."""
    ln = len(needle)
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(ln)
    ).cast("int")


_EN_MARKERS = (" the ", " and ", " of ", " to ", " is ")


def lang_id_en(col: Column, threshold: int = 1) -> Column:
    """'en' when enough English stopword markers occur, else 'unk'.

    The padded-spaces trick makes boundaries explicit without regex.
    """
    padded = F.concat(F.lit(" "), norm_ws(F.lower(col)), F.lit(" "))
    score = None
    for m in _EN_MARKERS:
        c = occurrence_count(padded, m)
        score = c if score is None else (score + c)
    return F.when(score >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristics; returns a struct of ratios.

    round(·, 6) keeps float formatting stable across engines.
    """
    n = norm_ws(col)
    length = F.length(n)
    toks = token_count(col)
    alpha = F.length(F.regexp_replace(n, r"[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(n, r"[^0-9]", ""))
    spaces = F.length(n) - F.length(F.replace(n, F.lit(" "), F.lit("")))
    punct = F.length(
        F.regexp_replace(n, r"[^!-/:-@\[-`{-~]", "")
    )  # ASCII punctuation classes
    padded = F.concat(F.lit(" "), F.lower(n), F.lit(" "))
    stop_hits = None
    for m in _EN_MARKERS:
        c = occurrence_count(padded, m)
        stop_hits = c if stop_hits is None else (stop_hits + c)
    avg_tok = F.when(toks > 0, F.round(length.cast("double") / toks, 6)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(length > 0, F.round(alpha.cast("double") / length, 6)).otherwise(F.lit(0.0))
    digit_ratio = F.when(length > 0, F.round(digits.cast("double") / length, 6)).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, F.round(punct.cast("double") / length, 6)).otherwise(F.lit(0.0))
    stopword_ratio = F.when(toks > 0, F.round(stop_hits.cast("double") / toks, 6)).otherwise(F.lit(0.0))
    return F.struct(
        length.alias("n_chars"),
        toks.alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        punct_ratio.alias("punct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        spaces.alias("n_spaces"),
    )


def fingerprint(col: Column) -> Column:
    """Stable document fingerprint: md5 of lowercase normalized text."""
    return F.md5(F.lower(norm_ws(col)))


class SQL:
    """DuckDB twins of the column functions above (exact arithmetic)."""

    @staticmethod
    def norm_ws(col: str) -> str:
        return f"trim(regexp_replace({col}, '\\s+', ' ', 'g'))"

    @staticmethod
    def token_count(col: str) -> str:
        n = SQL.norm_ws(col)
        return (
            f"CASE WHEN length({n}) = 0 THEN 0 "
            f"ELSE length({n}) - length(replace({n}, ' ', '')) + 1 END"
        )

    @staticmethod
    def occurrence_count(expr: str, needle: str) -> str:
        q = needle.replace("'", "''")
        return (
            f"CAST((length({expr}) - length(replace({expr}, '{q}', '')))"
            f" / {len(needle)} AS INT)"
        )

    @staticmethod
    def lang_id_en(col: str, threshold: int = 1) -> str:
        padded = f"(' ' || {SQL.norm_ws(f'lower({col})')} || ' ')"
        score = " + ".join(SQL.occurrence_count(padded, m) for m in _EN_MARKERS)
        return f"CASE WHEN ({score}) >= {threshold} THEN 'en' ELSE 'unk' END"

    @staticmethod
    def fingerprint(col: str) -> str:
        return f"md5(lower({SQL.norm_ws(col)}))"

    @staticmethod
    def quality_fields(col: str) -> dict:
        n = SQL.norm_ws(col)
        toks = SQL.token_count(col)
        return {
            "n_chars": f"length({n})",
            "n_tokens": toks,
            "avg_token_len": (
                f"CASE WHEN ({toks}) > 0 THEN "
                f"round(CAST(length({n}) AS DOUBLE) / ({toks}), 6) ELSE 0.0 END"
            ),
            "alpha_ratio": (
                f"CASE WHEN length({n}) > 0 THEN round(CAST("
                f"length(regexp_replace({n}, '[^a-zA-Z]', '', 'g')) AS DOUBLE)"
                f" / length({n}), 6) ELSE 0.0 END"
            ),
            "digit_ratio": (
                f"CASE WHEN length({n}) > 0 THEN round(CAST("
                f"length(regexp_replace({n}, '[^0-9]', '', 'g')) AS DOUBLE)"
                f" / length({n}), 6) ELSE 0.0 END"
            ),
            "punct_ratio": (
                f"CASE WHEN length({n}) > 0 THEN round(CAST("
                f"length(regexp_replace({n}, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)"
                f" / length({n}), 6) ELSE 0.0 END"
            ),
            "stopword_ratio": SQL._stopword_ratio(col),
            "n_spaces": f"length({n}) - length(replace({n}, ' ', ''))",
        }

    @staticmethod
    def _stopword_ratio(col: str) -> str:
        n = SQL.norm_ws(col)
        toks = SQL.token_count(col)
        padded = f"(' ' || lower({n}) || ' ')"
        hits = " + ".join(SQL.occurrence_count(padded, m) for m in _EN_MARKERS)
        return (
            f"CASE WHEN ({toks}) > 0 THEN "
            f"round(CAST(({hits}) AS DOUBLE) / ({toks}), 6) ELSE 0.0 END"
        )
