"""Sentence segmentation — expression-level, engine-portable.

Corpus pipelines segment documents into sentences for dedup shingles,
quality stats (sentences/doc, mean sentence length), and training-time
chunk boundaries.  The splitting rule here is deliberately *portable*:
it must produce byte-identical results in Spark (Java regex) and the
DuckDB twin (RE2), and RE2 has no lookahead/lookbehind — so the rule is
a leftmost non-overlapping replace that both engines execute
identically:

    boundary = sentence-final punctuation [.!?] + one space + [A-Z]

A ``\\x1f`` (unit separator) marker is injected at each boundary with a
backreference replace, then the text splits on the marker.  Leftmost
non-overlapping semantics mean a single capital letter can be consumed
by the preceding match and not start its own boundary ("Hi. A. Ok."
still splits before "A" because scanning resumes *after* the replaced
segment, i.e. after the capital) — the corner case is a 1-character
sentence followed immediately by another boundary, where both engines
agree anyway because they share the same scan rule.  No abbreviation
list: RE2's lack of lookarounds makes a portable one impossible, and
the value-oracle contract (identical in both engines) wins over
linguistic nicety; swap in a smarter segmenter behind the same column
contract if needed.

Everything is a JVM expression tree: zero shuffles, whole-stage
codegen, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import norm_ws, SQL as TSQL

__all__ = ["sentences", "sentence_stats", "SegSQL"]

_MARK = "\x1f"
_BOUNDARY = "([.!?]) ([A-Z])"


def sentences(col: Column) -> Column:
    """array<string> of sentences (whitespace-normalized input)."""
    n = norm_ws(col)
    marked = F.regexp_replace(n, _BOUNDARY, "$1" + _MARK + "$2")
    return F.when(F.length(n) == 0, F.array().cast("array<string>")).otherwise(
        F.split(marked, _MARK)
    )


def sentence_stats(col: Column) -> Column:
    """struct(n_sent int, s_first, s_last, len_total bigint)."""
    s = sentences(col)
    return F.struct(
        F.size(s).cast("int").alias("n_sent"),
        F.try_element_at(s, F.lit(1)).alias("s_first"),
        F.try_element_at(s, F.lit(-1)).alias("s_last"),
        F.aggregate(
            s, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("len_total"),
    )


class SegSQL:
    """DuckDB twins (RE2 replace with \\1 backrefs, chr(31) marker)."""

    @staticmethod
    def sentences(col: str) -> str:
        n = TSQL.norm_ws(col)
        marked = (
            f"regexp_replace({n}, '{_BOUNDARY}', "
            f"'\\1' || chr(31) || '\\2', 'g')"
        )
        return (
            f"CASE WHEN length({n}) = 0 THEN []::VARCHAR[] "
            f"ELSE string_split({marked}, chr(31)) END"
        )

    @staticmethod
    def stats_fields(col: str) -> dict:
        s = SegSQL.sentences(col)
        return {
            "n_sent": f"CAST(len({s}) AS INT)",
            "s_first": f"({s})[1]",
            "s_last": f"({s})[-1]",
            # COALESCE: DuckDB list_sum([]) is NULL where Spark's
            # aggregate starts from 0; the CAST collapses list_sum's
            # HUGEINT back to Spark's BIGINT (the classify.py lesson)
            "len_total": (
                f"CAST(COALESCE(list_sum(list_transform({s}, "
                f"x -> length(x))), 0) AS BIGINT)"
            ),
        }
