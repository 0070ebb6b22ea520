"""Model-based quality filtering: a hashed linear (fastText-shaped)
document classifier as a pure Spark expression tree.

The standard model-based quality gate (CCNet / GPT-3 / LLaMA data
recipes) is a linear classifier over hashed bag-of-words features: each
token hashes into one of ``n_buckets`` weight slots, the document score
is the sum (or mean) of its tokens' weights, and documents under a
threshold are dropped.  This module implements exactly that shape:

* tokens come from the engine-neutral normalization (explicit
  whitespace class + ASCII case fold — the portable-hash family rules);
* the bucket is the portable polynomial token hash mod ``n_buckets``;
* weights are INTEGER micro-units (±1000) derived affinely from the
  bucket id — a deterministic stand-in with the same arithmetic shape a
  trained weight table has.  Swapping in trained weights is a broadcast
  join of a (bucket, w_micro) dim table against the exploded tokens;
  the scoring, thresholding, and oracle story are unchanged;
* the document score is an exact INTEGER sum — order-independent on any
  engine, partitioning, or cluster size, so the classifier has a
  bit-exact ANSI-SQL twin (no float summation drift, no libm sigmoid
  divergence: the keep decision compares score_micro ≥ threshold_micro
  · n_tokens, which is the same decision sigmoid(mean) ≥ σ(t) makes,
  in integers).

Zero shuffles: the whole classifier is a per-row expression, so Catalyst
keeps it inside the scan projection and the only cost is CPU.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import _LOWERC, _UPPER, norm_ws
from .text import SQL as TSQL

__all__ = ["hashed_linear_score", "hashed_linear_score_sql"]

_MOD = 1_000_000_007
_BASE = 31
_REMIX_A = 0x6B8B4567 | 1
_REMIX_B = 0x327B23C6
# weight range: ±1000 micro-units per token
_W_SPAN = 2001


def _token_weight(tok: Column, n_buckets: int) -> Column:
    """Integer micro-weight of one token: polynomial char fold →
    bucket → affine remix → centered residue in [-1000, 1000]."""
    fold = F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * _BASE + F.ascii(ch), F.lit(_MOD)),
    )
    bucket = F.pmod(fold, F.lit(n_buckets))
    return F.pmod(bucket * _REMIX_A + _REMIX_B, F.lit(_MOD)) % _W_SPAN - (
        _W_SPAN // 2
    )


def hashed_linear_score(
    col: Column,
    n_buckets: int = 1 << 18,
    threshold_micro: int = 0,
) -> Column:
    """Struct(n_tokens, score_micro, keep) — the hashed-linear quality
    score of the document.

    ``keep`` = 1 iff mean token weight ≥ ``threshold_micro`` micro-units,
    decided as the integer comparison score_micro ≥ threshold_micro ·
    n_tokens (no division, no floats; empty documents score 0 and are
    kept iff threshold ≤ 0)."""
    n = F.translate(norm_ws(col), _UPPER, _LOWERC)
    toks = F.split(n, " ")
    n_tok = F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(toks))
    score = F.when(F.length(n) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + _token_weight(t, n_buckets),
        )
    )
    keep = (score >= F.lit(threshold_micro) * n_tok).cast("int")
    return F.struct(
        n_tok.alias("n_tokens"),
        score.alias("score_micro"),
        keep.alias("keep"),
    )


def hashed_linear_score_sql(
    col: str,
    n_buckets: int = 1 << 18,
    threshold_micro: int = 0,
) -> dict:
    """DuckDB twins of the three struct fields — identical integer
    arithmetic, identical decisions."""
    n = f"translate({TSQL.norm_ws(col)}, '{_UPPER}', '{_LOWERC}')"
    toks = f"string_split({n}, ' ')"
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(t[i + 1 : i + 1]) AS BIGINT) for i in range(0, length(t))]), "
        f"(acc, c) -> (acc * {_BASE} + c) % {_MOD})"
    )
    w = (
        f"(((({fold}) % {n_buckets}) * {_REMIX_A} + {_REMIX_B}) % {_MOD}) "
        f"% {_W_SPAN} - {_W_SPAN // 2}"
    )
    # CASTs pin the twin's pandas dtypes to Spark's: DuckDB len() is
    # BIGINT where Spark size() is INT, and list_sum over BIGINT returns
    # HUGEINT (→ float64 via pandas) where Spark's aggregate stays BIGINT
    # — without them the driver's dtype-exact value hash diverges even
    # though every value is numerically identical (r3's one red row).
    n_tok = f"CAST(CASE WHEN length({n}) = 0 THEN 0 ELSE len({toks}) END AS INT)"
    score = (
        f"CAST(CASE WHEN length({n}) = 0 THEN 0 "
        f"ELSE list_sum([{w} for t in {toks}]) END AS BIGINT)"
    )
    keep = (
        f"CASE WHEN ({score}) >= {threshold_micro} * ({n_tok}) "
        f"THEN 1 ELSE 0 END"
    )
    return {"n_tokens": n_tok, "score_micro": score, "keep": keep}
