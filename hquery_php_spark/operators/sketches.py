"""Probabilistic sketches with engine-exact, value-checkable math.

At corpus scale the exact answers ("how often does each of 10⁹ tokens
occur", "how many distinct tokens per source") cost a full shuffle of
the token stream; sketches bound the state to kilobytes per partition
and merge associatively — the shape that survives 100 TB.  Two classic
sketches, built so the VALUES are reproducible cross-engine (the repo's
oracle discipline), not just statistically similar:

* Count-Min (Cormode & Muthukrishnan 2005): d hash rows × w counters;
  point estimate = min over rows of the addressed counter.  Counters
  are exact integer sums of a deterministic hash family — the sketch a
  DuckDB twin computes is bit-identical.
* HyperLogLog register math (Flajolet et al. 2007): per-bucket max of
  leading-zero ranks.  The harmonic-mean step is the one float in HLL —
  computed here EXACTLY as the integer S = Σ_j 2^(64−M_j) (ranks ≤ 64,
  so each term is an exact power of two and int64-safe for m ≤ 2^9
  buckets of rank ≥ 55... practically: S < m·2^63 needs care, so ranks
  are capped and S is assembled as DOUBLE from exact powers — every
  term is exactly representable and the summation order is fixed by
  bucket id on both engines).  The final α·m²/S division is one double
  op, identical everywhere.

Both use the portable polynomial token fold (the classify/text family)
so Spark, DuckDB, or any ANSI engine address the same cells.

Scale shape: one partial-agg shuffle whose key space is the SKETCH
(d·w cells / m buckets), not the token vocabulary — the reducer state
is O(sketch), the classic reason to sketch at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _LOWERC, _UPPER, norm_ws

__all__ = [
    "token_fold",
    "cms_estimates",
    "cms_estimates_oracle_sql",
    "hll_distinct",
    "hll_distinct_oracle_sql",
    "bloom_positions",
    "bloom_build",
    "bloom_screen",
    "bloom_screen_oracle_sql",
    "binned_quantiles",
    "binned_quantiles_oracle_sql",
]

_MOD = 1_000_000_007
_BASE = 31
# affine row family for CMS (same LCG scheme as dedup._affine_consts,
# distinct seed so CMS rows never alias the minhash permutations)
_CMS_SEED = 0x3A7F


def _cms_consts(d: int, seed: int = _CMS_SEED) -> tuple:
    a, b, x = [], [], seed
    for _ in range(d):
        x = (1103515245 * x + 12345) % (1 << 31)
        a.append(x | 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b.append(x)
    return a, b


def token_fold(tok):
    """Portable polynomial fold of one token (the classify family):
    h = (h·31 + code) mod M over characters."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * _BASE + F.ascii(ch), F.lit(_MOD)),
    )


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    n = F.translate(norm_ws(F.col(text_col)), _UPPER, _LOWERC)
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.split(n, " ")).alias("tok")
    ).where(F.length("tok") > 0)


def cms_estimates(
    df: DataFrame,
    probes: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-Min point estimates for ``probes`` (a literal token list):
    (token, est, exact) with the guarantee est ≥ exact (one-sided
    error).  ``exact`` is carried for the driver check and the
    guarantee assertion; a production use keeps only the sketch.

    ONE aggregation pass builds the sketch: tokens → (row, col) cells →
    partial-agg counts (reducer keys = d·w cells, independent of
    vocabulary size).  Probe lookup is a driver-side map over ≤|probes|
    collected cells — parameter-sized, like a learned-dim lookup."""
    a_c, b_c = _cms_consts(d)
    toks = _tokens(df, text_col, id_col)
    fold = token_fold(F.col("tok"))
    cells = toks.select(
        F.col("tok"),
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.pmod(fold * F.lit(a_c[r]) + F.lit(b_c[r]), F.lit(_MOD)),
                        F.lit(w),
                    )
                    for r in range(d)
                ]
            )
        ).alias("row", "col"),
    )
    sketch = cells.groupBy("row", "col").agg(F.count("*").alias("n"))
    # probe addressing is pure Python over the same family
    def addr(tok: str) -> list:
        h = 0
        for ch in tok:
            h = (h * _BASE + ord(ch)) % _MOD
        return [((h * a_c[r] + b_c[r]) % _MOD) % w for r in range(d)]

    wanted = {f"{r},{c}" for t in probes for r, c in enumerate(addr(t))}
    cell_map = {
        (r["row"], r["col"]): r["n"]
        for r in sketch.where(
            F.concat_ws(",", "row", "col").isin(sorted(wanted))
        ).collect()
    }
    est = {
        t: min(cell_map.get((r, c), 0) for r, c in enumerate(addr(t)))
        for t in probes
    }
    exact = {
        r["tok"]: r["n"]
        for r in toks.where(F.col("tok").isin(list(probes)))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    spark = df.sparkSession
    return spark.createDataFrame(
        [(t, int(est[t]), int(exact.get(t, 0))) for t in sorted(probes)],
        "token string, est long, exact long",
    )


def cms_estimates_oracle_sql(
    probes: list,
    table: str = "documents",
    text_col: str = "text",
    d: int = 4,
    w: int = 1024,
) -> str:
    """DuckDB twin: the identical cells, counters, and min-over-rows
    estimates, fully in SQL."""
    from ..functions.text import SQL as TSQL

    a_c, b_c = _cms_consts(d)
    n = f"translate({TSQL.norm_ws(text_col)}, '{_UPPER}', '{_LOWERC}')"

    def fold(col: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[CAST(ascii({col}[i + 1 : i + 1]) AS BIGINT) "
            f"for i in range(0, length({col}))]), "
            f"(acc, c) -> (acc * {_BASE} + c) % {_MOD})"
        )

    def rows_addr(col: str) -> str:
        return ", ".join(
            f"((({fold(col)}) * {a_c[r]} + {b_c[r]}) % {_MOD}) % {w}"
            for r in range(d)
        )

    probe_vals = ", ".join("('" + t.replace("'", "''") + "')" for t in sorted(probes))
    return f"""
WITH toks AS (
  SELECT tok FROM (
    SELECT unnest(string_split({n}, ' ')) AS tok FROM {table}
  ) WHERE length(tok) > 0
),
cells AS (
  SELECT u.r AS row, [{rows_addr('tok')}][u.r + 1] AS col
  FROM toks, (SELECT unnest(range(0, {d})) AS r) u
),
sketch AS (SELECT row, col, count(*) AS n FROM cells GROUP BY row, col),
probes(token) AS (VALUES {probe_vals}),
paddr AS (
  SELECT token, u.r AS row,
         [{rows_addr('token')}][u.r + 1] AS col
  FROM probes, (SELECT unnest(range(0, {d})) AS r) u
),
est AS (
  SELECT p.token, min(coalesce(s.n, 0)) AS est
  FROM paddr p LEFT JOIN sketch s ON p.row = s.row AND p.col = s.col
  GROUP BY p.token
),
exact AS (
  SELECT tok AS token, count(*) AS n FROM toks
  WHERE tok IN (SELECT token FROM probes) GROUP BY tok
)
SELECT e.token, CAST(e.est AS BIGINT) AS est,
       CAST(coalesce(x.n, 0) AS BIGINT) AS exact
FROM est e LEFT JOIN exact x ON e.token = x.token
"""


def hll_distinct(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    p: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog distinct-token estimate with EXACT register
    math: (group, est, exact_distinct).

    m = 2^p buckets; bucket = fold mod m; rank = 1 + leading zeros of
    the remaining hash bits (a second affine remix spreads the fold to
    [0, 2^32)); registers M_j = max rank per bucket (one partial-agg
    shuffle with m keys per group).  The harmonic sum Σ 2^(−M_j) is
    assembled from EXACT powers of two (every 2^(−r) for r ≤ 64 is an
    exact double; summation order is fixed by bucket id), so the final
    raw estimate α·m²/S is the same double everywhere.  Bias
    corrections (linear counting, large-range) are the standard ones,
    applied identically in the SQL twin.  ``exact_distinct`` is carried
    for the driver check; production keeps only the m-byte registers."""
    m = 1 << p
    toks = _tokens(df, text_col, id_col).join(
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("g")),
        "id",
    )
    fold = token_fold(F.col("tok"))
    # spread to 32 bits: (a·h + b) mod M, then mod 2^32 is biased by M;
    # instead use the fold directly for the bucket and the remix for
    # rank bits — both < M < 2^31, rank counts leading zeros of a
    # 31-bit value (rank ≤ 32 after the +1)
    a, b = 0x6B8B4567 | 1, 0x327B23C6
    remix = F.pmod(fold * F.lit(a) + F.lit(b), F.lit(_MOD))
    bucket = F.pmod(fold, F.lit(m))
    # rank = 31 - floor(log2(remix)) for remix ≥ 1; remix = 0 → rank 32.
    # floor(log2) via length of the binary string — integer-exact, no libm.
    rank = F.when(remix == 0, F.lit(32)).otherwise(
        F.lit(32) - F.length(F.conv(remix.cast("string"), 10, 2))
    )
    regs = (
        toks.select(F.col("g"), bucket.alias("j"), rank.alias("r"))
        .groupBy("g", "j")
        .agg(F.max("r").alias("M"))
    )
    # exact Σ 2^(-M_j) + zero-bucket count, order fixed by j
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sums = regs.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("S_nz"),
        F.count("*").alias("nz"),
    )
    est_raw = F.lit(alpha * m * m) / (
        F.col("S_nz") + (F.lit(m) - F.col("nz"))  # empty buckets add 2^0
    )
    zeros = F.lit(m) - F.col("nz")
    # linear counting below the standard 2.5m threshold when zeros exist
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(est_raw)
    exact = (
        toks.groupBy("g")
        .agg(F.countDistinct("tok").alias("exact_distinct"))
    )
    return (
        sums.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            F.round(est, 4).alias("est"),
            F.col("exact_distinct"),
        )
    )


def hll_distinct_oracle_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    p: int = 8,
) -> str:
    """DuckDB twin: identical buckets, ranks, register maxima, exact
    power-of-two harmonic sum, and bias corrections."""
    from ..functions.text import SQL as TSQL

    m = 1 << p
    a, b = 0x6B8B4567 | 1, 0x327B23C6
    n = f"translate({TSQL.norm_ws(text_col)}, '{_UPPER}', '{_LOWERC}')"
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "[CAST(ascii(tok[i + 1 : i + 1]) AS BIGINT) for i in range(0, length(tok))]), "
        f"(acc, c) -> (acc * {_BASE} + c) % {_MOD})"
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # rank via binary-string length (DuckDB bin()) — same integer trick
    return f"""
WITH toks AS (
  SELECT g, tok FROM (
    SELECT {group_col} AS g, unnest(string_split({n}, ' ')) AS tok
    FROM {table}
  ) WHERE length(tok) > 0
),
h AS (
  SELECT g, ({fold}) % {m} AS j,
         CASE WHEN (({fold}) * {a} + {b}) % {_MOD} = 0 THEN 32
              ELSE 32 - length(bin((({fold}) * {a} + {b}) % {_MOD})) END AS r
  FROM toks
),
regs AS (SELECT g, j, max(r) AS M FROM h GROUP BY g, j),
sums AS (
  SELECT g, sum(power(2.0, -M)) AS S_nz, count(*) AS nz
  FROM regs GROUP BY g
),
est AS (
  SELECT g, nz,
         CAST({alpha * m * m!r} AS DOUBLE) / (S_nz + ({m} - nz)) AS est_raw
  FROM sums
),
fixed AS (
  SELECT g,
         CASE WHEN est_raw <= {2.5 * m} AND ({m} - nz) > 0
              THEN {float(m)} * ln({float(m)} / CAST({m} - nz AS DOUBLE))
              ELSE est_raw END AS est
  FROM est
),
exact AS (SELECT g, count(DISTINCT tok) AS exact_distinct FROM toks GROUP BY g)
SELECT f.g AS {group_col}, round(f.est, 4) AS est, x.exact_distinct
FROM fixed f JOIN exact x ON f.g = x.g
"""


# ---------------------------------------------------------------- #
# Bloom-filter membership ledger


def _bloom_consts(kh: int, seed: int = 0x1F2B) -> tuple:
    a, b, x = [], [], seed
    for _ in range(kh):
        x = (1103515245 * x + 12345) % (1 << 31)
        a.append(x | 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b.append(x)
    return a, b


def bloom_positions(col, m_bits: int = 1 << 16, kh: int = 5):
    """array<int> of the kh Bloom bit positions of a fingerprint string
    — deterministic affine family over the portable fold, so any engine
    addresses the same bits."""
    a_c, b_c = _bloom_consts(kh)
    fold = token_fold(col)
    return F.array(
        *[
            F.pmod(
                F.pmod(fold * F.lit(a_c[r]) + F.lit(b_c[r]), F.lit(_MOD)),
                F.lit(m_bits),
            )
            for r in range(kh)
        ]
    )


def bloom_build(
    df: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 16,
    kh: int = 5,
) -> DataFrame:
    """The set-bit table of a Bloom filter over the corpus's document
    fingerprints: (pos) distinct rows.  Semantically identical to the
    m-bit array (a row ↔ a set bit) but stays a first-class DataFrame —
    compact (≤ m rows regardless of corpus size), mergeable by UNION,
    broadcastable to probes.  At rest, pack to the literal bitmap."""
    from ..functions.text import fingerprint

    fp = fingerprint(F.col(text_col))
    return (
        df.select(F.explode(bloom_positions(fp, m_bits, kh)).alias("pos"))
        .distinct()
    )


def bloom_screen(
    batch: DataFrame,
    bits: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    kh: int = 5,
) -> DataFrame:
    """Definitely-new batch ids: a doc survives iff at least one of its
    kh bit positions is NOT set in the ledger.  NO FALSE NEGATIVES —
    every exactly-ledgered document always drops (all its bits are set);
    false positives (new docs dropped) occur at the classic
    (1−e^(−kn/m))^k rate, the price of an m-bit ledger.

    Shape: batch → kh position rows per doc (ids only) → LEFT ANTI join
    against the ≤m-row bit table (broadcastable) → any surviving
    position keeps the doc."""
    from ..functions.text import fingerprint

    fp = fingerprint(F.col(text_col))
    ex = batch.select(
        F.col(id_col).alias("id"),
        F.explode(bloom_positions(fp, m_bits, kh)).alias("pos"),
    )
    return (
        ex.join(bits.select("pos"), "pos", "left_anti")
        .select("id")
        .distinct()
    )


def bloom_screen_oracle_sql(
    batch_sql: str,
    ledger_sql: str,
    m_bits: int = 1 << 16,
    kh: int = 5,
) -> str:
    """DuckDB twin: identical folds, bit positions, and survivors.
    Subqueries yield (doc_id, text)."""
    from ..functions.text import SQL as TSQL

    a_c, b_c = _bloom_consts(kh)

    def fold(col: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[CAST(ascii({col}[i + 1 : i + 1]) AS BIGINT) "
            f"for i in range(0, length({col}))]), "
            f"(acc, c) -> (acc * {_BASE} + c) % {_MOD})"
        )

    poss = ", ".join(
        f"((({fold('fp')}) * {a_c[r]} + {b_c[r]}) % {_MOD}) % {m_bits}"
        for r in range(kh)
    )
    fp = TSQL.fingerprint("text")
    return f"""
WITH lfp AS (SELECT {fp} AS fp FROM ({ledger_sql})),
bits AS (SELECT DISTINCT unnest([{poss}]) AS pos FROM lfp),
bfp AS (SELECT doc_id AS id, {fp} AS fp FROM ({batch_sql})),
bpos AS (SELECT id, unnest([{poss}]) AS pos FROM bfp)
SELECT DISTINCT id FROM bpos ANTI JOIN bits ON bpos.pos = bits.pos
"""


# ---------------------------------------------------------------- #
# Binned quantiles (portable percentile sketch)


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
    bin_width: int = 100,
    qs: tuple = (50, 90, 99),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width histogram —
    the engine-exact alternative to ``approx_percentile`` (whose
    sketch values are implementation-specific and NOT reproducible
    across engines or releases).  State per group = occupied bins,
    merged by addition: the percentile sketch that survives both
    scale and the value-oracle discipline.

    Estimate convention: q_p = lower edge of the first bin whose
    cumulative count reaches ceil(total·p/100) (integer threshold
    arithmetic).  Error is bounded by bin_width, the classic
    histogram trade: more bins = tighter answers, same shape.

    Shape: ONE partial-agg shuffle keyed by (group, bin) — reducer
    state is the histogram, independent of row count — then a window
    cumsum over each group's (tiny) bin list."""
    from pyspark.sql import Window

    # FLOOR division on both engines (DuckDB's // TRUNCATES toward zero
    # for negatives — verified -150 // 100 = -1 — so the twin uses an
    # explicit pmod-style floor, _fdiv, and Spark floors here): a
    # negative value_col bins identically on both sides (-150 → bin -2).
    b = F.floor(F.col(value_col).cast("long") / F.lit(bin_width)).cast("long")
    counts = (
        df.select(F.col(group_col).alias("g"), b.alias("b"))
        .groupBy("g", "b")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("g").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("g"))
    )
    aggs = []
    for p in qs:
        # integer ceil: floor((total*p+99)/100) — kept in integer space so
        # the threshold matches the twin's // for any total (no double
        # rounding at the 2^53 boundary a 100-TB total could reach)
        thr = F.floor((F.col("total") * p + 99) / 100).cast("long")
        aggs.append(
            F.min(
                F.when(F.col("cum") >= thr, F.col("b") * bin_width)
            ).alias(f"p{p}")
        )
    return cum.groupBy("g").agg(*aggs).select(
        F.col("g").alias(group_col), *[F.col(f"p{p}") for p in qs]
    )


def binned_quantiles_oracle_sql(
    table: str = "documents",
    value_col: str = "n_chars",
    group_col: str = "source",
    bin_width: int = 100,
    qs: tuple = (50, 90, 99),
) -> str:
    """DuckDB twin: identical bins, thresholds, and estimates.  The bin
    uses pure-integer FLOOR division (``_fdiv``): DuckDB ``//``
    truncates toward zero, which would diverge from Spark's floor() on
    negative values; the threshold stays ``//`` (total ≥ 0 always)."""
    from hquery_php_spark.operators.semantic import _fdiv

    sel = ", ".join(
        f"min(CASE WHEN cum >= (total * {p} + 99) // 100 "
        f"THEN b * {bin_width} END) AS p{p}"
        for p in qs
    )
    bin_expr = _fdiv(f"CAST({value_col} AS BIGINT)", str(bin_width))
    return f"""
WITH c AS (
  SELECT {group_col} AS g, CAST({bin_expr} AS BIGINT) AS b,
         count(*) AS n
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT g, b, sum(n) OVER (PARTITION BY g ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY g) AS total
  FROM c
)
SELECT g AS {group_col}, {sel} FROM cum GROUP BY g
"""
