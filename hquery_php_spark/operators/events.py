"""Event-stream relational operators (batch form) — windowed aggregation
and sessionization, the engine-infrastructure side of the pipeline
(metrics rollups, crawl-rate accounting).

Both operators are pure DataFrame expressions (one shuffle each, partial
aggregation map-side) with exact ANSI-SQL twins for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["tumbling_counts", "sessionize"]


def tumbling_counts(df: DataFrame, ts_col: str = "ts", width: str = "hour") -> DataFrame:
    """Per-(window, event_type) counts + value sums over tumbling windows.

    ``date_trunc`` keys the shuffle; at scale this is the canonical
    pre-aggregation (map-side combine halves the shuffle volume).
    """
    return (
        df.groupBy(
            F.date_format(
                F.date_trunc(width, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
            ).alias("w_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap exceeds ``gap_minutes``.  Returns per-user session
    stats.  One shuffle (window partitioned by user), then one aggregate.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # Explicit ROWS frame for the running sum: Spark's default frame with an
    # ORDER BY is RANGE, which treats duplicate-timestamp rows as peers and
    # would diverge from the oracle's ROWS UNBOUNDED PRECEDING on ties.
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    # interval comparison — timezone-free, works for TIMESTAMP_NTZ columns
    new_session = F.when(
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessions = df.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(w_rows)
    )
    return (
        sessions.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .groupBy(user_col)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        + INTERVAL {gap_minutes} MINUTES
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(n_events) AS max_session_events
FROM per_session GROUP BY user_id
"""

TUMBLING_SQL = """
SELECT strftime(date_trunc('{width}', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


def top_users(df: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by total value within each event type — ranked window
    over a pre-aggregated frame (partial agg → one shuffle → window).
    Ties broken by user_id for a deterministic, oracle-checkable result."""
    from pyspark.sql import Window

    agg = df.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("event_type", "rank", "user_id", "total_value", "n_events")
    )


TOP_USERS_SQL = """
SELECT event_type, CAST(rank AS INT) AS rank, user_id, total_value, n_events
FROM (
  SELECT event_type, user_id,
         round(sum(value), 6) AS total_value,
         count(*) AS n_events,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY round(sum(value), 6) DESC, user_id
         ) AS rank
  FROM events
  GROUP BY event_type, user_id
)
WHERE rank <= {k}
"""


def hopping_counts(
    df: DataFrame, ts_col: str = "ts", width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Overlapping (hopping) window rollup — each event lands in
    width/slide windows; Spark's ``window()`` generates the assignments
    map-side, so the shuffle still carries only partial aggregates."""
    w = F.window(F.col(ts_col), width, slide)
    return df.groupBy(
        F.date_format(w.start, "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


HOPPING_SQL = """
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts)
           - off * INTERVAL '30 minutes' AS w_start,
         event_type, value
  FROM events, (SELECT unnest([0, 1]) AS off)
)
GROUP BY 1, 2
"""
