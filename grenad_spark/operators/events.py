"""Event-stream relational operators over the events table.

The reference has no window functions or time semantics (SURVEY §2.8); these
are the engine-side capabilities a training-data/telemetry pipeline needs,
expressed declaratively so Catalyst plans them (single shuffle per op):

- hourly_rollup: tumbling-window aggregation (batch form of the streaming
  windowed agg; date_trunc keyed, partial+final agg)
- sessionize: gap-based sessions via lag + running sum — the standard
  sessionization idiom
- topk_per_type: Top-K per group via window row_number
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30


def hourly_rollup(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )


SQL_HOURLY_ROLLUP = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
"""


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_start, n_events, duration_sec): new session when the
    gap since the user's previous event exceeds gap_min."""
    # microsecond arithmetic: unix_timestamp() truncates to seconds, which
    # drifts off-by-one vs DuckDB's fractional epoch() — unix_micros is exact
    # on both sides (DuckDB: epoch_us)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    marked = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_min * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("sess_no", F.sum("new_sess").over(w))
    return marked.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("session_start"),
        F.count("*").cast("long").alias("n_events"),
        ((F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp"))) / 1_000_000)
        .cast("long")
        .alias("duration_sec"),
    ).select("user_id", "session_start", "n_events", "duration_sec")


def sql_sessionize(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_min * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events,
       ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::BIGINT AS duration_sec
FROM sess GROUP BY user_id, sess_no
"""


def topk_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "event_id", F.round("value", 4).alias("value"))
    )


def sql_topk_per_type(k: int = 3) -> str:
    return f"""
SELECT event_type, event_id, round(value, 4) AS value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= {k}
"""
