"""Event-time window aggregations (batch-checkable twins of the
streaming layer).

The reference's one analytics operator is a processing-time sliding
window count (`reduceByKeyAndWindow(_+_, _-_, Minutes(10), Seconds(2))`,
``examples/.../KafkaWordCount.scala:72``). The new engine replaces it
with event-time windows + watermarks; these queries pin the exact
bucket semantics (epoch-aligned, start-inclusive end-exclusive) against
the SQL oracle, and :mod:`..streaming.pipeline` runs the identical
expressions under ``readStream``.

Scale: `window()` is a projection + hash-agg — one shuffle per query,
partial aggregation map-side; sliding windows fan each row out to
width/slide buckets before the shuffle (2× here), which beats the
reference's inverse-reduce state because the state store holds only
open windows past the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.batch import load_table
from .registry import register


@register(
    "q_window_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS ws,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
    doc="Tumbling 1-hour event-time window per event_type (Q5 analog, "
    "tumbling case).",
    tags=("window", "time", "streamable"),
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
        .orderBy("ws", "event_type")
    )


@register(
    "q_window_sliding_10m_5m",
    oracle="""
    WITH buckets AS (
      SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000)
               AS b, value, ts
      FROM events
    ), fanout AS (
      SELECT b AS ws, value FROM buckets
      UNION ALL
      SELECT b - INTERVAL 5 MINUTE AS ws, value FROM buckets
    )
    SELECT ws, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM fanout
    GROUP BY ws
    ORDER BY ws
    """,
    doc="Sliding window 10 min / slide 5 min — the event-time analog of "
    "the reference's reduceByKeyAndWindow (KafkaWordCount.scala:72). "
    "Each row fans out to width/slide = 2 buckets.",
    tags=("window", "time", "sliding", "streamable"),
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("ws"), "n", "total_value")
        .orderBy("ws")
    )


@register(
    "q_window_trailing_1h",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_value
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Per-event trailing 1-hour value sum per user — a RANGE frame "
    "over event time (every event sees the true 60-minute lookback, "
    "not a row count). Ordered by integer epoch-µs so the frame bound "
    "is exact integer arithmetic in both engines; DECIMAL sum keeps "
    "the window total order-independent. One shuffle on user_id; the "
    "in-partition range scan is the streaming state-store access "
    "pattern in batch form.",
    tags=("window", "time", "range-frame"),
)
def q_window_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.sum(dec("value")).over(w).cast("double").alias(
                "trailing_1h_value"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "q_window_session_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    doc="session_window(ts, 30 min) per user — session end = last event "
    "+ gap, matching Spark's merge rule (windows merge while they "
    "overlap; a gap == 30 min starts a new session).",
    tags=("window", "time", "session", "streamable"),
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )
