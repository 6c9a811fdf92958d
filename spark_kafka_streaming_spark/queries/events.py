"""Queries over the stream-shaped ``events`` table.

This is the batch-checkable face of the streaming layer: the same
transformations run under ``readStream`` in
:mod:`..streaming.pipeline`. The ``props`` JSON column plays the role
of the reference's pluggable byte→record flat-mapper
(``PartitionedSimpleConsumerKafkaInputDStream.scala:50``) — decoding
is declarative (`get_json_object` / `from_json`) instead of a user
closure, so Catalyst can prune and push down around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.batch import load_table
from .registry import register


@register(
    "q_events_json_extract",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_mod
    ORDER BY k_mod
    """,
    doc="JSON decode layer (flat-mapper replacement, reference "
    "...InputDStream.scala:50): extract props.k, bucket, aggregate.",
    tags=("events", "json", "decode"),
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k_mod", (F.get_json_object("props", "$.k").cast("int") % 10)
        )
        .groupBy("k_mod")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("k_mod")
    )


@register(
    "q_events_distinct_users_by_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Per-type distinct-user counts (the per-key cardinality the "
    "reference tracks as per-partition meters, M3).",
    tags=("events", "agg", "distinct"),
)
def q_events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_lag_lead_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) / 1000000.0
             AS secs_since_prev
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
    doc="lag/lead window navigation + event-time deltas per user.",
    tags=("events", "window", "lag"),
)
def q_events_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Integer-microsecond delta, then one double division: exact and
    # engine-independent (timestamp→double would quantize at ~0.24 µs).
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            (F.unix_micros("ts") - F.unix_micros(prev_ts)) / F.lit(1000000.0)
        ).alias("secs_since_prev"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "q_events_asof_last_click_before_purchase",
    oracle="""
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_click_ts
    FROM (
      SELECT user_id, event_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_ts
      FROM events
    ) t
    WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_ts, purchase_id
    """,
    doc="As-of join expressed as a running MAX over ordered history: each "
    "purchase picks up the most recent strictly-prior click. Scale path: "
    "single shuffle by user_id, no range-join blowup.",
    tags=("events", "asof", "window"),
)
def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        ev.withColumn("last_click_ts", F.max(click_ts).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
        .orderBy("user_id", "purchase_ts", "purchase_id")
    )


@register(
    "q_events_interval_join_click_purchase",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id, p.ts AS purchase_ts,
           c.event_id AS click_id,   c.ts AS click_ts,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS DOUBLE) / 1000000.0
             AS gap_sec
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 1800 * 1000000
    ORDER BY p.user_id, purchase_ts, purchase_id, click_ts, click_id
    """,
    doc="Interval (range) join: every click within the 30 minutes "
    "before each purchase by the same user — the batch twin of the "
    "watermarked stream-stream interval join in streaming/joins.py "
    "(general form of the reference's lag zip, "
    "ProcessorMetrics.scala:86-89). Gap compared in exact integer "
    "microseconds. Scale: equi-join on user_id with the range as a "
    "join residual — one shuffle, no range-join blowup.",
    tags=("events", "join", "interval"),
)
def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    gap_us = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return (
        p.join(
            c,
            (p.user_id == c.user_id)
            & (gap_us >= 0)
            & (gap_us <= 1800 * 1_000_000),
        )
        .select(
            p.user_id,
            "purchase_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            (gap_us.cast("double") / F.lit(1000000.0)).alias("gap_sec"),
        )
        .orderBy("user_id", "purchase_ts", "purchase_id", "click_ts", "click_id")
    )


@register(
    "q_events_sessionize_batch",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_last,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
    doc="Batch sessionization (gaps-and-islands, 30-min gap) — the batch "
    "twin of session_window() in the streaming layer.",
    tags=("events", "session", "window"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact integer-microsecond gap: timestamp→double quantizes at
    # ~0.4 µs near epoch magnitude, so a gap of exactly 1800 s could
    # round across the >= boundary in one engine only.  Same convention
    # as q_events_lag_lead above.
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap.isNull() | (gap >= 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )
