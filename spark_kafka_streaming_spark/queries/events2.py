"""Second events wave: funnel analysis and cohort retention — the two
product-analytics aggregations every event pipeline grows next, both
pure shuffle-bounded DataFrame plans keyed on ``user_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register


@register(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id AS user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END
                AS INT) AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY user_id
    """,
    doc="Ordered conversion funnel view → click → purchase per user: "
    "first view, first click strictly after it, first purchase strictly "
    "after that, and the funnel stage reached. Every agg and join is "
    "keyed on user_id, so one shuffle partitioning serves the whole "
    "chain (AQE reuses it); no window over the full event stream.",
    tags=("events", "funnel"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .withColumn(
            "stage",
            F.expr(
                "CAST(1 + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END"
                " + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END"
                " AS INT)"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "q_events_retention",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    f AS (SELECT user_id, MIN(d) AS cohort_day FROM a GROUP BY user_id)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.d) AS INT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Cohort retention triangle: users by first-active day, counted "
    "on each later active day. distinct (user, day) first — the raw "
    "event volume collapses before any join; the per-user first-day "
    "table joins on the same user_id partitioning.",
    tags=("events", "retention"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    f = a.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        a.join(f, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_day"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q_events_resample_gapfill",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    agg AS (
      SELECT event_type, h, COUNT(*) AS cnt,
             SUM(v) AS sv
      FROM b GROUP BY event_type, h
    ),
    bounds AS (
      SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b
    ),
    hours AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    spine AS (
      SELECT t.event_type, hours.h
      FROM (SELECT DISTINCT event_type FROM b) t CROSS JOIN hours
    )
    SELECT s.event_type, s.h,
           CAST(COALESCE(a.cnt, 0) AS BIGINT) AS cnt,
           CAST(last_value(a.sv IGNORE NULLS) OVER (
                  PARTITION BY s.event_type ORDER BY s.h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS filled_total
    FROM spine s LEFT JOIN agg a
      ON a.event_type = s.event_type AND a.h = s.h
    ORDER BY s.event_type, s.h
    """,
    doc="Time-series resampling with gap fill: hourly per-event-type "
    "grid from the corpus' min to max hour (sequence + cross join "
    "with the distinct types), empty buckets carried as cnt=0 and the "
    "hourly total forward-filled from the last populated bucket "
    "(last_value IGNORE NULLS over an event-type-partitioned frame). "
    "The standard dashboard/feature-store densification pass. Scale: "
    "the aggregation is the normal hourly rollup (map-side "
    "combinable); the spine is |types|x|hours| — tiny relative to "
    "events — and the fill window partitions by type, so state is one "
    "running value per partition. Exact DECIMAL sums; one final cast "
    "to DOUBLE.",
    tags=("events", "window", "time"),
)
def q_events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import dec

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        dec("value").alias("v"),
    )
    agg = b.groupBy("event_type", "h").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("sv")
    )
    bounds = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    types = b.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
            F.last("sv", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("filled_total"),
        )
        .orderBy("event_type", "h")
    )


@register(
    "q_events_scd2_user_state",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM o
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to
    FROM starts
    ORDER BY user_id, valid_from, event_id
    """,
    doc="SCD2 (slowly-changing-dimension type 2) derivation: collapse "
    "each user's event stream into state-validity intervals — a new "
    "row whenever the observed event_type changes, valid_to = next "
    "change's timestamp (NULL = current state). The standard "
    "change-data-capture history build: two windows over one "
    "user-partitioned sort (lag to detect changes, lead to close "
    "intervals — Spark evaluates both in a single sort since the "
    "ordering agrees), shuffle keyed on user_id only. event_id breaks "
    "timestamp ties deterministically.",
    tags=("events", "window", "time"),
)
def q_events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    starts = o.where(
        F.expr("prev_type IS NULL OR prev_type <> event_type")
    ).select(
        "user_id", "event_type", F.col("ts").alias("valid_from"), "event_id"
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return (
        starts.select(
            "user_id",
            "event_type",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            "event_id",
        )
        .orderBy("user_id", "valid_from", "event_id")
        .drop("event_id")
    )


@register(
    "q_events_dedup_within_interval",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM o
    WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 MINUTE
    ORDER BY event_id
    """,
    doc="Interval-bounded event dedup, batch form: keep an event only "
    "if the previous event of the same (user_id, event_type) is at "
    "least 5 minutes older (lag over one key-partitioned sort — "
    "debouncing duplicate beacons/retries). Complements the streaming "
    "dropDuplicatesWithinWatermark tier (streaming/pipeline.py) with "
    "a driver-checkable batch debounce on the same keys; note the "
    "semantics differ on chained bursts (this compares to the "
    "previous event, state-based streaming dedup compares to the "
    "last event that survived state expiry). One shuffle on the "
    "dedup key; window state is O(1) per key.",
    tags=("events", "dedup", "time"),
)
def q_events_dedup_within_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .where(
            F.expr("prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 MINUTE")
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )
