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
