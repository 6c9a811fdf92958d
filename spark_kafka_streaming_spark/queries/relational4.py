"""Round-4 third batch: snapshot maintenance and data-contract audits.

* ``q_cdc_apply_changes`` — MERGE INTO semantics as a full-outer join:
  apply a deterministic change stream (inserts/updates/deletes derived
  from the snapshot itself, so the oracle replays it) to the orders
  snapshot and checksum the result.  The maintenance operation every
  warehouse table needs; Delta/Iceberg MERGE compiles to exactly this
  join shape.
* ``q_quality_expectations_events`` — a dbt-style expectation suite
  over the event stream in ONE pass: null checks, domain checks,
  range checks, and a key-uniqueness audit, each reported as a
  (rule, n_violations) row.  The pre-publish gate of a data contract.

Both are pure relational compositions (no reference analog — the
reference ships raw decoded tuples with no table maintenance at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import register

# --------------------------------------------------------- CDC merge

#: Deterministic change stream derived from the snapshot: key mod 10
#: selects deletes (0), updates (1, 2 — totalprice bumped, status→'U'),
#: and inserts (3 — re-keyed clone with status 'N').  Self-derived so
#: both engines construct bit-identical changes; in production the
#: changes table is the (much smaller) CDC feed and is broadcast.
_CDC_SQL = """
WITH changes AS (
  SELECT o_orderkey AS k, 'D' AS op,
         CAST(NULL AS DOUBLE) AS new_price, CAST(NULL AS VARCHAR(8)) AS new_status
  FROM {orders} WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'U', o_totalprice + 1.0, 'U'
  FROM {orders} WHERE o_orderkey % 10 IN (1, 2)
  UNION ALL
  SELECT o_orderkey + 1000000000, 'I', o_totalprice, 'N'
  FROM {orders} WHERE o_orderkey % 10 = 3
),
merged AS (
  SELECT COALESCE(c.k, s.o_orderkey) AS k,
         CASE WHEN c.op = 'U' THEN c.new_status
              WHEN c.op = 'I' THEN c.new_status
              ELSE s.o_orderstatus END AS status,
         CASE WHEN c.op = 'U' THEN c.new_price
              WHEN c.op = 'I' THEN c.new_price
              ELSE s.o_totalprice END AS price
  FROM {orders} s
  FULL OUTER JOIN changes c ON c.k = s.o_orderkey
  WHERE c.op IS NULL OR c.op <> 'D'
)
SELECT status,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM merged
GROUP BY status
ORDER BY status
"""


@register(
    "q_cdc_apply_changes",
    oracle=_CDC_SQL.format(orders="orders"),
    doc="MERGE INTO semantics (the Delta/Iceberg upsert) as one "
    "full-outer join: a change stream of deletes, updates, and "
    "inserts applied to the orders snapshot, with the result "
    "checksummed per order status (count + exact DECIMAL price sum). "
    "The change stream is derived deterministically from the snapshot "
    "(key mod 10) so the oracle replays it bit-identically; in "
    "production the CDC feed is far smaller than the snapshot and "
    "broadcasts, making the merge a map-side probe of the snapshot — "
    "here both sides shuffle on the key, the general case. DELETE "
    "drops the matched row, UPDATE takes the change side's values, "
    "INSERT survives the join unmatched — the exact row-level "
    "semantics MERGE compiles to.",
    tags=("relational", "cdc", "join"),
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_cdc"
    )
    return spark.sql(_CDC_SQL.format(orders="orders_cdc"))


# ---------------------------------------------- expectation suite

_EXPECT_SQL = """
WITH base AS (
  SELECT event_id, ts, user_id, event_type, value FROM {events}
),
dups AS (
  SELECT COUNT(*) AS n FROM (
    SELECT event_id FROM base GROUP BY event_id HAVING COUNT(*) > 1
  ) d
)
SELECT 'event_id_not_null' AS rule,
       CAST(COALESCE(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_violations
FROM base
UNION ALL
SELECT 'ts_not_null',
       CAST(COALESCE(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT)
FROM base
UNION ALL
SELECT 'ts_not_future',
       CAST(COALESCE(SUM(CASE WHEN ts > TIMESTAMP '2030-01-01 00:00:00'
                THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM base
UNION ALL
SELECT 'event_type_in_domain',
       CAST(COALESCE(SUM(CASE WHEN event_type NOT IN
                ('click','view','purchase','signup','error')
                OR event_type IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM base
UNION ALL
SELECT 'value_non_negative',
       CAST(COALESCE(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT)
FROM base
UNION ALL
SELECT 'event_id_unique', CAST(n AS BIGINT) FROM dups
ORDER BY rule
"""


@register(
    "q_quality_expectations_events",
    oracle=_EXPECT_SQL.format(events="events"),
    doc="Data-contract expectation suite over the event stream — the "
    "dbt-test / Great-Expectations pre-publish gate as one query: "
    "null checks, a future-timestamp range check, an event_type "
    "domain check, a value sign check, and an event_id uniqueness "
    "audit, each reported as (rule, n_violations). The five "
    "column-level rules share ONE scan via conditional aggregation "
    "(map-side combined, no shuffle beyond the single-row reduces); "
    "only the uniqueness rule shuffles, keyed on event_id — the "
    "minimum any exact duplicate check needs. All-zero counts on the "
    "driver-generated tables; the value is the gate's plan shape plus "
    "the nonzero report at real scale (same posture as "
    "q_audit_referential_integrity).",
    tags=("events", "audit", "quality"),
)
def q_quality_expectations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_expect"
    )
    return spark.sql(_EXPECT_SQL.format(events="events_expect"))


# ------------------------------------------------- skew diagnostics

_SKEW_TOPK = 10


@register(
    "q_skew_report_orders",
    oracle=f"""
    WITH counts AS (
      SELECT o_custkey AS key_val, COUNT(*) AS cnt FROM orders
      GROUP BY o_custkey
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM counts
    ),
    top AS (
      SELECT key_val, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key_val)
                  AS INT) AS rk
      FROM counts
    )
    SELECT t.rk, t.key_val, CAST(t.cnt AS BIGINT) AS cnt,
           CAST((t.cnt * 1000000) // x.total AS BIGINT) AS share_ppm,
           x.n_keys, x.total
    FROM top t CROSS JOIN tot x
    WHERE t.rk <= {_SKEW_TOPK}
    ORDER BY t.rk
    """,
    doc="Join-key skew report: the top-{k} hottest o_custkey values "
    "with exact counts and parts-per-million share of all rows, "
    "beside the key cardinality and total — the pre-flight a pipeline "
    "runs before keying a shuffle on a column (decides between plain "
    "hash partitioning, salting (operators/skew.py), and AQE skew "
    "splitting; pairs with q_sketch_join_cardinality's size "
    "estimate). One map-side-combined groupBy; the top-k is a "
    "TakeOrdered heap, never a global sort; the totals reduce to one "
    "broadcast row. Shares are exact integer ppm (cnt·10⁶ DIV total) "
    "— no float division to drift.".format(k=_SKEW_TOPK),
    tags=("relational", "audit", "skew"),
)
def q_skew_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key_val"))
        .agg(F.count("*").alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    w = Window.orderBy(F.desc("cnt"), "key_val")
    top = (
        counts.orderBy(F.desc("cnt"), "key_val")
        .limit(_SKEW_TOPK)
        .withColumn("rk", F.row_number().over(w))
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "rk",
            "key_val",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("CAST((cnt * 1000000) DIV total AS BIGINT)").alias(
                "share_ppm"
            ),
            "n_keys",
            "total",
        )
        .orderBy("rk")
    )


# --------------------------------------------------- rate limiting

_RATE_N = 3  # keep first N events per (user, hour)


@register(
    "q_events_rate_limited",
    oracle=f"""
    WITH ranked AS (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id
             ) AS rn
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN rn <= {_RATE_N} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > {_RATE_N} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Count-based rate limiting: keep the first {n} events per "
    "(user, hour) — the quota/debounce ingestion pass that caps a "
    "runaway client's telemetry (complements the TIME-based debounce "
    "of q_events_dedup_within_interval: that drops repeats within an "
    "interval, this caps volume per window regardless of spacing). "
    "One window over a (user, hour)-keyed sort — the partition key "
    "includes the hour bucket, so a hot user's history splits across "
    "hour groups instead of one unbounded per-user sort (the same "
    "key-plus-time-range split SCALE.md prescribes for skewed window "
    "keys); reported as kept/dropped per event type. Streaming twin: "
    "the same quota via dropDuplicatesWithinWatermark on "
    "(user, hour, rank-bucket) or applyInPandasWithState counters "
    "(streaming/state.py).".format(n=_RATE_N),
    tags=("events", "window", "quality"),
)
def q_events_rate_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where("ts IS NOT NULL")
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN rn <= {_RATE_N} THEN 1 ELSE 0 END) "
                f"AS BIGINT)"
            ).alias("n_kept"),
            F.expr(
                f"CAST(SUM(CASE WHEN rn > {_RATE_N} THEN 1 ELSE 0 END) "
                f"AS BIGINT)"
            ).alias("n_dropped"),
        )
        .orderBy("event_type")
    )
