"""Fifth relational wave: distribution window functions, explicit
window frames, non-equi (band) broadcast join, and array higher-order
functions — the §2b rows that previous waves covered only partially.

Exactness notes: rank-family outputs are integers or divisions of
identical integers (deterministic given a total order — every ORDER BY
below carries a unique tiebreaker); array math runs on the shared
integer-scaling recipe from ``functions/vectors.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..functions import vectors as V
from ..sources.batch import load_table
from .registry import register


@register(
    "q_window_distribution_ranks",
    oracle="""
    SELECT c_custkey, c_nationkey,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST()    OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution window functions (ntile / percent_rank / cume_dist) "
    "per nation, totally ordered by (acctbal, custkey) so every rank is "
    "deterministic; pr/cd are divisions of identical integers in both "
    "engines.",
    tags=("window", "rank"),
)
def q_window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_window_first_last_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth_value over an explicit unbounded ROWS frame (the "
    "default RANGE frame would make last_value the current row) — values "
    "pass through untouched, so raw doubles compare exactly.",
    tags=("window", "frame"),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


_BANDS = [
    (0, -100000.0, 0.0),
    (1, 0.0, 2500.0),
    (2, 2500.0, 5000.0),
    (3, 5000.0, 7500.0),
    (4, 7500.0, 100000.0),
]
_BANDS_SQL = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)


@register(
    "q_join_band_broadcast",
    oracle=f"""
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM customer
    JOIN (VALUES {_BANDS_SQL}) AS b(band, lo, hi)
      ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band
    ORDER BY band
    """,
    doc="Non-equi band join: customers matched to balance intervals. The "
    "interval side is tiny and broadcast, so the physical plan is a "
    "BroadcastNestedLoopJoin — the scalable shape for interval lookups "
    "(big-big range joins instead bucket both sides on floor(x/width)).",
    tags=("join", "range"),
)
def q_join_band_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bands = spark.createDataFrame(_BANDS, "band int, lo double, hi double")
    return (
        cust.join(
            F.broadcast(bands),
            (cust.c_acctbal >= bands.lo) & (cust.c_acctbal < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), dsum("c_acctbal").alias("bal"))
        .orderBy("band")
    )


@register(
    "q_array_hof_stats",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_aggregate({V.duck_scaled('embedding')}, 'sum') AS BIGINT)
             AS sum_scaled,
           CAST(list_aggregate({V.duck_scaled('embedding')}, 'max') AS BIGINT)
             AS max_scaled
    FROM embeddings
    """,
    doc="Array higher-order functions (transform / aggregate / array_max) "
    "over the embedding column — per-element math stays in the integer "
    "scaling recipe, so sums are associative and engine-identical.",
    tags=("scalar", "array"),
)
def q_array_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = V.spark_scaled("embedding")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.expr(
            f"aggregate({scaled}, 0L, (acc, x) -> acc + x)"
        ).alias("sum_scaled"),
        F.expr(f"array_max({scaled})").alias("max_scaled"),
    )
