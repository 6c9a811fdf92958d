"""Relational operator surface (SURVEY.md §2b): joins of every flavor,
aggregation variants (distinct / rollup / cube / pivot), window
functions, sort/limit, set ops, scalar function families.

The reference delegates all of this to Spark after ingest (its only
relational ops are union/map/flatMap/reduceByKeyAndWindow in
``examples/.../KafkaWordCount.scala:53-73`` and the client-side lag
zip-join in ``ProcessorMetrics.scala:86-89``); here each capability is
a first-class, oracle-checked query.

Scale notes: dimension sides of joins are broadcast; aggregates are
map-side combinable (decimal sums, counts); window functions partition
by bounded keys (custkey/user_id) so no single partition explodes;
top-k uses order+limit which Spark executes as a per-partition top-k
(TakeOrderedAndProject) — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.batch import load_table
from .registry import register


# ---------------------------------------------------------------- joins


@register(
    "q_join_anti_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Left-anti join (NOT EXISTS): customers that never ordered.",
    tags=("relational", "join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "q_join_semi_parts_ordered",
    oracle="""
    SELECT p_type, COUNT(*) AS n_parts
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_type
    ORDER BY p_type
    """,
    doc="Left-semi join (EXISTS): parts that appear in at least one lineitem.",
    tags=("relational", "join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_type")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_type")
    )


@register(
    "q_join_left_order_counts",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="Left outer join preserving unmatched customers; COUNT(col) "
    "null-skipping semantics.",
    tags=("relational", "join", "outer"),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_join_full_outer_nation_activity",
    oracle="""
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.k = s.k
    ORDER BY nationkey
    """,
    doc="Full outer join of two aggregates with COALESCE key merge.",
    tags=("relational", "join", "outer"),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        c.join(s, c.k == s.k, "full_outer")
        .select(
            F.coalesce(c.k, s.k).alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# ----------------------------------------------------- aggregation forms


@register(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact distinct aggregation (expand+two-phase shuffle in Spark).",
    tags=("relational", "agg", "distinct"),
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_agg_rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP grouping sets (subtotals + grand total).",
    tags=("relational", "agg", "rollup"),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count("*").alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q_agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE grouping sets over two dimensions.",
    tags=("relational", "agg", "cube"),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q_agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Pivot (orderstatus → columns) with count cells; absent cells NULL.",
    tags=("relational", "agg", "pivot"),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------ window functions


@register(
    "q_window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS INT) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Top-K per group via row_number window; deterministic tiebreak.",
    tags=("relational", "window", "topk"),
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "q_window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Running aggregate over an explicit ROWS frame (exact decimal).",
    tags=("relational", "window", "frame"),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q_window_rank_dense_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(RANK() OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice DESC
           ) AS INT) AS price_rank,
           CAST(DENSE_RANK() OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice DESC
           ) AS INT) AS price_dense_rank
    FROM orders
    WHERE o_totalprice > 300000
    ORDER BY o_orderpriority, price_rank, o_orderkey
    """,
    doc="rank/dense_rank with duplicate-value tie semantics.",
    tags=("relational", "window", "rank"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    ).orderBy("o_orderpriority", "price_rank", "o_orderkey")


# --------------------------------------------------------- sort / limit


@register(
    "q_sort_limit_top_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Global top-100 — Spark plans TakeOrderedAndProject (per-partition "
    "top-k + merge), never a full sort at scale.",
    tags=("relational", "sort", "limit"),
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# -------------------------------------------------------------- set ops


@register(
    "q_setops_customer_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    ORDER BY c_custkey
    """,
    doc="UNION (distinct) then EXCEPT, distinct set semantics.",
    tags=("relational", "setop"),
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    big_spenders = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        building.union(auto)
        .distinct()
        .exceptAll(big_spenders.distinct())
        .distinct()
        .orderBy("c_custkey")
    )


@register(
    "q_setops_intersect_active_both_years",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    ORDER BY o_custkey
    """,
    doc="INTERSECT distinct semantics: customers active in both years.",
    tags=("relational", "setop"),
)
def q_setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


# ------------------------------------------------------ scalar functions


@register(
    "q_scalar_string_functions",
    oracle="""
    SELECT regexp_extract(p_name, '^[a-z]+') AS first_word,
           COUNT(*) AS n,
           CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_len,
           MIN(UPPER(p_name)) AS first_upper
    FROM part
    GROUP BY first_word
    ORDER BY first_word
    """,
    doc="String functions: regexp_extract, length, upper, min-string.",
    tags=("relational", "scalar", "string"),
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.withColumn("first_word", F.regexp_extract("p_name", "^[a-z]+", 0))
        .groupBy("first_word")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("p_name")).cast("bigint").alias("total_len"),
            F.min(F.upper(F.col("p_name"))).alias("first_upper"),
        )
        .orderBy("first_word")
    )


@register(
    "q_scalar_date_functions",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
    FROM orders
    GROUP BY order_year, order_month
    ORDER BY order_year, order_month
    """,
    doc="Date functions: year/month extraction + monthly aggregation.",
    tags=("relational", "scalar", "date"),
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("monthly_total"),
        )
        .orderBy("order_year", "order_month")
    )


@register(
    "q_scalar_case_when_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                ELSE 'large' END AS price_band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
    FROM orders
    GROUP BY price_band
    ORDER BY price_band
    """,
    doc="CASE WHEN bucketing + aggregation.",
    tags=("relational", "scalar", "case"),
)
def q_scalar_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
    )
    return (
        orders.withColumn("price_band", band)
        .groupBy("price_band")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("o_totalprice")).cast("double").alias("band_total"),
        )
        .orderBy("price_band")
    )


@register(
    "q_scalar_math_functions",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_floor,
           CAST(SUM(CAST(CEIL(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_ceil,
           SQRT(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) AS sqrt_total,
           CAST(MAX(ABS(o_totalprice)) AS DOUBLE) AS max_abs
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Math functions over exact intermediates: floor/ceil/sqrt/abs.",
    tags=("relational", "scalar", "math"),
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sum(F.floor("o_totalprice").cast("bigint")).cast("bigint").alias("sum_floor"),
            F.sum(F.ceil("o_totalprice").cast("bigint")).cast("bigint").alias("sum_ceil"),
            F.sqrt(F.sum(dec("o_totalprice")).cast("double")).alias("sqrt_total"),
            F.max(F.abs(F.col("o_totalprice"))).cast("double").alias("max_abs"),
        )
        .orderBy("o_orderpriority")
    )
