"""Second relational wave: grouping sets, exact percentiles, unpivot,
nation-pair trade flows, market-share windows, null-handling and
string/map function families — deepening SURVEY.md §2b coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.batch import load_table
from .registry import register

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "q_agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (asymmetric sets — not expressible as "
    "rollup/cube).",
    tags=("relational", "agg", "groupingsets"),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@register(
    "q_agg_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Exact percentiles (linear interpolation — Spark `percentile` and "
    "DuckDB `quantile_cont` agree bitwise). The approx tier is "
    "q_agg_approx (rows-only).",
    tags=("relational", "agg", "percentile"),
)
def q_agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_agg_approx",
    oracle=None,  # HLL/t-digest internals are engine-specific by design
    doc="Approximate tier: approx_count_distinct (HLL) + percentile_approx "
    "(t-digest) — the one-pass forms for extreme cardinality; accuracy "
    "bounds asserted in tests/test_relational_extra.py.",
    tags=("relational", "agg", "approx", "rows-only"),
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.expr("percentile_approx(l_extendedprice, 0.5)").alias("approx_median"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    ORDER BY p_partkey, metric
    """,
    doc="Unpivot (wide→long) via stack(); oracle uses the ANSI UNION ALL "
    "equivalent.",
    tags=("relational", "unpivot"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'p_retailprice', p_retailprice, "
            "'p_size', CAST(p_size AS DOUBLE)) AS (metric, val)"
        ),
    ).orderBy("p_partkey", "metric")


@register(
    "q07_nation_trade_flow",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cust_nation, supp_nation, ship_year
    ORDER BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
    "year — the same dim table (nation) joined twice under different "
    "roles, all broadcast.",
    tags=("relational", "join", "selfdim"),
)
def q07_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    pair = ["NATION_1", "NATION_2"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .filter(
            F.col("cn.n_name").isin(pair)
            & F.col("sn.n_name").isin(pair)
            & (F.col("cn.n_name") != F.col("sn.n_name"))
        )
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM({_REV}) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_year
    ORDER BY ship_year
    """,
    doc="TPC-H Q14 shape: conditional-aggregate ratio (promo revenue "
    "share) per year; part dim broadcast.",
    tags=("relational", "join", "ratio"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", F.expr(_REV))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(F.expr(_REV)).cast("double").alias("total_revenue"),
            (
                F.sum(promo).cast("double")
                / F.sum(F.expr(_REV)).cast("double")
            ).alias("promo_share"),
        )
        .orderBy("ship_year")
    )


@register(
    "q_window_market_share",
    oracle="""
    WITH yearly AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
             o_orderpriority,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY 1, 2
    )
    SELECT order_year, o_orderpriority,
           CAST(rev_dec AS DOUBLE) AS rev,
           CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY order_year) AS DOUBLE)
             AS share
    FROM yearly
    ORDER BY order_year, o_orderpriority
    """,
    doc="Two-level aggregate: share-of-total via a window over a grouped "
    "result (TPC-H Q8 shape). The window SUM stays DECIMAL (an unordered "
    "window over doubles would sum in engine-dependent order).",
    tags=("relational", "window", "share"),
)
def q_window_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"), "o_orderpriority"
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = W.partitionBy("order_year")
    return (
        yearly.select(
            "order_year",
            "o_orderpriority",
            F.col("rev_dec").cast("double").alias("rev"),
            (
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(w).cast("double")
            ).alias("share"),
        )
        .orderBy("order_year", "o_orderpriority")
    )


@register(
    "q_null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0)
             AS total_spend,
           CASE WHEN COUNT(o_orderkey) = 0 THEN 'inactive' ELSE 'active' END
             AS status,
           NULLIF(COUNT(o_orderkey), 0) AS n_orders_or_null
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    WHERE c_custkey < 50
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="Null-handling family: COALESCE / NULLIF / CASE over outer-join "
    "nulls.",
    tags=("relational", "scalar", "null"),
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(dec("o_totalprice")).cast("double"), F.lit(0.0)
            ).alias("total_spend"),
            F.when(F.count("o_orderkey") == 0, "inactive")
            .otherwise("active")
            .alias("status"),
            F.nullif(F.count("o_orderkey"), F.lit(0)).alias("n_orders_or_null"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_scalar_string_builders",
    oracle="""
    SELECT p_partkey,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
           reverse(p_name) AS rev_name,
           replace(p_name, ' ', '_') AS snake_name,
           substring(p_name, 1, 5) AS name5
    FROM part
    WHERE p_partkey < 50
    ORDER BY p_partkey
    """,
    doc="String builder family: concat_ws/lpad/reverse/replace/substring.",
    tags=("relational", "scalar", "string"),
)
def q_scalar_string_builders(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return part.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.reverse("p_name").alias("rev_name"),
        F.expr("replace(p_name, ' ', '_')").alias("snake_name"),
        F.substring("p_name", 1, 5).alias("name5"),
    ).orderBy("p_partkey")


@register(
    "q_map_json_explode",
    oracle="""
    SELECT k, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total
    FROM (
      SELECT unnest(json_keys(props)) AS k,
             CAST(json_extract(props, '$.k') AS BIGINT) AS v
      FROM events
    ) t
    GROUP BY k
    ORDER BY k
    """,
    doc="JSON→map decode + explode (MapType surface): parse props as "
    "map<string,bigint>, explode entries, aggregate per key.",
    tags=("relational", "map", "json"),
)
def q_map_json_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("k", "v")
    )
    return (
        parsed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .orderBy("k")
    )


@register(
    "q_agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Salted two-phase aggregation over a deliberately skewed key "
    "(3 distinct values across the whole fact table): per-(key,salt) "
    "partials spread the hot keys across reducers, then a tiny final "
    "combine. Exact-decimal sums make the result identical to the "
    "direct groupBy the oracle runs.",
    tags=("relational", "agg", "skew"),
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import dec as _dec
    from ..operators.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    return (
        salted_sum_count(
            li, ["l_returnflag"], _dec("l_extendedprice"), n_salts=16
        )
        .select(
            "l_returnflag",
            F.col("total").cast("double").alias("total"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_subquery_correlated_above_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 * (
        SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey
      ) > 3 * (
        SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        FROM orders i WHERE i.o_custkey = o.o_custkey
      )
    ORDER BY o_orderkey
    """,
    doc="Correlated scalar subqueries: orders exceeding 1.5x their own "
    "customer's average order value, written division-free over exact "
    "decimal sums (price*2*count > 3*sum) so the threshold comparison "
    "has no cross-engine float boundary.",
    tags=("relational", "subquery", "correlated"),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 * (
            SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey
          ) > 3 * (
            SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FROM orders i WHERE i.o_custkey = o.o_custkey
          )
        ORDER BY o_orderkey
        """
    )


@register(
    "q_subquery_in_uncorrelated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey = 2
    )
    ORDER BY c_custkey
    """,
    doc="Uncorrelated IN subquery (planned as a semi join).",
    tags=("relational", "subquery", "in"),
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 2
        )
        ORDER BY c_custkey
        """
    )
