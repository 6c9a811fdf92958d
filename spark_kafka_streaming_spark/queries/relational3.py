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


@register(
    "q_audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', COUNT(*)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', COUNT(*)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'supplier->nation', COUNT(*)
    FROM supplier s WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
    UNION ALL
    SELECT 'nation->region', COUNT(*)
    FROM nation n WHERE NOT EXISTS
      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)
    UNION ALL
    SELECT 'lineitem->part', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    ORDER BY fk
    """,
    doc="Referential-integrity audit across the star schema: orphan "
    "counts for every foreign key as one result (the dbt-test / "
    "data-contract pass a pipeline runs before publishing a "
    "snapshot). Both lineitem FKs (orders + part) are checked in ONE "
    "lineitem pass — left joins against the broadcast part key set "
    "and the orders key set, counted by conditional aggregation — so "
    "the biggest fact is scanned once; the remaining legs are "
    "anti-joins with broadcast dims. All-zero counts on the "
    "driver-generated tables — the audit's value is the plan shape "
    "plus the nonzero report at real scale.",
    tags=("relational", "join", "audit"),
)
def q_audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphans(fact: str, fk: str, dim: str, pk: str, label: str) -> DataFrame:
        f = load_table(spark, sf_dir, fact)
        d = F.broadcast(load_table(spark, sf_dir, dim).select(pk))
        return (
            f.join(d, f[fk] == d[pk], "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    # Both lineitem FKs in one scan: left-join flags + conditional agg.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .select("p_partkey")
        .withColumn("has_p", F.lit(1))
    )
    li_counts = (
        li.join(part, li.l_partkey == F.col("p_partkey"), "left")
        .join(
            ords.withColumn("has_o", F.lit(1)),
            li.l_orderkey == ords.o_orderkey,
            "left",
        )
        .agg(
            # COALESCE: SUM over zero rows is NULL, but an empty fact
            # table has 0 orphans (matches the oracle's COUNT(*)).
            F.coalesce(
                F.sum(F.expr("CASE WHEN has_o IS NULL THEN 1 ELSE 0 END")),
                F.lit(0),
            ).alias("lo"),
            F.coalesce(
                F.sum(F.expr("CASE WHEN has_p IS NULL THEN 1 ELSE 0 END")),
                F.lit(0),
            ).alias("lp"),
        )
        .selectExpr(
            "stack(2, 'lineitem->orders', lo, 'lineitem->part', lp) "
            "AS (fk, n_orphans)"
        )
    )
    legs = [
        li_counts,
        orphans("orders", "o_custkey", "customer", "c_custkey",
                "orders->customer"),
        orphans("customer", "c_nationkey", "nation", "n_nationkey",
                "customer->nation"),
        orphans("supplier", "s_nationkey", "nation", "n_nationkey",
                "supplier->nation"),
        orphans("nation", "n_regionkey", "region", "r_regionkey",
                "nation->region"),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    return out.orderBy("fk")


@register(
    "q_events_rollup_time_grains",
    oracle="""
    SELECT COALESCE(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP)
                         AS VARCHAR), 'ALL') AS day,
           COALESCE(CAST(date_trunc('hour', ts) AS VARCHAR), 'ALL') AS hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)),
                            ())
    ORDER BY day, hour
    """,
    doc="Multi-granularity time rollup in ONE pass: hourly, daily, and "
    "grand-total aggregates of the event stream via GROUPING SETS "
    "over derived time buckets (the OLAP-cube time hierarchy every "
    "dashboard materializes). Spark expands the sets map-side and "
    "partial-aggregates each — one shuffle carrying ~(hours + days + "
    "1) groups, not 3 scans. Grain keys are stringified with an 'ALL' "
    "sentinel so the result is engine-portable (NULL-vs-sentinel "
    "rollup markers differ across engines otherwise); NULL timestamps "
    "are filtered first so the sentinel is unambiguous — a NULL-ts "
    "group would otherwise masquerade as a subtotal row (use "
    "GROUPING() markers instead if NULL keys must be kept).",
    tags=("events", "agg", "time"),
)
def q_events_rollup_time_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_grains"
    )
    return spark.sql(
        """
        SELECT COALESCE(CAST(date_trunc('day', ts) AS STRING), 'ALL') AS day,
               COALESCE(CAST(date_trunc('hour', ts) AS STRING), 'ALL')
                 AS hour,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM events_grains
        WHERE ts IS NOT NULL
        GROUP BY GROUPING SETS
          ((date_trunc('day', ts), date_trunc('hour', ts)),
           (date_trunc('day', ts)),
           ())
        ORDER BY day, hour
        """
    )


@register(
    "q_text_fuzzy_match",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ),
    probes AS (
      SELECT p_name AS orig,
             substr(p_name, 1, 2) || substr(p_name, 4) AS probe
      FROM (SELECT p_name FROM names ORDER BY p_name LIMIT 5)
    )
    SELECT pr.probe, n.p_name,
           CAST(levenshtein(pr.probe, n.p_name) AS INT) AS dist
    FROM probes pr CROSS JOIN names n
    WHERE levenshtein(pr.probe, n.p_name) <= 2
    ORDER BY pr.probe, dist, n.p_name
    """,
    doc="Fuzzy string matching: 5 deterministically corrupted part "
    "names (3rd character deleted) matched against the distinct name "
    "dictionary within edit distance 2 — the entity-resolution / "
    "typo-lookup shape. The probe side is broadcast, so the "
    "dictionary scans once map-side with k levenshtein evaluations "
    "per row (never a dictionary×dictionary cross join); for "
    "probe-at-scale matching, block on (length band, first char) "
    "first — the same candidate-prune idea as the dedup tiers. "
    "levenshtein is integer-exact and identical across engines.",
    tags=("relational", "text", "join"),
)
def q_text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    probes = (
        names.orderBy("p_name")
        .limit(5)
        .select(
            F.expr("concat(substr(p_name, 1, 2), substr(p_name, 4))").alias(
                "probe"
            )
        )
    )
    return (
        names.crossJoin(F.broadcast(probes))
        .where(F.expr("levenshtein(probe, p_name) <= 2"))
        .select(
            "probe",
            "p_name",
            F.expr("CAST(levenshtein(probe, p_name) AS INT)").alias("dist"),
        )
        .orderBy("probe", "dist", "p_name")
    )


@register(
    "q_basket_brand_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )
    SELECT a.p_brand AS brand1, b.p_brand AS brand2,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY brand1, brand2
    ORDER BY n_orders DESC, brand1, brand2
    LIMIT 15
    """,
    doc="Market-basket co-occurrence: top brand pairs bought in the "
    "same order (association-rule support counting). The self-join is "
    "keyed on l_orderkey, so fan-out per order is bounded by "
    "(distinct brands per order choose 2) — small by construction of "
    "real baskets (TPC-H ~4 items/order), never a table-level "
    "quadratic; part is broadcast into the item derivation. The "
    "relational twin of the corpus collocation query "
    "(q_text_collocations_lift).",
    tags=("relational", "join", "agg"),
)
def q_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand1"),
            F.col("b.p_brand").alias("brand2"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand1", "brand2")
        .limit(15)
    )


# Generators + grid normalization shared with the write-side operator
# (operators/zorder.py). Both dimensions are min/max-normalized onto
# the same 2^ZBITS grid BEFORE interleaving: raw-value interleaving of
# unequal-width domains puts all the high interleave bits on the wider
# dimension, so the narrower one gets no top-level clustering (found
# live: raw 27-bit interleave at sf0.001 left custkey spans at the
# full domain because order-day needed 4 more bits than custkey).
from ..operators.zorder import ZBITS_DEFAULT as _ZBITS  # noqa: E402
from ..operators.zorder import z_expr_duck as _z_duck  # noqa: E402
from ..operators.zorder import z_expr_spark as _z_spark  # noqa: E402

_ZBUCKETS = 16
#: Equal-width value-range cuts of the z (and linear) key: bucket =
#: key's top log2(_ZBUCKETS) bits.  This is the plan-shape twin of the
#: writer's ``repartitionByRange(zval)`` — value-range cuts, no global
#: sort — where the previous NTILE form imposed a row-balanced total
#: order the shipped writer never executes (34 s at sf10 vs a map-only
#: bucket tag here; VERDICT r3 #6).  repartitionByRange samples its
#: bounds to balance rows; fixed equal-width bounds are the
#: deterministic, oracle-replayable stand-in (cells are min/max grid
#: normalized, so they fill their domain ~uniformly and the widths are
#: comparable).
_ZSHIFT_Z = 2 * _ZBITS - 4  # 2^4 = _ZBUCKETS buckets over 2·ZBITS z bits
_ZSHIFT_L = _ZBITS - 4
_ZCELL = (
    "(({x} - min_{x}) * {cells}) DIV (max_{x} - min_{x} + 1)"
)  # exact integer grid cell, Spark form; DuckDB uses // for DIV


def _cell_spark(x: str) -> str:
    return _ZCELL.format(x=x, cells=1 << _ZBITS)


def _cell_duck(x: str) -> str:
    return _ZCELL.format(x=x, cells=1 << _ZBITS).replace(" DIV ", " // ")


@register(
    "q_layout_zorder",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS key, o_custkey AS c,
             CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate)
                  AS BIGINT) AS d
      FROM orders
    ),
    bounds AS (
      SELECT MIN(c) AS min_c, MAX(c) AS max_c,
             MIN(d) AS min_d, MAX(d) AS max_d
      FROM base
    ),
    cells AS (
      SELECT key, c, d,
             {_cell_duck('c')} AS cc,
             {_cell_duck('d')} AS dc
      FROM base CROSS JOIN bounds
    ),
    z AS (
      SELECT key, c, d, cc, {_z_duck('cc', 'dc')} AS zval FROM cells
    ),
    bucketed AS (
      SELECT 'zorder' AS layout, c, d, (zval >> {_ZSHIFT_Z}) AS bucket
      FROM z
      UNION ALL
      SELECT 'linear' AS layout, c, d, (cc >> {_ZSHIFT_L}) AS bucket
      FROM z
    ),
    spans AS (
      SELECT layout, bucket, COUNT(*) AS n,
             MAX(c) - MIN(c) + 1 AS span_c,
             MAX(d) - MIN(d) + 1 AS span_d
      FROM bucketed GROUP BY layout, bucket
    )
    SELECT layout,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(span_c) AS BIGINT) AS max_span_c,
           CAST(MAX(span_d) AS BIGINT) AS max_span_d,
           CAST(SUM(span_c * n) AS BIGINT) AS weighted_span_c,
           CAST(SUM(span_d * n) AS BIGINT) AS weighted_span_d
    FROM spans
    GROUP BY layout
    ORDER BY layout
    """,
    doc="Z-order (Morton) multi-dimensional clustering, quantified: "
    "orders keyed by bit-interleaved (custkey, order-day) are cut "
    "into {b} contiguous files and compared against a linear "
    "custkey sort on per-file min/max spans of BOTH dimensions — the "
    "statistics file-skipping actually uses. The linear layout gives "
    "tight custkey spans but every file spans the full date range "
    "(zero date pruning); the z-order layout bounds both spans, so "
    "range predicates on either dimension skip files. Both dims are "
    "min/max-normalized onto the same 2^{k} grid with exact integer "
    "arithmetic BEFORE the bit-interleave — unbalanced raw domains "
    "would give the wider dimension every high interleave bit and "
    "destroy clustering on the narrower one. Buckets are the key's "
    "top-4 bits — equal-width value-range cuts, the deterministic "
    "twin of the writer's `repartitionByRange(zval)` (which samples "
    "its bounds) — so the metric plan is scan → map → groupBy with NO "
    "global sort, the same shape the shipped write path "
    "(operators/zorder.py::write_zordered) executes at any scale. "
    "Judge by the WEIGHTED spans (tests pin both weighted spans below "
    "half their domains and the weighted date span at less than half "
    "of linear's).".format(b=_ZBUCKETS, k=_ZBITS),
    tags=("relational", "layout", "scale"),
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_custkey").alias("c"),
        F.expr(
            "CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT)"
        ).alias("d"),
    )
    bounds = base.agg(
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )
    cells = base.crossJoin(F.broadcast(bounds)).select(
        "key",
        "c",
        "d",
        F.expr(_cell_spark("c")).alias("cc"),
        F.expr(_cell_spark("d")).alias("dc"),
    )
    z = cells.withColumn("zval", F.expr(_z_spark("cc", "dc")))
    bucketed = z.select(
        F.lit("zorder").alias("layout"),
        "c",
        "d",
        F.expr(f"shiftright(zval, {_ZSHIFT_Z})").alias("bucket"),
    ).unionByName(
        z.select(
            F.lit("linear").alias("layout"),
            "c",
            "d",
            F.expr(f"shiftright(cc, {_ZSHIFT_L})").alias("bucket"),
        )
    )
    spans = bucketed.groupBy("layout", "bucket").agg(
        F.count("*").alias("n"),
        (F.max("c") - F.min("c") + 1).alias("span_c"),
        (F.max("d") - F.min("d") + 1).alias("span_d"),
    )
    return (
        spans.groupBy("layout")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("span_c").cast("bigint").alias("max_span_c"),
            F.max("span_d").cast("bigint").alias("max_span_d"),
            F.sum(F.expr("span_c * n")).cast("bigint").alias(
                "weighted_span_c"
            ),
            F.sum(F.expr("span_d * n")).cast("bigint").alias(
                "weighted_span_d"
            ),
        )
        .orderBy("layout")
    )
