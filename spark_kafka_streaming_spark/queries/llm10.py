"""Round-4 second batch: sketch×window composition and iterative graph
analytics.

* ``q_sketch_hll_sliding`` — rolling 3-hour distinct-user estimates by
  merging per-hour HyperLogLog registers (bucket-wise max) across a
  sliding hour window, audited against the exact rolling distinct.
  The dashboard metric every event platform needs at 100 TB: the
  rolling merge touches only sketch rows (hours·m), never re-shuffles
  the raw keys per window the way exact sliding COUNT(DISTINCT) must.
* ``q_graph_pagerank_brands`` — fixed-iteration PageRank over the
  brand co-occurrence graph (edges = brands bought together in an
  order), all state in scaled int64 so the trajectory is
  bit-identical cross-engine.  The message-passing join+groupBy per
  iteration is the Pregel pattern on DataFrames — vertex-partitioned
  at any graph size (same execution shape as
  :mod:`..operators.clusters`' label propagation).

No analog in the reference (streaming word count only); these extend
the sketch tier and add the iterative-algorithm representative beyond
connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions.caching import track_persist
from ..operators import sketches as SK
from ..sources.batch import load_table
from .registry import register

# ----------------------------------------- sliding-window HLL merge

_HLL_W = 1 << SK.HLL_WBITS
_HLL_NUM = SK.HLL_ALPHA * SK.HLL_M * SK.HLL_M * float(1 << SK.HLL_SHIFT)
#: sliding window: current hour + 2 preceding
_SLIDE_HOURS = 2


@register(
    "q_sketch_hll_sliding",
    oracle=f"""
    WITH hashed AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hidx,
             user_id,
             {TH.duck_str_hash_raw("CAST(user_id AS VARCHAR)")} AS hr
      FROM events WHERE ts IS NOT NULL
    ),
    perhour AS (
      SELECT hidx, CAST(hr // {_HLL_W} AS INT) AS bucket,
             MAX({SK.duck_hll_rank_sql(f"(hr % {_HLL_W})")}) AS r
      FROM hashed GROUP BY hidx, bucket
    ),
    spine AS (SELECT DISTINCT hidx FROM hashed),
    merged AS (
      SELECT s.hidx, p.bucket, MAX(p.r) AS r
      FROM spine s
      JOIN perhour p
        ON p.hidx BETWEEN s.hidx - {_SLIDE_HOURS} AND s.hidx
      GROUP BY s.hidx, p.bucket
    ),
    summary AS (
      SELECT hidx,
             CAST(({SK.HLL_M} - COUNT(*)) * {1 << SK.HLL_SHIFT}
                  + SUM((1::BIGINT) << ({SK.HLL_SHIFT} - r)) AS BIGINT)
               AS sum_scaled
      FROM merged GROUP BY hidx
    ),
    truth AS (
      SELECT s.hidx, COUNT(DISTINCT h.user_id) AS true_distinct
      FROM spine s
      JOIN hashed h
        ON h.hidx BETWEEN s.hidx - {_SLIDE_HOURS} AND s.hidx
      GROUP BY s.hidx
    )
    SELECT s.hidx, s.sum_scaled,
           CAST({_HLL_NUM!r} AS DOUBLE) / CAST(s.sum_scaled AS DOUBLE)
             AS raw_est,
           t.true_distinct
    FROM summary s JOIN truth t USING (hidx)
    ORDER BY s.hidx
    """,
    doc="Sliding-window distinct users via mergeable sketches: one "
    "m={m}-register HyperLogLog per hour, and each hour's trailing "
    "{w}-hour estimate formed by bucket-wise MAX-merge of the window's "
    "per-hour registers — sketch mergeability doing the work a "
    "re-aggregation would. Exact rolling COUNT(DISTINCT) must "
    "re-shuffle every key for every window position (each key lands "
    "in {w} windows); the sketch path aggregates keys ONCE into "
    "O(hours·m) register rows and the rolling merge runs entirely on "
    "those — at 100 TB the merge input is KB-sized however many "
    "events each hour holds. The rolling fan is a map-side explode of "
    "each hour's (slide+1) window offsets + a broadcast semi-join "
    "against the hour spine (an equi-join — never a nested-loop band "
    "join); empty registers are accounted arithmetically (no "
    "spine×bucket fill). Exact rolling distinct returned beside the "
    "estimate as the test-scale comparator.".format(
        m=SK.HLL_M, w=_SLIDE_HOURS + 1
    ),
    tags=("sketch", "window", "events", "llm"),
)
def q_sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where("ts IS NOT NULL")
    hashed = ev.select(
        F.expr("unix_timestamp(ts) DIV 3600").alias("hidx"),
        "user_id",
        F.expr(TH.spark_str_hash_raw("CAST(user_id AS STRING)")).alias("hr"),
    )
    perhour = (
        hashed.select(
            "hidx",
            F.expr(f"CAST(hr DIV {_HLL_W} AS INT)").alias("bucket"),
            F.expr(SK.hll_rank_sql(f"(hr % {_HLL_W})"))
            .cast("int")
            .alias("rank"),
        )
        .groupBy("hidx", "bucket")
        .agg(F.max("rank").alias("r"))
    )
    spine = hashed.select("hidx").distinct()
    # The rolling merge fans each row to the window positions it feeds
    # via a MAP-SIDE explode of the offset sequence (hour h lands in
    # windows [h, h + slide]) and keeps only positions that exist in
    # the data with a broadcast hash semi-join against the hour spine
    # — identical rows to the oracle's band join, without the
    # broadcast nested-loop join that tested every row against every
    # spine hour (guide §3: the band predicate is not an equi-join,
    # so Spark ran it as BroadcastNestedLoopJoin — |rows|·|hours|
    # comparisons; the explode is |rows|·(slide+1) emitted rows).
    fan = perhour.select(
        F.explode(
            F.expr(f"sequence(hidx, hidx + {_SLIDE_HOURS})")
        ).alias("hidx"),
        "bucket",
        "r",
    ).join(F.broadcast(spine), "hidx", "left_semi")
    merged = fan.groupBy("hidx", "bucket").agg(F.max("r").alias("r"))
    summary = merged.groupBy("hidx").agg(
        F.expr(
            f"CAST(({SK.HLL_M} - COUNT(*)) * {1 << SK.HLL_SHIFT} "
            f"+ SUM(shiftleft(CAST(1 AS BIGINT), {SK.HLL_SHIFT} - r)) "
            f"AS BIGINT)"
        ).alias("sum_scaled")
    )
    # exact comparator leg: reduce to per-hour DISTINCT users first
    # (the union of per-hour distinct sets is the window's distinct
    # set), then the same map-side offset fan + spine semi-join.
    truth = (
        hashed.select("hidx", "user_id")
        .distinct()
        .select(
            F.explode(
                F.expr(f"sequence(hidx, hidx + {_SLIDE_HOURS})")
            ).alias("hidx"),
            "user_id",
        )
        .join(F.broadcast(spine), "hidx", "left_semi")
        .groupBy("hidx")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
    )
    return (
        summary.join(truth, "hidx")
        .select(
            "hidx",
            "sum_scaled",
            F.expr(f"{_HLL_NUM!r}D / CAST(sum_scaled AS DOUBLE)").alias(
                "raw_est"
            ),
            "true_distinct",
        )
        .orderBy("hidx")
    )


# ------------------------------------------------ PageRank (brands)

#: rank scale (per-node), damping 0.85; base = round(0.15·SCALE).
_PR_SCALE = 1_000_000_000
_PR_BASE = 150_000_000
_PR_ITERS = 3

#: One iteration's update, shared operand order: contributions are
#: exact integer (rank·weight) DIV out_weight; their sum is exact; the
#: damping multiply + round happens once on the exact total.
_PR_STEP = (
    "CAST({base} + CAST(round(0.85 * CAST(s AS DOUBLE)) AS BIGINT) "
    "AS BIGINT)"
)


def _duck_pr_iter(prev: str, out: str) -> str:
    return f"""
      SELECT e.dst AS brand,
             {_PR_STEP.format(base=_PR_BASE)} AS rank_scaled
      FROM (
        SELECT e.dst, CAST(SUM((r.rank_scaled * e.w) // o.ow) AS BIGINT) AS s
        FROM edges e
        JOIN {prev} r ON r.brand = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
      ) e
    """


_PR_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
edges AS (
  SELECT a.brand AS src, b.brand AS dst, COUNT(*) AS w
  FROM items a JOIN items b
    ON a.okey = b.okey AND a.brand <> b.brand
  GROUP BY a.brand, b.brand
),
outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src
),
r0 AS (SELECT src AS brand, CAST({_PR_SCALE} AS BIGINT) AS rank_scaled
       FROM outw),
r1 AS ({_duck_pr_iter('r0', 'r1')}),
r2 AS ({_duck_pr_iter('r1', 'r2')}),
r3 AS ({_duck_pr_iter('r2', 'r3')})
SELECT brand, rank_scaled FROM r3
ORDER BY rank_scaled DESC, brand
"""


@register(
    "q_graph_pagerank_brands",
    oracle=_PR_ORACLE,
    doc="Fixed-iteration PageRank over the brand co-occurrence graph "
    "(edge src→dst weighted by the number of orders containing both "
    "brands; damping 0.85, {it} iterations, per-node scale 10^9, "
    "unnormalized teleport). Every rank is a scaled int64: each "
    "neighbor contribution is the exact integer (rank·w) DIV "
    "out_weight, contributions sum exactly, and the single damping "
    "multiply+round per node per iteration uses identical IEEE "
    "operands — so the full trajectory replays bit-identically in the "
    "oracle (float message passing would drift with partitioning and "
    "engine). Execution is the Pregel pattern as DataFrames: one "
    "broadcast-join + groupBy(dst) per superstep — "
    "vertex-partitioned message passing that scales to graphs where "
    "the edge list is the 100 TB fact (the co-occurrence edge build "
    "is itself the order-bounded pair fan-out of "
    "q_basket_brand_pairs). Dangling nodes are absent by "
    "construction (co-occurrence is symmetric).".format(it=_PR_ITERS),
    tags=("graph", "iterative", "relational"),
)
def q_graph_pagerank_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = track_persist(
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") != F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("src"), F.col("b.brand").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("ow"))
    ranks = outw.select(
        F.col("src").alias("brand"),
        F.lit(_PR_SCALE).cast("bigint").alias("rank_scaled"),
    )
    for _ in range(_PR_ITERS):
        ranks = (
            edges.join(
                F.broadcast(ranks), ranks.brand == edges.src
            )
            .join(F.broadcast(outw), "src")
            .select(
                "dst",
                F.expr("CAST((rank_scaled * w) DIV ow AS BIGINT)").alias(
                    "c"
                ),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("s"))
            .select(
                F.col("dst").alias("brand"),
                F.expr(_PR_STEP.format(base=_PR_BASE)).alias(
                    "rank_scaled"
                ),
            )
        )
    return ranks.orderBy(F.desc("rank_scaled"), "brand")
