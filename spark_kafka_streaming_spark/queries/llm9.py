"""Round-4 wave: ranked text retrieval, sketch-driven join planning,
null-aware subqueries, mergeable moments, and robust anomaly detection.

* ``q_text_bm25_search`` — BM25-ranked retrieval over the inverted
  index's term statistics with a bit-length-quantized idf (no libm).
* ``q_sketch_join_cardinality`` — join-size estimation from two
  Count-Min sketches (inner product), audited against the exact
  count — the pre-flight a planner runs before committing a shuffle
  strategy at 100 TB.
* ``q_subquery_not_in_null_aware`` — NOT IN's three-valued-logic
  semantics, both with and without NULLs in the subquery (Spark plans
  the null-aware broadcast anti join).
* ``q_stats_moments_merge`` — grouped count/mean/variance from exact
  mergeable partials (n, Σc, Σc²) — the parallel-moments pattern.
* ``q_events_anomaly_mad`` — median/MAD outlier detection with
  rank-selected (lower) medians, no interpolation.

Cross-engine exactness follows the registry rules: integer/decimal
accumulation, shared-literal single divisions, no ln/exp (BM25's idf
is quantized to the integer bit-length of an exact scaled ratio —
monotone in the real idf and bit-identical everywhere).

No analog in the reference (its sole aggregate is the windowed word
count, ``KafkaWordCount.scala:70-73``); these extend the index,
sketch, and quality tiers it seeded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators import sketches as SK
from ..sources.batch import load_table
from .registry import register

# ------------------------------------------------------ BM25 search
# Scoring constants/expressions live in operators/index.py (shared
# with the streaming serving loop, IncrementalIndexer.bm25_snapshot);
# this module binds them into the single-pass catalog query + oracle.

from ..operators import index as IX  # noqa: E402

_BM25_TERMS = IX.BM25_TERMS
_BM25_TOPK = IX.BM25_TOPK
_IDF_SCALE = IX.IDF_SCALE
_BM25_SCORE = IX.BM25_SCORE
_bm25_tf_case = IX.bm25_tf_case
_idfq = IX.bm25_idfq


_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({TH.duck_tokens('text')}) AS term FROM documents
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS dl,
         {', '.join(f"CAST({_bm25_tf_case(t)} AS BIGINT) AS tf_{t}" for t in _BM25_TERMS)}
  FROM tok GROUP BY doc_id
),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
         {', '.join(f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in _BM25_TERMS)}
  FROM per_doc
),
scored AS (
  SELECT d.doc_id, d.dl,
         {', '.join(f"d.tf_{t}" for t in _BM25_TERMS)},
         s.n_docs, s.sum_dl,
         {', '.join(_idfq(f's.df_{t}', '//') + f' AS idfq_{t}' for t in _BM25_TERMS)}
  FROM per_doc d CROSS JOIN stats s
),
final AS (
  SELECT doc_id,
         {', '.join(_BM25_SCORE.format(t=t) + f' AS s_{t}' for t in _BM25_TERMS)}
  FROM scored
)
SELECT doc_id, s_hash, s_stream, s_vector,
       ((s_hash + s_stream) + s_vector) AS score
FROM final
ORDER BY score DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@register(
    "q_text_bm25_search",
    oracle=_BM25_ORACLE,
    doc="BM25-ranked retrieval for a literal multi-term query over the "
    "document corpus: per-doc term frequencies, document length, and "
    "corpus statistics feed the Okapi score (k1=1.2, b=0.75), top-{k} "
    "docs by (score desc, doc_id). ONE tokenize→explode→groupBy(doc) "
    "pass computes dl and every per-term tf together (map-side "
    "combined; no tf⋈dl join), the corpus stats reduce to a single "
    "broadcast row, and the ranking is TakeOrderedAndProject — so the "
    "plan is one shuffle + one broadcast at any corpus size. The idf "
    "is quantized to the bit-length of the exact integer "
    "(N−df)·{s}/(df+1) — monotone in the real log-idf and "
    "bit-identical cross-engine (libm ln drifts between engines); "
    "per-term scores are summed in a fixed written order. The search "
    "tier's ranked-retrieval leg over the same statistics the "
    "inverted index (q_text_inverted_index) materializes.".format(
        k=_BM25_TOPK, s=_IDF_SCALE
    ),
    tags=("text", "search", "llm"),
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(TH.spark_tokens("text"))).alias("term")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.expr(_bm25_tf_case(t)).cast("bigint").alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    )
    return IX.bm25_score_per_doc(per_doc)


# ------------------------------------- sketch join-size estimation

_CMS_VALUES = (
    "(VALUES " + ", ".join(f"({i})" for i in range(SK.CMS_D)) + ") t(i)"
)


def _duck_cms(table: str, key: str) -> str:
    h = TH.duck_str_hash(f"CAST({key} AS VARCHAR)")
    return f"""
      SELECT i AS r, CAST({SK.duck_cms_bucket_sql('h')} AS INT) AS b,
             COUNT(*) AS cnt
      FROM (SELECT {key}, {h} AS h FROM {table})
      CROSS JOIN {_CMS_VALUES}
      GROUP BY r, b
    """


@register(
    "q_sketch_join_cardinality",
    oracle=f"""
    WITH ska AS ({_duck_cms('events', 'user_id')}),
    skb AS ({_duck_cms('customer', 'c_custkey')}),
    prods AS (
      SELECT a.r, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
      FROM ska a JOIN skb b ON a.r = b.r AND a.b = b.b
      GROUP BY a.r
    ),
    est AS (
      SELECT CAST(MIN(COALESCE(p.ip, 0)) AS BIGINT) AS est_pairs
      FROM (SELECT i AS r FROM {_CMS_VALUES}) spine
      LEFT JOIN prods p USING (r)
    ),
    ca AS (SELECT user_id AS k, COUNT(*) AS na FROM events GROUP BY 1),
    cb AS (SELECT c_custkey AS k, COUNT(*) AS nb FROM customer GROUP BY 1),
    ex AS (
      SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS exact_pairs
      FROM ca JOIN cb USING (k)
    )
    SELECT est_pairs, exact_pairs,
           CAST(est_pairs - exact_pairs AS BIGINT) AS overcount
    FROM est CROSS JOIN ex
    """,
    doc="Join-cardinality estimation from sketches: |events ⋈ "
    "customer on user_id=c_custkey| estimated as the minimum over "
    "hash rows of the inner product of the two sides' Count-Min "
    "sketches (the AMS/CM join-size estimator — one-sided "
    "overcount), audited against the exact join size in the same "
    "result. This is the planner pre-flight that decides shuffle "
    "strategy at 100 TB: each side reduces map-side to a fixed "
    "{d}×{w} summary, the estimate is computed on broadcast-size "
    "data, and no actual join of the big sides happens; the exact "
    "leg (a count-group join) is the test-scale comparator. Portable "
    "hash family ⇒ every cell and hence the estimate itself matches "
    "DuckDB exactly.".format(d=SK.CMS_D, w=SK.CMS_W),
    tags=("sketch", "join", "llm"),
)
def q_sketch_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    ska = SK.cms_build(ev, "user_id").alias("a")
    skb = SK.cms_build(cust, "c_custkey").alias("b")
    prods = (
        ska.join(skb, ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("bigint").alias("ip"))
    )
    # Min over ALL hash rows via the 0..CMS_D-1 spine: a row whose two
    # sketches share no bucket has true inner product 0 (the exact
    # AMS/CM row estimate for near-disjoint key sets) — dropping it
    # from the MIN would report a looser estimate than the minimum the
    # estimator claims.
    spine = (
        spark.range(SK.CMS_D).select(F.col("id").cast("int").alias("r"))
    )
    est = (
        spine.join(prods, "r", "left")
        .agg(
            F.min(F.coalesce(F.col("ip"), F.lit(0)))
            .cast("bigint")
            .alias("est_pairs")
        )
    )
    ca = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("na")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").alias("nb")
    )
    ex = (
        ca.join(cb, "k")
        .agg(
            F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
            .cast("bigint")
            .alias("exact_pairs")
        )
    )
    return est.crossJoin(ex).select(
        "est_pairs",
        "exact_pairs",
        (F.col("est_pairs") - F.col("exact_pairs"))
        .cast("bigint")
        .alias("overcount"),
    )


# ------------------------------------------- null-aware NOT IN


_NOT_IN_SQL = """
SELECT 'not_in_with_nulls' AS variant, COUNT(*) AS n
FROM {orders}
WHERE o_custkey NOT IN
  (SELECT CASE WHEN c_acctbal < 0 THEN c_custkey END FROM {customer})
UNION ALL
SELECT 'not_in_null_filtered' AS variant, COUNT(*) AS n
FROM {orders}
WHERE o_custkey NOT IN
  (SELECT c_custkey FROM {customer} WHERE c_acctbal < 0)
ORDER BY variant
"""


@register(
    "q_subquery_not_in_null_aware",
    oracle=_NOT_IN_SQL.format(orders="orders", customer="customer"),
    doc="NOT IN under three-valued logic: orders whose customer key is "
    "not in a subquery that CONTAINS NULLs (any NULL makes x NOT IN "
    "(...) never true — the count is 0 by the SQL standard) versus "
    "the NULL-filtered form (the real anti-join count). The classic "
    "silent-wrong-answer trap in pipeline audits. Spark plans the "
    "first leg as a null-aware broadcast anti join "
    "(BroadcastHashJoin isNullAware) — single-key NOT IN stays a "
    "broadcast probe, not the quadratic BroadcastNestedLoopJoin — "
    "and the second as an ordinary broadcast left-anti; both "
    "map-only against the fact at any scale.",
    tags=("relational", "subquery", "join"),
)
def q_subquery_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_nin"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_nin"
    )
    return spark.sql(
        _NOT_IN_SQL.format(orders="orders_nin", customer="customer_nin")
    )


# ------------------------------------------- mergeable moments

#: cents scaling shared with the histogram sketch (exact integers).
_CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
#: variance from merged partials, every operand/order shared:
#: var = ((Σc² − (Σc·Σc)/n) / n) / 100²  (population variance).
_MOM_FINAL = (
    "CAST(n AS BIGINT) AS n, "
    "((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0) AS mean_val, "
    "(((CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) / 10000.0) AS var_val"
)


@register(
    "q_stats_moments_merge",
    oracle=f"""
    WITH c AS (
      SELECT event_type, {_CENTS} AS c FROM events WHERE value IS NOT NULL
    ),
    partials AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(c) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(c * c) AS DECIMAL(38,0)) AS s2
      FROM c GROUP BY event_type
    )
    SELECT event_type, {_MOM_FINAL}
    FROM partials
    ORDER BY event_type
    """,
    doc="Grouped count/mean/variance from exact mergeable partials: "
    "per event type the moments (n, Σcents, Σcents²) accumulate in "
    "integer/DECIMAL(38) arithmetic — partials from ANY split of the "
    "data (partitions, micro-batches) sum to the same triple, pinned "
    "by tests/test_llm9.py — and mean/variance derive by shared-order "
    "IEEE division at the end. This is the parallel-moments pattern "
    "every profiler needs at 100 TB: the shuffle carries 3 numbers "
    "per group (map-side combined), never rows, and the same merge "
    "maintains running moments on a stream. Plain sum(double) would "
    "drift across engines and partitionings; Welford's streaming "
    "update would serialize — exact partial sums give both "
    "mergeability and bit-stability.",
    tags=("agg", "stats", "llm"),
)
def q_stats_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where("value IS NOT NULL")
    partials = (
        ev.select("event_type", F.expr(_CENTS).alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s1x"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias(
                "s2x"
            ),
        )
        # Spark SUM(DECIMAL(38,0)) stays decimal(38,0); re-alias for the
        # shared final expression (raw decimals never leave the query).
        .select(
            "event_type",
            "n",
            F.col("s1x").alias("s1"),
            F.col("s2x").alias("s2"),
        )
    )
    return partials.selectExpr("event_type", *_MOM_FINAL.split(", ")).orderBy(
        "event_type"
    )


# ------------------------------------------- MAD anomaly detection

#: Outlier threshold: |v − median| > 3·MAD (unscaled MAD — the
#: 1.4826 normal-consistency factor would add nothing cross-engine).
_MAD_K = "3.0"


@register(
    "q_events_anomaly_mad",
    oracle=f"""
    WITH v AS (
      SELECT event_type, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    cnt AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY event_type),
    med AS (
      SELECT event_type, value AS med FROM (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn
        FROM v
      ) r JOIN cnt USING (event_type)
      WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT v.event_type, v.event_id, abs(v.value - m.med) AS dev, m.med
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, dev AS mad FROM (
        SELECT event_type, dev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS rn
        FROM dev
      ) r JOIN cnt USING (event_type)
      WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type, c.n, m.med, a.mad,
           CAST(SUM(CASE WHEN d.dev > {_MAD_K} * a.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m USING (event_type)
    JOIN mad a USING (event_type)
    JOIN cnt c USING (event_type)
    GROUP BY d.event_type, c.n, m.med, a.mad
    ORDER BY d.event_type
    """,
    doc="Robust per-group anomaly detection: lower median and lower-"
    "median absolute deviation (MAD) of event values per type, and "
    "the count of values beyond {k}·MAD — the outlier screen robust "
    "to the outliers it hunts (mean/stddev screens are not). Medians "
    "are RANK-SELECTED (row (n+1)/2 by (value, event_id)) — actual "
    "data elements, no interpolation — so every compared double is a "
    "raw input value and the result is bit-identical cross-engine "
    "(interpolated percentiles hide engine-specific arithmetic "
    "order). The rank selection runs on the exact value histogram "
    "(map-side-combined groupBy (type, value) + cumulative count — "
    "the k-th order statistic is tie-break-independent, so the "
    "selected double is identical), never a full-table sort: the "
    "shuffle and the per-type window carry distinct values, not "
    "rows, with full map-side parallelism at any group count; at "
    "100 TB the same screen runs on the mergeable log-histogram "
    "sketch's quantile estimates (q_sketch_quantile_hist) instead "
    "of exact ranks, trading the documented bucket-width error for "
    "a shuffle of O(sketch).".format(k=_MAD_K),
    tags=("events", "stats", "quality"),
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The rank-selected medians are computed over the VALUE HISTOGRAM
    # (groupBy (event_type, value) + cumulative count), not via
    # row_number windows over the full events table: the k-th order
    # statistic of a multiset is the smallest value whose cumulative
    # multiplicity reaches k, independent of the (value, event_id)
    # tie-break — ties share one value, so the selected double is
    # identical to the oracle's rank-selected row.  The window row
    # count drops from |events| to |distinct (type, value)| (bounded
    # by the value domain after the map-side combine), removing the
    # full per-type sort that serialized one event_type per task —
    # the q_events_anomaly_mad_hist plan shape (guide §2.4/§2.2),
    # here exact for ARBITRARY doubles because nothing quantizes.
    from ..functions.caching import track_persist

    v = (
        load_table(spark, sf_dir, "events")
        .where("value IS NOT NULL")
        .select("event_type", "value")
    )
    h = v.groupBy("event_type", "value").agg(F.count("*").alias("cnt"))
    # The cached copy is coalesced: the aggregation itself keeps full
    # map-side parallelism, but the RESULT is histogram-sized by
    # construction, and every downstream pass otherwise pays one task
    # per shuffle partition of pure overhead (measured 0.3–0.4 s per
    # 32-task stage over a 10k-row cache).  4 partitions bounds that
    # while leaving room for multi-GB histograms at the top decades.
    h = track_persist(h.coalesce(4))
    # materialize the histogram once: its consumers (n, med, devh)
    # otherwise race to fill the lazy cache from concurrent AQE
    # broadcast-build stages, each re-running the events scan
    h.count()
    n = h.groupBy("event_type").agg(F.sum("cnt").cast("bigint").alias("n"))
    wc = Window.partitionBy("event_type").orderBy("value")
    cum = h.withColumn("cm", F.sum("cnt").over(wc))
    med = (
        cum.join(F.broadcast(n), "event_type")
        .where(F.expr("cm >= (n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(F.min("value").alias("med"))
    )
    # deviation histogram: a regroup of the value histogram (dev is a
    # function of (value, med) — the same double the row form computes)
    devh = (
        h.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.expr("abs(value - med)").alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    devh = track_persist(devh.coalesce(4))
    devh.count()
    wd = Window.partitionBy("event_type").orderBy("dev")
    dcum = devh.withColumn("cm", F.sum("cnt").over(wd))
    mad = (
        dcum.join(F.broadcast(n), "event_type")
        .where(F.expr("cm >= (n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(F.min("dev").alias("mad"))
    )
    outl = (
        devh.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN dev > {_MAD_K} * mad THEN cnt "
                f"ELSE 0 END) AS BIGINT)"
            ).alias("n_outliers")
        )
    )
    return (
        n.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .join(F.broadcast(outl), "event_type")
        .select("event_type", "n", "med", "mad", "n_outliers")
        .orderBy("event_type")
    )


# --------------------------------- MAD, the one-scan histogram form

#: Lower-median rank over a cumulative count: smallest key whose
#: running total reaches (n+1) DIV 2.
_MAD2_K = 3


@register(
    "q_events_anomaly_mad_hist",
    oracle=f"""
    WITH h AS (
      SELECT event_type, {_CENTS} AS c, COUNT(*) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, c
    ),
    n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
          FROM h GROUP BY event_type),
    cum AS (
      SELECT event_type, c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cm
      FROM h
    ),
    med AS (
      SELECT cum.event_type, MIN(c) AS med_c
      FROM cum JOIN n USING (event_type)
      WHERE cm >= (n.n + 1) // 2
      GROUP BY cum.event_type
    ),
    devh AS (
      SELECT h.event_type, abs(h.c - m.med_c) AS d,
             CAST(SUM(h.cnt) AS BIGINT) AS cnt
      FROM h JOIN med m USING (event_type)
      GROUP BY h.event_type, abs(h.c - m.med_c)
    ),
    dcum AS (
      SELECT event_type, d, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY d) AS cm
      FROM devh
    ),
    mad AS (
      SELECT dcum.event_type, MIN(d) AS mad_c
      FROM dcum JOIN n USING (event_type)
      WHERE cm >= (n.n + 1) // 2
      GROUP BY dcum.event_type
    ),
    outl AS (
      SELECT devh.event_type,
             CAST(SUM(CASE WHEN devh.d > {_MAD2_K} * mad.mad_c
                      THEN devh.cnt ELSE 0 END) AS BIGINT) AS n_outliers
      FROM devh JOIN mad USING (event_type)
      GROUP BY devh.event_type
    )
    SELECT n.event_type, n.n,
           CAST(med.med_c AS DOUBLE) / 100.0 AS med_val,
           CAST(mad.mad_c AS DOUBLE) / 100.0 AS mad_val,
           outl.n_outliers
    FROM n
    JOIN med USING (event_type)
    JOIN mad USING (event_type)
    JOIN outl USING (event_type)
    ORDER BY n.event_type
    """,
    doc="Median/MAD anomaly screen in ONE event scan — the scale form "
    "of q_events_anomaly_mad: values quantize to exact integer cents, "
    "one map-side-combined groupBy builds the per-type cents "
    "histogram, and EVERYTHING else — lower median (rank-selected "
    "over the cumulative histogram), the deviation histogram (a "
    "regroup of the histogram itself by |c − med|, no second scan), "
    "the MAD, and the {k}·MAD outlier count (summed from histogram "
    "cells) — runs on histogram-sized data. The exact-rank form "
    "partitions its sorts by event_type and so parallelizes at most "
    "#groups-ways (measured 15× wall ratio at sf10 with 5 types); "
    "this form's shuffle is O(distinct cents ≈ value range·100) with "
    "full map-side parallelism at any group count, and every number "
    "is exact integer arithmetic at cent resolution — same results "
    "as the exact form whenever the data is cent-quantized (pinned "
    "in tests/test_llm9.py).".format(k=_MAD2_K),
    tags=("events", "stats", "quality", "sketch"),
)
def q_events_anomaly_mad_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where("value IS NOT NULL")
    h = (
        ev.select("event_type", F.expr(_CENTS).alias("c"))
        .groupBy("event_type", "c")
        .agg(F.count("*").alias("cnt"))
    )
    from ..functions.caching import track_persist

    # coalesce the histogram-sized cache (downstream passes otherwise
    # pay one task per shuffle partition of pure overhead) and
    # materialize it once — the n/med/devh consumers otherwise race to
    # fill the lazy cache from concurrent AQE broadcast-build stages,
    # each re-running the events scan (same fixes as the exact form)
    h = track_persist(h.coalesce(4))
    h.count()
    n = h.groupBy("event_type").agg(F.sum("cnt").cast("bigint").alias("n"))
    wc = Window.partitionBy("event_type").orderBy("c")
    cum = h.withColumn("cm", F.sum("cnt").over(wc))
    med = (
        cum.join(F.broadcast(n), "event_type")
        .where(F.expr("cm >= (n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(F.min("c").alias("med_c"))
    )
    devh = (
        h.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.expr("abs(c - med_c)").alias("d"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    devh = track_persist(devh.coalesce(4))
    devh.count()
    wd = Window.partitionBy("event_type").orderBy("d")
    dcum = devh.withColumn("cm", F.sum("cnt").over(wd))
    mad = (
        dcum.join(F.broadcast(n), "event_type")
        .where(F.expr("cm >= (n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(F.min("d").alias("mad_c"))
    )
    outl = (
        devh.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"CAST(SUM(CASE WHEN d > {_MAD2_K} * mad_c THEN cnt "
                f"ELSE 0 END) AS BIGINT)"
            ).alias("n_outliers")
        )
    )
    return (
        n.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .join(F.broadcast(outl), "event_type")
        .select(
            "event_type",
            "n",
            F.expr("CAST(med_c AS DOUBLE) / 100.0").alias("med_val"),
            F.expr("CAST(mad_c AS DOUBLE) / 100.0").alias("mad_val"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


# ------------------------------------------- mergeable correlation

#: cents-scaled measures; all six partials in DECIMAL(38) → the
#: Pearson correlation from one shared-order expression (sqrt is
#: IEEE-correctly-rounded, so identical operands give identical
#: results cross-engine — unlike ln/exp).
_CORR_X = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
_CORR_Y = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_CORR_FINAL = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) - "
    "(CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / "
    "sqrt(((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)) - "
    "(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * "
    "((CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)) - "
    "(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)


@register(
    "q_stats_correlation_merge",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag AS grp, {_CORR_X} AS x, {_CORR_Y} AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    partials AS (
      SELECT grp, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sx2,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS sy2
      FROM c GROUP BY grp
    )
    SELECT grp, CAST(n AS BIGINT) AS n, {_CORR_FINAL} AS corr
    FROM partials
    ORDER BY grp
    """,
    doc="Grouped Pearson correlation (quantity vs extended price per "
    "return flag) from exact mergeable partials: the six sums "
    "(n, Σx, Σy, Σxy, Σx², Σy²) accumulate in integer/DECIMAL(38) "
    "arithmetic — partials from any split of the data merge exactly, "
    "so the shuffle carries six numbers per group and the same merge "
    "maintains running correlations on a stream — and the final "
    "Pearson expression evaluates once in a fixed operand order "
    "(sqrt is IEEE-correctly-rounded, so identical operands give "
    "bit-identical results, unlike ln/exp). The bivariate member of "
    "the moments family (q_stats_moments_merge); corr(x, x·a+b) "
    "degenerates correctly (pinned in tests/test_llm9.py).",
    tags=("agg", "stats", "llm"),
)
def q_stats_correlation_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        "l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL"
    )
    partials = (
        li.select(
            F.col("l_returnflag").alias("grp"),
            F.expr(_CORR_X).alias("x"),
            F.expr(_CORR_Y).alias("y"),
        )
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            # Cast INSIDE the sum: per-element products fit int64
            # (x ≤ 5e5, y ≤ ~1.1e7 cents ⇒ y² ≤ ~1.1e14) but their SUM
            # does not — Σy² per group is ~2.6e18 at sf0.1, past int64
            # at sf1 (ANSI would throw; non-ANSI silently wraps while
            # DuckDB sums in HUGEINT).  Accumulating in DECIMAL(38,0)
            # keeps the partials exact at any scale, matching the
            # moments query's pattern.
            F.sum(F.expr("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.expr("y").cast("decimal(38,0)")).alias("sy"),
            F.sum(F.expr("x * y").cast("decimal(38,0)")).alias("sxy"),
            F.sum(F.expr("x * x").cast("decimal(38,0)")).alias("sx2"),
            F.sum(F.expr("y * y").cast("decimal(38,0)")).alias("sy2"),
        )
    )
    return partials.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.expr(_CORR_FINAL).alias("corr"),
    ).orderBy("grp")
