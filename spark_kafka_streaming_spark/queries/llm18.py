"""Round-7 LLM-pipeline additions (second wave): the mergeable
bottom-k quantile sketch — rank statistics without a global sort —
global and per-group, each with an in-band exact rank audit so the
driver's value-hash pins estimation QUALITY, not just determinism.

Reference provenance: the reference repo (wgnet/spark-kafka-streaming)
has no quantile surface (its only aggregate is the windowed word count,
``KafkaWordCount.scala:70-73``); these extend the §2c sketch family
per SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators.quantiles import (
    K_GROUP,
    duck_quantiles_sql,
    quantiles_with_audit,
)
from ..sources.batch import load_table, table_row_count
from .registry import register

#: unique lineitem row key (l_linenumber ∈ 1..7, so ×8 is injective)
_LI_KEY = "l_orderkey * 8 + l_linenumber"


@register(
    "q_quantile_sketch_prices",
    oracle=duck_quantiles_sql("lineitem", "l_extendedprice", _LI_KEY),
    doc="Mergeable bottom-k quantile sketch over lineitem prices "
    "(operators/quantiles.py): every row gets a deterministic md5 "
    "priority, the sketch is the k=1024 smallest — compiled to "
    "TakeOrderedAndProject (each task emits ≤ k rows; no full shuffle, "
    "no sort of the data) — and seven quantiles are read at rank "
    "⌈q·m⌉. One conditional-aggregation scan (no sort) audits each "
    "estimate's exact rank: rank_err is the distance from q to the "
    "estimate's true rank interval and ok pins the O(1/√k) Hoeffding "
    "concentration IN-BAND, so the oracle hash checks quality. "
    "Partials merge associatively (bottom-k of unions), the property "
    "the streaming twin (streaming/incremental_quantiles.py) builds "
    "on.",
    tags=("llm", "sketch", "quantile"),
)
def q_quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return quantiles_with_audit(li, "l_extendedprice", _LI_KEY)


@register(
    "q_quantile_sketch_doclen_by_lang",
    oracle=duck_quantiles_sql(
        "documents", "n_chars", "doc_id", k=K_GROUP, group_col="lang"
    ),
    doc="Per-language document-length quantiles via the grouped "
    "bottom-k sketch (operators/quantiles.py): a bounded-memory "
    "per-task reduction keeps ≤ k=256 rows per group seen (the "
    "misra_gries_candidates shape — the union of task outputs is a "
    "guaranteed superset of each group's global bottom-k), so the "
    "shuffle is O(tasks·groups·k) rows, never the corpus; one window "
    "pass over the survivors finalizes the cut. Same in-band exact "
    "rank audit per (lang, q) as the global form; groups smaller than "
    "k degrade gracefully to exact quantiles (m = group size).",
    tags=("llm", "sketch", "quantile", "grouped"),
)
def q_quantile_sketch_doclen_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quantiles_with_audit(
        docs, "n_chars", "doc_id", k=K_GROUP, group_col="lang"
    )


#: Sessionized events as a derived table (the q_events_sessionize_batch
#: gaps-and-islands expressions) reduced to one row per session:
#: a unique session key and the session duration in microseconds.
#: Exact integer-microsecond gaps, same convention as events.py.
_SESSIONS_SQL = """(
  WITH flagged AS (
    SELECT user_id, ts, event_id,
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
  SELECT user_id * 100000 + session_no AS skey,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM numbered GROUP BY user_id, session_no
) sessions"""


@register(
    "q_events_session_duration_quantiles",
    oracle=duck_quantiles_sql(_SESSIONS_SQL, "dur_us", "skey", k=512),
    doc="Session-duration distribution — operator composition: "
    "gaps-and-islands sessionization (the q_events_sessionize_batch "
    "expressions, exact integer-microsecond 30-min gaps) reduced to "
    "one duration per session, then the bottom-k quantile sketch "
    "(operators/quantiles.py, k=512) with the in-band exact rank "
    "audit. The product-analytics P50/P95/P99 session-length panel as "
    "one query: sessionization shuffles keyed by user (the minimum "
    "any session definition needs), the sketch adds no full sort, and "
    "the audit re-scans only the one-row-per-session table.",
    tags=("events", "session", "sketch", "quantile"),
)
def q_events_session_duration_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap.isNull() | (gap >= 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = (
        ev.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_no")
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us")
        )
        .select(
            (F.col("user_id") * 100000 + F.col("session_no")).alias("skey"),
            "dur_us",
        )
    )
    return quantiles_with_audit(sessions, "dur_us", "skey", k=512)


_HH_GROUP_PHI = 0.02


@register(
    "q_text_heavy_hitters_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({TH.duck_tokens('text')}) AS token FROM documents
    ),
    f AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY lang, token),
    t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_group FROM f GROUP BY lang)
    SELECT f.lang AS lang, token, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(n_group AS DOUBLE), 6) AS frac
    FROM f JOIN t USING (lang)
    WHERE cnt >= ceil({_HH_GROUP_PHI} * n_group)
    ORDER BY lang, token
    """,
    doc="Exact per-language phi-heavy hitters (phi=0.02) — the grouped "
    "form of q_text_heavy_hitters (operators/sketches.py::"
    "heavy_hitters_exact_grouped): an independent bounded-memory "
    "Misra-Gries summary per (task, language) gives a provable "
    "no-false-negative candidate superset PER GROUP, per-group exact "
    "totals reduce from the same scan's sentinel rows, and the exact "
    "second pass counts candidate (lang, token) pairs only. The "
    "per-domain vocabulary-drift / per-language stopword panel at "
    "100 TB: the shuffle is O(tasks·langs·capacity) candidates, never "
    "the full distinct (lang, token) space — and the result is "
    "identical to the full groupBy the oracle runs.",
    tags=("llm", "sketch", "text", "grouped"),
)
def q_text_heavy_hitters_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sketches import heavy_hitters_exact_grouped

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.expr(TH.spark_tokens("text"))).alias("token")
    )
    return heavy_hitters_exact_grouped(
        toks, "lang", "token", phi=_HH_GROUP_PHI
    ).orderBy("lang", "token")



# --------------------------------------------- IMI recall harness


def _duck_imi_recall_oracle() -> str:
    from ..functions import vectors as V
    from ..operators.similarity import duck_ivf2_topk_sql
    from .llm17 import _FULL_NCELLS_SQL

    brute = f"""
    WITH sv AS (
      SELECT vec_id, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    sn AS (SELECT vec_id, v, {V.duck_dot('v', 'v')} AS n FROM sv),
    q AS (SELECT * FROM sn WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST({V.duck_dot('q.v', 'c.v')} AS DOUBLE)
               / (sqrt(CAST(q.n AS DOUBLE)) * sqrt(CAST(c.n AS DOUBLE)))
               AS cos_sim
      FROM q JOIN sn c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
      ) AS rn FROM scored
    ) t WHERE rn <= 5
    """
    imi = duck_ivf2_topk_sql(5, "id < 10", n_cells_sql=_FULL_NCELLS_SQL)
    return f"""
    WITH brute AS (SELECT query_id, neighbor_id FROM ({brute}) b),
    approx AS (
      SELECT query_id, neighbor_id FROM ({imi}) a
    )
    SELECT b.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / 5 AS recall_at_5
    FROM brute b
    LEFT JOIN approx a
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@register(
    "q_ann_recall_imi",
    oracle=_duck_imi_recall_oracle(),
    doc="ANN self-evaluation for the near-linear build path: recall@5 "
    "of the two-level (IMI-style) coarse quantizer against exact "
    "brute-force top-k, per query — the fourth leg of the ANN quality "
    "harness (with q_ann_recall_lsh / q_ann_recall_ivfpq / "
    "q_dedup_minhash_recall). Prices exactly what the |C|·O(√n_cells) "
    "assignment trades: a truth neighbor whose cell lives in an "
    "unprobed super. Bounded 10-query truth leg (brute force is the "
    "cost ceiling, the q_ann_recall_ivfpq pattern); the planted "
    "40-cluster CI fixture asserts ≥ 0.95 on structured corpora "
    "(tests/test_planted_clusters.py).",
    tags=("llm", "similarity", "imi", "evaluation"),
)
def q_ann_recall_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk, ivf_topk_imi
    from .llm13 import auto_cells

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    approx = (
        # footer-metadata count: raw table, same integer, no scan job
        ivf_topk_imi(
            q, emb, k=5,
            n_cells=auto_cells(table_row_count(sf_dir, "embeddings")),
        )
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        brute.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
            (F.sum(F.coalesce("_hit", F.lit(0))) / 5.0).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ------------------------------------- event-time windowed quantiles


@register(
    "q_quantile_windowed_hourly",
    oracle=duck_quantiles_sql(
        """(
      SELECT CAST(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS VARCHAR)
               || '|' || event_type AS wg,
             value AS v, event_id AS ek
      FROM events
    ) we""",
        "v",
        "ek",
        k=64,
        group_col="wg",
    ),
    doc="Event-time windowed rank analytics: per (hour, event_type) "
    "value quantiles via the grouped bottom-k sketch (k=64 per "
    "window-group) with the in-band exact rank audit — the hourly "
    "P50/P95/P99 latency/value panel every monitoring deployment "
    "runs, computed without sorting any window. The window key is the "
    "integer event-time hour (epoch_us/3.6e9 — engine-portable exact "
    "integer arithmetic, no timezone/format drift) composed with the "
    "type; groups are naturally bounded (hours × types) and the "
    "per-task cut keeps the shuffle at O(tasks·windows·k) however "
    "many events land in a window. The same bottom-k state serves the "
    "streaming form (streaming/incremental_quantiles.py with the "
    "window key as group_col) — batch and stream share the exact "
    "merge property.",
    tags=("events", "window", "sketch", "quantile"),
)
def q_quantile_windowed_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat(
            (F.floor(F.unix_micros("ts") / 3_600_000_000)).cast("long").cast("string"),
            F.lit("|"),
            F.col("event_type"),
        ).alias("wg"),
        F.col("value").alias("v"),
        F.col("event_id").alias("ek"),
    )
    return quantiles_with_audit(keyed, "v", "ek", k=64, group_col="wg")
