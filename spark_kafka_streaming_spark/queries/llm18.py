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

from pyspark.sql import DataFrame, SparkSession

from ..operators.quantiles import (
    K_GROUP,
    duck_quantiles_sql,
    quantiles_with_audit,
)
from ..sources.batch import load_table
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
