"""Second LLM-pipeline wave: full dedup resolution (pairs → clusters →
survivors), deterministic sampling, and corpus vocabulary analytics.

These are the operations that turn the pair-emitting dedup tier into a
usable training-data pipeline: transitively-closed duplicate clusters
with a canonical survivor, reproducible stratified subsampling (data
mixes), and vocabulary statistics (the corpus-scale form of the
reference's word count, ``KafkaWordCount.scala:60-66``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators.clusters import dedup_survivors
from ..operators.dedup import minhash_lsh_pairs
from ..operators.signatures import signature_table
from ..sources.batch import load_table
from .registry import register

# The minhash pair CTEs, shared with q_dedup_minhash_lsh's oracle.
_PAIR_CTES = f"""
    hs0 AS (
      SELECT doc_id,
             list_distinct(list_transform({TH.duck_shingles('text')},
               s -> {TH.duck_str_hash('s')})) AS hs
      FROM documents
    ),
    sig AS (
      SELECT doc_id, hs, {TH.duck_minhash_sig('hs')} AS sig
      FROM hs0 WHERE len(hs) > 0
    ),
    bands AS ({" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {TH.duck_band_key('sig', b)} AS key FROM sig"
        for b in range(TH.BANDS)
    )}),
    cand AS (
      SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id
    ),
    pairs AS (
      SELECT id1, id2
      FROM cand
      JOIN sig s1 ON s1.doc_id = id1
      JOIN sig s2 ON s2.doc_id = id2
      WHERE CAST(len(list_filter(s1.hs, x -> list_contains(s2.hs, x))) AS DOUBLE)
            / CAST(len(s1.hs) + len(s2.hs)
                   - len(list_filter(s1.hs, x -> list_contains(s2.hs, x))) AS DOUBLE)
            >= 0.5
    )
"""


@register(
    "q_dedup_clusters_minhash",
    oracle=f"""
    WITH RECURSIVE {_PAIR_CTES},
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION
      SELECT id2, id1 FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS is_survivor
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    doc="Full dedup resolution: MinHash-LSH pairs → connected "
    "components (min-label propagation, O(diameter) shuffle-bounded "
    "rounds) → canonical survivor per cluster. The oracle recomputes "
    "components by recursive transitive closure — exact for the "
    "small-cluster graphs near-dup corpora produce.",
    tags=("llm", "dedup", "clusters"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = signature_table(spark, sf_dir)
    pairs = minhash_lsh_pairs(None, jaccard_threshold=0.5, sigs=sigs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return dedup_survivors(pairs, docs).orderBy("doc_id")


@register(
    "q_sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {TH.duck_str_hash("'smpl:' || CAST(doc_id AS VARCHAR)")} % 10 = 0
    ORDER BY doc_id
    """,
    doc="Deterministic stratified sampling: keep ~10% per stratum by "
    "portable content hash of the id (not rand()) — the reproducible "
    "data-mix primitive; re-running the pipeline yields the identical "
    "sample, and the oracle proves it cross-engine.",
    tags=("llm", "sample"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(TH.spark_str_hash("concat('smpl:', CAST(doc_id AS STRING))"))
    return (
        docs.filter(h % 10 == 0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "q_text_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TH.duck_tokens('text')}) AS token
      FROM documents
    )
    SELECT token,
           COUNT(*) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 100
    """,
    doc="Corpus vocabulary top-k: global term frequency + document "
    "frequency, TakeOrdered top-100 — the batch corpus-scale form of "
    "the reference's streaming word count (KafkaWordCount.scala:60-66). "
    "Map-side-combined counts; no full sort (top-k only).",
    tags=("llm", "text", "vocab"),
)
def q_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(TH.spark_tokens("text"))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(100)
    )
