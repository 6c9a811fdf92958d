"""Sixth LLM-pipeline wave: cross-source contamination flow and
length-bucketed batching — corpus provenance auditing and the
padding-efficiency side of batch assembly.

Both oracle-checked with exact integer arithmetic: chunk flow is
distinct-pair counting over the portable chunk-hash family, and the
length bucketing rides the scale-safe global prefix sum with an
integer bucket formula (identical in both engines, no NTILE dialect
drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators.chunks import CHUNK_W, chunk_hashes
from ..operators.sharding import global_running_sum
from ..sources.batch import load_table
from .registry import register

# ------------------------------------- cross-source chunk flow


@register(
    "q_dedup_cross_source_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {TH.duck_tokens('text')} AS toks FROM documents
    ),
    ch AS (
      SELECT DISTINCT source, h FROM (
        SELECT source,
               unnest(list_transform(
                 generate_series(0, len(toks) // {CHUNK_W} - 1),
                 i -> {TH.duck_str_hash(
                     f"array_to_string(toks[i * {CHUNK_W} + 1 : "
                     f"i * {CHUNK_W} + {CHUNK_W}], ' ')")}
               )) AS h
        FROM t WHERE len(toks) >= {CHUNK_W}
      )
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS shared_chunks
    FROM ch a JOIN ch b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY shared_chunks DESC, src_a, src_b
    """,
    doc="Provenance audit: 16-token chunks appearing in more than one "
    "source, counted per source pair — where boilerplate/content flows "
    "between crawl sources. Only distinct (chunk-hash, source) rows "
    "shuffle (8-byte hashes, never text); the per-chunk pair expansion "
    "is bounded by #sources², and the output is #source-pairs rows. "
    "(operators/chunks.py)",
    tags=("llm", "dedup", "chunks", "provenance"),
)
def q_cross_source_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ch = (
        chunk_hashes(docs.select("doc_id", "source", "text"), id_col="source")
        .select("source", "h")
        .distinct()
    )
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("shared_chunks"))
        .orderBy(F.desc("shared_chunks"), "src_a", "src_b")
    )


# ------------------------------------- length-bucketed batching

_N_BUCKETS = 8


@register(
    "q_pack_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({TH.duck_tokens('text')}) AS BIGINT) AS n_tok
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tok,
             ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS rk,
             COUNT(*) OVER () AS total
      FROM t WHERE n_tok > 0
    ),
    b AS (
      SELECT doc_id, n_tok,
             CAST(((rk - 1) * {_N_BUCKETS}) // total AS BIGINT) AS bucket
      FROM r
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(MIN(n_tok) AS BIGINT) AS min_tok,
           CAST(MAX(n_tok) AS BIGINT) AS max_tok,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS padding_waste
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Length-bucketed batching plan: rank documents by token count "
    "(unique tiebreaker), cut into equal-population buckets with an "
    "exact integer formula, and report per-bucket padding waste "
    "(max_len·docs − Σlen — the tokens a pad-to-max batcher burns). "
    "The global rank is the two-phase scale-safe prefix sum "
    "(operators/sharding.py), not a single-partition window; the "
    "oracle's naive ROW_NUMBER is bit-identical by construction. "
    "Equal-population bucketing beats fixed length ranges under "
    "skewed length distributions — every batch bucket gets the same "
    "row count.",
    tags=("llm", "pack", "batching"),
)
def q_pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(f"CAST(size({TH.spark_tokens('text')}) AS BIGINT)").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    # scale-safe global rank: running count of 1s over (n_tok, doc_id)
    ranked = global_running_sum(
        t.withColumn("_one", F.lit(1)),
        "_one",
        ["n_tok", "doc_id"],
        cum_col="rk",
    )
    total = ranked.groupBy().agg(F.max("rk").alias("total"))
    b = ranked.crossJoin(F.broadcast(total)).withColumn(
        "bucket", F.expr(f"CAST(((rk - 1) * {_N_BUCKETS}) DIV total AS BIGINT)")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("docs"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
            (F.max("n_tok") * F.count("*") - F.sum("n_tok")).alias(
                "padding_waste"
            ),
        )
        .orderBy("bucket")
    )
