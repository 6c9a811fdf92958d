"""Fourth LLM-pipeline wave: corpus mixture realization, n-gram
language-model counts, and context-window sequence packing — the steps
that turn a clean corpus into what the trainer actually consumes.

All three are oracle-checked with exact integer arithmetic: mixture
membership is a portable hash predicate, LM counts are plain combinable
counts, and the packing plan rides the same scale-safe global prefix
sum as the shard assigner (bit-identical to the oracle's naive
single-window cumsum by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..operators.mixing import duck_mixture_keep_sql, mixture_report
from ..operators.sharding import pack_sequences
from ..sources.batch import load_table
from .registry import register

# ------------------------------------------------------- data mixing

#: target mixture: keep-rate per language, parts-per-million.
_MIX_PPM = {
    "en": 800_000,
    "fr": 650_000,
    "de": 650_000,
    "es": 650_000,
    "zh": 300_000,
}


@register(
    "q_mix_weighted_lang",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS docs_in,
           CAST(SUM(CASE WHEN {duck_mixture_keep_sql("doc_id", "lang", _MIX_PPM)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_in,
           CAST(SUM(CASE WHEN {duck_mixture_keep_sql("doc_id", "lang", _MIX_PPM)}
                    THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Corpus-mixture realization audit: downsample each language at "
    "its target rate (en 80%, fr/de/es 65%, zh 30%) via a portable "
    "content-hash predicate — rand()-free, so the mixture is a pure "
    "function of the data and reproduces identically on any cluster / "
    "partitioning / engine. Single map-only scan with conditional "
    "aggregation (no per-stratum passes); output one row per stratum. "
    "(operators/mixing.py)",
    tags=("llm", "mixing", "sample"),
)
def q_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rep = mixture_report(docs, _MIX_PPM, size_col="n_chars")
    return rep.select(
        "lang",
        "docs_in",
        "docs_kept",
        F.col("tok_in").alias("chars_in"),
        F.col("tok_kept").alias("chars_kept"),
    ).orderBy("lang")


# ----------------------------------------------- n-gram LM counts

_BIGRAM_MIN_COUNT = 2


@register(
    "q_ngram_bigram_counts",
    oracle=f"""
    WITH t AS (
      SELECT {TH.duck_tokens('text')} AS toks FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg
    GROUP BY bigram
    HAVING COUNT(*) >= {_BIGRAM_MIN_COUNT}
    ORDER BY cnt DESC, bigram
    LIMIT 100
    """,
    doc="KenLM-style n-gram count table (bigrams): raw (not distinct) "
    "token bigrams per document, combinable global counts with a "
    "min-count prune, top-100 by frequency. Map-side combine carries "
    "partial counts; TakeOrderedAndProject avoids a full sort. The "
    "count-threshold prune is the standard LM-table size guard — at "
    "100 TB the post-HAVING table is orders of magnitude smaller than "
    "the raw bigram stream.",
    tags=("llm", "text", "ngram"),
)
def q_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.expr(TH.spark_tokens("text")).alias("toks")).filter(
        F.expr("size(toks) >= 2")
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= _BIGRAM_MIN_COUNT)
        .orderBy(F.desc("cnt"), "bigram")
        .limit(100)
    )


# ------------------------------------------- sequence packing plan

_SEQ_LEN = 256  # tokens per packed training sequence


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({TH.duck_tokens('text')}) AS BIGINT) AS n_tok,
             {TH.duck_str_hash("CAST(doc_id AS VARCHAR)")} AS ord
      FROM documents
      WHERE len({TH.duck_tokens('text')}) > 0
    ),
    c AS (
      SELECT doc_id, n_tok,
             CAST(SUM(n_tok) OVER (ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM t
    )
    SELECT doc_id, n_tok,
           CAST((cum - n_tok) // {_SEQ_LEN} AS BIGINT) AS first_seq,
           CAST((cum - 1) // {_SEQ_LEN} AS BIGINT) AS last_seq,
           CAST((cum - 1) // {_SEQ_LEN} - (cum - n_tok) // {_SEQ_LEN} + 1
                AS BIGINT) AS n_seqs
    FROM c
    ORDER BY doc_id
    """,
    doc=f"Context-window packing plan: lay documents head-to-tail in "
    f"deterministic hash order and map each onto the fixed "
    f"{_SEQ_LEN}-token training sequences it occupies; n_seqs > 1 "
    f"marks boundary-crossing documents (the packing-efficiency / "
    f"attention-fragmentation metric). Runs on the scale-safe two-phase "
    f"global prefix sum (range-partition → local cumsum → broadcast "
    f"offsets), bit-identical to the oracle's single-window form. "
    f"(operators/sharding.py pack_sequences)",
    tags=("llm", "sharding", "packing"),
)
def q_pack_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, _SEQ_LEN).orderBy("doc_id")
