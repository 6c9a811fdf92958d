"""Third LLM-pipeline wave: benchmark decontamination, chunk-level
exact dedup, PII redaction, and token-budget training-shard assignment
— the corpus-hygiene and packing steps between "deduped documents" and
"training shards".

All four are oracle-checked: hashing goes through the engine-portable
family (:mod:`..functions.texthash`), regexes are RE2-compatible so the
same pattern runs in both engines, and the prefix-sum sharding is exact
integer arithmetic over a strict total order (partitioning-independent
by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH
from ..functions import vectors as V
from ..operators.chunks import CHUNK_W, chunk_dup_stats
from ..operators.sharding import exact_median_int, shard_by_token_budget
from ..operators.signatures import signature_table
from ..operators.text import EMAIL_RE, IPV4_RE, redact_pii
from ..operators.vector_agg import group_centroids
from ..sources.batch import load_table
from .registry import register

# ------------------------------------------------------ decontamination

#: deterministic held-out "benchmark" slice of the corpus
_EVAL_MOD = 97


@register(
    "q_decontaminate_ngram",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {TH.duck_shingle_hashes('text')} AS hs FROM documents
    ),
    ev AS (
      SELECT DISTINCT h FROM (
        SELECT unnest(hs) AS h FROM sh WHERE doc_id % {_EVAL_MOD} = 0
      )
    ),
    tr AS (
      SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
    )
    SELECT tr.doc_id AS doc_id, COUNT(*) AS n_hits
    FROM tr JOIN ev USING (h)
    GROUP BY tr.doc_id
    ORDER BY doc_id
    """,
    doc="Benchmark decontamination: training docs sharing any word "
    "3-gram with the held-out eval slice (doc_id % 97 = 0), with the "
    "distinct-overlap count. The eval shingle set is broadcast — the "
    "100 TB corpus side never shuffles; reads the shared per-corpus "
    "signature table, so the tokenize→shingle→hash cost is amortized "
    "across the whole dedup tier. (operators/decontaminate.py; "
    "general-API form contamination_hits works from raw text.)",
    tags=("llm", "decontaminate"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = signature_table(spark, sf_dir).select("doc_id", "hs")
    ev = (
        sigs.where(F.expr(f"doc_id % {_EVAL_MOD} = 0"))
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    tr = sigs.where(F.expr(f"doc_id % {_EVAL_MOD} <> 0")).select(
        "doc_id", F.explode("hs").alias("h")
    )
    return (
        tr.join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .orderBy("doc_id")
    )


# --------------------------------------------------- chunk-level dedup


@register(
    "q_dedup_chunk_exact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TH.duck_tokens('text')} AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, len(toks) // {CHUNK_W} - 1),
               i -> {TH.duck_str_hash(
                   f"array_to_string(toks[i * {CHUNK_W} + 1 : "
                   f"i * {CHUNK_W} + {CHUNK_W}], ' ')")}
             )) AS h
      FROM t WHERE len(toks) >= {CHUNK_W}
    ),
    occ AS (SELECT h, COUNT(*) AS c FROM ch GROUP BY h)
    SELECT ch.doc_id AS doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN occ.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN occ.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_frac
    FROM ch JOIN occ USING (h)
    GROUP BY ch.doc_id
    ORDER BY doc_id
    """,
    doc="Sub-document exact dedup at 16-token-chunk granularity "
    "(boilerplate detection): per-doc count/fraction of chunks whose "
    "hash occurs elsewhere in the corpus. Only 8-byte chunk hashes "
    "shuffle, never chunk text. (operators/chunks.py)",
    tags=("llm", "dedup", "chunks"),
)
def q_dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_dup_stats(docs).orderBy("doc_id")


# ------------------------------------------------------- PII redaction


@register(
    "q_text_pii_redact",
    oracle=f"""
    WITH a AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS aug
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(aug, '{IPV4_RE}')) AS INT) AS n_ips,
           md5(regexp_replace(regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>',
                 'g'), '{IPV4_RE}', '<IP>', 'g')) AS red_md5
    FROM a
    ORDER BY doc_id
    """,
    doc="PII scrub (emails + IPv4) with removal counts; deterministic "
    "synthetic PII is appended per doc so the redaction is non-trivially "
    "exercised, and the full redacted text is md5-compared against the "
    "oracle. RE2-compatible patterns run identically in both engines; "
    "map-only, codegen, no UDF. (operators/text.py::redact_pii)",
    tags=("llm", "text", "pii"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "aug",
        F.expr(
            "concat(text, ' contact u', CAST(doc_id AS STRING), "
            "'@example.com from 10.', CAST(pmod(doc_id, 256) AS STRING), "
            "'.0.1')"
        ),
    )
    return (
        redact_pii(aug, "aug", "redacted")
        .select(
            "doc_id",
            "n_emails",
            "n_ips",
            F.md5("redacted").alias("red_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- token-budget sharding

_SHARD_BUDGET = 2000  # tokens per training shard


@register(
    "q_shard_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({TH.duck_tokens('text')}) AS BIGINT) AS n_tok,
             {TH.duck_str_hash("CAST(doc_id AS VARCHAR)")} AS ord
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tok,
             CAST(SUM(n_tok) OVER (ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM t
    )
    SELECT doc_id, n_tok, cum,
           CAST((cum - n_tok) // {_SHARD_BUDGET} AS BIGINT) AS shard_id
    FROM c
    ORDER BY doc_id
    """,
    doc="Training-shard assignment: deterministic hash-ordered global "
    "shuffle + greedy packing into ~2000-token shards via an exact "
    "global prefix sum. The Spark plan is the scale-safe two-phase form "
    "(range-partition → local cumsum → broadcast per-partition offsets) "
    "— NOT a single-partition global window — yet bit-matches the "
    "oracle's naive SUM OVER (ORDER BY). (operators/sharding.py)",
    tags=("llm", "sharding"),
)
def q_shard_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return shard_by_token_budget(docs, _SHARD_BUDGET).orderBy("doc_id")


# ------------------------------------------------ vector aggregation


@register(
    "q_vector_centroids",
    oracle=f"""
    WITH sv AS (
      SELECT label, {V.duck_scaled('embedding')} AS v FROM embeddings
    ),
    ex AS (
      SELECT label,
             unnest(generate_series(0, len(v) - 1)) AS pos,
             unnest(v) AS c
      FROM sv
    ),
    s AS (
      SELECT label, pos, SUM(c) AS s, COUNT(*) AS n
      FROM ex GROUP BY label, pos
    )
    SELECT label, pos, CAST(n AS BIGINT) AS n_vecs,
           CAST(s AS DOUBLE) / n / {V.SCALE} AS c
    FROM s
    ORDER BY label, pos
    """,
    doc="Per-label exact embedding centroid (the k-means reduce step / "
    "class prototypes): posexplode to (group, pos, component), "
    "map-side-combinable integer sums — the shuffle carries one row per "
    "(group × dim × task), never per vector. Integer-scaled sums are "
    "associative, so the centroid is partition- and engine-independent. "
    "Emitted long-format (label, pos, component) for the oracle compare; "
    "the operator itself returns the rebuilt array<double> column. "
    "(operators/vector_agg.py)",
    tags=("llm", "vectors"),
)
def q_vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent = group_centroids(emb, ["label"])
    return cent.select(
        "label",
        F.posexplode("centroid").alias("pos", "c"),
        "n_vecs",
    ).select(
        "label",
        F.col("pos").cast("bigint").alias("pos"),
        "n_vecs",
        "c",
    ).orderBy("label", "pos")


# ------------------------------------- corpus-median quality filter


@register(
    "q_filter_median_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({TH.duck_tokens('text')}) AS BIGINT) AS n_tok
      FROM documents
    ),
    h AS (SELECT n_tok, COUNT(*) AS c FROM t GROUP BY n_tok),
    cum AS (
      SELECT n_tok, SUM(c) OVER (ORDER BY n_tok) AS cum,
             SUM(c) OVER () AS total
      FROM h
    ),
    thr AS (
      SELECT MIN(n_tok) AS med FROM cum WHERE cum >= (total + 1) // 2
    )
    SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT)
             AS kept_tokens
    FROM t JOIN thr ON t.n_tok >= thr.med
    GROUP BY source
    ORDER BY source
    """,
    doc="Data-dependent corpus filter: keep documents at or above the "
    "corpus-median token count. The median is exact but computed from "
    "the value *histogram* (groupBy token-count → cumulative walk over "
    "distinct values) — metadata-scale work, vs. the TakeOrdered-n/2 "
    "or global-sort plans that die at 100 TB; the 1-row threshold then "
    "broadcast-joins the corpus scan. (operators/sharding.py::"
    "exact_median_int)",
    tags=("llm", "filter"),
)
def q_filter_median_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn(
        "n_tok", F.expr(f"CAST(size({TH.spark_tokens('text')}) AS BIGINT)")
    )
    thr = exact_median_int(t, "n_tok")
    return (
        t.join(F.broadcast(thr), F.col("n_tok") >= F.col("med"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tok").alias("kept_tokens"),
        )
        .orderBy("source")
    )
