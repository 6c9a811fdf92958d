"""Inverted-index construction: the shared derivation used by the
batch catalog query (``q_text_inverted_index``) and the streaming
incremental indexer (:mod:`..streaming.incremental_index`).

The index is two composable steps:

* :func:`term_doc_tf` — tokenize + per-(term, doc) term frequency.
  One shuffle on (term, doc_id) with map-side partial counts; this is
  the MERGEABLE representation (tf partials from any split of the
  corpus — partitions, micro-batches — sum to the same table), which
  is what makes the streaming twin exact.
* :func:`inverted_index` — per-term document frequency, total tf, and
  the posting list capped at the top-``cap`` documents by
  (tf desc, doc_id).  The cap is the head-term skew guard: a
  stop-word's postings would otherwise concentrate its entire docset
  in one group at corpus scale.  Postings are serialized to a
  comma-joined string (container-typed outputs are forbidden by the
  registry rule — the verification driver's canonicalizer cannot hash
  list cells).

Provenance: the batch-corpus generalization of the reference's
streaming word count (``KafkaWordCount.scala:70-73``) into a search
structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import texthash as TH

#: Posting-list cap (top-k docs per term by tf desc, doc_id asc).
POSTINGS_CAP = 5


def term_doc_tf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) — the mergeable term-frequency table."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(TH.spark_tokens(text_col))).alias("term"),
    )
    return tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def inverted_index(tf: DataFrame, cap: int = POSTINGS_CAP) -> DataFrame:
    """(term, df, total_tf, top_docs) from a (term, doc_id, tf) table.

    ``top_docs`` is the rank-capped posting list as a comma-joined
    string of doc_ids ordered by (tf desc, doc_id).
    """
    w = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    ranked = tf.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
            F.expr(
                f"concat_ws(',', transform(array_sort(collect_list("
                f"CASE WHEN rk <= {cap} THEN struct(rk, doc_id) "
                f"END)), s -> CAST(s.doc_id AS STRING)))"
            ).alias("top_docs"),
        )
        .orderBy("term")
    )


# ------------------------------------------------- BM25 ranked scoring
#
# Shared by the batch catalog query (q_text_bm25_search, which builds
# per_doc in a single tokenize pass) and the streaming serving loop
# (IncrementalIndexer.bm25_snapshot, which derives per_doc from the
# merged (term, doc_id, tf) store: dl = Σ tf) — the SAME expressions
# in the same written order, so stream-served and batch scores are
# bit-identical.

#: Query terms (mid-frequency words of the corpus vocabulary).
BM25_TERMS = ("hash", "stream", "vector")
BM25_TOPK = 15
#: idf quantization scale: idfq = floor(log2((N-df)·1024 / (df+1))),
#: computed as the bit-length of an exact integer — engine-identical,
#: monotone in the real Robertson idf.
IDF_SCALE = 1024

#: k1 = 1.2, b = 0.75 (the standard Okapi constants).  The whole score
#: expression is ONE shared string evaluated with the same literal
#: operands in the same order by both engines → bit-identical doubles.
BM25_SCORE = (
    "(CAST(idfq_{t} AS DOUBLE) * ((CAST(tf_{t} AS DOUBLE) * 2.2) / "
    "(CAST(tf_{t} AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
    "((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)) / "
    "CAST(sum_dl AS DOUBLE))))))"
)


def bm25_idfq(df_expr: str, div: str) -> str:
    """Bit-length-quantized idf from exact integers; ``div`` is the
    engine's integer-division operator (Spark DIV, DuckDB //)."""
    return (
        f"CAST(length(bin(((n_docs - {df_expr}) * {IDF_SCALE}) {div} "
        f"({df_expr} + 1))) - 1 AS INT)"
    )


def bm25_tf_case(t: str) -> str:
    return f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)"


def bm25_score_per_doc(
    per_doc: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """Okapi BM25 ranking from a per-doc statistics table.

    ``per_doc``: (doc_id, dl, tf_<term>…).  Corpus statistics reduce
    to a single broadcast row, per-term scores sum in the fixed
    written order, and the ranking is TakeOrderedAndProject — one
    broadcast, zero extra shuffles at any corpus size.
    """
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.expr(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END)")
            .cast("bigint")
            .alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        *[f"tf_{t}" for t in terms],
        "n_docs",
        "sum_dl",
        *[F.expr(bm25_idfq(f"df_{t}", "DIV")).alias(f"idfq_{t}") for t in terms],
    )
    final = scored.select(
        "doc_id",
        *[F.expr(BM25_SCORE.format(t=t)).alias(f"s_{t}") for t in terms],
    )
    total = f"s_{terms[0]}"
    for t in terms[1:]:
        total = f"({total} + s_{t})"
    return (
        final.select(
            "doc_id",
            *[f"s_{t}" for t in terms],
            F.expr(total).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(topk)
    )


def rrf_fuse(
    bm: DataFrame, cv: DataFrame, rrf_k: int = 60, topk: int = 15
) -> DataFrame:
    """Reciprocal Rank Fusion of a lexical and a dense rank list.

    ``bm``: (doc_id, bm25_rank); ``cv``: (id, cos_rank).  Fused score
    is Σ 1/(rrf_k + rank) over the legs a doc appears in (Cormack
    2009) — score-free, so the ordering is engine-exact (ranks are
    integers; 1/(rrf_k+r) is one IEEE division).  Shared by the batch
    query (q_search_hybrid_rrf) and the streaming serving loop
    (streaming/serving.py::hybrid_rrf_from_stores), the same
    batch/stream-shared-expression contract as BM25 scoring above.
    The join is between two ≤leg_k-row rank lists — bounded at any
    corpus size.
    """
    fused = bm.join(cv, bm.doc_id == cv.id, "full_outer").select(
        F.coalesce("doc_id", "id").alias("id"),
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(1.0 / (rrf_k + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("cos_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "id").limit(topk)
