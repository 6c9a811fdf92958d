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
