"""Bigram language-model scoring of documents against their own corpus.

The per-round quality signal used by CCNet/KenLM-style pipelines:
build an n-gram count table over the corpus, then score every document
by how much of it is *familiar* (n-grams the corpus has seen at least
``min_count`` times).  Low-familiarity documents are gibberish or
OCR noise; suspiciously high familiarity flags boilerplate.

Plan shape (100 TB posture):

* LM table: explode bigrams → ``groupBy(bigram).count()`` — fully
  map-side combinable, the shuffle carries one row per distinct bigram
  per map task, never per occurrence.  The ``HAVING count >= min``
  prune (standard KenLM size guard) shrinks the table by orders of
  magnitude before it is joined.
* Scoring join: per-(doc, bigram) occurrence counts join the pruned LM
  table on the bigram key.  Spark picks broadcast when the pruned
  table fits (AQE), else a shuffle hash join on the key; either way
  nothing quadratic.  At 100 TB the join key should be the 64-bit
  bigram hash rather than the string — noted below, kept as the string
  here so the oracle comparison stays collision-free.
* Everything downstream is exact integers; the single division is one
  deterministic double op per doc, identical in both engines.

Scoring is *self-referential* (the corpus scores itself), matching the
first pass of a quality-filter loop; scoring against a frozen external
LM table is the same join with ``lm`` loaded from a parquet snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bigram) with multiplicity — one row per bigram occurrence."""
    toks = docs.select(
        id_col, F.expr(TH.spark_tokens(text_col)).alias("toks")
    ).filter(F.expr("size(toks) >= 2"))
    return toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    )


def bigram_familiarity(
    docs: DataFrame,
    min_count: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document familiarity under the corpus bigram LM.

    Returns ``(id_col, n_bigrams, n_familiar, familiarity)`` where
    ``familiarity = n_familiar / n_bigrams`` and a bigram occurrence is
    familiar iff its *corpus-wide* occurrence count is ``>= min_count``.
    """
    bg = _doc_bigrams(docs, text_col, id_col)
    # per-(doc, bigram) multiplicity: one shuffle keyed by (doc, bigram)
    per = bg.groupBy(id_col, "bigram").agg(F.count("*").alias("occ"))
    # corpus LM table, pruned before the join (KenLM min-count guard)
    lm = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("corpus_cnt"))
        .filter(F.col("corpus_cnt") >= min_count)
        .select("bigram")
        .withColumn("_familiar", F.lit(1))
    )
    scored = per.join(lm, "bigram", "left")
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_bigrams"),
            F.coalesce(F.sum(F.col("occ") * F.col("_familiar")), F.lit(0)).alias(
                "n_familiar"
            ),
        )
        .withColumn(
            "familiarity",
            F.col("n_familiar").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def duck_bigram_familiarity_sql(min_count: int = 3) -> str:
    """DuckDB oracle twin of :func:`bigram_familiarity` over ``documents``."""
    return f"""
    WITH t AS (
      SELECT doc_id, {TH.duck_tokens('text')} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t WHERE len(toks) >= 2
    ),
    per AS (
      SELECT doc_id, bigram, COUNT(*) AS occ FROM bg GROUP BY doc_id, bigram
    ),
    lm AS (
      SELECT bigram FROM bg GROUP BY bigram HAVING COUNT(*) >= {min_count}
    )
    SELECT per.doc_id,
           CAST(SUM(per.occ) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(SUM(CASE WHEN lm.bigram IS NOT NULL THEN per.occ END), 0)
                AS BIGINT) AS n_familiar,
           CAST(COALESCE(SUM(CASE WHEN lm.bigram IS NOT NULL THEN per.occ END), 0)
                AS DOUBLE) / CAST(SUM(per.occ) AS DOUBLE) AS familiarity
    FROM per LEFT JOIN lm USING (bigram)
    GROUP BY per.doc_id
    """
