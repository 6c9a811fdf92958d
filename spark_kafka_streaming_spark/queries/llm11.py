"""Round-4 fourth batch: containment (overlap-coefficient) dedup.

The asymmetric member of the dedup tier: symmetric Jaccard (MinHash,
SimHash, n-gram SSJoin) scores a short document embedded verbatim in a
long one LOW (small |A∩B|/|A∪B|), so sub-document duplication —
quoted chunks, boilerplate wrappers, prompt-template expansions —
survives every symmetric pass.  The overlap coefficient
|A∩B|/min(|A|,|B|) scores exactly those pairs ~1.0.
``operators/dedup.py::overlap_pairs``; see
q_dedup_cross_source_chunks for the chunk-level (exact) relative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import texthash as TH
from ..operators import dedup as D
from ..sources.batch import load_table
from .registry import register

_OV_THRESHOLD = 0.8
_OV_MAX_DF = 20


@register(
    "q_dedup_containment_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct({TH.duck_shingle_hashes('text')})) AS h
      FROM documents
    ),
    dfh AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h),
    rare AS (
      SELECT s.doc_id, s.h FROM sh s JOIN dfh USING (h)
      WHERE df <= {_OV_MAX_DF}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id1, c.id2, COUNT(*) AS inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.id1
      JOIN sh b ON b.doc_id = c.id2 AND b.h = a.h
      GROUP BY c.id1, c.id2
    )
    SELECT i.id1, i.id2, CAST(i.inter AS BIGINT) AS inter,
           CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
           CAST(i.inter AS DOUBLE) / CAST(LEAST(s1.sz, s2.sz) AS DOUBLE)
             AS overlap
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.id1
    JOIN sizes s2 ON s2.doc_id = i.id2
    WHERE CAST(i.inter AS DOUBLE) / CAST(LEAST(s1.sz, s2.sz) AS DOUBLE)
          >= {_OV_THRESHOLD}
    ORDER BY id1, id2
    """,
    doc="Containment near-dup detection by the overlap coefficient "
    "|A∩B|/min(|A|,|B|) over distinct word-3-gram shingles: the "
    "asymmetric dedup tier that catches a short document embedded "
    "verbatim inside a long one (overlap ≈ 1.0) where symmetric "
    "Jaccard stays low and every MinHash/SimHash pass misses it — "
    "the quoted-chunk / boilerplate-wrapper / template-expansion "
    "duplication of a crawl corpus. Candidates come only from "
    "shingles with document frequency ≤ {d} (the scale guard: "
    "per-shingle join fan-out bounded at df², and a pair is lost "
    "only if every shared shingle is boilerplate-hot); the exact "
    "intersection is then counted over candidates' full shingle "
    "sets. Exact integer sizes ⇒ bit-identical overlap division. "
    "operators/dedup.py::overlap_pairs.".format(d=_OV_MAX_DF),
    tags=("dedup", "text", "llm"),
)
def q_dedup_containment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.overlap_pairs(
        docs, threshold=_OV_THRESHOLD, max_df=_OV_MAX_DF
    ).orderBy("id1", "id2")
