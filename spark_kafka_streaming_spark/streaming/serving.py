"""Hybrid retrieval served from the maintained stores — the serving
loop that ties the maintenance family together.

A retrieval deployment keeps a lexical index and a vector index
current as documents stream in; query time fuses the two.  Both legs
already exist as streaming stores with batch-identical serving
(:meth:`..streaming.incremental_index.IncrementalIndexer.bm25_snapshot`
and :meth:`..streaming.incremental_vectors.IncrementalVectorIndexer.topk`),
and the fusion expression is shared with the batch query
(:func:`..operators.index.rrf_fuse`, q_search_hybrid_rrf) — so the
stream-served hybrid ranking is bit-identical to a batch rebuild over
everything ingested (pinned in tests/test_streaming_extra.py).

Scale shape: each leg reads only its store's bounded slice (BM25 stats
reduce from tf partials; ANN scans only probed ``cell=…``
directories), and the fusion joins two ≤leg_k-row rank lists — query
cost is independent of ingest history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import index as IX
from .incremental_index import IncrementalIndexer
from .incremental_vectors import IncrementalVectorIndexer


def hybrid_rrf_from_stores(
    indexer: IncrementalIndexer,
    vec_indexer: IncrementalVectorIndexer,
    queries: DataFrame,
    spark: SparkSession,
    leg_k: int = 50,
    rrf_k: int = 60,
    topk: int = 15,
    n_probe: int = 4,
) -> DataFrame | None:
    """RRF-fused hybrid retrieval from the two maintained stores.

    ``queries``: the (single- or few-row) query embedding frame for
    the dense leg; the lexical leg scores the store's fixed query
    terms.  Returns ``(id, bm25_rank, cos_rank, rrf)`` top-``topk``,
    or ``None`` until both stores have ingested at least one batch.
    """
    bm_scored = indexer.bm25_snapshot(spark, topk=leg_k)
    if bm_scored is None:
        return None
    w = Window.orderBy(F.desc("score"), "doc_id")
    bm = bm_scored.withColumn(
        "bm25_rank", F.row_number().over(w).cast("int")
    ).select("doc_id", "bm25_rank")
    cv_scored = vec_indexer.topk(queries, k=leg_k, n_probe=n_probe)
    if cv_scored is None:
        return None
    cv = cv_scored.select(
        F.col("neighbor_id").alias("id"),
        F.col("rn").cast("int").alias("cos_rank"),
    )
    return IX.rrf_fuse(bm, cv, rrf_k=rrf_k, topk=topk)
