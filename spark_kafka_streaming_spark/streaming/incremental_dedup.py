"""Incremental (streaming) near-duplicate filtering.

The batch MinHash-LSH operator (:mod:`..operators.dedup`) dedups a
corpus against itself; a training-data *pipeline* receives documents
continuously and must answer "is this new document a near-dup of
anything already accepted?" incrementally.

Design (the 100 TB shape):

* a persistent **signature store** (parquet table keyed by LSH band
  keys) holds one row per (band, key, doc_id) for every accepted doc;
* each micro-batch, via ``foreachBatch``: compute the batch's
  signatures (same engine-portable hash family), equi-join its band
  keys against the store (and against the batch itself for intra-batch
  dups), verify candidates with exact Jaccard on hashed shingles, drop
  matched docs, and append the survivors' band keys to the store;
* the store grows by accepted docs only; the join stays an equi-join
  on uniformly-distributed band keys — no state-store blowup, and the
  store doubles as the corpus's dedup index for batch jobs.

Exactly-once: the sink keys writes by ``batch_id`` (idempotent
overwrite on replay), same pattern as tests/test_streaming_extra.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import texthash as TH


def signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, hs, sig) for a batch of documents (no shuffle; map-only)."""
    return (
        docs.select(F.col(id_col), F.expr(TH.spark_tokens(text_col)).alias("toks"))
        .select(id_col, F.expr(TH.spark_shingles_from_tokens("toks")).alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            id_col,
            F.expr(
                f"array_distinct(transform(sh, s -> {TH.spark_str_hash('s')}))"
            ).alias("hs"),
        )
        .withColumn("sig", F.expr(TH.spark_minhash_sig("hs")))
    )


def band_keys(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, band, key, hs) — the LSH index rows for the store."""
    return sigs.select(
        id_col,
        "hs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(TH.spark_band_key("sig", b)).alias("key"),
                    )
                    for b in range(TH.BANDS)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key", "hs")


class IncrementalDeduper:
    """foreachBatch processor: accept only docs that are not near-dups
    of the already-accepted corpus (or of earlier docs in the same
    batch), maintaining the signature store at ``store_path`` and the
    accepted docs at ``accepted_path``.
    """

    def __init__(
        self,
        store_path: str,
        accepted_path: str,
        jaccard_threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.store_path = store_path
        self.accepted_path = accepted_path
        self.threshold = jaccard_threshold
        self.id_col = id_col
        self.text_col = text_col

    # -- helpers -------------------------------------------------------
    def _store(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.store_path):
            return None
        return spark.read.parquet(self.store_path)

    def _dup_ids(self, batch_keys: DataFrame, index: DataFrame) -> DataFrame:
        """ids in ``batch_keys`` that near-dup anything in ``index``."""
        id_c = self.id_col
        cand = (
            batch_keys.alias("n")
            .join(
                index.alias("o"),
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.key") == F.col("o.key"))
                & (F.col(f"n.{id_c}") != F.col(f"o.{id_c}")),
            )
            .select(
                F.col(f"n.{id_c}").alias("new_id"),
                F.col(f"o.{id_c}").alias("old_id"),
                F.col("n.hs").alias("hs1"),
                F.col("o.hs").alias("hs2"),
            )
            .dropDuplicates(["new_id", "old_id"])
        )
        inter = F.size(F.array_intersect("hs1", "hs2"))
        union = F.size("hs1") + F.size("hs2") - inter
        return (
            cand.withColumn(
                "jaccard", inter.cast("double") / union.cast("double")
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select(F.col("new_id").alias(self.id_col))
            .distinct()
        )

    # -- the foreachBatch hook -----------------------------------------
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        id_c = self.id_col
        keys = band_keys(signatures(batch, id_c, self.text_col), id_c).persist()

        dup_vs_store = None
        store = self._store(spark)
        if store is not None:
            dup_vs_store = self._dup_ids(keys, store)

        # intra-batch: keep the lowest id of each duplicate cluster
        intra = (
            keys.alias("a")
            .join(
                keys.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col(f"a.{id_c}") > F.col(f"b.{id_c}")),
            )
            .select(
                F.col(f"a.{id_c}").alias("new_id"),
                F.col(f"b.{id_c}").alias("old_id"),
                F.col("a.hs").alias("hs1"),
                F.col("b.hs").alias("hs2"),
            )
            .dropDuplicates(["new_id", "old_id"])
        )
        inter = F.size(F.array_intersect("hs1", "hs2"))
        union = F.size("hs1") + F.size("hs2") - inter
        intra_dups = (
            intra.withColumn("jaccard", inter.cast("double") / union.cast("double"))
            .filter(F.col("jaccard") >= self.threshold)
            .select(F.col("new_id").alias(id_c))
            .distinct()
        )

        dups = intra_dups if dup_vs_store is None else dup_vs_store.union(
            intra_dups
        ).distinct()
        accepted = batch.join(dups, id_c, "left_anti").persist()

        # idempotent per-epoch writes: replaying batch_id overwrites
        accepted.write.mode("overwrite").parquet(
            f"{self.accepted_path}/batch={batch_id}"
        )
        accepted_keys = keys.join(accepted.select(id_c), id_c, "left_semi")
        accepted_keys.write.mode("overwrite").parquet(
            f"{self.store_path}/batch={batch_id}"
        )
        keys.unpersist()
        accepted.unpersist()
