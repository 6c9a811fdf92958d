"""Incremental (streaming) quantile state: the bottom-k priority
sample maintained across micro-batches.

The batch sketch (:mod:`..operators.quantiles`) is *mergeable by
construction* — the per-group bottom-k of a union is the bottom-k of
the union of per-part bottom-k's — so the streaming state is simply
the current per-group sample, and the maintenance loop is the
partials-append shape shared by the other five stores (signatures,
index, MERGE, spans, vectors):

* each micro-batch writes ITS OWN per-group bottom-k (≤ groups·k rows)
  under a ``batch=B`` leaf with dynamic partition overwrite, so a
  replayed trigger overwrites exactly its own output (exactly-once);
* :meth:`IncrementalQuantileStore.sample` re-cuts bottom-k across all
  leaves — a window over O(batches·groups·k) rows, never the stream;
* :meth:`IncrementalQuantileStore.quantiles` runs the SAME
  :func:`..operators.quantiles.quantile_estimates` derivation as the
  batch query, so a snapshot over everything ingested is bit-identical
  to a batch rebuild (pinned in tests/test_round7b_ops.py);
* :meth:`IncrementalQuantileStore.compact` folds the leaves into one
  ``batch=-1`` base, bounding file counts.

Because the state is an actual row sample (not a digest), the store
also answers *new* quantiles, arbitrary sub-range ranks, and serves as
a deterministic uniform sample of the stream for any downstream audit
— properties engine-native quantile digests don't have.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.quantiles import K_GROUP, quantile_estimates


class IncrementalQuantileStore:
    """foreachBatch processor maintaining per-group bottom-k priority
    samples at ``store_path``; :meth:`quantiles` serves rank estimates
    over everything ingested."""

    def __init__(
        self,
        store_path: str,
        group_col: str,
        value_col: str,
        key_sql: str,
        k: int = K_GROUP,
        compact_every: int = 0,
    ):
        self.store_path = store_path
        self.group_col = group_col
        self.value_col = value_col
        self.key_sql = key_sql
        self.k = k
        self.compact_every = compact_every

    def _cut(self, rows: DataFrame) -> DataFrame:
        w = Window.partitionBy("g").orderBy("h", "ky")
        return (
            rows.withColumn("prk", F.row_number().over(w))
            .filter(F.col("prk") <= self.k)
            .drop("prk")
        )

    def sample(self, spark: SparkSession) -> DataFrame | None:
        """The current per-group bottom-k over ALL ingested rows:
        re-cutting the union of per-batch cuts is exact because any
        row in the global bottom-k survives its own batch's cut."""
        if not os.path.exists(self.store_path):
            return None
        return self._cut(
            spark.read.parquet(self.store_path).select("g", "v", "ky", "h")
        )

    def quantiles(self, spark: SparkSession) -> DataFrame | None:
        """(g, q, est, m) over everything ingested — the SAME
        derivation as the batch query, so snapshot ≡ batch rebuild."""
        samp = self.sample(spark)
        if samp is None:
            return None
        return quantile_estimates(samp, grouped=True).orderBy("g", "q")

    def compact(self, spark: SparkSession) -> None:
        """Fold per-batch leaves into one ``batch=-1`` base (temp dir +
        rename; a transactional table format makes the same move
        atomic)."""
        samp = self.sample(spark)
        if samp is None:
            return
        tmp = self.store_path + ".compact.tmp"
        (
            samp.withColumn("batch", F.lit(-1))
            .repartition("g")
            .write.mode("overwrite")
            .partitionBy("batch")
            .parquet(tmp)
        )
        shutil.rmtree(self.store_path)
        os.rename(tmp, self.store_path)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.quantiles import bottomk_sample_grouped

        cut = bottomk_sample_grouped(
            batch, self.group_col, self.value_col, self.key_sql, self.k
        )
        (
            cut.withColumn("batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(self.store_path)
        )
        if (
            self.compact_every
            and batch_id > 0
            and batch_id % self.compact_every == 0
        ):
            self.compact(batch.sparkSession)
